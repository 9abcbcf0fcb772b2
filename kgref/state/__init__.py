from .dictionary import DictionaryState

__all__ = ["DictionaryState"]
