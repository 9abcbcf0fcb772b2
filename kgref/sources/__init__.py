from .transcripts import documents_as_transcripts, read_transcripts

__all__ = ["read_transcripts", "documents_as_transcripts"]
