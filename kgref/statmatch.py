"""Statistical (non-dictionary) recognizer engine — the third engine
behind the SURVEY.md §2.10 plugin seam.

The reference's recognizer plugin directory implies a Mallet-style
statistical entity recognizer alongside the dictionary/mgrep one
(`ref:lib/ncbo_annotator/recognizers/mallet.rb [M]` — a CRF/MaxEnt
tagger trained outside the request path, loaded per worker).  This
module is that capability rebuilt on public ML: an AVERAGED PERCEPTRON
BIO tagger (Collins 2002, "Discriminative Training Methods for HMMs")
over hashed token features, trained deterministically at recognizer
init from the broadcast dictionary state (distant supervision: the
dictionary's own term surfaces embedded in synthetic context), and run
VECTORIZED at inference — feature hashing and class scoring are numpy
gathers over all tokens of a text at once, not per-token Python.

Inference contract is the engine seam shared with TermDictionary and
RegexTermScanner: ``match(utext, whole_word_only) -> list[RawMatch]``.
The tagger proposes entity REGIONS (maximal B/I runs); grounding to
term ids then window-scans only inside those regions.  Downstream
filtering/expansion (M4-M11, J1-J4, A4) is engine-independent.
Token-level tagging is inherently whole-word; ``whole_word_only=False``
degrades to whole-word semantics (documented engine property).

Scale shape: training happens once per actor ``__init__`` (the
stateful-stage pattern; milliseconds at dictionary sizes that fit the
broadcast state), weights are two small float32 arrays, and inference
adds no shuffle — the engine swaps into the same actor-pool
``map_batches`` stage as the other two.
"""

from __future__ import annotations

import numpy as np

from .matcher import TOKEN_RE, RawMatch

# classes ordered so that an all-zero score vector (token never seen in
# training) argmaxes to O — unseen vocabulary defaults to "not an entity"
_O, _B, _I = 0, 1, 2
_N_CLS = 3

_DIM = 1 << 16  # hashed feature space
_FAMILIES = 4  # cur, prev, next, shape
_SALT = np.array([0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F],
                 np.uint64)

_BOS = "<S>"
_EOS = "</S>"


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit token hashes (shared numpy M61 fold)."""
    from .ops.m61 import fold_m61_many

    return fold_m61_many(tokens)


def _shape_ids(tokens: list[str]) -> np.ndarray:
    """Cheap token-shape feature: (len bucket, has_digit, all_digit)."""
    out = np.empty(len(tokens), np.uint64)
    for i, t in enumerate(tokens):
        has_d = any(c.isdigit() for c in t)
        out[i] = (min(len(t), 8) << 2) | (has_d << 1) | t.isdigit()
    return out


def _features(tokens: list[str]) -> np.ndarray:
    """(n_tokens, _FAMILIES) hashed feature matrix for one token
    sequence: current / previous / next token identity + shape."""
    h = _hash_tokens([_BOS] + tokens + [_EOS])
    cur, prev, nxt = h[1:-1], h[:-2], h[2:]
    f = np.empty((len(tokens), _FAMILIES), np.int64)
    f[:, 0] = ((cur ^ _SALT[0]) % _DIM).astype(np.int64)
    f[:, 1] = ((prev ^ _SALT[1]) % _DIM).astype(np.int64)
    f[:, 2] = ((nxt ^ _SALT[2]) % _DIM).astype(np.int64)
    f[:, 3] = ((_shape_ids(tokens) ^ _SALT[3]) % _DIM).astype(np.int64)
    return f


def _synth_corpus(terms: list[str], seed: int = 13,
                  n_sentences: int = 400):
    """Deterministic distant-supervision corpus: dictionary term
    surfaces embedded in synthetic background context, BIO-labelled by
    construction.  Background vocabulary is a disjoint fake lexicon —
    at inference, genuinely unseen background tokens score 0 in every
    class and argmax to O, so the model's behavior on real text hinges
    on the term weights it learned here."""
    rng = np.random.default_rng(seed)
    bg = [f"BG{i}X" for i in range(256)]
    term_toks = [TOKEN_RE.findall(t) for t in terms]
    term_toks = [t for t in term_toks if t]
    sents: list[tuple[list[str], list[int]]] = []
    for _ in range(n_sentences):
        toks: list[str] = []
        labs: list[int] = []
        for _ in range(int(rng.integers(2, 5))):
            for _ in range(int(rng.integers(1, 5))):
                toks.append(bg[int(rng.integers(0, len(bg)))])
                labs.append(_O)
            tt = term_toks[int(rng.integers(0, len(term_toks)))]
            toks.extend(tt)
            labs.extend([_B] + [_I] * (len(tt) - 1))
        sents.append((toks, labs))
    return sents


class PerceptronTagger:
    """Averaged-perceptron BIO tagger over hashed token features.

    ``weights`` has shape (_N_CLS, _DIM); a token's class scores are
    the sum of its _FAMILIES feature weights (one numpy gather for the
    whole sequence).  Training is the standard averaged perceptron:
    on a mistake, w[gold, feats] += 1, w[pred, feats] -= 1, with the
    running average taken at the end (Collins 2002)."""

    def __init__(self, weights: np.ndarray):
        assert weights.shape == (_N_CLS, _DIM)
        self.weights = weights

    @classmethod
    def train(cls, sentences, epochs: int = 3) -> "PerceptronTagger":
        w = np.zeros((_N_CLS, _DIM), np.float64)
        acc = np.zeros_like(w)  # sum of w after every update (averaging)
        n_upd = 0
        feats = [(_features(toks), np.asarray(labs, np.int64))
                 for toks, labs in sentences]
        for _ in range(epochs):
            for f, labs in feats:
                scores = w[:, f].sum(axis=2)  # (cls, n_tokens)
                pred = scores.argmax(axis=0)
                wrong = np.nonzero(pred != labs)[0]
                for i in wrong:
                    w[labs[i], f[i]] += 1.0
                    w[pred[i], f[i]] -= 1.0
                    acc += w
                    n_upd += 1
        avg = acc / max(1, n_upd)
        return cls(avg.astype(np.float32))

    def tag(self, tokens: list[str]) -> np.ndarray:
        if not tokens:
            return np.empty(0, np.int64)
        f = _features(tokens)
        return self.weights[:, f].sum(axis=2).argmax(axis=0)


class StatisticalTermScanner:
    """Engine-seam adapter: BIO-tag the token sequence, then ground
    each maximal B/I run by window-scanning ONLY inside the run for
    surfaces the dictionary can resolve to term ids.  The model prunes
    the candidate space; the grounder supplies identities — the
    standard statistical-NER + entity-linking split."""

    def __init__(self, term_ids_by_norm: dict[str, int],
                 tagger: PerceptronTagger | None = None):
        self.term_ids_by_norm = term_ids_by_norm
        self._max_tokens = max(
            (len(TOKEN_RE.findall(t)) for t in term_ids_by_norm if t),
            default=1)
        self.tagger = tagger or PerceptronTagger.train(
            _synth_corpus(list(term_ids_by_norm)))

    def match(self, utext: str,
              whole_word_only: bool = True) -> list[RawMatch]:
        spans = [m.span() for m in TOKEN_RE.finditer(utext)]
        if not spans:
            return []
        tokens = [utext[s:e] for s, e in spans]
        labels = self.tagger.tag(tokens)
        ids = self.term_ids_by_norm
        out: list[RawMatch] = []
        n = len(tokens)
        i = 0
        while i < n:
            if labels[i] == _O:
                i += 1
                continue
            j = i
            while j + 1 < n and labels[j + 1] == _I:
                j += 1
            for a in range(i, j + 1):  # window-scan inside the run
                for b in range(a, min(a + self._max_tokens, j + 1)):
                    tid = ids.get(utext[spans[a][0]:spans[b][1]])
                    if tid is not None:
                        out.append(
                            RawMatch(tid, spans[a][0], spans[b][1]))
            i = j + 1
        return out
