"""Annotate stage — the fused hot path (SURVEY.md §2 M1–M11, J1–J4, A4).

One actor-pool ``map_batches`` stage does everything the reference does
between receiving a text and returning Annotation objects
(annotate → annotate_direct → expand_hierarchies → expand_mappings,
ref:lib/ncbo_annotator.rb [H]), emitting flat TRIPLES rows:

    ds.map_batches(AnnotateTriples, fn_constructor_args=(state_ref, opts),
                   batch_format="pyarrow", zero_copy_batch=True,
                   batch_size=cfg.batch_size, concurrency=N)

Fusing matcher + expansion + canonicalization into one stage minimizes
materialized intermediate rows (match fan-out multiplies bytes — every
extra stage boundary would re-serialize the exploded rows through the
object store).  The automaton/index build happens ONCE per actor in
``__init__`` from the broadcast DictionaryState (``ray.put`` handle, one
copy per node); the per-TERM expansion templates are likewise cached on
the actor (:class:`TemplateRegistry`) and amortized across every batch
the actor processes — per-batch work is dict probes + numpy gathers at
C speed.

Scale notes (10^12 turns): stateless w.r.t. the data — any worker can
take any block; dictionary is dimension-sized (≤ GBs for UMLS-scale) and
broadcast once; output batch is built column-wise and handed back to the
streaming executor, which backpressures on the match fan-out.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..matcher import RawMatch, fold_upper, longest_only_filter, raw_filter
from ..schemas import TRIPLES, AnnotateOptions
from ..state.dictionary import DictionaryState


def _resolve_state(state) -> DictionaryState:
    if isinstance(state, DictionaryState):
        return state
    import ray  # ObjectRef handed to the actor constructor

    return ray.get(state)


def _stop_set(state: DictionaryState, opts: AnnotateOptions) -> frozenset[str]:
    stopset = state.stop_words if opts.use_stop_words else frozenset()
    if opts.extra_stop_words:
        stopset = frozenset(
            stopset | {fold_upper(w) for w in opts.extra_stop_words})
    return stopset


class TemplateRegistry:
    """Per-TERM emitted-row templates, cached for an actor's lifetime.

    Dictionary state and options are immutable once an actor is
    constructed, so the template built for a term in one batch is valid
    for every later batch — building it per batch (the round-2 shape)
    repaid the full J1+closure+mapping resolution for the same hot terms
    on every batch.  Templates are built lazily as the corpus vocabulary
    appears and only grow; cached numpy/arrow views are invalidated by a
    cheap length check (state is append-only, never rewritten).

    A template maps one term_id to its fixed emitted rows under these
    options: J1 class resolution (M8–M10 filters) + direct + capped
    closure (J2) + filtered mappings (J3), as int-coded
    (pred, obj, dist, mt) rows.  A2/U2 keep-min-distance dedup is
    applied AT BUILD TIME — two matches can only collide on the full
    (s, e, pred, obj, mt) key when they share (s, e), and an identical
    span is an identical substring, hence the SAME term_id and the same
    template, so no runtime dedup pass is needed.

    Scoring support (A4): for score='old' every template row carries its
    exact per-row score (base × decay chain, Python-rounded at build —
    scores depend only on template fields).  For the cvalue variants the
    registry carries per-term factors (``n_direct``: raw passing class
    entries, the per-occurrence surface-count contribution;
    ``tok_factor``: 1+log2(ntoks) of the normalized surface) and the
    per-emission score is finished vectorized in the batch function.
    """

    def __init__(self, state: DictionaryState, opts: AnnotateOptions):
        self.term_classes = state.term_classes
        self.class_info = state.class_info
        self.closure = state.closure
        self.mappings = state.mappings
        self.with_synonyms = opts.with_synonyms
        self.expand_mappings = opts.expand_mappings
        self.onts = set(opts.ontologies)
        self.stys = set(opts.semantic_types)
        self.K = opts.expand_hierarchy_levels
        self.scoring = opts.score

        # obj registry: one dense code per distinct class URI seen
        self.obj_uris: list[str] = []
        self.obj_pref: list[str] = []
        self.obj_cui: list[str] = []
        self._obj_code_of: dict[str, int] = {}

        # template rows (CSR over tmpl_slice)
        self.t_pred: list[int] = []   # 0=annotated_with 1=isa 2=mapped
        self.t_obj: list[int] = []
        self.t_dist: list[int] = []
        self.t_mt: list[int] = []     # 0=PREF 1=SYN
        self.t_score_old: list[float] = []  # only filled when score='old'
        self.tmpl_slice: dict[int, tuple[int, int]] = {}

        # per-term scoring factors (cvalue/cvalueh)
        self.n_direct: dict[int, int] = {}
        self.tok_factor: dict[int, float] = {}

        # cached views, invalidated by length change
        self._np_len = -1
        self._np: tuple | None = None
        self._obj_len = -1
        self._obj_pa: tuple | None = None

    def obj_code(self, uri: str) -> int:
        c = self._obj_code_of.get(uri)
        if c is None:
            c = len(self.obj_uris)
            self._obj_code_of[uri] = c
            self.obj_uris.append(uri)
            info = self.class_info.get(uri)
            self.obj_pref.append(info[0] if info else "")
            self.obj_cui.append(info[1] if info else "")
        return c

    def build(self, tid: int) -> tuple[int, int]:
        """Build (and memoize) the template for one term id."""
        t_pred, t_obj = self.t_pred, self.t_obj
        t_dist, t_mt = self.t_dist, self.t_mt
        scoring_old = self.scoring == "old"
        start = len(t_pred)
        n_raw = 0
        seen: dict[tuple[int, int, int], int] = {}  # key -> row idx
        for uri, ont, mt in self.term_classes.get(tid, ()):
            if not self.with_synonyms and mt != "PREF":  # M8
                continue
            if self.onts and ont not in self.onts:  # M9
                continue
            if self.stys:  # M10
                info = self.class_info.get(uri)
                if not info or not self.stys.intersection(info[3]):
                    continue
            n_raw += 1
            mtc = 0 if mt == "PREF" else 1
            base = 10.0 if mtc == 0 else 8.0
            rows = [(0, self.obj_code(uri), 0, mtc)]
            if self.K:
                for anc, dist in self.closure.get(uri, ()):
                    if dist > self.K:
                        break  # closure lists are distance-sorted
                    rows.append((1, self.obj_code(anc), dist, mtc))
            if self.expand_mappings:
                for muri, mont in self.mappings.get(uri, ()):
                    if self.onts and mont not in self.onts:
                        continue
                    rows.append((2, self.obj_code(muri), 0, mtc))
            for pred, obj, dist, mtc_ in rows:
                k = (pred, obj, mtc_)
                prev = seen.get(k)
                if prev is not None:  # A2/U2: keep min distance
                    if dist < t_dist[prev]:
                        t_dist[prev] = dist
                        if scoring_old:
                            self.t_score_old[prev] = round(
                                base * (0.8 ** dist), 4)
                    continue
                seen[k] = len(t_pred)
                t_pred.append(pred)
                t_obj.append(obj)
                t_dist.append(dist)
                t_mt.append(mtc_)
                if scoring_old:
                    if pred == 0:
                        sc = base
                    elif pred == 1:
                        sc = round(base * (0.8 ** dist), 4)
                    else:
                        sc = round(base * 0.7, 4)
                    self.t_score_old.append(sc)
        self.n_direct[tid] = n_raw
        sl = (start, len(t_pred))
        self.tmpl_slice[tid] = sl
        return sl

    def rows_np(self):
        """Template rows as numpy (cached; rebuilt only on growth —
        bounded by dictionary size, not corpus size)."""
        n = len(self.t_pred)
        if self._np_len != n:
            self._np = (
                np.array(self.t_pred, dtype=np.int32),
                np.array(self.t_obj, dtype=np.int32),
                np.array(self.t_dist, dtype=np.int32),
                np.array(self.t_mt, dtype=np.int32),
                (np.array(self.t_score_old, dtype=np.float64)
                 if self.scoring == "old" else None),
            )
            self._np_len = n
        return self._np

    def obj_values(self):
        """Dictionary value arrays for the obj/pref/cui columns
        (cached; the placeholder [""] keeps empty dictionaries valid)."""
        n = len(self.obj_uris)
        if self._obj_len != n:
            self._obj_pa = (
                pa.array(self.obj_uris if n else [""], pa.string()),
                pa.array(self.obj_pref if n else [""], pa.string()),
                pa.array(self.obj_cui if n else [""], pa.string()),
            )
            self._obj_len = n
        return self._obj_pa


def annotate_rows(
    conv_ids: list[str],
    turn_idxs: list[int],
    texts: list[str],
    state: DictionaryState,
    opts: AnnotateOptions,
    match_fn=None,
    registry: TemplateRegistry | None = None,
) -> pa.Table:
    """Annotate a batch of turns → TRIPLES table.  Pure function (no Ray).

    ``match_fn(utext, whole_word_only) -> list[RawMatch]`` is the
    recognizer engine seam: default is the TermDictionary token-window /
    AC matcher; RegexAnnotateTriples plugs kgref.matcher.RegexTermScanner
    in here.  Everything downstream of raw matches (M4–M11, J1–J4, A4)
    is engine-independent, mirroring the reference where recognizers
    produce raw matches and the gem does filtering/expansion.

    ``registry`` carries the actor-lifetime template cache; standalone
    callers omit it and pay a fresh (lazy) build.  See
    :func:`annotate_rows_loop` for the per-row reference implementation
    the differential tests compare against.
    """
    return _annotate_rows_fast(conv_ids, turn_idxs, texts, state, opts,
                               match_fn, registry)


def annotate_rows_loop(
    conv_ids: list[str],
    turn_idxs: list[int],
    texts: list[str],
    state: DictionaryState,
    opts: AnnotateOptions,
    match_fn=None,
) -> pa.Table:
    """REFERENCE implementation: straight per-emitted-row Python loop.

    Kept (and unit-tested against the fast path for both unscored and
    all scored configs) as the executable spec of the emission
    semantics: per-turn (s, e, pred, obj, mt) dedup keeping min
    distance, A4 scoring with per-turn surface counts, threshold
    filtering.  Not used by any pipeline — the vectorized
    :func:`_annotate_rows_fast` is the only production path."""
    td = state.term_dictionary()
    if match_fn is None:
        match_fn = td.match
    term_classes = state.term_classes
    class_info = state.class_info
    closure = state.closure
    mappings = state.mappings
    stopset = _stop_set(state, opts)
    K = opts.expand_hierarchy_levels
    onts = set(opts.ontologies)
    stys = set(opts.semantic_types)
    scoring = opts.score

    # column builders (subj is derived vectorized at the end —
    # conv/turn/from-to; one f-string per emitted row would dominate
    # the loop at match-fan-out row counts)
    c_pred: list[str] = []
    c_obj: list[str] = []
    c_conv: list[str] = []
    c_turn: list[int] = []
    c_from: list[int] = []
    c_to: list[int] = []
    c_mt: list[str] = []
    c_text: list[str] = []
    c_dist: list[int] = []
    c_pref: list[str] = []
    c_cui: list[str] = []
    c_score: list[float] = []

    for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
        if not text:
            continue
        utext = fold_upper(text)  # M1 (length-preserving: offsets are
        # code-point positions into the ORIGINAL text — see matcher)
        matches: list[RawMatch] = match_fn(utext, opts.whole_word_only)  # M2/M3
        if not matches:
            continue
        if opts.longest_only:  # M7 (mgrep-level, before gem filters)
            matches = longest_only_filter(matches)
        matches = raw_filter(  # M4–M6
            matches,
            utext,
            min_term_size=opts.min_term_size,
            stop_set=stopset,
            exclude_numbers=opts.exclude_numbers,
        )
        if not matches:
            continue

        # J1 resolution + M8–M10 class filters
        direct: list[tuple[str, str, str, int, int]] = []
        for m in matches:
            for uri, ont, mt in term_classes.get(m.term_id, ()):
                if not opts.with_synonyms and mt != "PREF":
                    continue
                if onts and ont not in onts:
                    continue
                if stys:
                    info = class_info.get(uri)
                    if not info or not stys.intersection(info[3]):
                        continue
                direct.append((uri, ont, mt, m.start0, m.end0))
        if not direct:
            continue

        # A4 scoring support: per-turn surface counts (cvalue variants)
        counts: dict[str, int] = {}
        if scoring and scoring != "old":
            for _u, _o, _m, s, e in direct:
                v = utext[s:e]
                counts[v] = counts.get(v, 0) + 1

        seen: dict[tuple, int] = {}  # dedup idx by key (turn-scoped ≙ subj)

        def emit(pred, obj, s, e, mt, dist, score):
            k = (s, e, pred, obj, mt)
            prev = seen.get(k)
            if prev is not None:  # A2/U2: keep min distance
                if dist < c_dist[prev]:
                    c_dist[prev] = dist
                    c_score[prev] = score
                return
            seen[k] = len(c_pred)
            info = class_info.get(obj)
            c_pred.append(pred)
            c_obj.append(obj)
            c_conv.append(conv_id)
            c_turn.append(turn_idx)
            c_from.append(s + 1)
            c_to.append(e)
            c_mt.append(mt)
            c_text.append(text[s:e])
            c_dist.append(dist)
            c_pref.append(info[0] if info else "")  # M11/J4
            c_cui.append(info[1] if info else "")
            c_score.append(score)

        for uri, ont, mt, s, e in direct:
            if scoring:
                base = 10.0 if mt == "PREF" else 8.0
                if scoring == "old":
                    sc = base
                else:
                    val = utext[s:e]
                    ntoks = max(2, len([t for t in val.replace("_", " ").split() if t]))
                    sc = (1 + math.log2(ntoks)) * counts[val]
                    if scoring == "cvalueh":
                        sc = round(sc * (base / 10.0), 4)
                    else:
                        sc = round(sc, 4)
            else:
                sc = 0.0
            emit("annotated_with", uri, s, e, mt, 0, sc)
            if K:  # J2 broadcast closure join
                for anc, dist in closure.get(uri, ()):
                    if dist > K:
                        break  # closure lists are distance-sorted
                    asc = round(sc * (0.8**dist), 4) if scoring else 0.0
                    emit("isa_closure", anc, s, e, mt, dist, asc)
            if opts.expand_mappings:  # J3 broadcast mapping join
                for muri, mont in mappings.get(uri, ()):
                    if onts and mont not in onts:
                        continue
                    msc = round(sc * 0.7, 4) if scoring else 0.0
                    emit("mapped_to", muri, s, e, mt, 0, msc)

    # Low-cardinality string columns (preds, class URIs, labels, CUIs,
    # matched surfaces) are dictionary-encoded: the triple stream is the
    # pipeline's dominant byte volume and these columns repeat from a
    # dictionary-sized vocabulary — encoding cuts object-store/shuffle
    # bytes ~3× with zero semantic change (parquet keeps the encoding).
    def _dict(vals: list[str]) -> pa.Array:
        return pa.array(vals, pa.string()).dictionary_encode()

    conv_arr = pa.array(c_conv, pa.string()).dictionary_encode()
    turn_arr = pa.array(c_turn, pa.int32())
    from_arr = pa.array(c_from, pa.int32())
    to_arr = pa.array(c_to, pa.int32())
    # subj = "<conv>/<turn>/<from>-<to>", built with two vectorized joins
    subj_arr = pc.binary_join_element_wise(
        pc.binary_join_element_wise(
            pc.cast(conv_arr, pa.string()), pc.cast(turn_arr, pa.string()),
            pc.cast(from_arr, pa.string()), "/"),
        pc.cast(to_arr, pa.string()), "-")

    table = pa.Table.from_arrays(
        [
            subj_arr,
            _dict(c_pred),
            _dict(c_obj),
            # conv_id is dictionary-encoded too — it is NEVER a Ray-level
            # sort/groupby key inside the pipeline (the shuffle keys are
            # int bucket/salt; driver-contract queries decode first)
            conv_arr,
            turn_arr,
            from_arr,
            to_arr,
            _dict(c_mt),
            _dict(c_text),
            pa.array(c_dist, pa.int32()),
            _dict(c_pref),
            _dict(c_cui),
            pa.array(c_score, pa.float64()),
        ],
        names=[f.name for f in TRIPLES],
    )
    if (opts.score and opts.score_threshold > 0):
        table = table.filter(
            pc.greater_equal(table["score"], opts.score_threshold))
    return table


def _annotate_rows_fast(
    conv_ids: list[str],
    turn_idxs: list[int],
    texts: list[str],
    state: DictionaryState,
    opts: AnnotateOptions,
    match_fn,
    registry: TemplateRegistry | None = None,
) -> pa.Table:
    """Vectorized template fan-out — the production path for ALL
    configurations (unscored flagship and A4 scored).

    Python touches only per-RAW-MATCH work; the expansion to emitted
    triples happens in numpy:

    - the actor-lifetime :class:`TemplateRegistry` maps each term_id to
      its fixed emitted rows under these options (see the class doc for
      the build-time A2/U2 dedup argument);
    - raw matches fan out via CSR-style ``np.repeat``/gather over
      template slices;
    - output columns are built as DictionaryArrays directly from the
      int codes (obj/pred/mt/matched_text dictionaries are UNIQUE value
      lists — downstream sort-by-dictionary-code relies on that; the
      pref/cui columns index the obj registry and may repeat values,
      which nothing keys on).

    Scoring (A4) stays vectorized with EXACT loop parity:
    - 'old': scores depend only on template fields — gathered from the
      registry's per-row Python-rounded values.
    - 'cvalue'/'cvalueh': the loop's per-turn surface count factors
      through the term (a matched surface IS its term's normalized
      string, so counts[val] = occurrences(term in turn) × n_direct):
      per-emission scores are computed once per UNIQUE
      (term, count, mt, pred, dist) combo with the same Python
      round()/power chain as the loop, then gathered — Python cost is
      O(unique combos), not O(emitted rows).

    Row order differs from the loop's emission order; every consumer
    (driver hash gate, bucket sort+dedup, golden set compares) is
    order-insensitive.

    Recognizer contract: ``match_fn`` must emit each (term_id, span) at
    most once per text — both built-in engines guarantee this (the
    window scan visits each span once; AC terminal outputs are unique
    along fail chains; the regex scanner yields one hit per position
    per length group).  A third-party recognizer that duplicates
    matches would duplicate rows here, where the loop's seen-map
    would have absorbed them."""
    td = state.term_dictionary()
    if match_fn is None:
        match_fn = td.match
    if registry is None:
        registry = TemplateRegistry(state, opts)
    stopset = _stop_set(state, opts)
    whole_word = opts.whole_word_only
    scoring = opts.score
    need_counts = scoring in ("cvalue", "cvalueh")

    surf_vals: list[str] = []
    surf_code_of: dict[str, int] = {}

    # --- per-raw-match accumulators
    m_row: list[int] = []
    m_s: list[int] = []
    m_e: list[int] = []
    m_surf: list[int] = []
    m_t0: list[int] = []
    m_t1: list[int] = []
    m_tid: list[int] = []   # scored paths only
    m_cnt: list[int] = []   # cvalue paths only: counts[val] factor

    conv_codes_of_turn = np.empty(len(conv_ids), dtype=np.int32)
    conv_vals: list[str] = []
    conv_code_of: dict[str, int] = {}
    for i, cid in enumerate(conv_ids):
        c = conv_code_of.get(cid)
        if c is None:
            c = len(conv_vals)
            conv_code_of[cid] = c
            conv_vals.append(cid)
        conv_codes_of_turn[i] = c

    tmpl_get = registry.tmpl_slice.get
    tmpl_build = registry.build
    surf_get = surf_code_of.get
    tok_factor = registry.tok_factor
    n_direct = registry.n_direct
    for ridx, text in enumerate(texts):
        if not text:
            continue
        utext = fold_upper(text)  # M1
        matches = match_fn(utext, whole_word)  # M2/M3
        if not matches:
            continue
        if opts.longest_only:  # M7
            matches = longest_only_filter(matches)
        matches = raw_filter(  # M4–M6
            matches, utext, min_term_size=opts.min_term_size,
            stop_set=stopset, exclude_numbers=opts.exclude_numbers)
        turn_start = len(m_row)
        for m in matches:
            tid = m.term_id
            sl = tmpl_get(tid)
            if sl is None:
                sl = tmpl_build(tid)
            t0x, t1x = sl
            if t0x == t1x:  # all classes filtered out
                continue
            s0 = m.start0
            e0 = m.end0
            val = text[s0:e0]
            sc = surf_get(val)
            if sc is None:
                sc = len(surf_vals)
                surf_code_of[val] = sc
                surf_vals.append(val)
            if need_counts and tid not in tok_factor:
                norm = utext[s0:e0]  # == the term's normalized string
                ntoks = max(2, len(
                    [t for t in norm.replace("_", " ").split() if t]))
                tok_factor[tid] = 1 + math.log2(ntoks)
            m_row.append(ridx)
            m_s.append(s0)
            m_e.append(e0)
            m_surf.append(sc)
            m_t0.append(t0x)
            m_t1.append(t1x)
            if scoring:
                m_tid.append(tid)
        if need_counts and len(m_row) > turn_start:
            # counts[val] in the loop = per-turn direct-entry count of the
            # matched surface; surface ↔ term is a bijection (the matched
            # substring IS the normalized term), so counts factor as
            # occurrences(term) × n_direct(term)
            occ: dict[int, int] = {}
            for i in range(turn_start, len(m_row)):
                t = m_tid[i]
                occ[t] = occ.get(t, 0) + 1
            for i in range(turn_start, len(m_row)):
                t = m_tid[i]
                m_cnt.append(occ[t] * n_direct[t])

    # --- numpy CSR fan-out: one emitted row per template row per match
    t0a = np.array(m_t0, dtype=np.int64)
    lens = np.array(m_t1, dtype=np.int64) - t0a
    n = int(lens.sum())
    t_pred_np, t_obj_np, t_dist_np, t_mt_np, t_old_np = registry.rows_np()
    if n:
        midx = np.repeat(np.arange(len(t0a)), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        tidx = np.arange(n) - starts[midx] + t0a[midx]

        pred_c = t_pred_np[tidx]
        obj_c = t_obj_np[tidx]
        dist_c = t_dist_np[tidx]
        mt_c = t_mt_np[tidx]
        row_c = np.array(m_row, dtype=np.int64)[midx]
        s_c = np.array(m_s, dtype=np.int32)[midx]
        e_c = np.array(m_e, dtype=np.int32)[midx]
        surf_c = np.array(m_surf, dtype=np.int32)[midx]
    else:
        pred_c = obj_c = dist_c = mt_c = surf_c = np.array([], np.int32)
        row_c = np.array([], np.int64)
        s_c = e_c = np.array([], np.int32)
        midx = np.array([], np.int64)

    # --- A4 scores (exact loop parity; see docstring)
    if not scoring or not n:
        score_c = np.zeros(len(row_c), dtype=np.float64)
    elif scoring == "old":
        score_c = t_old_np[tidx]
    else:
        tid_c = np.array(m_tid, dtype=np.int64)[midx]
        cnt_c = np.array(m_cnt, dtype=np.int64)[midx]
        combos = np.stack([tid_c, cnt_c, mt_c.astype(np.int64),
                           pred_c.astype(np.int64),
                           dist_c.astype(np.int64)], axis=1)
        uniq, inv = np.unique(combos, axis=0, return_inverse=True)
        vals = np.empty(len(uniq), dtype=np.float64)
        cvalueh = scoring == "cvalueh"
        for u in range(len(uniq)):
            tid, cnt, mtc, pred, dist = (int(x) for x in uniq[u])
            base = 10.0 if mtc == 0 else 8.0
            sc = tok_factor[tid] * cnt
            sc = round(sc * (base / 10.0), 4) if cvalueh else round(sc, 4)
            if pred == 1:
                sc = round(sc * (0.8 ** dist), 4)
            elif pred == 2:
                sc = round(sc * 0.7, 4)
            vals[u] = sc
        score_c = vals[inv]

    if scoring and opts.score_threshold > 0 and n:
        keep = score_c >= opts.score_threshold
        if not keep.all():
            pred_c, obj_c, dist_c, mt_c = (pred_c[keep], obj_c[keep],
                                           dist_c[keep], mt_c[keep])
            row_c, s_c, e_c = row_c[keep], s_c[keep], e_c[keep]
            surf_c, score_c = surf_c[keep], score_c[keep]

    def _da(codes: np.ndarray, values) -> pa.DictionaryArray:
        if isinstance(values, list):
            values = pa.array(values if values else [""], pa.string())
        return pa.DictionaryArray.from_arrays(
            pa.array(codes, pa.int32()), values)

    obj_vals, pref_vals, cui_vals = registry.obj_values()
    conv_arr = _da(conv_codes_of_turn[row_c] if len(row_c) else
                   np.array([], np.int32), conv_vals)
    turn_arr = pa.array(np.array(turn_idxs, dtype=np.int32)[row_c]
                        if len(row_c) else np.array([], np.int32))
    from_arr = pa.array(s_c + 1 if len(s_c) else s_c, pa.int32())
    to_arr = pa.array(e_c, pa.int32())
    subj_arr = pc.binary_join_element_wise(
        pc.binary_join_element_wise(
            pc.cast(conv_arr, pa.string()), pc.cast(turn_arr, pa.string()),
            pc.cast(from_arr, pa.string()), "/"),
        pc.cast(to_arr, pa.string()), "-")

    return pa.Table.from_arrays(
        [
            subj_arr,
            _da(pred_c, ["annotated_with", "isa_closure", "mapped_to"]),
            _da(obj_c, obj_vals),
            conv_arr,
            turn_arr,
            from_arr,
            to_arr,
            _da(mt_c, ["PREF", "SYN"]),
            _da(surf_c, surf_vals),
            pa.array(dist_c, pa.int32()),
            _da(obj_c, pref_vals),  # M11/J4 canonical label of obj
            _da(obj_c, cui_vals),
            pa.array(score_c, pa.float64()),
        ],
        names=[f.name for f in TRIPLES],
    )


class AnnotateTriples:
    """Callable class for ``map_batches`` actor pools (ST1/ST2).

    All per-actor state is built ONCE here: the broadcast dictionary is
    materialized, the matcher index is built (mgrep loads its dictionary
    at server start; we build the token-window index at actor start),
    and the per-term template registry persists across every batch the
    actor processes."""

    def __init__(self, state, opts: AnnotateOptions | None = None):
        self.state = _resolve_state(state)
        self.opts = opts or AnnotateOptions()
        self.state.term_dictionary()
        self.registry = TemplateRegistry(self.state, self.opts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return annotate_rows(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("text").to_pylist(),
            self.state,
            self.opts,
            registry=self.registry,
        )


class StatisticalAnnotateTriples(AnnotateTriples):
    """Third recognizer through the plugin surface: a Mallet-style
    statistical tagger (averaged-perceptron BIO + in-run grounding,
    kgref.statmatch) instead of dictionary scanning
    (≙ ref:lib/ncbo_annotator/recognizers/mallet.rb [M] — the
    reference's statistical recognizer plugin).  The model is trained
    ONCE per actor in __init__ from the broadcast dictionary state
    (deterministic distant supervision), the same stateful-stage slot
    where the other engines build their automata.  Filtering,
    expansion and canonicalization are shared and engine-independent."""

    def __init__(self, state, opts: AnnotateOptions | None = None):
        super().__init__(state, opts)
        from ..statmatch import StatisticalTermScanner

        self._scanner = StatisticalTermScanner(
            self.state.term_dictionary().term_ids_by_norm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return annotate_rows(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("text").to_pylist(),
            self.state,
            self.opts,
            match_fn=self._scanner.match,
            registry=self.registry,
        )


class RegexAnnotateTriples(AnnotateTriples):
    """Second recognizer through the plugin surface
    (build_triples(recognizer=RegexAnnotateTriples)): raw matching runs
    on compiled per-length regex alternations (kgref.matcher.
    RegexTermScanner) instead of the token-window index; filtering,
    expansion and canonicalization are shared.  Scanner compiled ONCE
    per actor in __init__, like the automaton and template registry."""

    def __init__(self, state, opts: AnnotateOptions | None = None):
        super().__init__(state, opts)
        from ..matcher import RegexTermScanner

        self._scanner = RegexTermScanner(
            self.state.term_dictionary().term_ids_by_norm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return annotate_rows(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("text").to_pylist(),
            self.state,
            self.opts,
            match_fn=self._scanner.match,
            registry=self.registry,
        )


class LemmaAnnotateTriples(AnnotateTriples):
    """Fourth recognizer through the plugin surface: lemmatization-based
    matching (kgref.lemma — the Annotator+/SIFR fork's lemma mode,
    reconstructed from the published description; BASELINE.md records
    the feature as living outside the reference gem).  Dictionary lemma
    index built ONCE per actor in __init__ like every other engine;
    raw matches carry ORIGINAL-text offsets so the shared filtering /
    expansion / canonicalization and the matched_text (inflected
    surface) column are engine-independent."""

    def __init__(self, state, opts: AnnotateOptions | None = None):
        super().__init__(state, opts)
        from ..lemma import LemmaTermScanner

        self._scanner = LemmaTermScanner(
            self.state.term_dictionary().term_ids_by_norm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return annotate_rows(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("text").to_pylist(),
            self.state,
            self.opts,
            match_fn=self._scanner.match,
            registry=self.registry,
        )
