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
copy per node); per-batch work is dict probes + list appends at C speed.

Scale notes (10^12 turns): stateless w.r.t. the data — any worker can
take any block; dictionary is dimension-sized (≤ GBs for UMLS-scale) and
broadcast once; output batch is built column-wise and handed back to the
streaming executor, which backpressures on the match fan-out.
"""

from __future__ import annotations

import math

import pyarrow as pa

from ..matcher import RawMatch, fold_upper, longest_only_filter, raw_filter
from ..schemas import TRIPLES, AnnotateOptions
from ..state.dictionary import DictionaryState


def _resolve_state(state) -> DictionaryState:
    if isinstance(state, DictionaryState):
        return state
    import ray  # ObjectRef handed to the actor constructor

    return ray.get(state)


def annotate_rows(
    conv_ids: list[str],
    turn_idxs: list[int],
    texts: list[str],
    state: DictionaryState,
    opts: AnnotateOptions,
    match_fn=None,
) -> pa.Table:
    """Annotate a batch of turns → TRIPLES table.  Pure function (no Ray).

    ``match_fn(utext, whole_word_only) -> list[RawMatch]`` is the
    recognizer engine seam: default is the TermDictionary token-window /
    AC matcher; RegexAnnotateTriples plugs kgref.matcher.RegexTermScanner
    in here.  Everything downstream of raw matches (M4–M11, J1–J4, A4)
    is engine-independent, mirroring the reference where recognizers
    produce raw matches and the gem does filtering/expansion."""
    td = state.term_dictionary()
    if match_fn is None:
        match_fn = td.match
    term_classes = state.term_classes
    class_info = state.class_info
    closure = state.closure
    mappings = state.mappings
    stopset = state.stop_words if opts.use_stop_words else frozenset()
    if opts.extra_stop_words:
        stopset = frozenset(
            stopset | {fold_upper(w) for w in opts.extra_stop_words})
    K = opts.expand_hierarchy_levels
    onts = set(opts.ontologies)
    stys = set(opts.semantic_types)
    scoring = opts.score

    if not scoring:
        # flagship path: per-emitted-row Python eliminated (profiled as
        # the dominant cost at ~111 triples/turn fan-out)
        return _annotate_rows_fast(conv_ids, turn_idxs, texts, state,
                                   opts, match_fn)

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

    import pyarrow.compute as pc

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
        import pyarrow.compute as pc

        table = table.filter(pc.greater_equal(table["score"], opts.score_threshold))
    return table


def _annotate_rows_fast(
    conv_ids: list[str],
    turn_idxs: list[int],
    texts: list[str],
    state: DictionaryState,
    opts: AnnotateOptions,
    match_fn,
) -> pa.Table:
    """Vectorized fan-out for the unscored path (score='' — the
    flagship configuration).

    Python touches only per-RAW-MATCH work; the expansion to emitted
    triples happens in numpy:

    - a per-batch TERM TEMPLATE registry maps each term_id to its fixed
      emitted rows under these options: J1 class resolution (M8–M10
      filters) + direct + capped closure + filtered mappings, as
      int-coded (pred, obj, dist, mt) rows.  A2/U2 keep-min-distance
      dedup is applied AT BUILD TIME inside the template — two matches
      can only collide on the full (s, e, pred, obj, mt) key when they
      share (s, e), and an identical span is an identical substring,
      hence the SAME term_id and the same template.  No runtime dedup
      pass is needed at all.
    - raw matches fan out via CSR-style ``np.repeat``/gather over
      template slices;
    - output columns are built as DictionaryArrays directly from the
      int codes (obj/pred/mt/matched_text dictionaries are UNIQUE value
      lists — downstream sort-by-dictionary-code relies on that; the
      pref/cui columns index the obj registry and may repeat values,
      which nothing keys on).

    Row order differs from the scored path's emission order; every
    consumer (driver hash gate, bucket sort+dedup, golden set
    compares) is order-insensitive.

    Recognizer contract: ``match_fn`` must emit each (term_id, span) at
    most once per text — both built-in engines guarantee this (the
    window scan visits each span once; AC terminal outputs are unique
    along fail chains; the regex scanner yields one hit per position
    per length group).  A third-party recognizer that duplicates
    matches would duplicate rows here, where the scored path's seen-map
    would have absorbed them."""
    import numpy as np
    import pyarrow.compute as pc

    td = state.term_dictionary()
    if match_fn is None:
        match_fn = td.match
    term_classes = state.term_classes
    class_info = state.class_info
    closure = state.closure
    mappings = state.mappings
    stopset = state.stop_words if opts.use_stop_words else frozenset()
    if opts.extra_stop_words:
        stopset = frozenset(
            stopset | {fold_upper(w) for w in opts.extra_stop_words})
    K = opts.expand_hierarchy_levels
    onts = set(opts.ontologies)
    stys = set(opts.semantic_types)
    whole_word = opts.whole_word_only

    # --- registries (built lazily as this batch's vocabulary appears)
    obj_uris: list[str] = []
    obj_pref: list[str] = []
    obj_cui: list[str] = []
    obj_code_of: dict[str, int] = {}

    def obj_code(uri: str) -> int:
        c = obj_code_of.get(uri)
        if c is None:
            c = len(obj_uris)
            obj_code_of[uri] = c
            obj_uris.append(uri)
            info = class_info.get(uri)
            obj_pref.append(info[0] if info else "")
            obj_cui.append(info[1] if info else "")
        return c

    t_pred: list[int] = []
    t_obj: list[int] = []
    t_dist: list[int] = []
    t_mt: list[int] = []  # 0=PREF 1=SYN
    tmpl_slice: dict[int, tuple[int, int]] = {}

    def template(tid: int) -> tuple[int, int]:
        """Emitted-row template for one term id, filters applied and
        (pred, obj, mt)-deduped keep-min-distance at build time."""
        start = len(t_pred)
        seen: dict[tuple[int, int, int], int] = {}  # key -> row idx
        for uri, ont, mt in term_classes.get(tid, ()):
            if not opts.with_synonyms and mt != "PREF":  # M8
                continue
            if onts and ont not in onts:  # M9
                continue
            if stys:  # M10
                info = class_info.get(uri)
                if not info or not stys.intersection(info[3]):
                    continue
            mtc = 0 if mt == "PREF" else 1
            rows = [(0, obj_code(uri), 0, mtc)]
            if K:
                for anc, dist in closure.get(uri, ()):
                    if dist > K:
                        break  # closure lists are distance-sorted
                    rows.append((1, obj_code(anc), dist, mtc))
            if opts.expand_mappings:
                for muri, mont in mappings.get(uri, ()):
                    if onts and mont not in onts:
                        continue
                    rows.append((2, obj_code(muri), 0, mtc))
            for pred, obj, dist, mtc_ in rows:
                k = (pred, obj, mtc_)
                prev = seen.get(k)
                if prev is not None:  # A2/U2: keep min distance
                    if dist < t_dist[prev]:
                        t_dist[prev] = dist
                    continue
                seen[k] = len(t_pred)
                t_pred.append(pred)
                t_obj.append(obj)
                t_dist.append(dist)
                t_mt.append(mtc_)
        sl = (start, len(t_pred))
        tmpl_slice[tid] = sl
        return sl

    surf_vals: list[str] = []
    surf_code_of: dict[str, int] = {}

    # --- per-raw-match accumulators
    m_row: list[int] = []
    m_s: list[int] = []
    m_e: list[int] = []
    m_surf: list[int] = []
    m_t0: list[int] = []
    m_t1: list[int] = []

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

    tmpl_get = tmpl_slice.get
    surf_get = surf_code_of.get
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
        for m in matches:
            sl = tmpl_get(m.term_id)
            if sl is None:
                sl = template(m.term_id)
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
            m_row.append(ridx)
            m_s.append(s0)
            m_e.append(e0)
            m_surf.append(sc)
            m_t0.append(t0x)
            m_t1.append(t1x)

    # --- numpy CSR fan-out: one emitted row per template row per match
    t0a = np.array(m_t0, dtype=np.int64)
    lens = np.array(m_t1, dtype=np.int64) - t0a
    n = int(lens.sum())
    if n:
        midx = np.repeat(np.arange(len(t0a)), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        tidx = np.arange(n) - starts[midx] + t0a[midx]

        pred_c = np.array(t_pred, dtype=np.int32)[tidx]
        obj_c = np.array(t_obj, dtype=np.int32)[tidx]
        dist_c = np.array(t_dist, dtype=np.int32)[tidx]
        mt_c = np.array(t_mt, dtype=np.int32)[tidx]
        row_c = np.array(m_row, dtype=np.int64)[midx]
        s_c = np.array(m_s, dtype=np.int32)[midx]
        e_c = np.array(m_e, dtype=np.int32)[midx]
        surf_c = np.array(m_surf, dtype=np.int32)[midx]
    else:
        pred_c = obj_c = dist_c = mt_c = surf_c = np.array([], np.int32)
        row_c = np.array([], np.int64)
        s_c = e_c = np.array([], np.int32)

    def _da(codes: np.ndarray, values: list[str]) -> pa.DictionaryArray:
        return pa.DictionaryArray.from_arrays(
            pa.array(codes, pa.int32()),
            pa.array(values if values else [""], pa.string()))

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
            _da(obj_c, obj_uris),
            conv_arr,
            turn_arr,
            from_arr,
            to_arr,
            _da(mt_c, ["PREF", "SYN"]),
            _da(surf_c, surf_vals),
            pa.array(dist_c, pa.int32()),
            _da(obj_c, obj_pref),  # M11/J4 canonical label of obj
            _da(obj_c, obj_cui),
            pa.array(np.zeros(len(row_c)), pa.float64()),
        ],
        names=[f.name for f in TRIPLES],
    )


class AnnotateTriples:
    """Callable class for ``map_batches`` actor pools (ST1/ST2)."""

    def __init__(self, state, opts: AnnotateOptions | None = None):
        self.state = _resolve_state(state)
        self.opts = opts or AnnotateOptions()
        # force index build once per actor (mgrep loads its dictionary at
        # server start; we build the token-window index at actor start)
        self.state.term_dictionary()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return annotate_rows(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("text").to_pylist(),
            self.state,
            self.opts,
        )


class RegexAnnotateTriples(AnnotateTriples):
    """Second recognizer through the plugin surface
    (build_triples(recognizer=RegexAnnotateTriples)): raw matching runs
    on compiled per-length regex alternations (kgref.matcher.
    RegexTermScanner) instead of the token-window index; filtering,
    expansion and canonicalization are shared.  Scanner compiled ONCE
    per actor in __init__, like the automaton."""

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
        )
