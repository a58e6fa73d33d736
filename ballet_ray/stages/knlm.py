"""Interpolated Kneser–Ney n-gram language model — the published shape of
CCNet's actual perplexity filter (Wenzek et al. 2020 score with a KenLM
5-gram LM; KenLM implements interpolated (modified) Kneser–Ney, Chen &
Goodman 1999 §4). The repo's :func:`ballet_ray.stages.text.bigram_logprob_scores`
is the cheap interpolated-MLE stand-in; this module is the real KN family
at any order (default 3, CCNet parity at ``order=5``) with the
single-discount estimate D = n1/(n1 + 2·n2) per order (Ney, Essen &
Kneser 1994), fit distributed and applied shuffle-free.

Model (documents padded with ``order−1`` BOS tokens ``<s>`` so every real
word has a full context — every doc of n words scores exactly n
positions, single-word docs included). With c_N the raw N-gram counts and
c_k (k < N) the Kneser–Ney continuation counts
c_k(g) = |{w₀ : c_{k+1}(w₀·g) > 0}|:

    p_k(w|ctx) = max(c_k(ctx·w) − D_k, 0) / Σ_w c_k(ctx·w)
                 + D_k·N1+(ctx·)/Σ_w c_k(ctx·w) · p_{k−1}(w|ctx[1:])
    p_1(w)     = (c_1(w) + α) / (Σ c_1 + α·(V+1))

where N1+(ctx·) = #distinct continuations of ctx at level k, V = corpus
vocabulary size, and D_k is estimated from that level's counts-of-counts
(D = n1/(n1+2·n2); 0.5 when degenerate). The add-α floor on the unigram
continuation distribution reserves OOV mass the way KenLM reserves it for
``<unk>`` — unseen words score at α/(Σc_1+α·(V+1)) instead of −inf.
Continuation stats are taken over the N-gram-supported lower-order sets
(with BOS padding those differ from the raw supports only in
never-predicted all-BOS prefixes).

Scale shape: the fit is ONE corpus-wide N-gram-keyed groupby (the same
exchange class as the bigram/vocab fits) followed by one
suffix-derivation groupby per lower order over the successively smaller
DISTINCT tables; the per-context probabilities are computed by
coarse-partition grouped kernels (hash contexts into
``default_coarse_parts()`` partitions, one vectorized pandas pass each —
never a per-group map_groups). The broadcast model is capped KenLM-style
(``max_ngrams`` per level ≥ 2, ``max_vocab`` for the unigram table;
deterministic count-desc/key-asc order): a dropped k-gram of a KEPT
context backs off to exactly γ_k(ctx)·p_{k−1}(w|ctx[1:]) — the correct KN
value for an unseen k-gram in a seen context — so pruning only re-labels
low-count grams as unseen, identical to KenLM model pruning. All
aggregate statistics (discounts, context totals, Σc_1, V) are computed
BEFORE capping, so kept-gram probabilities are exact. Scoring is one
shuffle-free ``map_batches`` pass with NO gram strings at all: per-word
siphashes once per batch, every level's query hash is a Horner combine
over uint64 slices, probed by one searchsorted per level against the
broadcast sorted-hash tables (the fit builds them the same way; a 64-bit
collision anywhere rebuilds the whole model as exact string dicts and
the scorer takes the string branch — scores are bit-identical in both
modes, pinned by a forced-fallback test).

Reference anchor: ballet has no LM operator; this extends the corpus
toolkit the way feature/transformer parity extends ballet/feature.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BOS = "<s>"


def _norm_text(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    return col


def _padded_words(col, order: int):
    """Split ``'<s> '*(order−1) + text`` on single spaces. Null text → null
    row (zero scored positions), matching the other LM scorers."""
    pad_str = " ".join([_BOS] * (order - 1))
    pad = pa.array([pad_str] * len(col), pa.string())
    padded = pc.binary_join_element_wise(pad, col, " ")
    words = pc.split_pattern(padded, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words


def _window_mask(offsets: np.ndarray, m: int, order: int) -> np.ndarray:
    """Valid mask over the m sliding windows of the flattened word array:
    windows crossing a doc boundary are invalid."""
    valid = np.ones(m, dtype=bool)
    ends = offsets[1:]
    bad = np.concatenate([ends - j for j in range(1, order)])
    bad = bad[(bad >= 0) & (bad < m)]
    valid[bad] = False
    return valid


def _ngram_strings(words, order: int):
    """(gram strings for every within-doc N-gram, doc offsets, valid mask).

    Returns (None, offsets, None) when the block holds fewer than N words."""
    flat = words.flatten()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    m = len(flat) - (order - 1)
    if m < 1:
        return None, offsets, None
    slices = [flat.slice(j, m) for j in range(order)]
    tg = pc.binary_join_element_wise(*slices, " ")
    return tg, offsets, _window_mask(offsets, m, order)


# Horner multiplier for combining per-word siphashes into gram hashes
# (FNV-1a prime; uint64 arithmetic wraps mod 2^64). Both the fit-side
# table build (_gram_hash) and the scorer compute gram hashes THIS way —
# from word hashes, never by hashing the joined gram string — so the
# scorer needs no gram strings at all.
_HK = np.uint64(1099511628211)


def _gram_hash(col, k: int) -> np.ndarray:
    """uint64 hash of 'w1 … wk' k-gram strings via per-word siphash +
    Horner combine (every row has exactly k space-separated words)."""
    from ballet_ray.functions.partition import stable_hash_array

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, np.uint64)
    if k == 1:
        return stable_hash_array(col.to_numpy(zero_copy_only=False))
    parts = pc.split_pattern(col, " ")
    flat = parts.flatten()
    hw = stable_hash_array(flat.to_numpy(zero_copy_only=False)).reshape(-1, k)
    h = hw[:, 0].copy()
    for t in range(1, k):
        np.multiply(h, _HK, out=h)
        np.add(h, hw[:, t], out=h)
    return h


def _count_of_counts(ds, col: str):
    """(n1, n2, n3, n4) = # rows with count 1/2/3/4 — tiny partial-sum
    reductions over the distinct-gram table."""

    def partial(t: pa.Table) -> pa.Table:
        c = t.column(col).to_numpy(zero_copy_only=False)
        return pa.table({f"n{j}": pa.array([int((c == j).sum())], pa.int64())
                         for j in (1, 2, 3, 4)})

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n1", "n2", "n3", "n4"])
    return tuple(float(agg[f"sum(n{j})"]) for j in (1, 2, 3, 4))


def _discount(n1: float, n2: float) -> float:
    d = n1 + 2.0 * n2
    return n1 / d if d > 0 else 0.5


def _modified_discounts(n1, n2, n3, n4):
    """Modified-KN discounts D1/D2/D3+ (Chen & Goodman 1999 eq. 26, the
    scheme KenLM ships): Y = n1/(n1+2n2), D_j = j − (j+1)·Y·n_{j+1}/n_j,
    clamped into [0, j] for robustness (KenLM refuses ill-formed
    discounts; we clamp and keep going). Returns None when any needed
    count-of-count is zero — the caller falls back to the single Ney
    discount for that level (tiny or degenerate corpora)."""
    if n1 <= 0 or n2 <= 0 or n3 <= 0 or n4 <= 0:
        return None
    y = n1 / (n1 + 2.0 * n2)
    d1 = 1.0 - 2.0 * y * n2 / n1
    d2 = 2.0 - 3.0 * y * n3 / n2
    d3 = 3.0 - 4.0 * y * n4 / n3
    return (min(max(d1, 0.0), 1.0), min(max(d2, 0.0), 2.0),
            min(max(d3, 0.0), 3.0))


def _prefix_suffix(gcol, k: int):
    """Vectorized (context = first k−1 words, tail = last k−1 words, last
    word) of 'w1 … wk' k-gram strings (words contain no spaces by
    construction, so the split is always exactly k elements)."""
    parts = pc.split_pattern(gcol, " ")
    ctx = pc.binary_join(pc.list_slice(parts, 0, k - 1), " ")
    tail = pc.binary_join(pc.list_slice(parts, 1, k), " ")
    last = pc.list_element(parts, k - 1)
    return ctx, tail, last


def _probe(hs: np.ndarray, vs: np.ndarray, qh: np.ndarray, default: float) -> np.ndarray:
    """Vectorized lookup: value of each query hash in the sorted table,
    ``default`` where absent."""
    if len(hs) == 0 or len(qh) == 0:
        return np.full(len(qh), default, np.float64)
    pos = np.searchsorted(hs, qh)
    posc = np.minimum(pos, len(hs) - 1)
    hit = hs[posc] == qh
    return np.where(hit, vs[posc], default)


def _cap_model(model, cap, count_col: str = "c"):
    """Materialize and deterministically cap a model table (count desc,
    key asc ties)."""
    model = model.materialize()
    if cap is not None and model.count() > cap:
        model = (model.sort([count_col, "g"], descending=[True, False])
                 .limit(cap).materialize())
    return model


def _collect_level(model, cap, k: int):
    """Cap-sort a level-k model and collect HASHED lookup tables — the
    gram strings never reach the driver (the string collect of a 5M-row
    level was ~700 MB and dominated fit wall time). Keys hash via
    :func:`_gram_hash` (word-hash Horner) so the scorer can derive query
    hashes straight from word hashes. Collision detection is hash-side:
    grams are distinct by construction, so a duplicate gram hash IS a
    collision; contexts legitimately repeat but carry one γ per ctx, so
    two different γ values under one ctx hash is a collision. Returns
    ("arr", (hg, p), (hc, gam)) or None on collision (the fit then
    rebuilds the WHOLE model as exact string dicts from the retained
    capped handles — probability ~7e-7 at 5M; mixed hash/dict levels
    would break the scorer's single-mode branch)."""

    def hash_cols(t: pa.Table) -> pa.Table:
        hg = _gram_hash(t.column("g"), k)
        hc = _gram_hash(t.column("ctx"), k - 1)
        return pa.table({"hg": pa.array(hg), "p": t.column("p"),
                         "hc": pa.array(hc), "gam": t.column("gam")})

    hdf = model.map_batches(hash_cols, batch_format="pyarrow").to_pandas()
    if not len(hdf) or "hg" not in hdf.columns:
        # a fully-pruned level: every gram backs off via the defaults
        e = np.empty(0, np.uint64)
        return ("arr", (e, np.empty(0)), (e.copy(), np.empty(0)))
    hg = hdf["hg"].to_numpy()
    p = hdf["p"].to_numpy(np.float64)
    o = np.argsort(hg, kind="stable")
    hg, p = hg[o], p[o]
    if len(hg) and (hg[1:] == hg[:-1]).any():
        return None
    hc = hdf["hc"].to_numpy()
    gam = hdf["gam"].to_numpy(np.float64)
    o = np.argsort(hc, kind="stable")
    hc, gam = hc[o], gam[o]
    if len(hc):
        dup = hc[1:] == hc[:-1]
        if dup.any():
            if (gam[1:][dup] != gam[:-1][dup]).any():
                return None
            keep = np.concatenate([[True], ~dup])
            hc, gam = hc[keep], gam[keep]
    return ("arr", (hg, p), (hc, gam))


def _collect_unigram(tbl, count_col: str, cap):
    """Hashed collect of the unigram table (unique keys: duplicate hash =
    collision → None, same whole-model string fallback)."""

    def hash_cols(t: pa.Table, cc=count_col) -> pa.Table:
        h = _gram_hash(t.column("g"), 1)
        return pa.table({"h": pa.array(h), "v": t.column(cc)})

    hdf = tbl.map_batches(hash_cols, batch_format="pyarrow").to_pandas()
    if not len(hdf) or "h" not in hdf.columns:
        return ("arr", (np.empty(0, np.uint64), np.empty(0)))
    h = hdf["h"].to_numpy()
    v = hdf["v"].to_numpy(np.float64)
    o = np.argsort(h, kind="stable")
    h, v = h[o], v[o]
    if len(h) and (h[1:] == h[:-1]).any():
        return None
    return ("arr", (h, v))


def _capped_pandas(ds, count_col: str, key_col: str, cap: int | None):
    """Deterministic top-``cap`` (count desc, key asc — partition/run
    independent ties) of a materialized model table, as pandas."""
    ds = ds.materialize()
    if cap is not None and ds.count() > cap:
        return ds.sort([count_col, key_col],
                       descending=[True, False]).limit(cap).to_pandas()
    return ds.to_pandas()


def kn_logprob_scores(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      order: int = 3, alpha: float = 0.5,
                      discount: str = "ney",
                      round_to: int | None = 4,
                      max_ngrams: int | None = 5_000_000,
                      max_vocab: int | None = 2_000_000,
                      prune_min_count: int = 1,
                      concurrency: int | tuple | None = (1, 8),
                      keep_cols: list[str] | None = None):
    """Per-document ``logprob`` / ``mean_logprob`` / ``ppl`` under an
    interpolated Kneser–Ney ``order``-gram LM fit on the corpus itself
    (module docstring has the model and the scale shape; ``order=5`` is
    CCNet/KenLM parity, the default 3 balances model size vs fluency
    signal). Every doc of n words scores exactly n positions (BOS
    padding), so ``mean_logprob`` divides by n and empty/null docs emit
    0/0/1. ``max_ngrams`` caps each level-≥2 broadcast table
    independently; ``max_vocab`` caps the unigram table.

    ``keep_cols``: extra input columns carried through the scoring map
    unchanged (join-free filter-by-score, as in the other LM scorers).

    ``discount``: ``"ney"`` (single D per level, Chen & Goodman's
    interpolated KN — the SQL-auditable default) or ``"modified"``
    (D1/D2/D3+ per level, the modified-KN scheme KenLM ships; levels with
    degenerate counts-of-counts fall back to the single discount).

    ``prune_min_count``: KenLM-style count pruning — drop level-≥2 grams
    whose (continuation) count is below it BEFORE the top-K cap, after
    all statistics are final: kept-gram probabilities are unchanged and
    dropped grams back off exactly (on low-reuse corpora a threshold of 2
    collapses the broadcast model by the singleton fraction). Default 1 =
    keep everything.

    ``concurrency``: actor-pool size for the scoring stage — the model
    dicts deserialize ONCE per actor in ``__init__`` (a plain task pool
    would re-deserialize the broadcast model for every batch; at the 5M
    default caps that is ~1 GB per task). Tuple = autoscaling pool.
    """
    import ray as _ray

    if order < 2:
        raise ValueError("kn_logprob_scores needs order >= 2")
    if discount not in ("ney", "modified"):
        raise ValueError(f"unknown discount scheme {discount!r}")

    # ---- fit: corpus-wide N-gram counts (the one big exchange) ----
    def top_counts(t: pa.Table) -> pa.Table:
        col = _norm_text(t.column(text_col))
        words = _padded_words(col, order)
        tg, _offsets, valid = _ngram_strings(words, order)
        if tg is None:
            return pa.table({"g": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        d = tg.filter(pa.array(valid)).dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        return pa.table({
            "g": d.dictionary,
            "n": pa.array(np.bincount(codes, minlength=len(d.dictionary))
                          .astype(np.int64))})

    from ballet_ray.functions.reduce import grouped_reduce

    # coarse-partition reduce, not Ray's sort-based groupby: the trigram
    # table is corpus-scale with string keys, where one vectorized pandas
    # combine per partition beats the per-group combine by a wide margin
    tbl = grouped_reduce(
        ds.select_columns([text_col])
        .map_batches(top_counts, batch_format="pyarrow"),
        "g", {"n": "sum"}, num_parts=64,
    ).materialize()
    empty_model = tbl.count() == 0  # model_ref stays None -> scorer emits 0/0/1

    levels_out: list = []  # level k=order..2 → (p dict, gamma dict)
    model_ref = None
    denom = 1.0
    if not empty_model:
        from ballet_ray.functions.partition import (default_coarse_parts,
                                                    stable_hash_array)
        n_parts = default_coarse_parts()
        count_col = "n"
        capped_levels: list = []
        collided = False

        for k in range(order, 1, -1):
            n1, n2, n3, n4 = _count_of_counts(tbl, count_col)
            dmod = (_modified_discounts(n1, n2, n3, n4)
                    if discount == "modified" else None)
            dk = _discount(n1, n2)

            def add_keys(t: pa.Table, k=k, cc=count_col) -> pa.Table:
                ctx, tail, _last = _prefix_suffix(t.column("g"), k)
                h = stable_hash_array(ctx.to_numpy(zero_copy_only=False))
                part = pa.array((h % np.uint64(n_parts)).astype(np.int64))
                return pa.table({"g": t.column("g"), "ctx": ctx,
                                 "tail": tail, "c": t.column(cc),
                                 "__part": part})

            def ctx_kernel(df: pd.DataFrame, dk=dk,
                           dmod=dmod) -> pd.DataFrame:
                grp = df.groupby("ctx", sort=False)
                tot = grp["c"].transform("sum").to_numpy(np.float64)
                c = df["c"].to_numpy(np.float64)
                if dmod is None:
                    npg = grp["c"].transform("size").to_numpy(np.float64)
                    p = np.maximum(c - dk, 0.0) / tot
                    gam = dk * npg / tot
                else:
                    d1, d2, d3 = dmod
                    dc = np.where(c == 1, d1, np.where(c == 2, d2, d3))
                    p = np.maximum(c - dc, 0.0) / tot
                    # γ(ctx) = (D1·N1(ctx) + D2·N2(ctx) + D3·N3+(ctx))/tot
                    is1 = (c == 1).astype(np.float64)
                    is2 = (c == 2).astype(np.float64)
                    is3 = (c >= 3).astype(np.float64)
                    tdf = pd.DataFrame({"ctx": df["ctx"].to_numpy(),
                                        "i1": is1, "i2": is2, "i3": is3})
                    tg = tdf.groupby("ctx", sort=False)
                    gam = (d1 * tg["i1"].transform("sum").to_numpy(np.float64)
                           + d2 * tg["i2"].transform("sum").to_numpy(np.float64)
                           + d3 * tg["i3"].transform("sum").to_numpy(np.float64)
                           ) / tot
                return pd.DataFrame({
                    "g": df["g"], "ctx": df["ctx"], "c": df["c"],
                    "p": p, "gam": gam})

            keyed = tbl.map_batches(add_keys, batch_format="pyarrow")
            model = (keyed.select_columns(["g", "ctx", "c", "__part"])
                     .groupby("__part").map_groups(ctx_kernel,
                                                   batch_format="pandas"))
            if prune_min_count > 1:
                model = model.map_batches(
                    lambda t, pm=prune_min_count: t.filter(
                        pc.greater_equal(t.column("c"), pm)),
                    batch_format="pyarrow")
            capped = _cap_model(model, max_ngrams)
            capped_levels.append(capped)
            lev = _collect_level(capped, max_ngrams, k)
            collided = collided or lev is None
            levels_out.append(lev)

            # derive level k−1: continuation counts over the distinct set
            def tail_partial(t: pa.Table) -> pa.Table:
                d = t.column("tail")
                if isinstance(d, pa.ChunkedArray):
                    d = d.combine_chunks()
                d = d.dictionary_encode()
                codes = d.indices.to_numpy(zero_copy_only=False)
                return pa.table({
                    "g": d.dictionary,
                    "kc": pa.array(np.bincount(codes,
                                               minlength=len(d.dictionary))
                                   .astype(np.int64))})

            tbl = grouped_reduce(
                keyed.select_columns(["tail"])
                .map_batches(tail_partial, batch_format="pyarrow"),
                "g", {"kc": "sum"}, num_parts=64,
            ).materialize()
            count_col = "kc"

        # level 1: unigram continuation counts; Σc_1 = |distinct level-2 set|
        nb = float(tbl.sum(count_col))
        vocab = float(tbl.count())
        denom = nb + alpha * (vocab + 1.0)
        capped_uni = _cap_model(tbl, max_vocab, count_col)
        cwd = _collect_unigram(capped_uni, count_col, max_vocab)
        if collided or cwd is None:
            # a 64-bit collision somewhere: rebuild the WHOLE model as
            # exact string dicts (single-mode scorer branch)
            levels_out = []
            for capped in capped_levels:
                mdf = capped.to_pandas()
                levels_out.append(("dict",
                    dict(zip(mdf["g"], mdf["p"].to_numpy(np.float64))),
                    dict(zip(mdf["ctx"], mdf["gam"].to_numpy(np.float64)))))
            cwm = capped_uni.to_pandas()
            cwd = ("dict",
                   dict(zip(cwm["g"], cwm[count_col].to_numpy(np.float64))))
        # ONE broadcast object: every scoring actor deserializes it once
        # (numpy hash tables — near-zero-copy; colliding tables only are
        # exact dicts)
        model_ref = _ray.put({"levels": levels_out, "cwd": cwd})

    # ---- score: one shuffle-free actor-pool pass ----
    in_cols = [id_col, text_col] + [c for c in (keep_cols or [])
                                    if c not in (id_col, text_col)]
    kwargs = dict(model_ref=model_ref, order=order, alpha=alpha,
                  denom=denom, text_col=text_col, id_col=id_col,
                  round_to=round_to, keep_cols=keep_cols)
    projected = ds.select_columns(in_cols)
    if concurrency is None:
        scorer = KnScorer(**kwargs)
        return projected.map_batches(scorer, batch_format="pyarrow")
    return projected.map_batches(
        KnScorer, fn_constructor_kwargs=kwargs,
        concurrency=concurrency, batch_format="pyarrow")


class KnScorer:
    """Actor-pool scoring stage: the broadcast KN model (one ray.put
    object holding every level's p/γ dict + the unigram table) is fetched
    and deserialized ONCE per actor in ``__init__`` — at the default 5M
    caps that is ~1 GB of dicts, which a plain task pool would pay again
    for every batch. ``model_ref=None`` = empty corpus → 0/0/1 rows."""

    def __init__(self, *, model_ref, order: int, alpha: float, denom: float,
                 text_col: str, id_col: str, round_to: int | None,
                 keep_cols: list[str] | None):
        if model_ref is None:
            self.levels = None
            self.cwd = ("dict", {})
        else:
            import ray as _ray

            model = _ray.get(model_ref)
            self.levels = model["levels"]
            self.cwd = model["cwd"]
        self.order = order
        self.alpha = alpha
        self.denom = denom
        self.text_col = text_col
        self.id_col = id_col
        self.round_to = round_to
        self.keep_cols = keep_cols or []

    def __call__(self, t: pa.Table) -> pa.Table:
        order, alpha, denom = self.order, self.alpha, self.denom
        col = _norm_text(t.column(self.text_col))
        ids = t.column(self.id_col)
        extra = {c: t.column(c) for c in self.keep_cols}
        n = len(col)
        zeros = np.zeros(n)

        def empty_out():
            return pa.table({self.id_col: ids, **extra,
                             "logprob": pa.array(zeros),
                             "mean_logprob": pa.array(zeros),
                             "ppl": pa.array(np.ones(n))})

        if self.levels is None:
            return empty_out()
        words = _padded_words(col, order)
        hash_mode = (self.cwd[0] == "arr"
                     and all(lev[0] == "arr" for lev in self.levels))
        if hash_mode:
            # pure word-hash path: per-word siphash ONCE, every level's
            # query hash is a Horner combine over uint64 slices — no gram
            # strings, no dictionary encode, no string joins in scoring
            from ballet_ray.functions.partition import stable_hash_array

            flat = words.flatten()
            offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            offsets = offsets - offsets[0]
            m = len(flat) - (order - 1)
            if m < 1:
                return empty_out()
            valid = _window_mask(offsets, m, order)
            hw = stable_hash_array(flat.to_numpy(zero_copy_only=False))
            cw_h, cw_v = self.cwd[1]
            p_acc = (_probe(cw_h, cw_v, hw[order - 1:order - 1 + m], 0.0)
                     + alpha) / denom
            for k in range(2, order + 1):
                j = order - k        # suffix start for level k
                s_h = hw[j:j + m].copy()
                for tt in range(1, k):
                    np.multiply(s_h, _HK, out=s_h)
                    np.add(s_h, hw[j + tt:j + tt + m], out=s_h)
                c_h = hw[j:j + m].copy()
                for tt in range(1, k - 1):
                    np.multiply(c_h, _HK, out=c_h)
                    np.add(c_h, hw[j + tt:j + tt + m], out=c_h)
                lev = self.levels[order - k]    # levels stored k=order..2
                pkv = _probe(lev[1][0], lev[1][1], s_h, 0.0)
                gkv = _probe(lev[2][0], lev[2][1], c_h, 1.0)
                p_acc = pkv + gkv * p_acc
            logp = np.log(p_acc)
        else:
            # exact string/dict fallback (a table hit a 64-bit collision
            # at fit time): dictionary-encode distinct grams, dict gets
            tg, offsets, valid = _ngram_strings(words, order)
            if tg is None:
                return empty_out()
            d = tg.dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dtg = d.dictionary
            parts = pc.split_pattern(dtg, " ")
            last = pc.list_element(parts, order - 1).to_pylist()
            dd = self.cwd[1]
            cwv = np.array([dd.get(w, 0.0) for w in last], np.float64)
            p_acc = (cwv + alpha) / denom
            for k in range(2, order + 1):
                j = order - k
                sfx = pc.binary_join(pc.list_slice(parts, j, order), " ").to_pylist()
                ctx = pc.binary_join(pc.list_slice(parts, j, order - 1), " ").to_pylist()
                lev = self.levels[order - k]
                pd_, gd_ = lev[1], lev[2]
                pkv = np.array([pd_.get(g, 0.0) for g in sfx], np.float64)
                gkv = np.array([gd_.get(g, 1.0) for g in ctx], np.float64)
                p_acc = pkv + gkv * p_acc
            logp = np.log(p_acc)[codes]
        lens = np.diff(offsets)                   # padded lens (0 for nulls)
        npos = np.maximum(lens - (order - 1), 0)  # scored positions per doc
        # the valid mask keeps exactly npos[i] gram starts per doc, in doc
        # order, so the repeat below is the segment map for them
        tot = np.bincount(
            np.repeat(np.arange(n, dtype=np.int64), npos),
            weights=logp[valid], minlength=n).astype(np.float64)
        mean = np.divide(tot, npos, out=np.zeros_like(tot), where=npos > 0)
        out_tot, out_mean, out_ppl = tot, mean, np.exp(-mean)
        if self.round_to is not None:
            out_tot = np.round(out_tot, self.round_to)
            out_mean = np.round(out_mean, self.round_to)
            out_ppl = np.round(out_ppl, self.round_to)
        return pa.table({self.id_col: ids, **extra,
                         "logprob": pa.array(out_tot),
                         "mean_logprob": pa.array(out_mean),
                         "ppl": pa.array(out_ppl)})
