"""Interpolated Kneser–Ney trigram language model — the published shape of
CCNet's actual perplexity filter (Wenzek et al. 2020 score with a KenLM
n-gram LM; KenLM implements interpolated (modified) Kneser–Ney, Chen &
Goodman 1999 §4). The repo's :func:`ballet_ray.stages.text.bigram_logprob_scores`
is the cheap interpolated-MLE stand-in; this module is the real KN family
member at order 3 with the single-discount estimate D = n1/(n1 + 2·n2)
(Ney, Essen & Kneser 1994), fit distributed and applied shuffle-free.

Model (documents padded with two BOS tokens ``<s> <s>`` so every real word
has a full trigram context — every doc of n words scores exactly n
positions, single-word docs included):

    p(w|u,v) = p3(uvw) + γ3(uv)·( p2(vw) + γ2(v)·p1(w) )

      p3(uvw) = max(c(uvw) − D3, 0) / c(uv·)          γ3(uv) = D3·N1+(uv·)/c(uv·)
      p2(vw)  = max(N1+(·vw) − D2, 0) / N1+(·v·)      γ2(v)  = D2·N1+(v·)/N1+(·v·)
      p1(w)   = (N1+(·w) + α) / (N1+(··) + α·(V+1))

where c(uv·) = Σ_w c(uvw), N1+(·vw) = #distinct u with c(uvw) > 0 (the
Kneser–Ney continuation counts), N1+(·v·)/N1+(v·)/N1+(·w)/N1+(··) are its
row/column marginals, V = corpus vocabulary size, and D3/D2 are the
order-specific Ney discounts estimated from counts-of-counts
(D = n1/(n1+2·n2); 0.5 when degenerate). The add-α floor on the unigram
continuation distribution reserves OOV mass the way KenLM reserves it for
``<unk>`` — unseen words score at α/(N1+(··)+α·(V+1)) instead of −inf.
Continuation stats are taken over the trigram-supported bigram set (with
BOS padding that set differs from the raw bigram support only in the
never-predicted ``<s> <s>`` pair).

Scale shape: the fit is ONE corpus-wide trigram-keyed groupby (the same
exchange class as the bigram/vocab fits) followed by groupbys over the
much smaller DISTINCT-trigram table; the per-context probabilities are
computed by coarse-partition grouped kernels (hash contexts into
``default_coarse_parts()`` partitions, one vectorized pandas pass each —
never a per-group map_groups). The broadcast model is capped KenLM-style
(``max_trigrams``/``max_bigrams``/``max_vocab``, deterministic
count-desc/key-asc order): a dropped trigram of a KEPT context backs off
to exactly γ3(uv)·p(w|v) — the correct KN value for an unseen trigram in
a seen context — so pruning only re-labels low-count grams as unseen,
identical to KenLM model pruning. All aggregate statistics (discounts,
context totals, V, N1+(··)) are computed BEFORE capping, so kept-gram
probabilities are exact. Scoring is one shuffle-free ``map_batches`` pass
(dictionary-encode, look up distinct grams only, one segment-sum per doc).

Reference anchor: ballet has no LM operator; this extends the corpus
toolkit the way feature/transformer parity extends ballet/feature.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BOS = "<s>"
_PAD = _BOS + " " + _BOS


def _norm_text(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    return col


def _padded_words(col):
    """Split ``'<s> <s> ' + text`` on single spaces. Null text → null row
    (zero scored positions), matching the other LM scorers."""
    pad = pa.array([_PAD] * len(col), pa.string())
    padded = pc.binary_join_element_wise(pad, col, " ")
    words = pc.split_pattern(padded, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words


def _trigram_strings(words):
    """(tg strings for every within-doc trigram, doc offsets, flat len).

    Returns (None, offsets, 0) when the block holds fewer than 3 words."""
    flat = words.flatten()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    if len(flat) < 3:
        return None, offsets, len(flat)
    tg = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 2), flat.slice(1, len(flat) - 2),
        flat.slice(2), " ")
    valid = np.ones(len(flat) - 2, dtype=bool)
    ends = offsets[1:]
    bad = np.concatenate([ends - 2, ends - 1])
    bad = bad[(bad >= 0) & (bad < len(valid))]
    valid[bad] = False
    return tg, offsets, valid


def _count_of_counts(ds, col: str):
    """(n1, n2) = # rows with count 1 / 2 — two tiny partial-sum reductions."""

    def partial(t: pa.Table) -> pa.Table:
        c = t.column(col).to_numpy(zero_copy_only=False)
        return pa.table({"n1": pa.array([int((c == 1).sum())], pa.int64()),
                         "n2": pa.array([int((c == 2).sum())], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(["n1", "n2"])
    return float(agg["sum(n1)"]), float(agg["sum(n2)"])


def _discount(n1: float, n2: float) -> float:
    d = n1 + 2.0 * n2
    return n1 / d if d > 0 else 0.5


def _split3(tgcol):
    """Vectorized (u, v, w) from 'u v w' trigram strings (words contain no
    spaces by construction, so the split is always exactly 3 elements)."""
    parts = pc.split_pattern(tgcol, " ")
    return (pc.list_element(parts, 0), pc.list_element(parts, 1),
            pc.list_element(parts, 2))


def _capped_pandas(ds, count_col: str, key_col: str, cap: int | None):
    """Deterministic top-``cap`` (count desc, key asc — partition/run
    independent ties) of a materialized model table, as pandas."""
    ds = ds.materialize()
    if cap is not None and ds.count() > cap:
        return ds.sort([count_col, key_col],
                       descending=[True, False]).limit(cap).to_pandas()
    return ds.to_pandas()


def kn_logprob_scores(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      alpha: float = 0.5, round_to: int | None = 4,
                      max_trigrams: int | None = 5_000_000,
                      max_bigrams: int | None = 5_000_000,
                      max_vocab: int | None = 2_000_000,
                      keep_cols: list[str] | None = None):
    """Per-document ``logprob`` / ``mean_logprob`` / ``ppl`` under an
    interpolated Kneser–Ney trigram LM fit on the corpus itself (module
    docstring has the model and the scale shape). Every doc of n words
    scores exactly n positions (BOS padding), so ``mean_logprob`` divides
    by n and empty/null docs emit 0/0/1.

    ``keep_cols``: extra input columns carried through the scoring map
    unchanged (join-free filter-by-score, as in the other LM scorers).
    """
    import ray as _ray

    # ---- fit: corpus-wide trigram counts (the one big exchange) ----
    def tri_counts(t: pa.Table) -> pa.Table:
        col = _norm_text(t.column(text_col))
        words = _padded_words(col)
        tg, _offsets, valid = _trigram_strings(words)
        if tg is None:
            return pa.table({"tg": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        d = tg.filter(pa.array(valid)).dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        return pa.table({
            "tg": d.dictionary,
            "n": pa.array(np.bincount(codes, minlength=len(d.dictionary))
                          .astype(np.int64))})

    tri_ds = (ds.select_columns([text_col])
              .map_batches(tri_counts, batch_format="pyarrow")
              .groupby("tg").sum("n").materialize())
    if tri_ds.count() == 0:
        # all-null/empty corpus: every doc scores zero positions
        empty_model = True
    else:
        empty_model = False

    uref = bref = g3ref = g2ref = p3ref = None
    denom = 1.0
    if not empty_model:
        n1_3, n2_3 = _count_of_counts(tri_ds, "sum(n)")
        d3 = _discount(n1_3, n2_3)

        # ---- per-context trigram probabilities (coarse-partition kernel) ----
        from ballet_ray.functions.partition import (default_coarse_parts,
                                                    stable_hash_array)
        n_parts = default_coarse_parts()

        def add_ctx(t: pa.Table) -> pa.Table:
            u, v, w = _split3(t.column("tg"))
            ctx = pc.binary_join_element_wise(u, v, " ")
            vw = pc.binary_join_element_wise(v, w, " ")
            h = stable_hash_array(ctx.to_numpy(zero_copy_only=False))
            part = pa.array((h % np.uint64(n_parts)).astype(np.int64))
            return pa.table({"tg": t.column("tg"), "ctx": ctx, "vw": vw,
                             "c": t.column("sum(n)"), "__part": part})

        def ctx_kernel(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("ctx", sort=False)["c"]
            tot = g.transform("sum").to_numpy(np.float64)
            npg = g.transform("size").to_numpy(np.float64)
            c = df["c"].to_numpy(np.float64)
            return pd.DataFrame({
                "tg": df["tg"], "ctx": df["ctx"], "c": df["c"],
                "p3": np.maximum(c - d3, 0.0) / tot,
                "g3": d3 * npg / tot})

        tri_keyed = tri_ds.map_batches(add_ctx, batch_format="pyarrow")
        tri_model = (tri_keyed.select_columns(["tg", "ctx", "c", "__part"])
                     .groupby("__part").map_groups(ctx_kernel,
                                                   batch_format="pandas"))
        trim = _capped_pandas(tri_model, "c", "tg", max_trigrams)
        p3d = dict(zip(trim["tg"], trim["p3"].to_numpy(np.float64)))
        g3d = dict(zip(trim["ctx"], trim["g3"].to_numpy(np.float64)))

        # ---- continuation (bigram-level) model: K(vw) = N1+(.vw) ----
        def k_partial(t: pa.Table) -> pa.Table:
            d = t.column("vw")
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            d = d.dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False)
            return pa.table({
                "vw": d.dictionary,
                "kc": pa.array(np.bincount(codes, minlength=len(d.dictionary))
                               .astype(np.int64))})

        k_ds = (tri_keyed.select_columns(["vw"])
                .map_batches(k_partial, batch_format="pyarrow")
                .groupby("vw").sum("kc").materialize())
        n1_2, n2_2 = _count_of_counts(k_ds, "sum(kc)")
        d2 = _discount(n1_2, n2_2)

        def add_v(t: pa.Table) -> pa.Table:
            parts = pc.split_pattern(t.column("vw"), " ")
            v = pc.list_element(parts, 0)
            w = pc.list_element(parts, 1)
            h = stable_hash_array(v.to_numpy(zero_copy_only=False))
            part = pa.array((h % np.uint64(n_parts)).astype(np.int64))
            return pa.table({"vw": t.column("vw"), "v": v, "w": w,
                             "kc": t.column("sum(kc)"), "__part": part})

        def v_kernel(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("v", sort=False)["kc"]
            tot = g.transform("sum").to_numpy(np.float64)
            nw = g.transform("size").to_numpy(np.float64)
            kc = df["kc"].to_numpy(np.float64)
            return pd.DataFrame({
                "vw": df["vw"], "v": df["v"], "kc": df["kc"],
                "p2": np.maximum(kc - d2, 0.0) / tot,
                "g2": d2 * nw / tot})

        k_keyed = k_ds.map_batches(add_v, batch_format="pyarrow")
        k_model = (k_keyed.select_columns(["vw", "v", "kc", "__part"])
                   .groupby("__part").map_groups(v_kernel,
                                                 batch_format="pandas"))
        km = _capped_pandas(k_model, "kc", "vw", max_bigrams)
        p2d = dict(zip(km["vw"], km["p2"].to_numpy(np.float64)))
        g2d = dict(zip(km["v"], km["g2"].to_numpy(np.float64)))

        # ---- unigram continuation: N1+(.w), N1+(..), V ----
        def w_partial(t: pa.Table) -> pa.Table:
            d = t.column("w")
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            d = d.dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False)
            return pa.table({
                "w": d.dictionary,
                "cw": pa.array(np.bincount(codes, minlength=len(d.dictionary))
                               .astype(np.int64))})

        cw_ds = (k_keyed.select_columns(["w"])
                 .map_batches(w_partial, batch_format="pyarrow")
                 .groupby("w").sum("cw").materialize())
        nb = float(k_ds.count())          # N1+(..): Σ_w N1+(.w) = |K|
        vocab = float(cw_ds.count())      # every real word is a trigram tail
        denom = nb + alpha * (vocab + 1.0)
        cwm = _capped_pandas(cw_ds, "sum(cw)", "w", max_vocab)
        cwd = dict(zip(cwm["w"], cwm["sum(cw)"].to_numpy(np.float64)))

        uref = _ray.put(cwd)
        bref = _ray.put(p2d)
        g2ref = _ray.put(g2d)
        g3ref = _ray.put(g3d)
        p3ref = _ray.put(p3d)

    # ---- score: one shuffle-free pass ----
    def score(t: pa.Table) -> pa.Table:
        col = _norm_text(t.column(text_col))
        ids = t.column(id_col)
        extra = {c: t.column(c) for c in (keep_cols or [])}
        n = len(col)
        zeros = np.zeros(n)

        def empty_out():
            return pa.table({id_col: ids, **extra,
                             "logprob": pa.array(zeros),
                             "mean_logprob": pa.array(zeros),
                             "ppl": pa.array(np.ones(n))})

        if empty_model:
            return empty_out()
        words = _padded_words(col)
        tg, offsets, valid = _trigram_strings(words)
        if tg is None:
            return empty_out()
        p3d = _ray.get(p3ref)
        g3d = _ray.get(g3ref)
        p2d = _ray.get(bref)
        g2d = _ray.get(g2ref)
        cwd = _ray.get(uref)
        d = tg.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dtg = d.dictionary
        du, dv, dw = _split3(dtg)
        dctx = pc.binary_join_element_wise(du, dv, " ").to_pylist()
        dvw = pc.binary_join_element_wise(dv, dw, " ").to_pylist()
        dws = dw.to_pylist()
        dtgs = dtg.to_pylist()
        p3v = np.array([p3d.get(g, 0.0) for g in dtgs], np.float64)
        g3v = np.array([g3d.get(g, 1.0) for g in dctx], np.float64)
        p2v = np.array([p2d.get(g, 0.0) for g in dvw], np.float64)
        g2v = np.array([g2d.get(g.split(" ", 1)[0], 1.0) for g in dvw],
                       np.float64)
        cwv = np.array([cwd.get(g, 0.0) for g in dws], np.float64)
        p1v = (cwv + alpha) / denom
        logp_d = np.log(p3v + g3v * (p2v + g2v * p1v))
        logp = logp_d[codes]
        lens = np.diff(offsets)                 # padded lens (0 for nulls)
        npos = np.maximum(lens - 2, 0)          # scored positions per doc
        # the valid mask keeps exactly npos[i] trigram starts per doc, in
        # doc order, so the repeat below is the segment map for them
        tot = np.bincount(
            np.repeat(np.arange(n, dtype=np.int64), npos),
            weights=logp[valid], minlength=n).astype(np.float64)
        mean = np.divide(tot, npos, out=np.zeros_like(tot), where=npos > 0)
        out_tot, out_mean, out_ppl = tot, mean, np.exp(-mean)
        if round_to is not None:
            out_tot = np.round(out_tot, round_to)
            out_mean = np.round(out_mean, round_to)
            out_ppl = np.round(out_ppl, round_to)
        return pa.table({id_col: ids, **extra, "logprob": pa.array(out_tot),
                         "mean_logprob": pa.array(out_mean),
                         "ppl": pa.array(out_ppl)})

    in_cols = [id_col, text_col] + [c for c in (keep_cols or [])
                                    if c not in (id_col, text_col)]
    return ds.select_columns(in_cols).map_batches(score, batch_format="pyarrow")
