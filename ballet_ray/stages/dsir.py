"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): pick raw-corpus documents whose hashed-n-gram distribution looks
like a target corpus.

The published recipe, re-expressed Ray-Data-first:

1. **Feature space**: unigrams + bigrams of whitespace words, hashed into
   a FIXED number of buckets ``B`` (the paper uses 10k). Hashing bounds
   every corpus-wide structure at ``O(B)`` regardless of vocabulary —
   unlike a term dictionary there is nothing to cap or broadcast-gate.
2. **Fit**: bucket-count vectors for the target and raw corpora. Each is
   one ``vector_sum_reduce`` pass (per-block ``np.bincount`` partials,
   tree-merged worker-side; the driver receives exactly one length-``B``
   float64 vector — 80 KB at B=10k).
3. **Score**: the per-document log importance weight
   ``logw(x) = Σ_gram  log p̂_target[b(gram)] − log p̂_raw[b(gram)]``
   with add-α smoothing ``p̂[b] = (c_b + α) / (T + αB)``. The λ = log-ratio
   vector broadcasts once via ``ray.put``; scoring is a shuffle-free
   ``map_batches`` pass (dictionary-encode grams, hash distinct values
   only, segment-sum per doc with one ``np.bincount``).
4. **Resample** (:func:`dsir_resample`): Gumbel-top-k without
   replacement — ``key = logw + Gumbel(hash(id))`` with a DETERMINISTIC
   hash-uniform draw (no RNG state ⇒ reproducible across runs,
   partitionings and cluster sizes, resumable, and SQL-auditable), then
   one global ``sort().limit(k)`` over (key, id) only.

Two hash modes, as everywhere in this package (`stages/sampling.py`):
``method="md5"`` is the SQL-audit mode the DuckDB oracles reproduce
(``bucket = int(md5(gram)[:8], 16) % B``); ``method="siphash"`` is the
corpus-scale vectorized mode. Both hash only each batch's DISTINCT grams
(dictionary encode first), so even md5 mode is O(batch vocab), not
O(tokens).

At 100 TB: the only all-to-all is the final top-k sort in
``dsir_resample``, and it moves (id, key) pairs only — the text payload
never shuffles. Everything else is map-only plus two 80 KB tree
reductions.

Reference scope anchor: corpus-selection utilities sit beside the
sampling family (reference has no equivalent; SURVEY §2.8 extensions).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_of_distinct(terms: np.ndarray, buckets: int, method: str) -> np.ndarray:
    """bucket id per DISTINCT gram string (int64)."""
    if method == "md5":
        md5 = hashlib.md5
        return np.asarray(
            [int(md5(t.encode()).hexdigest()[:8], 16) % buckets for t in terms],
            dtype=np.int64,
        )
    if method != "siphash":
        raise ValueError("method must be 'md5' or 'siphash'")
    from ballet_ray.functions.partition import stable_hash_array

    return (stable_hash_array(terms) % np.uint64(buckets)).astype(np.int64)


def _gram_buckets(
    t: pa.Table, *, text_col: str, buckets: int, ngmax: int, method: str
) -> tuple[np.ndarray, np.ndarray, int]:
    """Hashed (uni+bi)gram stream of a batch.

    Returns ``(bucket_ids, doc_index, n_rows)`` — one entry per gram
    occurrence, vectorized: split once, dictionary-encode, hash only the
    distinct grams, map back through the codes.
    """
    col = t.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        # an all-None block arrives null-typed, which split_pattern has no
        # kernel for; null texts contribute no grams (same as a null row
        # inside a string-typed block)
        return np.empty(0, np.int64), np.empty(0, np.int64), len(t)
    words = pc.split_pattern(col, " ")
    n = len(words)
    flat = words.flatten()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    doc_idx_uni = np.repeat(np.arange(n, dtype=np.int64), lens)

    gram_arrays = [flat]
    doc_arrays = [doc_idx_uni]
    if ngmax >= 2 and len(flat) > 1:
        bi = pc.binary_join_element_wise(flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        valid = np.ones(len(flat) - 1, dtype=bool)
        ends = offsets[1:] - 1  # last position of each doc: (last, next-first) pairs are invalid
        valid[ends[(ends >= 0) & (ends < len(valid))]] = False
        bi = bi.filter(pa.array(valid))
        gram_arrays.append(bi)
        doc_arrays.append(doc_idx_uni[:-1][valid] if len(doc_idx_uni) else doc_idx_uni)

    out_buckets, out_docs = [], []
    for grams, docs in zip(gram_arrays, doc_arrays):
        if len(grams) == 0:
            continue
        d = grams.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        distinct = np.asarray(d.dictionary.to_pandas(), dtype=object)
        bmap = _bucket_of_distinct(distinct, buckets, method)
        out_buckets.append(bmap[codes])
        out_docs.append(docs)
    if not out_buckets:
        return np.empty(0, np.int64), np.empty(0, np.int64), n
    return np.concatenate(out_buckets), np.concatenate(out_docs), n


def _bucket_counts(ds, *, text_col: str, buckets: int, ngmax: int, method: str,
                   side: str) -> np.ndarray:
    if method not in ("md5", "siphash"):
        raise ValueError("method must be 'md5' or 'siphash'")
    from ballet_ray.stages.decomposition import vector_sum_reduce

    def vec(t: pa.Table) -> np.ndarray:
        b, _, _ = _gram_buckets(t, text_col=text_col, buckets=buckets, ngmax=ngmax, method=method)
        return np.bincount(b, minlength=buckets).astype(np.float64)

    try:
        return vector_sum_reduce(ds.select_columns([text_col]), vec)
    except IndexError:
        raise ValueError(f"DSIR {side} corpus is empty — nothing to fit") from None


def dsir_log_weights(
    raw_ds,
    target_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    ngmax: int = 2,
    alpha: float = 1.0,
    method: str = "siphash",
    round_to: int | None = 4,
):
    """Per-document DSIR log importance weight of ``raw_ds`` toward the
    distribution of ``target_ds``. Returns a Dataset ``(id_col, logw)``.

    Two 80 KB tree reductions (target + raw bucket counts) fit the model;
    scoring is one shuffle-free map_batches pass with the λ vector
    broadcast via ``ray.put``.
    """
    import ray

    ct = _bucket_counts(target_ds, text_col=text_col, buckets=buckets, ngmax=ngmax,
                        method=method, side="target")
    cr = _bucket_counts(raw_ds, text_col=text_col, buckets=buckets, ngmax=ngmax,
                        method=method, side="raw")
    denom_t = ct.sum() + alpha * buckets
    denom_r = cr.sum() + alpha * buckets
    lam = (np.log(ct + alpha) - np.log(denom_t)) - (np.log(cr + alpha) - np.log(denom_r))
    lref = ray.put(lam)

    def score(t: pa.Table) -> pa.Table:
        lam = ray.get(lref)
        b, d, n = _gram_buckets(t, text_col=text_col, buckets=buckets, ngmax=ngmax, method=method)
        # astype: bincount with EMPTY weights (a block of all-empty texts)
        # returns int64, which would flip the logw column's schema
        logw = np.bincount(d, weights=lam[b], minlength=n).astype(np.float64)
        if round_to is not None:
            logw = np.round(logw, round_to)
        return pa.table({id_col: t.column(id_col), "logw": pa.array(logw)})

    return raw_ds.select_columns([id_col, text_col]).map_batches(score, batch_format="pyarrow")


def _gumbel_u(keys: np.ndarray, salt: str, method: str) -> np.ndarray:
    """Deterministic Gumbel(0,1) draw per key: ``-log(-log(u))`` with the
    hash-uniform ``u = (h32 + 0.5) / 2^32`` (md5 mode: first 8 hex digits
    of ``md5(salt || key)``, the construction every SQL oracle in this
    package reproduces; the +0.5 keeps u strictly inside (0,1))."""
    from ballet_ray.stages.sampling import _md5_hex, _sip_u64

    if method == "md5":
        hexes = _md5_hex(list(keys), salt)
        h = np.asarray([int(x[:8], 16) for x in hexes], dtype=np.float64)
        u = (h + 0.5) / 2.0**32
    else:
        h = (_sip_u64(np.asarray(keys), salt) >> np.uint64(32)).astype(np.float64)
        u = (h + 0.5) / 2.0**32
    return -np.log(-np.log(u))


def dsir_resample(
    raw_ds,
    target_ds,
    *,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    ngmax: int = 2,
    alpha: float = 1.0,
    salt: str = "dsir",
    method: str = "siphash",
    round_to: int | None = 4,
):
    """Gumbel-top-k importance resampling WITHOUT replacement (the DSIR
    selection step): keep the ``k`` documents maximizing
    ``logw + Gumbel(hash(id))``. Deterministic — the Gumbel noise is a
    hash-uniform transform, not an RNG draw. Returns ``(id_col, logw,
    key)`` sorted by key descending; only (id, two floats) enter the
    final global sort, never the text payload.
    """
    scored = dsir_log_weights(
        raw_ds, target_ds, text_col=text_col, id_col=id_col,
        buckets=buckets, ngmax=ngmax, alpha=alpha, method=method, round_to=None,
    )

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        logw = t.column("logw").to_numpy(zero_copy_only=False)
        key = logw + _gumbel_u(ids, salt, method)
        out_w, out_k = logw, key
        if round_to is not None:
            out_w, out_k = np.round(logw, round_to), np.round(key, round_to)
        return pa.table({id_col: t.column(id_col), "logw": pa.array(out_w),
                         "key": pa.array(out_k)})

    return (
        scored.map_batches(add_key, batch_format="pyarrow")
        .sort(["key", id_col], descending=[True, False])
        .limit(k)
    )
