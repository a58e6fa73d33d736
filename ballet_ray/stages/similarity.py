"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``); each batch does ONE numpy matmul against it, emits its
  local top-k per query, and a tiny groupby-merge reduces to the global
  top-k. Scales: per-batch work is a dense GEMM, the shuffle carries only
  k × queries rows per batch.
- ``lsh_knn``: random-hyperplane LSH variant — vectors are bucketed by
  signature; only the query's bucket (and optional neighbor probes) is
  scanned. The scale path when brute force is too expensive.
- ``embedding_near_dup_pairs``: cosine near-duplicate pairs within LSH
  buckets (embedding-space near-dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _emb_matrix(table: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    """list<float> / fixed_size_list / tensor-extension column → (n, d) f32."""
    arr = table.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype)
    if pa.types.is_list(arr.type) or pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
        return flat.reshape(n, -1)
    # Ray tensor extension / object fallback
    np_arr = arr.to_numpy(zero_copy_only=False)
    return np.stack([np.asarray(v) for v in np_arr]).astype(dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute(ds, queries: np.ndarray, *, embedding_col: str, id_col: str, k: int = 10):
    """Exact cosine top-k of each query row against the whole Dataset.
    Returns a Dataset (query_idx, id, score) with k rows per query."""
    q = _normalize(np.asarray(queries, dtype=np.float64))  # f64: oracle parity
    qref = ray.put(q)

    def local_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        m = _normalize(_emb_matrix(t, embedding_col))
        if not len(m):
            return pa.table({"query_idx": pa.array([], pa.int32()), id_col: t.column(id_col).slice(0, 0), "score": pa.array([], pa.float32())})
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        scores = m @ qm.T  # (n, nq)
        kk = min(k, len(m))
        top = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, nq)
        qi, oi, sc = [], [], []
        for qj in range(qm.shape[0]):
            sel = top[:, qj]
            qi.append(np.full(kk, qj, dtype=np.int32))
            oi.append(ids[sel])
            sc.append(scores[sel, qj])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(qi)),
                id_col: pa.array(np.concatenate(oi)),
                "score": pa.array(np.concatenate(sc).astype(np.float64)),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, "score")

    return partials.groupby("query_idx").map_groups(merge, batch_format="pandas")


class _HyperplaneSigner:
    def __init__(self, dim: int, num_bits: int, seed: int = 1754):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, num_bits).astype(np.float32)

    def sign(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0  # (n, num_bits)
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return bits @ weights


def lsh_bucketize(ds, *, embedding_col: str, dim: int, num_bits: int = 8, seed: int = 1754):
    """Append an LSH bucket column (random-hyperplane signature)."""
    signer = _HyperplaneSigner(dim, num_bits, seed)

    def f(t: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(t, embedding_col))
        sig = signer.sign(m) if len(m) else np.empty(0, dtype=np.int64)
        return t.append_column("lsh_bucket", pa.array(sig))

    return ds.map_batches(f, batch_format="pyarrow")


def lsh_knn(
    ds, queries: np.ndarray, *, embedding_col: str, id_col: str, k: int = 10,
    num_bits: int = 8, num_tables: int = 4, multiprobe: int = 1, seed: int = 1754,
):
    """Approximate top-k: scan only rows that share a bucket with a query
    in ANY of ``num_tables`` independent hash tables, optionally probing
    neighbor buckets that differ in up to ``multiprobe`` bits (standard
    multi-table + multi-probe LSH: per-table miss probability is
    independent, so recall ≈ 1-(1-p)^L climbs exponentially with L). The
    candidate filter runs inside one ``map_batches`` — all tables'
    signatures are computed per batch, never materialized corpus-wide."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    dim = q.shape[1]
    signers = [_HyperplaneSigner(dim, num_bits, seed + 7919 * t) for t in range(num_tables)]

    def probe_set(signer) -> set:
        base = signer.sign(q)
        sigs = set(base.tolist())
        if multiprobe >= 1:
            for b in range(num_bits):
                sigs.update((base ^ (1 << b)).tolist())
        if multiprobe >= 2:
            for b1 in range(num_bits):
                for b2 in range(b1 + 1, num_bits):
                    sigs.update((base ^ (1 << b1) ^ (1 << b2)).tolist())
        return sigs

    probes = [np.fromiter(probe_set(s), dtype=np.int64) for s in signers]

    def keep(t: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(t, embedding_col, dtype=np.float32))
        if not len(m):
            return t
        mask = np.zeros(len(m), dtype=bool)
        for signer, p in zip(signers, probes):
            mask |= np.isin(signer.sign(m), p)
        return t.filter(pa.array(mask))

    return knn_brute(
        ds.map_batches(keep, batch_format="pyarrow"), q,
        embedding_col=embedding_col, id_col=id_col, k=k,
    )


def embedding_near_dup_pairs(
    ds, *, embedding_col: str, id_col: str, dim: int, threshold: float = 0.95,
    num_bits: int = 10, max_bucket: int = 4096,
):
    """Pairs with cosine >= threshold found within LSH buckets.

    Buckets above ``max_bucket`` rows (a degenerate bucket — e.g. zero
    vectors all hashing together) are NOT processed all-pairs: rows are
    sorted by their projection onto a fixed direction and compared within
    overlapping sliding windows (stride = max_bucket/2), bounding every
    GEMM at max_bucket² while keeping nearby vectors co-windowed
    (documented recall cap for adversarial buckets)."""
    bucketed = lsh_bucketize(ds.select_columns([id_col, embedding_col]), embedding_col=embedding_col, dim=dim, num_bits=num_bits)
    rng = np.random.RandomState(1754)
    direction = rng.randn(dim).astype(np.float32)
    direction /= np.linalg.norm(direction)

    def _window_pairs(m: np.ndarray, ids: np.ndarray):
        s = m @ m.T
        iu = np.triu_indices(len(m), 1)
        sel = s[iu] >= threshold
        return ids[iu[0][sel]], ids[iu[1][sel]], s[iu][sel].astype(np.float64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col).reset_index(drop=True)
        m = _normalize(np.stack(g[embedding_col].to_numpy()).astype(np.float32))
        ids = g[id_col].to_numpy()
        if n <= max_bucket:
            ia, ib, cs = _window_pairs(m, ids)
            return pd.DataFrame({"id_a": ia, "id_b": ib, "cosine": cs})
        order = np.argsort(m @ direction, kind="stable")
        m, ids = m[order], ids[order]
        stride = max(1, max_bucket // 2)
        seen = {}
        for start in range(0, n - 1, stride):
            w = slice(start, min(n, start + max_bucket))
            ia, ib, cs = _window_pairs(m[w], ids[w])
            for a, b, c in zip(ia, ib, cs):
                key = (a, b) if a <= b else (b, a)
                seen.setdefault(key, float(c))
            if w.stop >= n:
                break
        if not seen:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ks = list(seen)
        return pd.DataFrame(
            {"id_a": [k[0] for k in ks], "id_b": [k[1] for k in ks], "cosine": [seen[k] for k in ks]}
        )

    return bucketed.groupby("lsh_bucket").map_groups(pairs, batch_format="pandas")
