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
    pairs = _cell_pair_finder(embedding_col, id_col, threshold, max_bucket, dim)
    return bucketed.groupby("lsh_bucket").map_groups(pairs, batch_format="pandas")


def _cell_pair_finder(embedding_col: str, id_col: str, threshold: float, max_bucket: int, dim: int, seed: int = 1754):
    """Per-group near-pair kernel shared by the LSH-bucket and k-means-cell
    paths: exact all-pairs below ``max_bucket`` rows, projection-sorted
    sliding windows above (every GEMM bounded at max_bucket²)."""
    rng = np.random.RandomState(seed)
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

    return pairs


def semantic_dedup(
    ds, *, embedding_col: str, id_col: str, dim: int, threshold: float = 0.95,
    n_centroids: int = 64, max_bucket: int = 4096, kmeans_iters: int = 3,
    seed: int = 1754, keep_col: str | None = None, keep: str = "max",
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space, search near-duplicate
    pairs only WITHIN each cluster, connect pairs into components, keep
    the minimum id per component (deterministic representative — the
    paper's choice of keeper is arbitrary; min-id makes the result
    oracle-able). With ``keep_col`` the keeper is instead the component
    member with the best value of that ``ds`` column (min-id tiebreak) —
    quality-aware retention via
    :func:`ballet_ray.stages.dedup.cluster_losers`.

    Returns the ids to DROP, i.e. every component member except its
    representative. Scale shape: centroid fit is `ivf_fit_centroids`
    (per-round partial sums, driver sees K rows); cluster assignment is
    one GEMM argmax per batch; the pair search shuffles only
    (cell, id, vector) with per-cell GEMMs bounded by ``max_bucket``;
    components resolve via the distributed min-label propagation in
    dedup.py. The corpus payload never fans out all-pairs.
    """
    from ballet_ray.stages.dedup import assign_clusters

    slim = ds.select_columns([id_col, embedding_col])
    cents = ivf_fit_centroids(
        slim, embedding_col=embedding_col, n_centroids=n_centroids,
        iters=kmeans_iters, seed=seed,
    )
    cref = ray.put(cents)

    def cellify(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)).astype(np.float32)
        cell = np.argmax(m @ c.T, axis=1) if len(m) else np.empty(0, np.int64)
        return t.append_column("cell", pa.array(cell.astype(np.int32)))

    pairs_fn = _cell_pair_finder(embedding_col, id_col, threshold, max_bucket, dim, seed)
    pairs = slim.map_batches(cellify, batch_format="pyarrow").groupby("cell").map_groups(
        pairs_fn, batch_format="pandas"
    )
    comps = assign_clusters(pairs, id_col=id_col)  # (id, cluster_rep)
    from ballet_ray.stages.dedup import cluster_losers

    if keep_col is not None and comps.count() == 0:
        import ray.data as _rdata

        return _rdata.from_pandas(pd.DataFrame({id_col: []}))
    return cluster_losers(comps, ds, id_col=id_col, keep_col=keep_col, keep=keep)


def _priority_sample_matrix(ds, embedding_col: str, sample_size: int, seed: int) -> np.ndarray:
    """Unbiased deterministic sample of embedding rows: per-batch top-cap
    by a content-stable hashed priority (project onto a fixed random
    direction, hash the bit pattern — block- and partitioning-agnostic),
    merged on the driver by the same priority. (n, d) float32.

    The per-batch cap must be the FULL sample_size: any smaller cap makes
    the result depend on the partitioning (a single block can hold more
    than cap of the global smallest-priority rows — seen as a PQ/IVF
    nondeterminism bug when one partition held the whole table). The
    shuffle therefore carries ≤ sample_size rows per block — same
    exactness-first shape as stratified_sample."""
    from ballet_ray.functions.partition import stable_hash_array

    cap = sample_size
    proj = np.random.RandomState(seed ^ 0x5EED).randn(8192).astype(np.float32)

    def sample_batch(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, embedding_col, dtype=np.float32)
        if not len(m):
            return pa.table({"prio": pa.array([], pa.uint64()),
                             "vec": pa.array([], pa.binary())})
        d = m.shape[1]
        p = proj[:d] if d <= len(proj) else np.resize(proj, d)
        key = (m @ p).astype(np.float64).view(np.int64)
        prio = stable_hash_array(key)
        k = min(cap, len(m))
        sel = np.argsort(prio)[:k]
        return pa.table({"prio": pa.array(prio[sel]),
                         "vec": pa.array([m[i].tobytes() for i in sel], pa.binary())})

    parts = ds.select_columns([embedding_col]).map_batches(
        sample_batch, batch_format="pyarrow"
    ).sort("prio").limit(sample_size).to_pandas()
    return np.stack([np.frombuffer(b, np.float32) for b in parts["vec"]])


def ivf_fit_centroids(
    ds, *, embedding_col: str, n_centroids: int = 256, sample_size: int = 8192,
    iters: int = 5, seed: int = 1754,
):
    """Distributed k-means for IVF coarse quantization (inverted-file ANN,
    Jégou/Douze/Schmid 2011 "Product quantization for nearest neighbor
    search" §IV — here with exact residual scoring instead of PQ codes,
    the right trade at list<float> column widths). Init centroids from
    a seeded-hash priority sample (unbiased across blocks, like the imputer
    reservoir — NOT a first-blocks prefix), then ``iters`` Lloyd rounds
    where each round is ONE map_batches pass emitting per-centroid partial
    (sum, count) rows reduced by a grouped Sum — the driver sees
    n_centroids rows per round, never vectors. Returns (K, d) float32."""
    sample = _priority_sample_matrix(ds, embedding_col, sample_size, seed)
    sample = _normalize(sample.astype(np.float64)).astype(np.float32)

    rng = np.random.RandomState(seed)
    K = min(n_centroids, len(sample))
    cents = sample[rng.choice(len(sample), K, replace=False)]

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _normalize(_emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)).astype(np.float32)
            if not len(m):
                return pa.table({"cid": pa.array([], pa.int32()),
                                 "cnt": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.binary())})
            assign = np.argmax(m @ c.T, axis=1)
            uniq = np.unique(assign)
            sums = np.zeros((len(uniq), m.shape[1]), np.float64)
            for j, u in enumerate(uniq):
                sums[j] = m[assign == u].sum(axis=0)
            cnt = np.bincount(assign, minlength=c.shape[0])[uniq]
            return pa.table({"cid": pa.array(uniq.astype(np.int32)),
                             "cnt": pa.array(cnt.astype(np.int64)),
                             "vsum": pa.array([s.tobytes() for s in sums], pa.binary())})

        import pandas as pd

        def reduce_cid(g: pd.DataFrame) -> pd.DataFrame:
            tot = np.zeros_like(np.frombuffer(g["vsum"].iloc[0], np.float64))
            for b in g["vsum"]:
                tot = tot + np.frombuffer(b, np.float64)
            return pd.DataFrame({"cid": [int(g["cid"].iloc[0])],
                                 "cnt": [int(g["cnt"].sum())],
                                 "vsum": [tot.tobytes()]})

        stats = (ds.select_columns([embedding_col])
                 .map_batches(partial, batch_format="pyarrow")
                 .groupby("cid").map_groups(reduce_cid, batch_format="pandas")
                 .to_pandas())
        new = cents.copy()
        for _, r in stats.iterrows():
            if r["cnt"] > 0:
                new[int(r["cid"])] = (np.frombuffer(r["vsum"], np.float64) / r["cnt"]).astype(np.float32)
        cents = _normalize(new.astype(np.float64)).astype(np.float32)
    return cents


def assign_topic_clusters(ds, centroids: np.ndarray, *, embedding_col: str,
                          out_col: str = "cluster"):
    """Append ``out_col`` = nearest-centroid id (cosine, matching the
    normalized :func:`ivf_fit_centroids` objective) to every row — one
    broadcast of the (K, d) centroid matrix, one GEMM per batch, zero
    shuffles. The public face of the assignment step IVF/SemDeDup use
    internally; with a fitted k-means this is corpus topic clustering."""
    c = _normalize(np.asarray(centroids, dtype=np.float64)).astype(np.float32)
    cref = ray.put(c)

    def tag(t: pa.Table) -> pa.Table:
        if not len(t):
            return t.append_column(out_col, pa.array([], pa.int32()))
        m = _normalize(_emb_matrix(t, embedding_col, dtype=np.float32)
                       .astype(np.float64)).astype(np.float32)
        assign = np.argmax(m @ ray.get(cref).T, axis=1).astype(np.int32)
        return t.append_column(out_col, pa.array(assign))

    return ds.map_batches(tag, batch_format="pyarrow")


#: Backward-compat alias — the centroid tagger used to be exported as
#: ``assign_clusters``, which collided with the connected-components
#: ``dedup.assign_clusters`` when both were re-exported from ``corpus``.
assign_clusters = assign_topic_clusters


def cluster_embeddings(
    ds, *, embedding_col: str, n_clusters: int = 256, out_col: str = "cluster",
    sample_size: int = 8192, iters: int = 5, seed: int = 1754,
):
    """Corpus topic clustering: distributed k-means fit
    (:func:`ivf_fit_centroids` — priority-sample init + Lloyd rounds whose
    all-to-all carries only K (sum, count) rows) then one map-only
    assignment pass. Returns ``(tagged_dataset, centroids)``.

    The cluster column is the group key for cluster-balanced data mixing:
    compose with ``sampling.temperature_sample(group_col=out_col)`` to
    flatten topic skew, or ``groupby(out_col).count()`` for the topic
    histogram. Deterministic for a given (input content, seed) —
    independent of partitioning and cluster size."""
    cents = ivf_fit_centroids(ds, embedding_col=embedding_col,
                              n_centroids=n_clusters, sample_size=sample_size,
                              iters=iters, seed=seed)
    return assign_topic_clusters(ds, cents, embedding_col=embedding_col,
                                 out_col=out_col), cents


def ivf_knn(
    ds, queries: np.ndarray, centroids: np.ndarray, *, embedding_col: str,
    id_col: str, k: int = 10, nprobe: int = 8,
):
    """IVF approximate top-k: rows whose coarse cell is among any query's
    ``nprobe`` nearest centroids are scanned exactly (one GEMM per batch);
    everything else is skipped. With ``nprobe == len(centroids)`` the scan
    is exhaustive and exactly equals ``knn_brute`` — the correctness mode;
    at corpus scale nprobe/K is the fraction of data touched."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    nprobe = min(nprobe, len(c))
    qprobes = np.argsort(-(q @ c.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe = np.unique(qprobes)
    cref = ray.put(c.astype(np.float32))
    pref = ray.put(probe)

    def keep(t: pa.Table) -> pa.Table:
        cc, pp = ray.get(cref), ray.get(pref)
        m = _normalize(_emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)).astype(np.float32)
        if not len(m):
            return t
        assign = np.argmax(m @ cc.T, axis=1)
        return t.filter(pa.array(np.isin(assign, pp)))

    return knn_brute(
        ds.map_batches(keep, batch_format="pyarrow"), q,
        embedding_col=embedding_col, id_col=id_col, k=k,
    )


def diversity_sample(
    ds, *, embedding_col: str, id_col: str, dim: int, k: int,
    n_centroids: int = 64, kmeans_iters: int = 3, max_bucket: int = 65536,
    seed: int = 1754,
):
    """Coreset / diversity selection: pick ~``k`` exemplars spread over
    embedding space (greedy k-center a.k.a. farthest-point traversal —
    2-approximation to the optimal covering radius, Gonzalez 1985).

    Scale shape: exact farthest-point traversal is O(k·n) GEMM over the
    whole corpus, so the traversal runs WITHIN k-means cells (same
    ivf_fit_centroids machinery as IVF/SemDeDup — driver sees K rows per
    Lloyd round): each cell greedily selects its proportional share
    ``ceil(k · |cell| / n)``, seeded at the point nearest the centroid
    (ties by min id ⇒ fully deterministic under any partitioning). Per-
    cell work is O(share · |cell| · d) with |cell| bounded by cell count
    choice; cells above ``max_bucket`` rows are subsampled by hashed
    priority before traversal (documented approximation).

    Returns (id, cell, pick_order) — pick_order is the traversal rank
    within the cell (0 = cell medoid), so callers can take stricter
    subsets without re-running.
    """
    import pandas as pd

    from ballet_ray.functions.partition import stable_hash_array

    slim = ds.select_columns([id_col, embedding_col])
    cents = ivf_fit_centroids(
        slim, embedding_col=embedding_col, n_centroids=n_centroids,
        iters=kmeans_iters, seed=seed,
    )
    n_total = slim.count()
    cref = ray.put(cents)

    def cellify(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)).astype(np.float32)
        cell = np.argmax(m @ c.T, axis=1) if len(m) else np.empty(0, np.int64)
        return t.append_column("cell", pa.array(cell.astype(np.int32)))

    def kcenter(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        share = int(np.ceil(k * len(g) / max(n_total, 1)))
        g = g.sort_values(id_col).reset_index(drop=True)
        if len(g) > max_bucket:
            prio = stable_hash_array(g[id_col].to_numpy().astype(object))
            g = g.iloc[np.argsort(prio)[:max_bucket]].sort_values(id_col).reset_index(drop=True)
        m = _normalize(np.stack(g[embedding_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy()
        c = _normalize(np.asarray(ray.get(cref), np.float64))[cell]
        share = min(share, len(g))
        # seed: nearest to centroid (max cosine), tie -> min id (sorted)
        first = int(np.argmax(m @ c))
        picked = [first]
        dmin = 1.0 - m @ m[first]  # cosine distance to the picked set
        for _ in range(share - 1):
            nxt = int(np.argmax(dmin))  # argmax returns FIRST max -> min id tie-break
            picked.append(nxt)
            np.minimum(dmin, 1.0 - m @ m[nxt], out=dmin)
        return pd.DataFrame(
            {id_col: ids[picked], "cell": cell, "pick_order": np.arange(len(picked))}
        )

    cells = slim.map_batches(cellify, batch_format="pyarrow")
    return cells.groupby("cell").map_groups(kcenter, batch_format="pandas")


# ---------------------------------------------------------------------------
# Product quantization (Jégou/Douze/Schmid 2011) — the memory-scale ANN path:
# each d-dim vector compresses to m uint8 codes (e.g. 64 floats -> 8 bytes),
# queries score the codes via an ADC lookup table without ever touching the
# original vectors.


def _pq_split(m: np.ndarray, n_sub: int) -> np.ndarray:
    n, d = m.shape
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by m_subspaces {n_sub}")
    return m.reshape(n, n_sub, d // n_sub)


def _pq_assign(sub: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Nearest codeword per (row, subspace). sub (n, m, dsub), books
    (m, K, dsub) -> codes (n, m) — one GEMM per subspace:
    argmin ||x-c||² = argmin (−2x·c + ||c||²)."""
    n, n_sub, _ = sub.shape
    codes = np.empty((n, n_sub), np.int64)
    for s in range(n_sub):
        b = books[s]
        d2 = -2.0 * (sub[:, s, :] @ b.T) + (b * b).sum(axis=1)
        codes[:, s] = np.argmin(d2, axis=1)
    return codes


def pq_fit(ds, *, embedding_col: str, m_subspaces: int = 8, n_codes: int = 256,
           sample_size: int = 8192, local_iters: int = 10, refine_iters: int = 2,
           seed: int = 1754) -> np.ndarray:
    """Fit PQ codebooks: per-subspace k-means. Init + ``local_iters`` Lloyd
    rounds run on a deterministic hash-priority sample on the driver (the
    standard practice — codebooks are trained on a sample), then
    ``refine_iters`` DISTRIBUTED Lloyd rounds over the full corpus where
    each round is ONE tree-reduced pass (``vector_sum_reduce`` of the
    flat (m·K·dsub sums + m·K counts) vector — ~½ MB at m=8, K=256,
    dsub=8; the driver never sees vectors). Returns (m, K, dsub) float32.
    """
    from ballet_ray.stages.decomposition import vector_sum_reduce

    sample = _priority_sample_matrix(ds, embedding_col, sample_size, seed).astype(np.float64)
    d = sample.shape[1]
    if d % m_subspaces:
        raise ValueError(f"dim {d} not divisible by m_subspaces {m_subspaces}")
    dsub = d // m_subspaces
    K = min(n_codes, len(sample))
    rng = np.random.RandomState(seed)
    sub = _pq_split(sample, m_subspaces)

    books = np.empty((m_subspaces, K, dsub), np.float64)
    for s in range(m_subspaces):
        x = sub[:, s, :]
        cents = x[rng.choice(len(x), K, replace=False)]
        for _ in range(local_iters):
            d2 = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            for j in range(K):
                sel = assign == j
                if sel.any():
                    cents[j] = x[sel].mean(axis=0)
        books[s] = cents

    vec_len = m_subspaces * K * dsub + m_subspaces * K
    for _ in range(refine_iters):
        bref = ray.put(books.astype(np.float32))

        def partial(t: pa.Table) -> np.ndarray:
            b = ray.get(bref).astype(np.float64)
            m = _emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)
            out = np.zeros(vec_len, np.float64)
            if not len(m):
                return out
            sub = _pq_split(m, m_subspaces)
            codes = _pq_assign(sub, b)
            sums = out[: m_subspaces * K * dsub].reshape(m_subspaces, K, dsub)
            cnts = out[m_subspaces * K * dsub:].reshape(m_subspaces, K)
            for s in range(m_subspaces):
                cnts[s] = np.bincount(codes[:, s], minlength=K)
                for dd in range(dsub):
                    sums[s, :, dd] = np.bincount(
                        codes[:, s], weights=sub[:, s, dd], minlength=K
                    )
            return out

        tot = vector_sum_reduce(ds.select_columns([embedding_col]), partial)
        sums = tot[: m_subspaces * K * dsub].reshape(m_subspaces, K, dsub)
        cnts = tot[m_subspaces * K * dsub:].reshape(m_subspaces, K)
        nz = cnts > 0
        books = books.copy()
        books[nz] = sums[nz] / cnts[nz][:, None]

    return books.astype(np.float32)


def pq_encode(ds, codebooks: np.ndarray, *, embedding_col: str, id_col: str,
              out_col: str = "pq_code"):
    """Encode each row to its m uint8 PQ codes — one shuffle-free
    vectorized pass; output is (id, list<uint8>) — e.g. 64 f32 -> 8 bytes,
    a 32× compression of the ANN working set."""
    if codebooks.shape[1] > 256:
        raise ValueError("uint8 codes require n_codes <= 256")
    bref = ray.put(codebooks.astype(np.float64))

    def enc(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        m = _emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)
        if not len(m):
            return pa.table({id_col: t.column(id_col),
                             out_col: pa.array([], pa.list_(pa.uint8()))})
        codes = _pq_assign(_pq_split(m, b.shape[0]), b).astype(np.uint8)
        n, n_sub = codes.shape
        offs = pa.array((np.arange(n + 1, dtype=np.int64) * n_sub).astype(np.int32))
        lst = pa.ListArray.from_arrays(offs, pa.array(codes.ravel()))
        return pa.table({id_col: t.column(id_col), out_col: lst})

    return ds.select_columns([id_col, embedding_col]).map_batches(enc, batch_format="pyarrow")


def pq_knn(ds, queries: np.ndarray, codebooks: np.ndarray, *, embedding_col: str,
           id_col: str, k: int = 10):
    """ADC (asymmetric distance computation) top-k: each batch encodes its
    rows once, then every query scores them through a (m, K) lookup table
    of exact query-to-codeword squared distances — Σ_s LUT[s, code_s], no
    distance to the original vectors. ``score = −‖q−x̂‖²`` (larger is
    closer) so the per-query merge is the same grouped nlargest as
    knn_brute. With m=1 and K ≥ #distinct vectors this is exact L2 top-k.
    """
    q = np.asarray(queries, dtype=np.float64)
    b = codebooks.astype(np.float64)
    n_sub, K, dsub = b.shape
    # LUT[qi, s, j] = ||q_s - c_sj||²
    qs = _pq_split(q, n_sub)  # (nq, m, dsub)
    lut = (
        (qs * qs).sum(axis=2)[:, :, None]
        - 2.0 * np.einsum("qsd,sjd->qsj", qs, b)
        + (b * b).sum(axis=2)[None, :, :]
    )  # (nq, m, K)
    bref, lref = ray.put(b), ray.put(lut)

    def local_topk(t: pa.Table) -> pa.Table:
        bb, ll = ray.get(bref), ray.get(lref)
        m = _emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)
        if not len(m):
            return pa.table({"query_idx": pa.array([], pa.int32()),
                             id_col: t.column(id_col).slice(0, 0),
                             "score": pa.array([], pa.float64())})
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        codes = _pq_assign(_pq_split(m, bb.shape[0]), bb)  # (n, m)
        kk = min(k, len(m))
        qi, oi, sc = [], [], []
        cols = np.arange(bb.shape[0])
        for qj in range(ll.shape[0]):
            dist = ll[qj][cols, codes].sum(axis=1)  # (n,)
            sel = np.argpartition(dist, kk - 1)[:kk]
            qi.append(np.full(kk, qj, dtype=np.int32))
            oi.append(ids[sel])
            sc.append(-dist[sel])
        return pa.table({"query_idx": pa.array(np.concatenate(qi)),
                         id_col: pa.array(np.concatenate(oi)),
                         "score": pa.array(np.concatenate(sc))})

    partials = ds.select_columns([id_col, embedding_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, "score")

    return partials.groupby("query_idx").map_groups(merge, batch_format="pandas")


def ivf_pq_knn(ds, queries: np.ndarray, centroids: np.ndarray, codebooks: np.ndarray,
               *, embedding_col: str, id_col: str, k: int = 10, nprobe: int = 8):
    """The production large-scale ANN stack (IVFADC, Jégou et al. 2011
    §V): IVF coarse probing prunes the corpus to the queries' ``nprobe``
    nearest cells, then PQ-ADC scores only the survivors — per batch one
    small GEMM for the cell assignment plus LUT gathers; full vectors are
    touched once (for assignment) and never shipped. With
    ``nprobe == len(centroids)`` it degrades to pq_knn exactly."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    nprobe = min(nprobe, len(c))
    qprobes = np.argsort(-(q @ c.T), axis=1)[:, :nprobe]
    probe = np.unique(qprobes)
    cref, pref = ray.put(c.astype(np.float32)), ray.put(probe)

    def keep(t: pa.Table) -> pa.Table:
        cc, pp = ray.get(cref), ray.get(pref)
        m = _normalize(_emb_matrix(t, embedding_col, dtype=np.float32).astype(np.float64)).astype(np.float32)
        if not len(m):
            return t
        assign = np.argmax(m @ cc.T, axis=1)
        return t.filter(pa.array(np.isin(assign, pp)))

    return pq_knn(
        ds.select_columns([id_col, embedding_col]).map_batches(keep, batch_format="pyarrow"),
        np.asarray(queries, dtype=np.float64), codebooks,
        embedding_col=embedding_col, id_col=id_col, k=k,
    )

def semantic_decontaminate(ds, eval_vectors: np.ndarray, *,
                           embedding_col: str, threshold: float = 0.95,
                           action: str = "drop", score_col: str = "max_eval_sim"):
    """Embedding-space benchmark decontamination: score every corpus row
    by its MAX cosine similarity against the eval-set vectors and (with
    ``action='drop'``) remove rows at or above ``threshold`` — the
    semantic complement of the n-gram rules in
    ``dedup.find_contaminated`` / ``find_contaminated_tokens``
    (paraphrased or re-tokenized eval leakage that exact n-grams miss).

    ``action='tag'`` keeps every row and appends ``score_col`` (float64)
    for auditing / threshold calibration.

    Scale shape: the eval matrix is normalized once on the driver and
    broadcast via ``ray.put`` (benchmark suites are 10^4–10^6 rows — MBs
    to ~1 GB in the object store, read zero-copy by every task); each
    batch then does ONE dense GEMM and a row-max — map-only, no shuffle,
    the corpus embeddings never leave their block. Beyond ~10^6 eval
    rows, pre-cluster the eval side (``ivf_fit_centroids``) and probe
    per-cell; at that point the eval set is itself a corpus and this
    broadcast bound is documented rather than hidden.
    """
    if action not in ("drop", "tag"):
        raise ValueError("action must be 'drop' or 'tag'")
    ev = _normalize(np.asarray(eval_vectors, dtype=np.float64))
    if ev.ndim != 2 or not len(ev):
        raise ValueError("eval_vectors must be a non-empty (n, d) matrix")
    evref = ray.put(ev)

    def score(t: pa.Table) -> pa.Table:
        e = ray.get(evref)
        m = _normalize(_emb_matrix(t, embedding_col))
        if not len(m):
            sims = np.zeros(0, np.float64)
        else:
            sims = (m @ e.T).max(axis=1)
        if action == "tag":
            return t.append_column(score_col, pa.array(sims))
        return t.filter(pa.array(sims < threshold))

    return ds.map_batches(score, batch_format="pyarrow")
