"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are Dataset→Dataset and shuffle only small derived columns (hashes,
signatures, pair ids) — never the payload. Patterns follow the standard
published LSH constructions (Broder '97 minhash, Charikar '02 simhash):

- exact:   md5(content) → groupby(hash) → keep min id      (one shuffle of ids)
- minhash: word-shingles → k minhashes → b bands → groupby (band, band_hash)
           → candidate pairs → estimated Jaccard from signature agreement
- simhash: 64-bit hyperplane-free signature; near-dup = small Hamming
           distance found via band buckets
- ngram-jaccard: exact verification of candidate pairs (hash-join texts in)
- embedding: cosine ≥ threshold within LSH buckets (see similarity.py)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ballet_ray.functions.hashing import mix
from ballet_ray.stages.text import _WORD_RE


def add_content_hash(ds, col: str, out: str = "content_md5"):
    def f(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        return t.append_column(
            out, pa.array([hashlib.md5(v.encode()).hexdigest() if v is not None else None for v in vals])
        )

    return ds.map_batches(f, batch_format="pyarrow")


def exact_dedup(ds, col: str, id_col: str):
    """Keep one row per distinct value of ``col`` (the min ``id_col`` —
    deterministic). Shuffles only (hash, id); payload never moves: winners
    are selected as an id set, then the full rows are semi-join filtered."""
    hashed = add_content_hash(ds.select_columns([col, id_col]), col)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    winners = (
        hashed.groupby("content_md5")
        .map_groups(keep_first, batch_format="pandas")
        .select_columns([id_col])
    )
    ids = winners.to_pandas()[id_col].to_numpy()
    from ballet_ray.stages.joins import semi_join_filter

    return semi_join_filter(ds, ids, key=id_col)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (uint64)."""
    ws = _WORD_RE.findall(text.lower()) if text else []
    if len(ws) < k:
        ws = ws + ["_"] * (k - len(ws))
    sh = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
        )
    return out


class MinHasher:
    """Actor-pool stage: text → num_perm minhash values (vectorized over
    shingles with the affine-permutation trick a*x+b over uint64)."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 1754):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**62, size=num_perm).astype(np.uint64) | np.uint64(1)
        self.b = rng.randint(0, 2**62, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        with np.errstate(over="ignore"):
            m = (sh[:, None] * self.a[None, :] + self.b[None, :]).min(axis=0)
        return m

    def __call__(self, table: pa.Table) -> pa.Table:
        texts = table.column("text").to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else np.empty((0, self.num_perm), np.uint64)
        # store as fixed-size list of int64 (reinterpreted bits)
        flat = sigs.astype(np.int64).ravel()
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), self.num_perm)
        return table.append_column("minhash", arr)


def minhash_lsh_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    est_threshold: float = 0.5,
    concurrency: int = 4,
):
    """Near-duplicate candidate pairs via MinHash-LSH.

    sign → explode to (band, band_hash, id, sig) rows → groupby band bucket
    → pairs within bucket → dedupe pairs → estimated Jaccard = fraction of
    agreeing minhashes; keep pairs ≥ est_threshold.
    Returns a Dataset of (id_a, id_b, est_jaccard).
    """
    rows_per_band = num_perm // bands

    projected = ds.select_columns([id_col, text_col])
    signed = projected.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm, "k": shingle_k},
        batch_format="pyarrow", concurrency=concurrency,
    )

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig = np.asarray(t.column("minhash").combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(len(ids), num_perm)
        out_ids, out_band, out_bh, out_sig = [], [], [], []
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band].astype(np.uint64)
            # process-stable band hash (builtin hash() is salted per process
            # and would break cross-task bucketing)
            bh = (mix(*[seg[:, j] for j in range(rows_per_band)]) >> np.uint64(1)).astype(np.int64)
            out_ids.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_bh.append(bh)
            out_sig.append(sig)
        sigs = np.concatenate(out_sig)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids)),
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_bh)),
                "minhash": pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel()), num_perm),
            }
        )

    exploded = signed.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        g = g.sort_values(id_col).reset_index(drop=True)
        sigs = np.stack(g["minhash"].to_numpy())
        ids = g[id_col].to_numpy()
        ia, ib, est = [], [], []
        for i in range(len(g)):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for j_off, e in enumerate(agree):
                if e >= est_threshold:
                    ia.append(ids[i])
                    ib.append(ids[i + 1 + j_off])
                    est.append(float(e))
        return pd.DataFrame({"id_a": ia, "id_b": ib, "est_jaccard": est})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a pair can surface from several bands — dedupe
    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dd, batch_format="pandas")


class SimHasher:
    """64-bit SimHash over word hashes (Charikar '02)."""

    def __init__(self):
        self.word = _WORD_RE

    def signature(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in self.word.findall(text.lower()) if text else []:
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
            acc += np.where(bits == 1, 1, -1)
        sig = np.packbits((acc > 0).astype(np.uint8))
        return int.from_bytes(sig.tobytes(), "little")

    def __call__(self, table: pa.Table) -> pa.Table:
        texts = table.column("text").to_pylist()
        sigs = np.array([self.signature(t) for t in texts], dtype=np.uint64)
        return table.append_column("simhash", pa.array(sigs.astype(np.int64)))


def simhash_pairs(ds, *, id_col: str = "doc_id", max_hamming: int = 3, concurrency: int = 4):
    """Near-dup pairs whose 64-bit simhash Hamming distance <= max_hamming.
    Bucket by each of 4 16-bit bands (pigeonhole: distance<=3 ⇒ at least one
    band equal), verify distance within buckets."""
    signed = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for b in range(4):
            band = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        id_col: pa.array(ids),
                        "band": pa.array(np.full(len(ids), b, dtype=np.int32)),
                        "band_val": pa.array(band),
                        "simhash": pa.array(sig.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = signed.select_columns([id_col, "simhash"]).map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values(id_col).reset_index(drop=True)
        sigs = g["simhash"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy()
        ia, ib, hd = [], [], []
        for i in range(len(g)):
            x = sigs[i + 1 :] ^ sigs[i]
            dist = np.array([bin(int(v)).count("1") for v in x])
            for j_off in np.flatnonzero(dist <= max_hamming):
                ia.append(ids[i])
                ib.append(ids[i + 1 + j_off])
                hd.append(int(dist[j_off]))
        return pd.DataFrame({"id_a": ia, "id_b": ib, "hamming": hd})

    pairs = exploded.groupby(["band", "band_val"]).map_groups(bucket_pairs, batch_format="pandas")

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dd, batch_format="pandas")


def assign_clusters(pairs, *, id_col: str = "doc_id", max_rounds: int = 10):
    """Near-dup pairs → per-id cluster representative (the minimum id of its
    connected component) via iterative min-label propagation: each round is
    a flat emission of (node, candidate_label) edges in both directions
    plus self-labels, reduced by a grouped min — no driver-side union-find,
    so component assignment scales with the pair count. Converges in
    O(diameter) rounds; near-dup clusters are almost always tiny, so
    ``max_rounds`` is a formality. Returns (id, cluster_rep) rows for every
    id that appears in a pair."""
    import ray.data as rdata

    from ray.data.aggregate import Min

    def seed(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.concatenate([a, b])),
                "label": pa.array(np.concatenate([np.minimum(a, b)] * 2)),
            }
        )

    labels = (
        pairs.map_batches(seed, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Min("label", alias_name="label"))
    )
    edges = pairs.select_columns(["id_a", "id_b"]).to_pandas()

    for _ in range(max_rounds):
        ldf = labels.to_pandas()
        lmap = dict(zip(ldf[id_col], ldf["label"]))
        la = edges["id_a"].map(lmap)
        lb = edges["id_b"].map(lmap)
        if (la == lb).all():
            break
        prop = pd.DataFrame(
            {
                id_col: np.concatenate([edges["id_a"], edges["id_b"], ldf[id_col]]),
                "label": np.concatenate([np.minimum(la, lb)] * 2 + [ldf["label"]]),
            }
        )
        labels = (
            rdata.from_pandas(prop)
            .groupby(id_col)
            .aggregate(Min("label", alias_name="label"))
        )
    return labels.map_batches(
        lambda t: t.rename_columns([id_col, "cluster_rep"]), batch_format="pyarrow"
    )


def dedup_by_minhash(ds, *, text_col: str = "text", id_col: str = "doc_id", **lsh_kwargs):
    """End-to-end near-dedup: MinHash-LSH candidate pairs → connected
    components → keep one representative row (the min id) per cluster."""
    pairs = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col, **lsh_kwargs)
    clusters = assign_clusters(pairs, id_col=id_col).to_pandas()
    losers = clusters[clusters[id_col] != clusters["cluster_rep"]][id_col].to_numpy()
    from ballet_ray.stages.joins import semi_join_filter

    return semi_join_filter(ds, losers, key=id_col, invert=True)


def ngram_jaccard_pairs(ds, pairs, *, text_col="text", id_col="doc_id", k: int = 3, threshold: float = 0.0):
    """Exact n-gram Jaccard for candidate pairs. The texts of both sides are
    attached via broadcast lookups (candidate sets are small relative to the
    corpus; at larger pair counts switch to two hash joins)."""
    import ray

    texts = ds.select_columns([id_col, text_col]).to_pandas()
    ref = ray.put(dict(zip(texts[id_col], texts[text_col])))

    def verify(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        ja = []
        for a, b in zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist()):
            sa = set(_shingle_hashes(lookup.get(a, ""), k).tolist())
            sb = set(_shingle_hashes(lookup.get(b, ""), k).tolist())
            ja.append(len(sa & sb) / max(1, len(sa | sb)))
        out = t.append_column("jaccard", pa.array(ja, type=pa.float64()))
        return out.filter(pa.array(np.asarray(ja) >= threshold))

    return pairs.map_batches(verify, batch_format="pyarrow")
