"""semantic_dedup: planted exact clones are dropped, originals kept;
transitive chains collapse to one representative."""

import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from ballet_ray.stages.similarity import semantic_dedup


def _ds(vectors, ids):
    t = pa.table({"vec_id": ids, "embedding": pa.array([v.tolist() for v in vectors], pa.list_(pa.float32()))})
    return rd.from_arrow(t).repartition(4)


def test_semantic_dedup_planted_clones():
    rng = np.random.default_rng(9)
    base = rng.normal(size=(150, 16)).astype(np.float32)
    ids = list(range(150)) + [1000 + i for i in range(0, 150, 5)]  # clone every 5th
    vecs = list(base) + [base[i] for i in range(0, 150, 5)]
    dropped = semantic_dedup(
        _ds(vecs, ids), embedding_col="embedding", id_col="vec_id", dim=16,
        threshold=0.999, n_centroids=8, kmeans_iters=2,
    ).to_pandas()
    assert sorted(dropped.vec_id) == [1000 + i for i in range(0, 150, 5)]


def test_semantic_dedup_transitive_component():
    # 4 copies of one vector under different ids -> keep only the min id
    rng = np.random.default_rng(1)
    base = rng.normal(size=(40, 8)).astype(np.float32)
    ids = list(range(40)) + [100, 200, 300]
    vecs = list(base) + [base[7], base[7], base[7]]
    dropped = semantic_dedup(
        _ds(vecs, ids), embedding_col="embedding", id_col="vec_id", dim=8,
        threshold=0.999, n_centroids=4, kmeans_iters=2,
    ).to_pandas()
    assert sorted(dropped.vec_id) == [100, 200, 300]


def test_semantic_dedup_keep_best():
    """keep_col retention: the kept component member is the best-scoring
    copy, not the min id."""
    rng = np.random.default_rng(1)
    base = rng.normal(size=(40, 8)).astype(np.float32)
    ids = list(range(40)) + [100, 200, 300]
    vecs = list(base) + [base[7], base[7], base[7]]
    scores = [0.0] * 43
    scores[ids.index(200)] = 9.0  # id 200 is the highest-quality copy
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "score": scores,
        }
    )
    dropped = semantic_dedup(
        rd.from_arrow(t).repartition(4), embedding_col="embedding",
        id_col="vec_id", dim=8, threshold=0.999, n_centroids=4, kmeans_iters=2,
        keep_col="score",
    ).to_pandas()
    assert sorted(dropped.vec_id) == [7, 100, 300]

    # no near-dups: empty drop set, not a crash on schema-less components
    t2 = pa.table(
        {
            "vec_id": list(range(20)),
            "embedding": pa.array([v.tolist() for v in base[:20]], pa.list_(pa.float32())),
            "score": [0.0] * 20,
        }
    )
    dropped2 = semantic_dedup(
        rd.from_arrow(t2), embedding_col="embedding", id_col="vec_id", dim=8,
        threshold=0.999, n_centroids=4, kmeans_iters=2, keep_col="score",
    ).to_pandas()
    assert len(dropped2) == 0


def test_diversity_sample_kcenter():
    from ballet_ray.stages.similarity import diversity_sample

    rng = np.random.default_rng(21)
    # 5 tight, well-separated gaussian clusters of 60 points each
    centers = rng.normal(size=(5, 12)) * 10
    vecs, labels = [], []
    for ci, c in enumerate(centers):
        pts = c + rng.normal(scale=0.05, size=(60, 12))
        vecs += list(pts.astype(np.float32))
        labels += [ci] * 60
    ids = list(range(len(vecs)))
    ds = _ds(vecs, ids)

    picked = diversity_sample(
        ds, embedding_col="embedding", id_col="vec_id", dim=12, k=15,
        n_centroids=4, kmeans_iters=2,
    ).to_pandas()
    assert len(picked) >= 15
    # k-center property: the picks cover every planted cluster
    covered = {labels[i] for i in picked.vec_id}
    assert covered == {0, 1, 2, 3, 4}
    # deterministic under repartitioning
    again = diversity_sample(
        _ds(vecs, ids), embedding_col="embedding", id_col="vec_id", dim=12, k=15,
        n_centroids=4, kmeans_iters=2,
    ).to_pandas()
    assert sorted(zip(picked.vec_id, picked.pick_order)) == sorted(zip(again.vec_id, again.pick_order))

def test_semantic_decontaminate_drop_and_tag():
    from ballet_ray.stages.similarity import semantic_decontaminate

    rng = np.random.default_rng(17)
    base = rng.normal(size=(120, 16)).astype(np.float32)
    ev = base[:4].astype(np.float64)           # eval set = first 4 vectors
    near = ev[0] + rng.normal(scale=1e-3, size=16)  # a paraphrase-grade near copy
    vecs = list(base) + [near.astype(np.float32)]
    ids = list(range(120)) + [9000]

    kept = semantic_decontaminate(
        _ds(vecs, ids), ev, embedding_col="embedding", threshold=0.95
    ).to_pandas()
    # exactly the eval originals and the planted near-copy are gone
    assert set(range(120)) - set(kept.vec_id) == {0, 1, 2, 3}
    assert 9000 not in set(kept.vec_id)

    # tag mode: scores match a brute numpy reference exactly
    tagged = semantic_decontaminate(
        _ds(vecs, ids), ev, embedding_col="embedding", action="tag"
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    m = np.stack([np.asarray(v, np.float64) for v in vecs])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    e = ev / np.linalg.norm(ev, axis=1, keepdims=True)
    want = (m @ e.T).max(axis=1)
    order = np.argsort(ids)
    np.testing.assert_allclose(tagged["max_eval_sim"].to_numpy(), want[order], rtol=0, atol=1e-12)
    assert len(tagged) == len(vecs)

    with pytest.raises(ValueError):
        semantic_decontaminate(_ds(vecs, ids), ev, embedding_col="embedding", action="x")

def test_in_context_ordering_composition():
    """In-context pretraining order (Shi 2023, arXiv:2310.10638): topic
    clustering composed with the curriculum form of the deterministic
    global order — docs of one topic get a CONTIGUOUS shuffle_idx range,
    so downstream (order-preserving) chunk+pack fills each pack with
    related docs. Pure composition of existing stages: cluster_embeddings
    → global_shuffle_index(bucket_col='cluster')."""
    from ballet_ray.stages.sampling import global_shuffle_index
    from ballet_ray.stages.similarity import cluster_embeddings

    rng = np.random.default_rng(31)
    centers = rng.normal(size=(4, 12)) * 10
    vecs, labels = [], []
    for ci, c in enumerate(centers):
        pts = c + rng.normal(scale=0.05, size=(50, 12))
        vecs += list(pts.astype(np.float32))
        labels += [ci] * 50
    ids = list(range(len(vecs)))

    tagged, cents = cluster_embeddings(
        _ds(vecs, ids), embedding_col="embedding", n_clusters=4,
        sample_size=64, iters=4)
    k = len(cents)
    ordered = global_shuffle_index(
        tagged, key_col="vec_id", bucket_col="cluster", n_buckets=k
    ).to_pandas().sort_values("shuffle_idx")

    # dense 0..N-1 permutation, and each k-means cell is one contiguous run
    assert list(ordered["shuffle_idx"]) == list(range(len(vecs)))
    runs = ordered["cluster"].to_numpy()
    assert (np.diff(runs) >= 0).all()          # cells in sequence
    # the planted clusters are recovered: every cell maps to ONE label
    by_cell = ordered.groupby("cluster")["vec_id"].apply(
        lambda s: {labels[i] for i in s})
    assert all(len(v) == 1 for v in by_cell)
