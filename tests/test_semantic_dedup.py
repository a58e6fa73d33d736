"""semantic_dedup: planted exact clones are dropped, originals kept;
transitive chains collapse to one representative."""

import numpy as np
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
