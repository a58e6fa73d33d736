"""Product quantization (similarity.pq_fit / pq_encode / pq_knn)."""

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.stages.similarity import pq_encode, pq_fit, pq_knn


def _make_ds(vecs, parts=3):
    return rd.from_items(
        [{"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(vecs)]
    ).repartition(parts)


def _clusters(seed=5, n_clusters=6, per=30, d=16, spread=0.05):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d) * 3.0
    vecs = np.concatenate([c + spread * rng.randn(per, d) for c in centers])
    labels = np.repeat(np.arange(n_clusters), per)
    return vecs.astype(np.float32), labels


def test_exact_mode_matches_brute_l2():
    # m=1 subspace, K >= #vectors: every vector is its own codeword after
    # refine, so ADC distance == exact L2 distance
    vecs, _ = _clusters(per=8, n_clusters=4, d=8)  # 32 vectors
    ds = _make_ds(vecs)
    books = pq_fit(ds, embedding_col="embedding", m_subspaces=1, n_codes=64,
                   sample_size=64, local_iters=20, refine_iters=2)
    q = vecs[:3] + 0.01
    out = pq_knn(ds, q, books, embedding_col="embedding", id_col="vec_id", k=3).to_pandas()
    for qi in range(3):
        d2 = ((vecs.astype(np.float64) - q[qi].astype(np.float64)) ** 2).sum(axis=1)
        exp = set(np.argsort(d2)[:3])
        got = set(out[out["query_idx"] == qi]["vec_id"])
        assert got == exp


def test_encode_shapes_and_determinism():
    vecs, _ = _clusters()
    books = pq_fit(_make_ds(vecs, 2), embedding_col="embedding",
                   m_subspaces=4, n_codes=16, sample_size=256)
    assert books.shape == (4, 16, 4)
    a = pq_encode(_make_ds(vecs, 1), books, embedding_col="embedding",
                  id_col="vec_id").to_pandas().set_index("vec_id").sort_index()
    b = pq_encode(_make_ds(vecs, 5), books, embedding_col="embedding",
                  id_col="vec_id").to_pandas().set_index("vec_id").sort_index()
    assert len(a) == len(vecs)
    for i in a.index:
        assert list(a.loc[i, "pq_code"]) == list(b.loc[i, "pq_code"])
    assert all(len(c) == 4 for c in a["pq_code"])


def test_fit_deterministic_across_partitionings():
    vecs, _ = _clusters()
    b1 = pq_fit(_make_ds(vecs, 1), embedding_col="embedding",
                m_subspaces=4, n_codes=8, sample_size=256, refine_iters=1)
    b2 = pq_fit(_make_ds(vecs, 6), embedding_col="embedding",
                m_subspaces=4, n_codes=8, sample_size=256, refine_iters=1)
    np.testing.assert_allclose(b1, b2, atol=1e-5)


def test_refine_reduces_quantization_error():
    vecs, _ = _clusters(per=50, n_clusters=8)
    ds = _make_ds(vecs, 4)

    def qerr(books):
        from ballet_ray.stages.similarity import _pq_assign, _pq_split

        sub = _pq_split(vecs.astype(np.float64), books.shape[0])
        codes = _pq_assign(sub, books.astype(np.float64))
        rec = books.astype(np.float64)[np.arange(books.shape[0]), codes]  # (n, m, dsub)
        return float(((sub - rec) ** 2).sum())

    b0 = pq_fit(ds, embedding_col="embedding", m_subspaces=4, n_codes=16,
                sample_size=128, local_iters=3, refine_iters=0)
    b2 = pq_fit(ds, embedding_col="embedding", m_subspaces=4, n_codes=16,
                sample_size=128, local_iters=3, refine_iters=3)
    assert qerr(b2) <= qerr(b0) + 1e-9


def test_recall_on_planted_clusters():
    vecs, labels = _clusters(n_clusters=6, per=30, d=16)
    ds = _make_ds(vecs, 4)
    books = pq_fit(ds, embedding_col="embedding", m_subspaces=4, n_codes=32,
                   sample_size=256, refine_iters=1)
    rng = np.random.RandomState(11)
    qidx = rng.choice(len(vecs), 10, replace=False)
    out = pq_knn(ds, vecs[qidx], books, embedding_col="embedding",
                 id_col="vec_id", k=5).to_pandas()
    # every retrieved neighbor should come from the query's own cluster
    hits = sum(
        labels[int(r["vec_id"])] == labels[qidx[int(r["query_idx"])]]
        for _, r in out.iterrows()
    )
    assert hits / len(out) >= 0.95


def test_dim_not_divisible_raises():
    vecs, _ = _clusters(d=10)
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(_make_ds(vecs), embedding_col="embedding", m_subspaces=4,
               n_codes=8, sample_size=64)


def test_ivf_pq_full_probe_equals_pq():
    from ballet_ray.stages.similarity import ivf_fit_centroids, ivf_pq_knn

    vecs, _ = _clusters(n_clusters=4, per=20, d=16)
    ds = _make_ds(vecs, 3)
    cents = ivf_fit_centroids(ds, embedding_col="embedding", n_centroids=8,
                              sample_size=128, iters=2)
    books = pq_fit(ds, embedding_col="embedding", m_subspaces=4, n_codes=16,
                   sample_size=256, refine_iters=1)
    q = vecs[[3, 41]]
    full = ivf_pq_knn(ds, q, cents, books, embedding_col="embedding",
                      id_col="vec_id", k=5, nprobe=len(cents)).to_pandas()
    ref = pq_knn(ds, q, books, embedding_col="embedding", id_col="vec_id", k=5).to_pandas()
    for qi in (0, 1):
        a = set(full[full["query_idx"] == qi]["vec_id"])
        b = set(ref[ref["query_idx"] == qi]["vec_id"])
        assert a == b


def test_ivf_pq_probe_recall():
    from ballet_ray.stages.similarity import ivf_fit_centroids, ivf_pq_knn

    vecs, labels = _clusters(n_clusters=6, per=30, d=16)
    ds = _make_ds(vecs, 4)
    cents = ivf_fit_centroids(ds, embedding_col="embedding", n_centroids=12,
                              sample_size=256, iters=3)
    books = pq_fit(ds, embedding_col="embedding", m_subspaces=4, n_codes=32,
                   sample_size=256, refine_iters=1)
    q = vecs[[0, 45, 100]]
    out = ivf_pq_knn(ds, q, cents, books, embedding_col="embedding",
                     id_col="vec_id", k=5, nprobe=3).to_pandas()
    hits = sum(labels[int(r["vec_id"])] == labels[[0, 45, 100][int(r["query_idx"])]]
               for _, r in out.iterrows())
    assert hits / len(out) >= 0.9
