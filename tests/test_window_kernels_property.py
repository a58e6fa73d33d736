"""Property-based tests: the O(n) window kernels must match pandas group
semantics for arbitrary key layouts, NaN patterns, and window sizes."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ballet_ray.functions import windows_np as wnp


@st.composite
def grouped_series(draw):
    n = draw(st.integers(1, 120))
    n_keys = draw(st.integers(1, 6))
    keys = np.sort(np.array(draw(st.lists(st.integers(0, n_keys - 1), min_size=n, max_size=n))))
    vals = np.array(draw(st.lists(st.floats(-100, 100, allow_nan=False), min_size=n, max_size=n)))
    nan_mask = np.array(draw(st.lists(st.booleans(), min_size=n, max_size=n)))
    vals = np.where(nan_mask, np.nan, vals)
    return keys, vals


@settings(max_examples=60, deadline=None, derandomize=True)
@given(grouped_series(), st.integers(-4, 4))
def test_lag_matches_pandas(data, k):
    keys, vals = data
    codes = wnp.group_codes(keys)
    got = wnp.lag(vals, codes, k)
    exp = pd.Series(vals).groupby(keys).shift(k).to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(grouped_series(), st.integers(1, 6))
def test_rolling_mean_matches_pandas(data, w):
    keys, vals = data
    codes = wnp.group_codes(keys)
    starts = wnp.group_starts(codes)
    got = wnp.rolling_mean(vals, starts, w)
    exp = (
        pd.Series(vals).groupby(keys).rolling(w, min_periods=1).mean().reset_index(drop=True).to_numpy()
    )
    assert np.allclose(got, exp, equal_nan=True, atol=1e-9)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(grouped_series())
def test_ffill_matches_pandas(data):
    keys, vals = data
    codes = wnp.group_codes(keys)
    starts = wnp.group_starts(codes)
    got = wnp.ffill(vals, starts)
    exp = pd.Series(vals).groupby(keys).ffill().to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(grouped_series(), st.integers(1, 1000))
def test_sessionize_matches_pandas(data, gap):
    keys, vals = data
    n = len(keys)
    # build per-group increasing timestamps with random deltas
    rng = np.random.RandomState(0)
    deltas = rng.randint(1, 2000, n).astype(np.int64)
    codes = wnp.group_codes(keys)
    starts = wnp.group_starts(codes)
    ts = np.zeros(n, dtype=np.int64)
    for i in range(n):
        ts[i] = deltas[i] if i == starts[i] else ts[i - 1] + deltas[i]
    got = wnp.sessionize(ts, codes, gap)
    s = pd.Series(ts)
    gapped = s.groupby(keys).diff() > gap
    exp = gapped.groupby(keys).cumsum().to_numpy()
    assert (got == exp).all()


@settings(max_examples=40, deadline=None, derandomize=True)
@given(grouped_series())
def test_cum_count_matches_pandas(data):
    keys, vals = data
    codes = wnp.group_codes(keys)
    got = wnp.cum_count(codes)
    exp = pd.Series(vals).groupby(keys).cumcount().to_numpy()
    assert (got == exp).all()


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50_000), min_size=0, max_size=40),
        min_size=1,
        max_size=25,
    )
)
def test_token_minhash_matches_naive(rows):
    """The vectorized masked-reduceat signer must equal a naive per-row
    implementation built from the same mix/permutation primitives."""
    import numpy as np

    from ballet_ray.functions.hashing import mix
    from ballet_ray.stages.dedup import TokenMinHasher

    tm = TokenMinHasher(num_perm=16, k=3)
    flat = np.concatenate([np.asarray(r, dtype=np.int64) for r in rows]) if any(rows) else np.empty(0, np.int64)
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    off[1:] = np.cumsum([len(r) for r in rows])
    got = tm.signatures_from_flat(flat, off)

    for i, r in enumerate(rows):
        toks = np.asarray(r, dtype=np.uint64)
        padded = np.concatenate([toks, np.zeros(tm.k - 1, dtype=np.uint64)])
        if len(toks) == 0:
            # masked sentinel: max of the 32-bit permutation dtype
            assert (got[i] == np.iinfo(np.uint32).max).all()
            continue
        sh = mix(*[padded[j : len(toks) + j] for j in range(tm.k)])
        sh32 = (sh >> np.uint64(32)).astype(np.uint32)
        with np.errstate(over="ignore"):
            expect = (sh32[:, None] * tm.a[None, :] + tm.b[None, :]).min(axis=0)
        assert (got[i] == expect).all(), i


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=0, max_size=12),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_pack_unpack_roundtrip_property(rows, slice_from):
    import pyarrow as pa

    from ballet_ray.stages.joins import pack_list_columns, unpack_list_columns

    t = pa.table(
        {
            "id": list(range(len(rows))),
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
        }
    )
    sliced = t.slice(min(slice_from, len(rows) - 1))
    back = unpack_list_columns(pack_list_columns(sliced))
    assert back.column("tokens").to_pylist() == sliced.column("tokens").to_pylist()
    assert back.column("id").to_pylist() == sliced.column("id").to_pylist()


def test_token_minhash_k1_empty_rows_sentinel():
    """k==1 inserts no pad tokens, so an empty row's reduceat start equals
    its successor's — the signer must still emit the UINT32_MAX sentinel,
    never the neighbor's first permutation value."""
    import numpy as np

    from ballet_ray.stages.dedup import TokenMinHasher

    tm = TokenMinHasher(num_perm=8, k=1)
    rows = [[5, 9], [], [7], []]
    flat = np.concatenate([np.asarray(r, dtype=np.int64) for r in rows if r])
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    off[1:] = np.cumsum([len(r) for r in rows])
    got = tm.signatures_from_flat(flat, off)
    umax = np.iinfo(np.uint32).max
    assert (got[1] == umax).all()
    assert (got[3] == umax).all()
    assert not (got[0] == umax).all()
    assert not (got[2] == umax).all()


@given(
    data=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=400
    ),
    k=st.sampled_from([8, 32, 128]),
    nsplit=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=40, deadline=None)
def test_kll_merge_any_split_equals_single_feed(data, k, nsplit):
    """Feeding a stream whole vs merging arbitrary chunk sketches must
    agree: both are valid KLL states whose quantiles stay within the
    sketch's rank-error bound of the true discrete quantile."""
    import numpy as np

    from ballet_ray.stages.sketches import _KLL

    x = np.asarray(data)
    whole = _KLL(k)
    whole.add(x)
    merged = _KLL(k)
    for chunk in np.array_split(x, nsplit):
        part = _KLL(k)
        part.add(chunk)
        merged.merge(part)
    xs = np.sort(x)
    for q in (0.25, 0.5, 0.9):
        for sk in (whole, merged):
            v = sk.quantiles([q])[0]
            rank = np.searchsorted(xs, v, side="right") / len(xs)
            lo_rank = np.searchsorted(xs, v, side="left") / len(xs)
            # rank error bound: generous 4/k + slack for tiny inputs
            eps = 4.0 / k + 1.0 / max(len(xs), 1)
            assert lo_rank - eps <= q <= rank + eps


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=40
    )
)
@settings(max_examples=40, deadline=None)
def test_word_repetition_property_matches_counter(texts):
    import collections

    import pyarrow as pa

    from ballet_ray.stages.text import WordRepetition

    t = pa.table({"text": pa.array(texts, pa.string())})
    out = WordRepetition().transform_table(t, ["text"])
    for txt, d, tp in zip(
        texts,
        out.column("dup_word_frac").to_pylist(),
        out.column("top_word_frac").to_pylist(),
    ):
        ws = txt.split(" ")
        cnt = collections.Counter(ws)
        L = max(len(ws), 1)
        assert abs(d - (1 - len(cnt) / L)) < 1e-12
        assert abs(tp - max(cnt.values()) / L) < 1e-12


@settings(max_examples=60, deadline=None, derandomize=True)
@given(grouped_series(), st.floats(0.01, 1.0))
def test_ewm_matches_pandas(data, alpha):
    keys, vals = data
    vals = np.nan_to_num(vals, nan=0.0)  # kernel contract: null-free input
    codes = wnp.group_codes(keys)
    got = wnp.ewm_mean(vals, codes, alpha)
    exp = (
        pd.Series(vals).groupby(keys).transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean()).to_numpy()
    )
    assert np.allclose(got, exp, atol=1e-8)
