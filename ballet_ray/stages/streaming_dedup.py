"""Online (streaming/incremental) exact dedup — a shared mutable
membership index over sharded Bloom-filter actors.

Batch ``exact_dedup`` (stages/dedup.py) answers "dedupe this closed
corpus" with a keyed shuffle. Ingest pipelines need the OTHER question:
"have I ever seen this content before, across every batch and every run
of an append-only stream?" — a shared mutable index, which is exactly the
case the Dataset API cannot express and raw Ray actors are for (the one
(c)-tier fallback in this package; everything else is map_batches).

Design:

- ``num_shards`` :class:`BloomShard` actors, each owning a fixed
  ``bits``-wide Bloom filter (numpy uint64 bitset, k probes by double
  hashing — vectorized, no per-row Python). A content hash routes to
  shard ``h % num_shards``, so shards never coordinate and scale reads
  linearly; per-shard calls serialize (actor semantics) which is what
  makes check-then-add atomic.
- :func:`streaming_exact_dedup` wraps a corpus pass: each batch hashes
  its content column (one vectorized pass), sends each shard ONE rpc with
  its hash slice, keeps first-in-batch occurrences whose probe says
  "never seen", and sets the bits. Batches carry only uint64 hashes to
  the actors — never the payload.

Semantics: at-most-one survivor per distinct content, first-arrival wins
(arrival order is the stream's order, not deterministic under parallel
re-execution — this is the documented streaming trade; use batch
``exact_dedup`` when a canonical winner matters). False positives drop a
unique row with probability ≈ (1 − e^{−kn/bits})^k — size ``bits`` ≥
~10 n for ε < 1 % at k=7; false negatives are impossible, so no
duplicate ever survives.

State persists for the lifetime of the actors: pass the same
``handles`` to successive datasets to dedup a multi-day ingest, and
:meth:`BloomShard.state` / ``restore`` round-trip the bitsets through
any store for job-level resume.

Retry hazard (and why retries are disabled): the shards are MUTATED as a
side effect of the map stage. If Ray re-executed a batch (task retry,
lost-object reconstruction, speculative re-run), the replayed batch's
hashes would already be set in the filters and every row in it would be
silently dropped. All three streaming passes therefore run their
map_batches with ``max_retries=0`` / ``retry_exceptions=False``
(``_NO_RETRY``): a worker loss fails the job loudly instead of corrupting
the output, and job-level resume goes through the checkpointed
``state()``/``restore()`` blobs, which snapshot BEFORE the failed pass.

Probe hazard (the plan-level twin of the retry hazard): the lazy Dataset
chain these stages return must be EXECUTED EXACTLY ONCE. Anything that
partially executes the plan a first time — ``ds.schema(fetch_if_missing=
True)`` / a ``limit(1)`` peek, a FeatureEngineeringPipeline fit's schema
probe, ``hash_join``'s side-schema probe, or simply consuming the dataset
twice — inserts the probed blocks' hashes, after which the real execution
sees them as already-present and silently drops those docs (behind a join
barrier the probe runs EVERY upstream block, suppressing the entire
corpus). Place the streaming-dedup stage LAST, immediately before the one
consuming ``write_parquet``/``materialize``/aggregate, with all fits,
probes and joins upstream of it — the pattern ``jobs/run.py`` follows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_U64 = np.uint64

# Side-effecting stages must never be re-executed (see module docstring):
# a replayed batch finds its own hashes already set and drops every row.
_NO_RETRY = {"max_retries": 0, "retry_exceptions": False}


def _probes(h: np.ndarray, k: int, bits: int) -> np.ndarray:
    """(k, n) probe positions by double hashing: h1 + i·h2 mod bits."""
    from ballet_ray.functions.hashing import splitmix64

    h1 = h % _U64(bits)
    h2 = splitmix64(h ^ _U64(0x9E3779B97F4A7C15)) % _U64(bits - 1) + _U64(1)
    i = np.arange(k, dtype=_U64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % _U64(bits)


class _BloomCore:
    """The filter itself — plain object so it is unit-testable without Ray.

    ``check_and_add`` takes an internal lock: the actor runs THREADED
    (``max_concurrency`` > 1) so its call queue is unordered — a Ray
    ordered actor queue cancels everything after 30 s when one caller's
    earlier seq_no stalls in a loaded cluster (observed killing the
    ingest stage when it ran beside full-width stages). The lock restores
    the atomic check-then-add the dedup semantics need."""

    def __init__(self, bits: int = 1 << 27, k: int = 7):
        import threading

        self.bits, self.k = int(bits), int(k)
        self.words = np.zeros((self.bits + 63) // 64, dtype=_U64)
        self._lock = threading.Lock()

    def check_and_add(self, h: np.ndarray) -> np.ndarray:
        """For each hash: True iff NOT seen before this call (and mark it
        seen). Duplicate hashes within one call: only the first is True."""
        h = np.asarray(h, dtype=_U64)
        if not len(h):
            return np.zeros(0, dtype=bool)
        # first occurrence within the call
        _, first_idx = np.unique(h, return_index=True)
        is_first = np.zeros(len(h), dtype=bool)
        is_first[first_idx] = True
        pos = _probes(h, self.k, self.bits)  # (k, n)
        w, b = pos >> _U64(6), pos & _U64(63)
        with self._lock:
            member = ((self.words[w] >> b) & _U64(1)).astype(bool).all(axis=0)
            fresh = is_first & ~member
            if fresh.any():
                wf, bf = w[:, fresh].ravel(), b[:, fresh].ravel()
                np.bitwise_or.at(self.words, wf, _U64(1) << bf)
        return fresh

    def state(self) -> bytes:
        """Snapshot the bitset, stamped with the hash backend that wrote
        it (header ``BLM2`` + 24-byte backend tag) — a restore under a
        different backend must fail loudly, not silently stop suppressing
        replays (the hashes would no longer line up bit-for-bit)."""
        from ballet_ray.functions.partition import hash_backend

        tag = hash_backend().encode()[:24].ljust(24, b"\0")
        with self._lock:
            return b"BLM2" + tag + self.words.tobytes()

    def restore(self, blob: bytes) -> None:
        from ballet_ray.functions.partition import hash_backend

        if blob[:4] != b"BLM2":
            raise ValueError(
                "BloomShard.restore: blob has no hash-backend stamp (written "
                "by a pre-stamp build, or not a BloomShard state blob). "
                "Hash defaults changed md5->siphash across builds; an "
                "unstamped bitset cannot be trusted to match this build's "
                "hashes — re-ingest instead of restoring."
            )
        tag = blob[4:28].rstrip(b"\0").decode()
        here = hash_backend()
        if tag != here:
            raise ValueError(
                f"BloomShard.restore: state was written under hash backend "
                f"{tag!r} but this environment resolves to {here!r}; the "
                f"bitsets are incompatible — re-ingest."
            )
        with self._lock:
            self.words = np.frombuffer(blob[28:], dtype=_U64).copy()


@ray.remote
class BloomShard(_BloomCore):
    """One shard of the shared membership index (actor = atomic
    check-then-add per call)."""


def make_bloom_index(num_shards: int = 8, *, bits: int = 1 << 27, k: int = 7) -> list:
    """Create the sharded index. ~``bits/8`` bytes per shard (16 MB at
    2^27); size total bits ≥ ~10× expected distinct rows.

    Shards take ``num_cpus=0`` (each rpc is a microseconds-scale bitset
    probe; claiming a CPU slot would let a saturated map stage starve the
    actors out of the scheduler) and ``max_concurrency=8`` (threaded ⇒
    UNORDERED call queue: Ray's ordered queue cancels all queued calls
    after 30 s when one caller's earlier seq_no stalls under cluster
    load; the bitset mutation is serialized by the core's own lock)."""
    return [BloomShard.options(num_cpus=0, max_concurrency=8).remote(bits=bits, k=k)
            for _ in range(num_shards)]


def streaming_minhash_dedup(
    ds, *, handles: list, id_col: str = "doc_id", text_col: str | None = "text",
    tokens_col: str | None = None, num_perm: int = 64, bands: int = 16,
    shingle_k: int = 3, seed: int = 1754,
):
    """Online NEAR-dedup: keep a document iff NONE of its MinHash-LSH band
    keys was ever seen by the shared sharded index — across this dataset
    and every earlier dataset the same ``handles`` processed (the
    append-only-ingest counterpart of :func:`~ballet_ray.stages.dedup.
    minhash_lsh_pairs`, which needs the closed corpus).

    Each batch signs its docs (the vectorized MinHasher/TokenMinHasher
    kernels — pass ``tokens_col`` to sign the canonical token table with
    no text path), folds each band's signature segment plus the band index
    into ONE uint64 key, and ships only those keys to the shards (≤
    ``bands × len(handles)`` rpcs per batch, payload never moves). A doc
    survives iff ALL ``bands`` keys were fresh.

    Semantics (documented trades of the online setting):

    - band recall/precision are those of (num_perm, bands) LSH — e.g.
      64/16 ⇒ match probability ``1-(1-j^4)^16``;
    - dropped docs leave their fresh band keys in the index, so dedup is
      CHAIN-transitive (A~B, B~C drops C even when A≁C) — usually what
      corpus dedup wants;
    - two mutually-similar docs racing through different in-flight batches
      can, in the worst interleaving, BOTH drop (each seeing the other's
      keys on some shard) — over-removal, never under-removal: two
      banding-similar docs are never both kept, because their shared key
      lands on one shard whose calls serialize;
    - Bloom false positives drop unique docs at the filter's ε (size
      ``bits`` ≥ ~10× expected distinct keys = docs × bands).

    Use batch ``dedup_by_minhash`` when a canonical winner or verified
    Jaccard matters; use this for "have I ingested something like this
    before, ever".
    """
    from ballet_ray.functions.hashing import mix
    from ballet_ray.stages.dedup import MinHasher, TokenMinHasher

    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    if (text_col is None) == (tokens_col is None):
        raise ValueError("pass exactly one of text_col / tokens_col")
    r = num_perm // bands
    n_shards = len(handles)
    band_salt = np.array([0x5EED ^ (b * 0x9E37) for b in range(bands)], dtype=_U64)

    def pass_batch(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t
        if tokens_col is not None:
            hasher = TokenMinHasher(num_perm=num_perm, k=shingle_k, seed=seed,
                                    tokens_col=tokens_col)
            col = t.column(tokens_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            flat = col.flatten().to_numpy(zero_copy_only=False)
            sig = hasher.signatures_from_flat(flat, offs)
        else:
            hasher = MinHasher(num_perm=num_perm, k=shingle_k, seed=seed,
                               text_col=text_col)
            sig = hasher.signatures(
                [x or "" for x in t.column(text_col).to_pylist()]
            )
        sig = sig.astype(_U64)
        keys = np.empty((bands, n), dtype=_U64)
        for b in range(bands):
            seg = sig[:, b * r : (b + 1) * r]
            keys[b] = mix(*[seg[:, j] for j in range(r)], band_salt[b])
        flatk = keys.ravel()                       # band-major
        doc_idx = np.tile(np.arange(n), bands)
        shard = (flatk % _U64(n_shards)).astype(np.int64)
        fresh = np.zeros(len(flatk), dtype=bool)
        futs, idxs = [], []
        for s in range(n_shards):
            sel = np.flatnonzero(shard == s)
            if len(sel):
                futs.append(handles[s].check_and_add.remote(flatk[sel]))
                idxs.append(sel)
        for sel, f in zip(idxs, ray.get(futs)):
            fresh[sel] = f
        stale_per_doc = np.bincount(doc_idx, weights=~fresh, minlength=n)
        return t.filter(pa.array(stale_per_doc == 0))

    return ds.map_batches(pass_batch, batch_format="pyarrow", **_NO_RETRY)


def streaming_embedding_dedup(
    ds, *, handles: list, embedding_col: str = "embedding",
    planes: int = 256, bands: int = 8, seed: int = 1754,
):
    """Online near-dedup over an embedding column (``list<float>``):
    random-hyperplane SimHash bits (Charikar 2002 — P[bit match] =
    1 − angle/π) band into uint64 keys against the same sharded Bloom
    index as :func:`streaming_minhash_dedup`; a row survives iff ALL its
    band keys were fresh. Defaults (256 planes / 8 bands = 32 bits per
    band) catch near-REPLICAS — cos >= 0.999 with ~99.97% per-pair
    probability, cos ~0.99 at ~87% — while random pairs collide at 2^-32
    per band.

    Band width is a key-space budget, not just a recall knob: a row is
    dropped when any of its band VALUES was ever inserted, so an index of
    N rows consumes N values out of the 2^(planes/bands) possible per
    band. 16-bit bands (the pre-round-5 default, 128/8) saturate past
    ~10^4 distinct rows — every possible band value gets taken and unique
    rows start dropping en masse. Keep planes/bands >= ~log2(N) + 20 for
    an index that must absorb N rows; widen ``bands`` only for small
    closed sets where milder similarity matters more than scale. Note the
    bits of one band correlate when ``planes >> d`` (they all live in the
    d-dimensional projection subspace), so LOW-dimension embeddings keep
    less than the nominal 2^32 band entropy — measured false-drop residue
    over 20k random rows: 5 at d=64, 54 at d=32, ~800 at d=16.
    The projection matrix is seeded and deterministic,
    so the signature of a vector is identical across batches, runs and
    cluster sizes.

    Per batch: one (n×d)·(d×planes) GEMM, bit packing, ≤ ``bands ×
    len(handles)`` rpcs of uint64 keys — embeddings never leave the map
    stage. Same trade set as the MinHash variant: chain-transitive,
    over-removal-only under concurrency, Bloom-ε extra drops.
    """
    from ballet_ray.functions.hashing import mix

    if planes % bands:
        raise ValueError("bands must divide planes")
    r = planes // bands
    if r > 64:
        raise ValueError(
            f"planes/bands = {r} bits per band exceeds the uint64 band key; "
            "use more bands or fewer planes")
    n_shards = len(handles)
    band_salt = np.array([0xE1B ^ (b * 0x85EB) for b in range(bands)], dtype=_U64)

    def pass_batch(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t
        col = t.column(embedding_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // n
        E = flat.reshape(n, d)
        rng = np.random.RandomState(seed)
        R = rng.standard_normal((d, planes))
        bits = (E @ R) > 0                       # (n, planes)
        keys = np.empty((bands, n), dtype=_U64)
        for b in range(bands):
            seg = bits[:, b * r : (b + 1) * r]
            packed = (seg @ (1 << np.arange(r, dtype=np.uint64))).astype(_U64)
            keys[b] = mix(packed, band_salt[b])
        flatk = keys.ravel()
        doc_idx = np.tile(np.arange(n), bands)
        shard = (flatk % _U64(n_shards)).astype(np.int64)
        fresh = np.zeros(len(flatk), dtype=bool)
        futs, idxs = [], []
        for s in range(n_shards):
            sel = np.flatnonzero(shard == s)
            if len(sel):
                futs.append(handles[s].check_and_add.remote(flatk[sel]))
                idxs.append(sel)
        for sel, f in zip(idxs, ray.get(futs)):
            fresh[sel] = f
        stale_per_doc = np.bincount(doc_idx, weights=~fresh, minlength=n)
        return t.filter(pa.array(stale_per_doc == 0))

    return ds.map_batches(pass_batch, batch_format="pyarrow", **_NO_RETRY)


def streaming_exact_dedup(ds, *, col: str, handles: list):
    """One streaming pass: keep rows whose ``col`` content was never seen
    by the index — across this dataset AND every earlier dataset the same
    ``handles`` processed. Batches ship only uint64 hashes to the shards;
    each batch makes ≤ ``len(handles)`` rpcs."""
    from ballet_ray.functions.partition import stable_hash_array

    n_shards = len(handles)

    def pass_batch(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        if not len(vals):
            return t
        h = stable_hash_array(vals)
        shard = (h % _U64(n_shards)).astype(np.int64)
        keep = np.zeros(len(h), dtype=bool)
        futs, idxs = [], []
        for s in range(n_shards):
            sel = np.flatnonzero(shard == s)
            if len(sel):
                futs.append(handles[s].check_and_add.remote(h[sel]))
                idxs.append(sel)
        for sel, f in zip(idxs, ray.get(futs)):
            keep[sel] = f
        return t.filter(pa.array(keep))

    return ds.map_batches(pass_batch, batch_format="pyarrow", **_NO_RETRY)
