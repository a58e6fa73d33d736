"""HashSplit stability + fraction accuracy; RegexRedactor vs python-re."""

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from ballet_ray.stages.core import HashSplit
from ballet_ray.stages.text import PII_PATTERNS, RegexRedactor


def test_hash_split_fractions_and_stability():
    t = pa.table({"doc_id": list(range(20000))})
    hs = HashSplit({"train": 0.8, "val": 0.1, "test": 0.1})
    out = hs.transform_table(t, ["doc_id"])
    splits = np.asarray(out.column("split").to_pylist())
    fr = {s: (splits == s).mean() for s in ("train", "val", "test")}
    assert abs(fr["train"] - 0.8) < 0.01 and abs(fr["val"] - 0.1) < 0.005 and abs(fr["test"] - 0.1) < 0.005
    # row-content determined: any batch slicing gives identical assignment
    for lo, hi in [(0, 7), (7, 20000)]:
        part = hs.transform_table(t.slice(lo, hi - lo), ["doc_id"])
        assert part.column("split").to_pylist() == splits[lo:hi].tolist()


def test_hash_split_dataset_repartition_invariant():
    t = pa.table({"doc_id": [f"d{i}" for i in range(500)]})
    hs = HashSplit()
    a = hs.transform_table(t, ["doc_id"]).column("split").to_pylist()
    ds = rd.from_arrow(t).repartition(7)
    b = (
        ds.map_batches(lambda x: x.append_column("split", hs.transform_table(x, ["doc_id"]).column("split")), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    exp = dict(zip(t.column("doc_id").to_pylist(), a))
    assert all(exp[d] == s for d, s in zip(b.doc_id, b.split))


def test_regex_redactor_matches_python_re():
    texts = [
        "mail me at bob.smith+x@example.co.uk or http://a.b/c?d=1 now",
        "ip 10.0.0.1 and card 4111111111111111 ok",
        "nothing to see",
        "",
        "two mails a@b.io c@d.org and 12345678",
    ]
    t = pa.table({"text": texts})
    out = RegexRedactor().transform_table(t, ["text"])
    got = out.column("text_redacted").to_pylist()
    hits = out.column("text_n_redactions").to_pylist()
    for i, s in enumerate(texts):
        n = 0
        for pat, repl in PII_PATTERNS:
            n += len(re.findall(pat, s))
            s = re.sub(pat, repl, s)
        assert got[i] == s and hits[i] == n
    assert hits[0] == 2 and "<EMAIL>" in got[0] and "<URL>" in got[0]


def test_pii_signals_counts_match_python_re():
    from ballet_ray.stages.text import PII_SIGNAL_PATTERNS, PiiSignals

    texts = [
        "mail bob@x.io and sue.r+1@a.b.co.uk, call 415-555-0172",
        "phones: (212) 555 0199, +1 303.555.2020; server 10.0.0.1",
        "192.168.1.250 and 8.8.8.8 but not 1234-5678",
        "clean text with no pii at all",
        "",
        None,
    ]
    t = pa.table({"text": pa.array(texts, pa.string())})
    out = PiiSignals().transform_table(t, ["text"])
    total = np.zeros(len(texts), dtype=np.int64)
    for name, pat in PII_SIGNAL_PATTERNS.items():
        got = out.column(f"text_n_{name}").to_pylist()
        exp = [len(re.findall(pat, s or "")) for s in texts]
        assert got == exp, (name, got, exp)
        total += np.asarray(exp)
    assert out.column("text_n_pii").to_pylist() == total.tolist()
    # spot expectations so the regexes themselves are pinned
    assert out.column("text_n_emails").to_pylist()[0] == 2
    assert out.column("text_n_phones").to_pylist()[1] == 2
    assert out.column("text_n_ip_addresses").to_pylist()[2] == 2
    assert out.column("text_n_pii").to_pylist()[3] == 0


def test_pii_signals_custom_patterns_and_validation():
    import pytest as _pt

    from ballet_ray.stages.text import PiiSignals

    with _pt.raises(ValueError):
        PiiSignals({})
    t = pa.table({"text": ["ssn 123-45-6789 twice 999-99-0000"]})
    out = PiiSignals({"ssn": r"\b\d{3}-\d{2}-\d{4}\b"}).transform_table(t, ["text"])
    assert out.column("text_n_ssn").to_pylist() == [2]
    assert out.column("text_n_pii").to_pylist() == [2]
    assert out.column_names == ["text_n_ssn", "text_n_pii"]


def test_fast_siphash_modes():
    import pyarrow as pa

    from ballet_ray.stages.core import HashSplit
    from ballet_ray.stages.sampling import hash_rate_filter

    t = pa.table({"doc_id": list(range(30000))})
    hs = HashSplit({"train": 0.8, "val": 0.1, "test": 0.1}, method="siphash")
    out = hs.transform_table(t, ["doc_id"])
    splits = np.asarray(out.column("split").to_pylist())
    fr = {s: (splits == s).mean() for s in ("train", "val", "test")}
    assert abs(fr["train"] - 0.8) < 0.01 and abs(fr["val"] - 0.1) < 0.006
    # slicing-invariant like the md5 mode
    part = hs.transform_table(t.slice(11, 500), ["doc_id"])
    assert part.column("split").to_pylist() == splits[11:511].tolist()

    ds = rd.from_arrow(t).repartition(4)
    kept = hash_rate_filter(ds, key_col="doc_id", rate=0.25, method="siphash").to_pandas()
    assert abs(len(kept) / 30000 - 0.25) < 0.01
    kept2 = hash_rate_filter(rd.from_arrow(t), key_col="doc_id", rate=0.25, method="siphash").to_pandas()
    assert sorted(kept2.doc_id) == sorted(kept.doc_id)


def test_error_paths():
    import pyarrow as pa
    import pytest as _pt

    from ballet_ray.stages.core import HashSplit
    from ballet_ray.stages.sampling import hash_rate_filter
    from ballet_ray.stages.sequences import chunk_table

    with _pt.raises(ValueError):
        HashSplit({"train": 0.5, "val": 0.2})  # doesn't sum to 1
    with _pt.raises(ValueError):
        HashSplit(method="sha1")
    t = pa.table({"doc_id": [1], "tokens": pa.array([[1, 2]], pa.list_(pa.int32()))})
    with _pt.raises(ValueError):
        chunk_table(t, list_col="tokens", id_col="doc_id", max_len=0)
    with _pt.raises(ValueError):
        chunk_table(t, list_col="tokens", id_col="doc_id", max_len=4, stride=-1)
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "g": ["a", "b"]}))
    with _pt.raises(ValueError):
        hash_rate_filter(ds, key_col="doc_id")  # neither rate nor rates
    with _pt.raises(ValueError):
        hash_rate_filter(ds, key_col="doc_id", rate=0.5, rates={"a": 1.0}, group_col="g")
    with _pt.raises(ValueError):
        hash_rate_filter(ds, key_col="doc_id", rates={"a": 1.0})  # rates without group
