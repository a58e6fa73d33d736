"""split_sentences: boundary kinds, trim, indices, partition invariance."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray.stages.text import split_sentences, split_sentences_table


def test_boundary_kinds_and_indices():
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["One. Two! Three? Four!! five\n\nSix   \nSeven",
                 "no punctuation at all",
                 ""],
    })
    out = split_sentences_table(t)
    got = list(zip(out["doc_id"].to_pylist(), out["sent_idx"].to_pylist(),
                   out["sentence"].to_pylist()))
    assert got == [
        (1, 0, "One."), (1, 1, "Two!"), (1, 2, "Three?"), (1, 3, "Four!!"),
        (1, 4, "five"), (1, 5, "Six"), (1, 6, "Seven"),
        (2, 0, "no punctuation at all"),
    ]  # empty doc contributes nothing


def test_no_split_inside_tokens():
    # '5.5' and 'Mr.' without following space-break stay intact; 'Mr. '
    # splits (documented naive heuristic)
    t = pa.table({"doc_id": [1], "text": ["Pi is 3.14 exactly. Mr. Smith agrees."]})
    s = split_sentences_table(t)["sentence"].to_pylist()
    assert s == ["Pi is 3.14 exactly.", "Mr.", "Smith agrees."]


def test_min_chars_and_nulls():
    t = pa.table({"doc_id": [1, 2], "text": ["ab. c. defg.", None]})
    s = split_sentences_table(t, min_chars=3)
    assert s["sentence"].to_pylist() == ["ab.", "defg."]
    assert s["sent_idx"].to_pylist() == [0, 1]


def test_dataset_partition_invariance(ray_session):
    df = pd.DataFrame({
        "doc_id": range(40),
        "text": [f"Alpha {i}. Beta {i}! Gamma {i}?\nDelta {i}" for i in range(40)],
    })
    a = (split_sentences(rd.from_pandas(df).repartition(1)).to_pandas()
         .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True))
    b = (split_sentences(rd.from_pandas(df).repartition(7)).to_pandas()
         .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True))
    assert a.equals(b)
    assert (a.groupby("doc_id").size() == 4).all()
