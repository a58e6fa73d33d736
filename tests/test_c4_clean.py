"""C4 heuristic cleanup (Raffel et al. 2020 §2.2): line-level terminal
punctuation / min-words / javascript rules, doc-level lorem-ipsum / brace /
min-kept-lines rules, partition invariance, passthrough columns."""

import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.text import c4_clean, c4_clean_table

GOOD1 = "This is a good long sentence with many words."
GOOD2 = "Another fine sentence is right here today!"
GOOD3 = "A third good closing sentence ends the page?"


def _doc(*lines):
    return "\n".join(lines)


def test_line_rules():
    t = pa.table({
        "doc_id": [1],
        "text": [_doc(
            "nav menu home",                       # no terminal punct
            GOOD1,
            "Please enable JavaScript to view.",   # drop term (case-insens.)
            "Tiny line.",                          # < 5 words
            GOOD2,
            GOOD3,
        )],
    })
    out = c4_clean_table(t, "text")
    assert out.num_rows == 1
    assert out.column("text")[0].as_py() == _doc(GOOD1, GOOD2, GOOD3)
    assert out.column("lines_in")[0].as_py() == 6
    assert out.column("lines_kept")[0].as_py() == 3


def test_terminal_punct_variants():
    quotes = ['He said "stop there now please do".',
              "Sentence that ends with a question mark?",
              "Sentence that ends with an exclamation mark!",
              'A quoted ending keeps the line alive today."']
    t = pa.table({"doc_id": [1], "text": [_doc(*quotes)]})
    out = c4_clean_table(t, "text", min_lines=4)
    assert out.column("lines_kept")[0].as_py() == 4


@pytest.mark.parametrize("poison,kw", [
    ("Lorem Ipsum dolor sit amet.", {}),            # phrase, case-insensitive
    ("var x = { a: 1 };", {}),                      # brace
])
def test_doc_level_drop(poison, kw):
    t = pa.table({"doc_id": [1, 2],
                  "text": [_doc(GOOD1, GOOD2, GOOD3),
                           _doc(GOOD1, GOOD2, GOOD3, poison)]})
    out = c4_clean_table(t, "text", **kw)
    assert out.column("doc_id").to_pylist() == [1]


def test_min_lines_and_null_and_empty():
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [_doc(GOOD1, GOOD2), None, ""]})
    out = c4_clean_table(t, "text")  # min_lines=3 default
    assert out.num_rows == 0
    out2 = c4_clean_table(t, "text", min_lines=2)
    assert out2.column("doc_id").to_pylist() == [1]


def test_passthrough_and_stats_off():
    t = pa.table({"doc_id": [7], "lang": ["en"],
                  "text": [_doc(GOOD1, GOOD2, GOOD3)]})
    out = c4_clean_table(t, "text", stats=False)
    assert out.column_names == ["doc_id", "lang", "text"]
    assert out.column("lang")[0].as_py() == "en"


def test_dataset_partition_invariance(ray_session):
    docs = []
    for i in range(60):
        lines = [f"Document {i} sentence number one is long enough.",
                 GOOD2, GOOD3, "nav bar"]
        if i % 7 == 0:
            lines.append("lorem ipsum dolor sit amet.")
        docs.append({"doc_id": i, "text": _doc(*lines)})
    ds = rd.from_items(docs).map_batches(
        lambda t: t, batch_format="pyarrow")
    a = c4_clean(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (c4_clean(rd.from_items(docs).repartition(13))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) == 60 - len(range(0, 60, 7))
    assert a.equals(b)
    assert (a["lines_kept"] == 3).all()


def test_dedup_by_minhash_on_all_filtered_corpus(ray_session):
    """An aggressive upstream gate can hand dedup an EMPTY corpus (e.g.
    c4_clean dropping every doc): the LSH path must return it unchanged
    instead of KeyError-ing on the schema-less signature table."""
    from ballet_ray.stages.dedup import dedup_by_minhash

    docs = [{"doc_id": i, "text": "no terminal punctuation here"}
            for i in range(8)]
    ds = c4_clean(rd.from_items(docs), stats=False)  # drops all 8
    out = dedup_by_minhash(ds, text_col="text", id_col="doc_id")
    assert out.count() == 0
