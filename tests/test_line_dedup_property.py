"""Property-based corpus-wide line dedup: arbitrary small corpora (repeated
lines within and across docs, blank/whitespace lines, case variants,
string AND integer ids) vs a brute first-global-occurrence reference."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ballet_ray.stages.dedup import remove_duplicate_lines

LINES = ["alpha beta", "Alpha Beta", "  alpha beta  ", "gamma", "", "  ", "x"]


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(1, 8))
    docs = []
    for i in range(n_docs):
        n_lines = draw(st.integers(0, 6))
        docs.append(
            "\n".join(draw(st.lists(st.sampled_from(LINES),
                                    min_size=n_lines, max_size=n_lines)))
        )
    return docs


def _brute(docs, min_chars=1):
    """First global occurrence by (doc order = id order, line order); lines
    whose lower(strip()) is shorter than min_chars are structural (never
    keyed, always kept)."""
    seen = set()
    out = []
    for text in docs:
        kept = []
        for line in text.split("\n"):
            key = line.strip().lower()
            if len(key) < min_chars:
                kept.append(line)
                continue
            if key in seen:
                continue
            seen.add(key)
            kept.append(line)
        out.append("\n".join(kept))
    return out


@settings(max_examples=25, deadline=None, derandomize=True)
@given(corpora(), st.booleans())
def test_line_dedup_matches_brute(docs, string_ids):
    ids = [f"d{i:02d}" for i in range(len(docs))] if string_ids else list(range(len(docs)))
    df = pd.DataFrame({"doc_id": ids, "text": docs})
    got = (
        remove_duplicate_lines(rd.from_pandas(df).repartition(3),
                               text_col="text", id_col="doc_id")
        .to_pandas().set_index("doc_id")["text"]
    )
    want = _brute(docs)
    for i, d in zip(ids, want):
        assert got[i] == d, (i, repr(got[i]), repr(d))
