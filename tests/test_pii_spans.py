"""Dolma span-tagger shape: PiiSpans offsets + apply_spans redaction
(tag once, redact at mix time without re-scanning the text)."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.text import (PII_SIGNAL_PATTERNS, PiiSignals, PiiSpans,
                                    apply_spans)


TEXTS = [
    "reach me at bob@example.com or (212) 555-0188 today",
    "server 10.0.0.1 and backup 192.168.1.254 are up",
    "totally clean document with no sensitive content at all",
    "two mails: a@b.co x@y.org and one ip 8.8.8.8",
    "",
    None,
]


def _table():
    return pa.table({"doc_id": list(range(len(TEXTS))),
                     "text": pa.array(TEXTS, pa.string())})


def test_spans_match_re_reference_and_counts():
    t = _table()
    spans = PiiSpans().transform_table(t, ["text"])
    sigs = PiiSignals().transform_table(t, ["text"])
    for kind, pat in PII_SIGNAL_PATTERNS.items():
        got = spans.column(f"text_{kind}_spans").to_pylist()
        rx = re.compile(pat)
        for i, txt in enumerate(TEXTS):
            want = [x for m in rx.finditer(txt or "")
                    for x in (m.start(), m.end())]
            assert got[i] == want, (kind, i)
            # span count per kind == the counts-only tagger's number
            assert len(got[i]) // 2 == sigs.column(f"text_n_{kind}")[i].as_py()


def test_apply_spans_removal_and_merge(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["abcdefghij", "no spans here"]})
    # overlapping + adjacent spans from two tagger columns merge: (1,4)+(3,6)
    # -> (1,6); (7,9) separate
    t = pa.table({
        "doc_id": [0, 1],
        "text": df.text,
        "a_spans": pa.array([[1, 4, 7, 9], []], pa.list_(pa.int32())),
        "b_spans": pa.array([[3, 6], []], pa.list_(pa.int32())),
    })
    out = apply_spans(rd.from_arrow(t), span_cols=["a_spans", "b_spans"]
                      ).to_pandas().sort_values("doc_id")
    assert out.text.tolist() == ["agj", "no spans here"]
    assert "a_spans" not in out.columns and "b_spans" not in out.columns

    # placeholder replacement: one token per MERGED span
    out2 = apply_spans(rd.from_arrow(t), span_cols=["a_spans", "b_spans"],
                       repl="_X_", drop_span_cols=False
                       ).to_pandas().sort_values("doc_id")
    assert out2.text.tolist() == ["a_X_g_X_j", "no spans here"]
    assert "a_spans" in out2.columns


def test_tag_then_apply_equals_direct_redaction(ray_session):
    """PiiSpans + apply_spans(repl=tok) == RegexRedactor for a single
    pattern (no overlap between matches of one pattern)."""
    from ballet_ray.stages.text import RegexRedactor

    pat = PII_SIGNAL_PATTERNS["emails"]
    t = _table()
    spans = PiiSpans({"emails": pat}).transform_table(t, ["text"])
    both = t.append_column("text_emails_spans",
                           spans.column("text_emails_spans"))
    red = apply_spans(rd.from_arrow(both), span_cols="text_emails_spans",
                      repl="<EMAIL>").to_pandas().sort_values("doc_id")
    want = RegexRedactor([(pat, "<EMAIL>")]).transform_table(t, ["text"])
    assert red.text.fillna("__null__").tolist() == [
        x if x is not None else "__null__"
        for x in want.column("text_redacted").to_pylist()]


def test_spans_unicode_codepoint_offsets(ray_session):
    """Offsets are Python-str codepoints (not utf8 bytes) end to end:
    multibyte chars before the match must not shift the splice."""
    txt = "héllo wörld — mail bob@example.com fin"
    t = pa.table({"doc_id": [0], "text": [txt]})
    spans = PiiSpans({"emails": PII_SIGNAL_PATTERNS["emails"]}
                     ).transform_table(t, ["text"])
    s, e = spans.column("text_emails_spans").to_pylist()[0]
    assert txt[s:e] == "bob@example.com"
    both = t.append_column("text_emails_spans",
                           spans.column("text_emails_spans"))
    out = apply_spans(rd.from_arrow(both), span_cols="text_emails_spans",
                      repl="<EMAIL>").to_pandas()
    assert out.text.iloc[0] == "héllo wörld — mail <EMAIL> fin"


def test_apply_spans_property_random(ray_session):
    """Randomized spans (overlapping, nested, adjacent, multi-column) vs
    an independent interval-merge reference."""
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(1, 8))
        texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, int(rng.integers(0, 40))))
                 for _ in range(n)]
        cols = {}
        for sc in ("s1", "s2"):
            rows = []
            for txt in texts:
                k = int(rng.integers(0, 4))
                flat = []
                for _ in range(k):
                    if len(txt) == 0:
                        break
                    a = int(rng.integers(0, len(txt)))
                    b = int(rng.integers(a, len(txt))) + 1
                    flat.extend((a, b))
                rows.append(flat)
            cols[sc] = pa.array(rows, pa.list_(pa.int32()))
        t = pa.table({"doc_id": list(range(n)),
                      "text": pa.array(texts, pa.string()),
                      "s1": cols["s1"], "s2": cols["s2"]})
        repl = rng.choice(["", "<X>"])
        got = (apply_spans(rd.from_arrow(t).repartition(2),
                           span_cols=["s1", "s2"], repl=str(repl))
               .to_pandas().sort_values("doc_id").text.tolist())

        def ref(txt, spans):
            if not spans:
                return txt
            spans = sorted((spans[i], spans[i + 1])
                           for i in range(0, len(spans), 2))
            merged = [list(spans[0])]
            for s, e in spans[1:]:
                if s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            out, pos = [], 0
            for s, e in merged:
                out.append(txt[pos:s] + str(repl))
                pos = e
            out.append(txt[pos:])
            return "".join(out)

        want = [ref(txt, list(cols["s1"][i].as_py()) + list(cols["s2"][i].as_py()))
                for i, txt in enumerate(texts)]
        assert got == want, trial
