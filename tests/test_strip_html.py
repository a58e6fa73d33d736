"""HtmlToText: HTML → text extraction (web-ingest first stage)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.text import HTML_ENTITIES, HtmlToText


def _strip(htmls):
    t = pa.table({"page": pa.array(htmls, type=pa.string())})
    out = HtmlToText().transform_table(t, ["page"])
    return out.column("page_text").to_pylist(), out.column("page_n_tags").to_pylist()


def test_golden_page():
    texts, tags = _strip([
        '<html><head><script type="a">var x = 1 < 2;</script>'
        "<style>p { color: red; }</style></head>"
        "<body><h1>Title &amp; more</h1><!-- note --><p>hello   world</p>"
        '<div class="f">foo&nbsp;&lt;end&gt;</div><span>inline</span>'
        "</body></html>",
    ])
    assert texts[0] == "Title & more\n\nhello world\n\nfoo <end>\ninline"
    assert tags[0] > 0


def test_script_style_content_dropped_not_just_tags():
    texts, _ = _strip(["<p>keep</p><script>function f() { return 1; }</script>"
                       "<style>.x { display: none; }</style><p>also</p>"])
    assert "function" not in texts[0] and "display" not in texts[0]
    assert "keep" in texts[0] and "also" in texts[0]


def test_entity_order_amp_last():
    # "&amp;lt;" must decode to the literal string "&lt;", never to "<"
    texts, _ = _strip(["a &amp;lt; b &amp; c &lt; d"])
    assert texts[0] == "a &lt; b & c < d"


def test_numeric_entities_left_verbatim_except_39():
    texts, _ = _strip(["it&#39;s &#169; year"])
    assert texts[0] == "it's &#169; year"


def test_block_tags_newline_inline_tags_removed():
    texts, _ = _strip(["<ul><li>one</li><li>two</li></ul><b>bold</b><i>it</i>"])
    # adjacent close+open block tags leave one blank line (two newlines);
    # inline tags strip with no separator
    assert texts[0] == "one\n\ntwo\n\nboldit"


def test_whitespace_collapse_and_trim():
    texts, _ = _strip(["  <p>  a\t\tb  </p>\n\n\n\n<p>c</p>  "])
    assert texts[0] == "a b\n\nc"


def test_null_and_plain_text():
    texts, tags = _strip([None, "no tags at all"])
    assert texts == [None, "no tags at all"]
    assert tags == [None, 0]


def test_unclosed_and_attribute_heavy_tags():
    texts, _ = _strip(['<img src="x.png" alt="a > b is rare"/>word<br/>next'])
    # '>' inside the alt attribute ends the tag under the regex rule —
    # deterministic, documented, and mirrored by the SQL oracle
    assert texts[0].endswith("word\nnext")


def test_entity_table_is_plain_substrings():
    for pat, repl in HTML_ENTITIES:
        assert pat.startswith("&") and pat.endswith(";")
        assert len(repl) == 1


def test_pipeline_multiblock(ray_session):
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(200)],
        "page": [f"<p>doc {i} &amp; body</p><script>x{i}</script>"
                 for i in range(200)],
    })
    pipe = FeatureEngineeringPipeline([Feature("page", HtmlToText())])
    out = pipe.fit_transform(rd.from_pandas(df).repartition(8)).to_pandas()
    out = out.set_index("doc_id")
    for i in range(200):
        assert out.loc[f"d{i}", "page_text"] == f"doc {i} & body"
        assert out.loc[f"d{i}", "page_n_tags"] == 4
