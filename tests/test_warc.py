"""WARC source: incremental parser, multi-member gzip, Ray read path, and
the composed crawl-ingest pipeline (read_warc → canonicalize_url →
HtmlToText)."""

import gzip

import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.sources.warc import (
    WarcDatasource,
    _inflate,
    _RecordParser,
    read_warc,
    write_warc,
)


def _recs(n, tag=""):
    return [{"target_uri": f"https://ex.org/{tag}{i}",
             "payload": (f"body {tag}{i} héllo " * (i % 5 + 1)).encode()}
            for i in range(n)]


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("chunk", [7, 1 << 20])
def test_parser_roundtrip_any_chunking(tmp_path, gz, chunk):
    recs = _recs(23)
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    write_warc(path, recs, gzip_per_record=gz)
    raw = open(path, "rb").read()
    chunks = [raw[i:i + chunk] for i in range(0, len(raw), chunk)]
    stream = _inflate(chunks) if gz else chunks
    parser = _RecordParser()
    rows = [r for c in stream for r in parser.feed(c)]
    assert len(rows) == 23
    for i, r in enumerate(rows):
        assert r["target_uri"] == recs[i]["target_uri"]
        assert r["payload"] == recs[i]["payload"]
        assert r["payload_len"] == len(recs[i]["payload"])
        assert r["http_status"] == 200
        assert r["warc_type"] == "response"
        assert r["http_content_type"].startswith("text/html")
        assert r["record_id"].startswith("<urn:uuid:")


def test_parser_rejects_garbage():
    parser = _RecordParser()
    with pytest.raises(ValueError, match="malformed WARC"):
        list(parser.feed(b"NOT A WARC\r\nX: y\r\n\r\n"))


def test_non_http_payload_and_type_filter(tmp_path):
    # hand-rolled warcinfo record (no HTTP envelope) + one response
    info = b"software: test\r\n"
    rec = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
           b"WARC-Record-ID: <urn:uuid:i>\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Type: application/warc-fields\r\n"
           b"Content-Length: " + str(len(info)).encode() + b"\r\n\r\n"
           + info + b"\r\n\r\n")
    path = str(tmp_path / "mixed.warc")
    with open(path, "wb") as f:
        f.write(rec)
    write_warc(str(tmp_path / "resp.warc"), _recs(1))
    with open(path, "ab") as f:
        f.write(open(str(tmp_path / "resp.warc"), "rb").read())

    parser = _RecordParser()
    rows = list(parser.feed(open(path, "rb").read()))
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response"]
    assert rows[0]["payload"] == info  # raw payload, no HTTP split
    assert rows[0]["http_status"] is None
    assert rows[0]["target_uri"] is None


def test_read_warc_ray_multifile(ray_session, tmp_path):
    n = 0
    for shard in range(3):
        recs = _recs(40, tag=f"s{shard}-")
        write_warc(str(tmp_path / f"part-{shard}.warc.gz"), recs,
                   gzip_per_record=True)
        n += len(recs)
    ds = read_warc(str(tmp_path), rows_per_block=16)
    assert ds.count() == n
    df = ds.to_pandas()
    assert set(df["http_status"]) == {200}
    assert df["payload_len"].sum() == df["payload"].map(len).sum()
    # warc_types=None keeps everything; unknown filter keeps nothing
    assert read_warc(str(tmp_path / "part-0.warc.gz"),
                     warc_types=None).count() == 40
    empty = read_warc(str(tmp_path / "part-0.warc.gz"),
                      warc_types=("request",))
    assert empty.count() == 0
    # schema survives the empty case (the always-one-block guarantee)
    assert "target_uri" in empty.schema().names


def test_read_warc_composes_with_crawl_stages(ray_session, tmp_path):
    from ballet_ray.stages.text import HtmlToText, canonicalize_url

    recs = [{"target_uri": f"HTTPS://Ex.ORG:443/p/{i}?utm_s=x",
             "payload": f"<html><body><p>doc {i} &amp; co</p></body></html>"
                        .encode()}
            for i in range(30)]
    write_warc(str(tmp_path / "c.warc.gz"), recs, gzip_per_record=True)

    def parse(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "url": t.column("target_uri"),
            "page": pc.cast(t.column("payload"), pa.string()),
        })

    # the same composition shape as the warc_pipeline_docs driver query
    from ballet_ray.pipeline import FeatureEngineeringPipeline
    from ballet_ray.feature import Feature

    parsed = (read_warc(str(tmp_path / "c.warc.gz"))
              .map_batches(parse, batch_format="pyarrow")
              .map_batches(canonicalize_url, batch_format="pyarrow"))
    pipe = FeatureEngineeringPipeline([Feature("page", HtmlToText())])
    df = pipe.fit_transform(parsed).to_pandas()
    assert len(df) == 30
    assert df["canonical_url"].str.startswith("https://ex.org/p/").all()
    assert not df["canonical_url"].str.contains("utm").any()
    assert df["page_text"].str.contains("& co").all()
    assert not df["page_text"].str.contains("<").any()


def test_registry_warc_format(ray_session, tmp_path):
    from ballet_ray.sources.registry import load_table

    write_warc(str(tmp_path / "r.warc"), _recs(5))
    ds = load_table(str(tmp_path / "r.warc"), format="warc",
                    columns=["target_uri", "payload_len"])
    df = ds.to_pandas()
    assert list(df.columns) == ["target_uri", "payload_len"] and len(df) == 5


def test_whole_file_gzip_also_supported(ray_session, tmp_path):
    # one gzip member over the whole archive (non-CC producers do this)
    plain = str(tmp_path / "w.warc")
    write_warc(plain, _recs(12))
    gz = str(tmp_path / "w.warc.gz")
    with open(gz, "wb") as f:
        f.write(gzip.compress(open(plain, "rb").read(), mtime=0))
    assert read_warc(gz).count() == 12


def _wet_recs(n):
    return [{"target_uri": f"https://ex.org/t/{i}",
             "payload": f"page text {i} — extracted plain text".encode(),
             "warc_type": "conversion"}
            for i in range(n)]


def test_read_wet_conversion_records(ray_session, tmp_path):
    """WET shape: conversion records carry plain text with no HTTP
    envelope; read_wet selects them and the payload is the page text."""
    from ballet_ray.sources.warc import read_wet

    path = str(tmp_path / "a.wet.gz")
    # a response record mixed in must be filtered out by read_wet
    write_warc(path, _wet_recs(9) + _recs(3), gzip_per_record=True)
    df = read_wet(path).to_pandas()
    assert len(df) == 9
    assert (df["warc_type"] == "conversion").all()
    assert df["http_status"].isna().all()
    assert (df["content_type"] == "text/plain").all()
    texts = df["payload"].map(lambda b: b.decode())
    assert texts.str.startswith("page text ").all()
    assert texts.str.contains("—").all()


def test_registry_wet_inference(ray_session, tmp_path):
    from ballet_ray.sources.registry import load_table

    path = str(tmp_path / "r.wet.gz")
    write_warc(path, _wet_recs(4), gzip_per_record=True)
    ds = load_table(path, columns=["target_uri", "payload_len"])
    assert ds.count() == 4
