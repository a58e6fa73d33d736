"""WARC (ISO 28500) source — the native input format of web-scale corpora
(a Common Crawl snapshot is ~90k ``.warc.gz`` archives of ~1 GB each).

Ray-native design, sized for that input:

- **parallelism = number of archives** — one read task per WARC file (the
  unit every WARC processor shards on), scheduled by Ray Data's streaming
  executor like any other file read;
- **within a file the reader streams** — fixed-size chunks through a
  multi-member gzip inflater (Common Crawl gzips each record as its own
  member) into an incremental record parser, emitting an Arrow block every
  ``rows_per_block`` records, so peak memory is O(one block), never
  O(archive), even on a 1 GB file;
- **HTTP envelopes are parsed, not shipped** — for ``application/http``
  response records the status line + headers are reduced to
  ``http_status`` / ``http_content_type`` columns and only the body bytes
  enter the ``payload`` column.

Output schema (one row per selected record)::

    record_id          string   WARC-Record-ID
    warc_type          string   WARC-Type (response / request / metadata …)
    warc_date          string   WARC-Date (ISO-8601, as written)
    target_uri         string   WARC-Target-URI (null for warcinfo)
    content_type       string   record-level Content-Type
    http_status        int32    HTTP status (null for non-HTTP payloads)
    http_content_type  string   HTTP Content-Type header (null likewise)
    payload            binary   HTTP body, or the raw payload for
                                non-HTTP records
    payload_len        int64    len(payload)

The reference engine reads tabular files only; this source exists for the
corpus-ingest pipelines (``read_warc`` → HtmlToText → canonicalize_url →
dedup …). Format per the public ISO 28500 / WARC 1.1 specification.
"""

from __future__ import annotations

import gzip
import zlib
from typing import TYPE_CHECKING, Iterable, Iterator, Optional

import pyarrow as pa

from ray.data.datasource.file_based_datasource import FileBasedDatasource

if TYPE_CHECKING:
    import ray.data

_SCHEMA = pa.schema([
    ("record_id", pa.string()),
    ("warc_type", pa.string()),
    ("warc_date", pa.string()),
    ("target_uri", pa.string()),
    ("content_type", pa.string()),
    ("http_status", pa.int32()),
    ("http_content_type", pa.string()),
    ("payload", pa.binary()),
    ("payload_len", pa.int64()),
])

_CRLF2 = b"\r\n\r\n"


class _RecordParser:
    """Incremental WARC record parser: feed() arbitrary byte chunks, collect
    completed records. Holds at most one in-flight record in its buffer."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._need = 0  # payload bytes still expected (0 = parsing headers)
        self._headers: Optional[dict] = None

    def feed(self, data: bytes) -> Iterator[dict]:
        self._buf += data
        while True:
            if self._headers is None:
                rec = self._parse_header()
                if rec is None:
                    return
            if len(self._buf) < self._need:
                return
            payload = bytes(self._buf[: self._need])
            del self._buf[: self._need]
            headers, self._headers, self._need = self._headers, None, 0
            yield self._to_row(headers, payload)

    def _parse_header(self) -> Optional[dict]:
        # skip the inter-record CRLF CRLF trailer / leading blank lines
        start = 0
        while self._buf[start : start + 2] in (b"\r\n", b"\n\r"):
            start += 2
        while self._buf[start : start + 1] == b"\n":
            start += 1
        end = self._buf.find(_CRLF2, start)
        if end < 0:
            if start:
                del self._buf[:start]
            return None
        block = bytes(self._buf[start:end])
        del self._buf[: end + 4]
        if not block.startswith(b"WARC/"):
            raise ValueError(
                f"malformed WARC record header: {block[:60]!r}")
        headers: dict[str, str] = {}
        for line in block.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
        self._headers = headers
        self._need = int(headers.get("content-length", "0"))
        return headers

    @staticmethod
    def _to_row(headers: dict, payload: bytes) -> dict:
        status = http_ct = None
        body = payload
        if "application/http" in headers.get("content-type", ""):
            head, sep, rest = payload.partition(_CRLF2)
            if sep:
                body = rest
                lines = head.split(b"\r\n")
                parts = lines[0].split(None, 2)
                if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
                    try:
                        status = int(parts[1])
                    except ValueError:
                        status = None
                for line in lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        http_ct = v.strip().decode("utf-8", "replace")
                        break
        return {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "warc_date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ct,
            "payload": body,
            "payload_len": len(body),
        }


def _inflate(chunks: Iterable[bytes]) -> Iterator[bytes]:
    """Multi-member gzip decompression (each Common Crawl record is its
    own member): restart the inflater on member boundaries."""
    d = zlib.decompressobj(wbits=31)
    for chunk in chunks:
        while chunk:
            out = d.decompress(chunk)
            if out:
                yield out
            if d.eof:
                chunk = d.unused_data
                d = zlib.decompressobj(wbits=31)
            else:
                chunk = b""
    tail = d.flush()
    if tail:
        yield tail


def _rows_to_block(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_SCHEMA)


class WarcDatasource(FileBasedDatasource):
    """See module docstring. ``warc_types=None`` keeps every record;
    the default keeps only ``response`` records (the corpus payload)."""

    _FILE_EXTENSIONS = None  # .warc, .warc.gz, anything — sniffed by magic

    def __init__(self, paths, *, warc_types=("response",),
                 rows_per_block: int = 256, chunk_size: int = 1 << 20,
                 **file_based_kwargs):
        super().__init__(paths, **file_based_kwargs)
        self._warc_types = set(warc_types) if warc_types is not None else None
        self._rows_per_block = rows_per_block
        self._chunk_size = chunk_size

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        def raw() -> Iterator[bytes]:
            while True:
                chunk = f.read(self._chunk_size)
                if not chunk:
                    return
                yield chunk

        chunks = raw()
        first = next(chunks, b"")
        if first[:2] == b"\x1f\x8b":
            def _chain():
                yield first
                yield from chunks
            stream: Iterable[bytes] = _inflate(_chain())
        elif first:
            def stream_gen():
                yield first
                yield from chunks
            stream = stream_gen()
        else:
            stream = ()

        parser = _RecordParser()
        rows: list[dict] = []
        yielded = False
        for data in stream:
            for row in parser.feed(data):
                if self._warc_types is None or \
                        row["warc_type"] in self._warc_types:
                    rows.append(row)
                if len(rows) >= self._rows_per_block:
                    yield _rows_to_block(rows)
                    rows, yielded = [], True
        if rows or not yielded:
            # an empty file still contributes one empty block with the schema
            yield _rows_to_block(rows)


def read_warc(paths, *, warc_types=("response",), rows_per_block: int = 256,
              include_paths: bool = False,
              **read_kwargs) -> "ray.data.Dataset":
    """``ray.data``-style reader: one lazy Dataset over WARC archive(s).

    ``paths`` may be a file, directory, or list. Extra ``read_kwargs`` go to
    ``ray.data.read_datasource`` (e.g. ``override_num_blocks``,
    ``ray_remote_args``)."""
    import ray.data

    return ray.data.read_datasource(
        WarcDatasource(paths, warc_types=warc_types,
                       rows_per_block=rows_per_block,
                       include_paths=include_paths),
        **read_kwargs,
    )


def read_wet(paths, *, rows_per_block: int = 256,
             include_paths: bool = False,
             **read_kwargs) -> "ray.data.Dataset":
    """WET reader (Common Crawl's pre-extracted plain-text distribution).

    A ``.wet.gz`` file is an ordinary WARC archive whose text lives in
    ``conversion`` records (Content-Type ``text/plain``, no HTTP
    envelope) — so this is :func:`read_warc` selecting
    ``warc_types=("conversion",)``; the ``payload`` column is the UTF-8
    page text directly, no HTML stripping needed downstream."""
    return read_warc(paths, warc_types=("conversion",),
                     rows_per_block=rows_per_block,
                     include_paths=include_paths, **read_kwargs)


def write_warc(path: str, records: Iterable[dict], *,
               gzip_per_record: bool = False) -> None:
    """Fixture/test encoder. By default writes ``response`` records with
    an HTTP/1.1 envelope (Common Crawl ``.warc`` shape); a record with
    ``warc_type="conversion"`` is written as a WET-style plain-text
    record (no HTTP envelope, Content-Type ``text/plain``). Each record
    dict: ``target_uri``, ``payload`` (bytes), optional ``warc_type``,
    ``http_status`` (default 200), ``http_content_type`` (default
    ``text/html; charset=utf-8``), ``warc_date``.
    ``gzip_per_record=True`` writes one gzip member per record (the CC
    convention)."""
    with open(path, "wb") as out:
        for i, rec in enumerate(records):
            body = rec["payload"]
            wtype = rec.get("warc_type", "response")
            if wtype == "conversion":
                block, rec_ct = body, "text/plain"
            else:
                status = rec.get("http_status", 200)
                ct = rec.get("http_content_type", "text/html; charset=utf-8")
                block = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ct}\r\n"
                         f"Content-Length: {len(body)}\r\n\r\n"
                         ).encode("ascii") + body
                rec_ct = "application/http; msgtype=response"
            head = (
                "WARC/1.0\r\n"
                f"WARC-Type: {wtype}\r\n"
                f"WARC-Record-ID: <urn:uuid:00000000-0000-4000-8000-"
                f"{i:012d}>\r\n"
                f"WARC-Date: {rec.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
                f"WARC-Target-URI: {rec['target_uri']}\r\n"
                f"Content-Type: {rec_ct}\r\n"
                f"Content-Length: {len(block)}\r\n\r\n"
            ).encode("ascii")
            record = head + block + b"\r\n\r\n"
            out.write(gzip.compress(record, mtime=0) if gzip_per_record
                      else record)
