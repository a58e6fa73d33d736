"""Config-driven table loading (reference ballet/util/io.py:120-129 and the
project template's load_data — CSV tables declared in ballet.yml).

Config shape::

    {"tables": [{"name": "entities", "path": "data/entities.parquet",
                 "format": "parquet", "columns": [...]},
                {"name": "targets", "path": "data/targets.csv"}],
     "splits": {"train": "data/train", "val": "data/val"}}

Every reader returns a lazy ``ray.data.Dataset`` with column pruning pushed
into the read where the format supports it (Parquet).
"""

from __future__ import annotations

import os

import ray.data as rd

_READERS = {
    "parquet": lambda path, columns: rd.read_parquet(path, columns=columns),
    "csv": lambda path, columns: _project(rd.read_csv(path), columns),
    "json": lambda path, columns: _project(rd.read_json(path), columns),
    "text": lambda path, columns: rd.read_text(path),
    "binary": lambda path, columns: rd.read_binary_files(path, include_paths=True),
    "warc": lambda path, columns: _project(_read_warc(path), columns),
    "wet": lambda path, columns: _project(_read_wet(path), columns),
}


def _read_warc(path):
    from ballet_ray.sources.warc import read_warc

    return read_warc(path)


def _read_wet(path):
    from ballet_ray.sources.warc import read_wet

    return read_wet(path)


def _project(ds, columns):
    return ds.select_columns(columns) if columns else ds


def _infer_format(path: str) -> str:
    if path.lower().endswith((".wet", ".wet.gz")):
        return "wet"
    if path.lower().endswith((".warc", ".warc.gz")):
        return "warc"
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    return {"pq": "parquet", "jsonl": "json", "txt": "text"}.get(ext, ext or "parquet")


def load_table(path: str, *, format: str | None = None, columns: list[str] | None = None):
    fmt = format or _infer_format(path)
    if fmt not in _READERS:
        raise ValueError(f"unsupported table format {fmt!r}; known: {sorted(_READERS)}")
    return _READERS[fmt](path, columns)


def load_table_from_config(input_dir: str, table_config: dict):
    """One table entry → Dataset (reference load_table_from_config)."""
    path = table_config["path"]
    if not os.path.isabs(path):
        path = os.path.join(input_dir, path)
    return load_table(
        path,
        format=table_config.get("format"),
        columns=table_config.get("columns"),
    )


_WRITERS = {
    "parquet": lambda ds, path, kw: ds.write_parquet(path, **kw),
    "csv": lambda ds, path, kw: ds.write_csv(path, **kw),
    "json": lambda ds, path, kw: ds.write_json(path, **kw),
}


def write_table(ds, path: str, *, format: str | None = None, **kwargs) -> None:
    """Write a Dataset to a directory of part files (parquet/csv/json)."""
    fmt = format or _infer_format(path)
    if fmt not in _WRITERS:
        raise ValueError(f"unsupported sink format {fmt!r}; known: {sorted(_WRITERS)}")
    _WRITERS[fmt](ds, path, kwargs)


class TableRegistry:
    """All of a project's tables, loaded lazily by name.

    ``load`` memoizes the (lazy) Dataset handle per table for ``cache_ttl``
    seconds (reference: the project data cache memoizes load_data for 10
    minutes, ballet/project.py:288-301,328-347). Datasets are lazy plans,
    so the cache avoids re-planning/re-listing files, not re-reading data —
    pass ``cache_ttl=0`` to disable."""

    def __init__(
        self,
        input_dir: str,
        config: dict,
        *,
        cache_ttl: float = 600.0,
        materialize: bool = False,
    ):
        self.input_dir = input_dir
        self.config = config
        self.cache_ttl = cache_ttl
        self.materialize = materialize
        self._tables = {t["name"]: t for t in config.get("tables", [])}
        self._cache: dict[str, tuple[float, object]] = {}

    def names(self) -> list[str]:
        return list(self._tables)

    def load(self, name: str, *, materialize: bool | None = None):
        """``materialize=True`` caches the table's BLOCKS in the object
        store (Ray's analog of the reference's in-memory DataFrame cache —
        repeated pipelines over the same table skip the parquet re-read for
        ``cache_ttl`` seconds, and the object store spills to disk if the
        table outgrows memory). Default (False) caches only the lazy plan
        handle, avoiding re-planning/re-listing, never re-read cost."""
        if name not in self._tables:
            raise KeyError(f"unknown table {name!r}; known: {self.names()}")
        import time

        materialize = self.materialize if materialize is None else materialize
        cache_key = (name, materialize)
        if self.cache_ttl > 0:
            hit = self._cache.get(cache_key)
            if hit is not None and time.monotonic() - hit[0] < self.cache_ttl:
                return hit[1]
        ds = load_table_from_config(self.input_dir, self._tables[name])
        if materialize:
            ds = ds.materialize()
        if self.cache_ttl > 0:
            self._cache[cache_key] = (time.monotonic(), ds)
        return ds

    def load_split(self, split: str):
        """Split directory convention (reference data.splits,
        ballet/validation/main.py:71-89)."""
        splits = self.config.get("splits", {})
        if split not in splits:
            raise KeyError(f"unknown split {split!r}; known: {list(splits)}")
        path = splits[split]
        if not os.path.isabs(path):
            path = os.path.join(self.input_dir, path)
        return rd.read_parquet(path)
