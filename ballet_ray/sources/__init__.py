from ballet_ray.sources.registry import (
    TableRegistry,
    load_table,
    load_table_from_config,
    write_table,
)
from ballet_ray.sources.warc import WarcDatasource, read_warc, write_warc

__all__ = [
    "TableRegistry",
    "WarcDatasource",
    "load_table",
    "load_table_from_config",
    "read_warc",
    "write_table",
    "write_warc",
]
