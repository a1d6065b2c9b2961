"""Source readers. The reference reads nothing from disk (data arrives from
the viewser/ingester services, SURVEY.md §1.4); this engine's canonical
source is Parquet with pushdown-friendly declarative reads."""

from .tables import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    read_parquet_pruned,
    read_stream_parquet,
    read_table,
    read_tables,
    write_bucketed,
    write_parquet,
    write_range_sorted,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)
