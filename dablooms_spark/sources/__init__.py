from dablooms_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    synth_webpages,
    table_row_count,
)

__all__ = [
    "load_table",
    "load_tables",
    "synth_webpages",
    "table_row_count",
    "TABLE_NAMES",
]
