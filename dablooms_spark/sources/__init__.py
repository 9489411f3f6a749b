from dablooms_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    synth_webpages,
)

__all__ = ["load_table", "load_tables", "synth_webpages", "TABLE_NAMES"]
