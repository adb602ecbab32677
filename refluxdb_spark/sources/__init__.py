from refluxdb_spark.sources.lineprotocol import (
    explode_fields,
    parse_lines_df,
    read_lineprotocol,
)

__all__ = ["parse_lines_df", "explode_fields", "read_lineprotocol"]
