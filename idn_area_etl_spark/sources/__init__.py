from idn_area_etl_spark.sources.raw import (
    RAW_TABLE_SCHEMA,
    raw_from_cell_grids,
)
from idn_area_etl_spark.sources.tables import load_table, load_tables

__all__ = ["RAW_TABLE_SCHEMA", "raw_from_cell_grids", "load_table", "load_tables"]
