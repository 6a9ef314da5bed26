from idn_area_etl_spark.functions.cleaning import (
    clean_name,
    fix_wrapped_name,
    format_coordinate,
    normalize_words,
    py_strip,
)

__all__ = [
    "clean_name",
    "fix_wrapped_name",
    "format_coordinate",
    "normalize_words",
    "py_strip",
]
