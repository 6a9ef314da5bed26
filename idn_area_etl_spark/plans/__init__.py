from idn_area_etl_spark.plans.registry import QuerySpec, all_specs

__all__ = ["QuerySpec", "all_specs"]
