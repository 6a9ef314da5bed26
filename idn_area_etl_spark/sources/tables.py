"""Loaders for the synthetic TPC-H-ish parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst gets parquet footers, so
filter pushdown / column pruning / partition pruning all apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


#: Tables whose downstream operators are per-row expensive (shingling,
#: minhash, vector math): when their scan yields fewer partitions than
#: cores (single-row-group test files), spread once so the expensive
#: expressions parallelize.  Fact-table scan/join/agg queries are NOT
#: spread — measurements show the 1-task shuffle write costs more than
#: the parallelism gains, and Catalyst's broadcast-join pipelines keep
#: them in a single stage.  At real scale scans produce >= cores
#: splits and the guard no-ops.  Decisions are memoized per file.
_SPREAD_TABLES = {"documents", "embeddings"}
_spread_decisions: dict[tuple[str, str], bool] = {}


def _spread(spark: SparkSession, df: DataFrame, key: tuple[str, str]) -> DataFrame:
    cores = spark.sparkContext.defaultParallelism
    needs = _spread_decisions.get(key)
    if needs is None:
        needs = df.rdd.getNumPartitions() < cores
        _spread_decisions[key] = needs
    return df.repartition(cores) if needs else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver may call query builders from its own SparkSession;
    # timestamp results only match the (UTC-naive) DuckDB oracle under
    # a UTC session timezone, so pin it here rather than relying on the
    # session factory having been ours.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS).  Spark <=4.0
        # rejects that type unless nanosAsLong is set (then: read the
        # raw longs, truncate to micros — identical to DuckDB); Spark
        # >=4.1 reads it natively as TIMESTAMP_NTZ (ignoring the
        # legacy flag), where the naive value under the pinned UTC
        # session equals DuckDB's naive timestamp — cast to the
        # session-zoned TIMESTAMP the query surface expects.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001 - conf removed in newer Spark
            pass
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _SPREAD_TABLES:
        return _spread(spark, df, (sf_dir, name))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
