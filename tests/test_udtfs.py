"""UDTF extension surface: the registered table function must agree
with the native explode fast path."""

from __future__ import annotations

from pyspark.sql import functions as F

from idn_area_etl_spark.functions.udtfs import register_udtfs


def _native_bigrams(df):
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.concat_ws(" ", F.get(toks, i - 1), F.get(toks, i)).alias("bigram"),
        ),
    )
    # explode(NULL) emits nothing — texts with <2 tokens drop out
    # (sequence(1, n-1) would otherwise count *down* for n < 2).
    guarded = F.when(F.size(toks) >= 2, pairs)
    return df.select("doc_id", F.explode(guarded).alias("p")).select(
        "doc_id", "p.pos", "p.bigram"
    )


def test_udtf_matches_native_explode(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "Alpha beta  gamma"), (2, "solo"), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, t.pos, t.bigram FROM udtf_docs, "
            "LATERAL word_bigrams(text) t"
        ).collect()
    )
    want = sorted(tuple(r) for r in _native_bigrams(df).collect())
    assert got == want
    assert (1, 0, "alpha beta") in got and (1, 1, "beta gamma") in got
    assert all(r[0] == 1 for r in got)  # rows 2-4 emit nothing
