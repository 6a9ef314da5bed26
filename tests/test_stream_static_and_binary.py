"""Stream-static enrichment join and the binaryFile source.

- Stream-static: a streaming fact (parquet directory source) joined
  to a STATIC broadcast dimension — the canonical enrichment shape;
  the dim is re-read per micro-batch without any state store.
- binaryFile: Spark's built-in whole-file binary source, the entry
  point of every multimodal pipeline (SURVEY §2.1 S1 maps camelot's
  PDF scan onto it); content and length must round-trip exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

FACTS = "user_id long, amount double"
DIM = "user_id long, tier string"


def test_stream_static_enrichment_join(spark, tmp_path):
    facts = [(1, 10.0), (2, 20.0), (1, 5.0), (3, 7.0)]
    dim = [(1, "gold"), (2, "silver")]  # user 3 has no tier
    f_path = str(tmp_path / "facts")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(facts, FACTS).coalesce(1).write.parquet(f_path)
    static_dim = spark.createDataFrame(dim, DIM)

    stream = spark.readStream.schema(FACTS).parquet(f_path)
    enriched = stream.join(F.broadcast(static_dim), "user_id", "left").select(
        "user_id",
        "amount",
        F.coalesce("tier", F.lit("none")).alias("tier"),
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["amount"], r["tier"])
        for r in spark.read.parquet(out_path).collect()
    }
    assert got == {
        (1, 10.0, "gold"),
        (1, 5.0, "gold"),
        (2, 20.0, "silver"),
        (3, 7.0, "none"),
    }


def test_binaryfile_source_roundtrip(spark, tmp_path):
    payloads = {
        "a.bin": b"\x00\x01\x02hello",
        "b.bin": b"",
        "c.bin": bytes(range(256)),
    }
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            "length",
            "content",
        )
    )
    rows = {r["name"]: r for r in df.collect()}
    # gotcha pinned: binaryFile SKIPS zero-length files entirely —
    # pipelines must not rely on empty blobs surviving ingestion
    assert set(rows) == {"a.bin", "c.bin"}
    for name in rows:
        data = payloads[name]
        assert rows[name]["length"] == len(data)
        assert bytes(rows[name]["content"]) == data
