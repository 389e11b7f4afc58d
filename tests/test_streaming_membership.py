"""Streaming operators (rate-source smoke) + membership/Bloom operators."""

import os
import time

import pytest
from pyspark.sql import functions as F

from sketch_spark.operators import membership
from sketch_spark.streaming import topk as stream_ops


def test_semi_anti_join(spark):
    probe = spark.createDataFrame([(i,) for i in range(10)], "k int")
    build = spark.createDataFrame([(i,) for i in range(0, 10, 2)], "k int")
    assert membership.semi_join(probe, build, ["k"]).count() == 5
    assert membership.anti_join(probe, build, ["k"]).count() == 5


def test_bloom_no_false_negatives_and_low_fpr(spark):
    n = 500
    elems = spark.createDataFrame([(f"k{i}",) for i in range(n)], "k string")
    n_bits, n_hashes = membership.bloom_params(n, fpr=0.01)
    bloom = membership.bloom_build(elems, "k", n_bits, n_hashes)
    present = membership.bloom_probe(elems, bloom, "k", n_bits, n_hashes)
    assert present.where(~F.col("may_contain")).count() == 0  # no false negs
    absent = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "k string")
    fp = membership.bloom_probe(absent, bloom, "k", n_bits, n_hashes).where(
        F.col("may_contain")
    ).count()
    assert fp / 2000 < 0.05  # target fpr 1%, generous bound


def test_streaming_windowed_counts_rate_source(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).cast("string").alias("key"),
        )
    )
    out = stream_ops.windowed_counts(stream, "key", "ts", "10 seconds", None, "5 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 40
        rows = 0
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("select count(*) c from win_counts").collect()[0].c
            if rows > 0:
                break
            time.sleep(1)
        assert rows > 0
        keys = {r.key for r in spark.sql("select distinct key from win_counts").collect()}
        assert keys <= {"0", "1", "2", "3", "4"}
    finally:
        q.stop()


def test_streaming_one_perm_registers_rate_source(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 500).load()
        .select(
            (F.col("value") % 3).cast("string").alias("conv_id"),
            F.xxhash64("value").alias("h"),
        )
    )
    regs = stream_ops.streaming_one_perm_registers(stream, p=4)
    q = (
        regs.writeStream.format("memory")
        .queryName("stream_regs")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 40
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("select count(*) c from stream_regs").collect()[0].c
            if n >= 3:
                break
            time.sleep(1)
        assert n >= 3
        # register values fit in 60 bits (p=4)
        mx = spark.sql("select max(register) m from stream_regs").collect()[0].m
        assert 0 <= mx < (1 << 60)
    finally:
        q.stop()


def test_streaming_update_query_stateful(spark, tmp_path):
    """The reference's insert-then-query (ssi.h:157-209) as a stateful
    streaming operator: a batch-2 arrival must pair with a batch-1 member
    of the same bucket (state survives micro-batches via the checkpoint)."""
    import time

    from sketch_spark.streaming.topk import streaming_update_query

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [("c1", 0, 42), ("c2", 0, 42), ("c3", 1, 99)],
        "conv_id string, band int, key long",
    ).write.mode("overwrite").parquet(f"{src}/b1")

    stream = spark.readStream.schema("conv_id string, band int, key long").option(
        "maxFilesPerTrigger", "100"
    ).parquet(f"{src}/b*")
    out = streaming_update_query(stream, bucket_cap=8)
    q = (
        out.writeStream.format("memory")
        .queryName("upq")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r.a, r.b) for r in spark.sql("SELECT * FROM upq").collect()}
        assert ("c1", "c2") in got1
        assert not any("c3" in p for p in got1)  # alone in its bucket
        # batch 2: c4 lands in c1/c2's bucket -> pairs with BOTH via state
        spark.createDataFrame(
            [("c4", 0, 42)], "conv_id string, band int, key long"
        ).write.mode("overwrite").parquet(f"{src}/b2")
        time.sleep(0.2)
        q.processAllAvailable()
        got2 = {(r.a, r.b) for r in spark.sql("SELECT * FROM upq").collect()}
        assert ("c1", "c4") in got2 and ("c2", "c4") in got2
    finally:
        q.stop()


def test_streaming_update_query_long_ids(spark, tmp_path):
    """The batch pipeline's band tables carry dictionary-encoded LONG
    cids; the streaming operator must follow the stream's id type in its
    output and state schemas (they were hardcoded to string)."""
    import time

    from sketch_spark.streaming.topk import streaming_update_query

    src = str(tmp_path / "srcL")
    ckpt = str(tmp_path / "ckptL")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [(11, 0, 42), (7, 0, 42), (99, 1, 5)],
        "conv_id long, band int, key long",
    ).write.mode("overwrite").parquet(f"{src}/b1")
    stream = spark.readStream.schema("conv_id long, band int, key long").option(
        "maxFilesPerTrigger", "100"
    ).parquet(f"{src}/b*")
    out = streaming_update_query(stream, bucket_cap=8)
    assert dict(out.dtypes)["a"] == "bigint"
    q = (
        out.writeStream.format("memory")
        .queryName("upq_long")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r.a, r.b) for r in spark.sql("SELECT * FROM upq_long").collect()}
        assert (7, 11) in got1  # NUMERIC min/max ordering, not lexicographic
        # batch 2: state survives and pairs numerically
        spark.createDataFrame(
            [(2, 0, 42)], "conv_id long, band int, key long"
        ).write.mode("overwrite").parquet(f"{src}/b2")
        time.sleep(0.2)
        q.processAllAvailable()
        got2 = {(r.a, r.b) for r in spark.sql("SELECT * FROM upq_long").collect()}
        assert (2, 7) in got2 and (2, 11) in got2
    finally:
        q.stop()
