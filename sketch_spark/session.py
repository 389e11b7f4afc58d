"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (local[N], 128 GiB, single JVM) but every knob is the
one you would also set on a 1000-executor cluster:

  * AQE on (runtime coalescing, skew-join splitting) — the LSH bucket join is
    the skew hotspot at 10^12 turns.
  * Arrow enabled for the few pandas UDF stages.
  * ANSI off for sketch_spark-owned sessions: WangHash / rolling hashes rely
    on two's-complement wraparound (identical bit pattern to the reference's
    uint64 arithmetic, hash.h:42-63). Driver-owned sessions may keep ANSI on;
    all `__spark_entry__.queries()` plans are overflow-free by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sketch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # shuffle partitions default: 2x cores locally; a real cluster would use
    # ~2-3x total executor cores (AQE coalesces down afterwards).
    if shuffle_partitions is None:
        n = int(cpus) if str(cpus).isdigit() else 32
        shuffle_partitions = max(2 * n, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
