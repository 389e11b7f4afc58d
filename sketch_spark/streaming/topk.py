"""Structured Streaming operators.

The reference is a single-pass streaming *ingestion* engine (every sketch
supports addh on a live stream; realccm_t adds time decay, mult.h:43-170).
The dedup north rule is batch-with-checkpoints, so streaming is a side
surface here — but the monoid property that makes sketches Spark partial
aggregates makes them streaming aggregates for free.  This module provides
the two natural pieces:

  * windowed_counts: watermarked sliding-window key counts — the
    HeavyKeeper/realccm_t "frequency with forgetting" analog (old windows
    age out instead of exponential decay);
  * streaming one-perm register updates: groupBy(conv, bucket).min over a
    stream in update mode — literally the reference's CAS-min register
    ingestion (bbmh.h:959-969) as a streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed counts per key.  Append/update-mode safe: late
    rows beyond the watermark are dropped (the decay analog)."""
    w = F.window(F.col(ts_col), window, slide or window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("win.start", "win.end", key_col, "cnt")
    )


def streaming_one_perm_registers(
    stream: DataFrame,
    group_col: str = "conv_id",
    hash_col: str = "h",
    p: int = 7,
) -> DataFrame:
    """Streaming register table (update mode): min-per-(conv, bucket) over
    an unbounded stream of shingle hashes — the reference's lock-free
    streaming addh (bbmh.h:959-969) expressed as a streaming aggregation.
    Finalization (pivot to a 2^p array + densify) happens in batch at
    checkpoint time, exactly like the reference's finalize()."""
    vb = 64 - p
    mask = (1 << vb) - 1
    return (
        stream.select(
            F.col(group_col),
            F.shiftrightunsigned(F.col(hash_col), vb).alias("bucket"),
            F.col(hash_col).bitwiseAND(F.lit(mask)).alias("value"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.min("value").alias("register"))
    )
