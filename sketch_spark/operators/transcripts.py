"""Transcript-table operators: stable turn ordering + per-conversation
shingling (the ingestion front of the dedup pipeline).

Input schema (BASELINE.json input_hint):
  transcripts(conv_id string, turn_idx int, role string, text string,
              tool string, ts timestamp)

Stable turn ordering = (turn_idx, ts, role) — the deterministic tie-break the
per-turn text-equality invariant depends on (SURVEY.md §7.4).

Shingles are turn-level n-grams: the texts of n consecutive turns joined with
an \\x1e separator, hashed JVM-side with xxhash64 (the reference shingler
hash_ngrams streams XXH3 over the concatenated items, util.cpp:47-68; same
sliding-window semantics: L turns -> max(L-n+1, 0) shingles).

Everything is ONE groupBy(conv_id): sort-by-struct + higher-order functions;
no Python, no window function, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1e"
DEFAULT_N = 3
DEFAULT_SEED = 42


def conv_table(transcripts: DataFrame, n: int = DEFAULT_N, seed: int = DEFAULT_SEED) -> DataFrame:
    """One row per conversation:
      conv_id, n_turns, full_text (ordered, SEP-joined), full_hash,
      shingles (sorted DISTINCT xxhash64 array), n_shingles (distinct).
    """
    turns = F.array_sort(
        F.collect_list(F.struct("turn_idx", "ts", "role", "text"))
    )
    agg = transcripts.groupBy("conv_id").agg(turns.alias("turns"))
    texts = F.col("turns").getField("text")
    n_turns = F.size("turns")
    # null_replacement="": array_join otherwise SKIPS null elements, so a
    # conversation with a null-text turn would serialize identically to
    # one WITHOUT that turn — a false exact-duplicate (and identically
    # shrunken shingle windows).  With the empty replacement the turn
    # keeps its separator slot: ["x", null, "y"] -> "x\x1e\x1ey", distinct
    # from ["x", "y"] -> "x\x1ey".
    full_text = F.array_join(texts, SEP, null_replacement="")
    idx = F.sequence(F.lit(1), F.greatest(n_turns - F.lit(n - 1), F.lit(0)))
    shingle_strs = F.when(n_turns < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.array_join(F.slice(texts, i, n), SEP, null_replacement=""),
        )
    )
    shingles = F.array_sort(
        F.array_distinct(F.transform(shingle_strs, lambda s: F.xxhash64(s, F.lit(seed))))
    )
    return agg.select(
        "conv_id",
        # dictionary-encoded 8-byte working id: every downstream exchange
        # (64 band rows + ~L/w fingerprint rows per conv, the pipeline's
        # dominant byte streams) carries this long instead of the string id.
        # xxhash64 keeps it join-free and deterministic; injectivity is
        # ASSERTED per run (one agg over the persisted conv table,
        # dedup.DedupPipeline.run) — at 10^12 convs assign dense ids at
        # ingest instead and drop the assert.
        F.xxhash64("conv_id").alias("cid"),
        n_turns.alias("n_turns"),
        full_text.alias("full_text"),
        F.xxhash64(full_text, F.lit(seed)).alias("full_hash"),
        F.xxhash64(full_text, F.lit(seed + 1)).alias("full_hash2"),
        shingles.alias("shingles"),
        F.size(shingles).alias("n_shingles"),
    )


def exact_dup_pairs(conv: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Exact duplicates: identical full_text (hash-grouped, then pairs to the
    group's canonical = min id; a star, which is all connected
    components needs).  Catches short convs with zero shingles too.

    Equality is keyed on TWO independent 64-bit hashes (different seeds):
    one xxhash64 alone makes birthday collisions expected at the 10^12-conv
    target (n^2/2^65 ~ thousands of false edges, each transitively merging
    unrelated clusters through connected components); two push the
    expectation to n^2/2^129 ~ 10^-15.  Falls back to full_hash alone when
    the caller's table carries no second hash."""
    keys = ["full_hash", "full_hash2"] if "full_hash2" in conv.columns else ["full_hash"]
    groups = (
        conv.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return groups.select(
        F.element_at("ids", 1).alias("a"), F.explode(F.slice("ids", 2, 1 << 30)).alias("b")
    ).select("a", "b")
