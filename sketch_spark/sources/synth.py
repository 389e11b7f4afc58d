"""Deterministic synthetic transcript corpus with planted duplicate truth.

Implements FIXTURES.md §1: the `transcripts` table (exact input_hint schema)
plus `truth_pairs` / `truth_clusters` ground truth.  Mirrors the reference's
planted-truth test style (testsrc/mhtest.cpp:44-58 constructs sets with known
overlap; benchmark/acc.cpp:38-45 plants true J = 1/3) at conversation level.

Families (seed-pinned, numpy RNG):
  exact      — conv cloned verbatim under a new conv_id
  near_f05/10/20 — clone with ~5/10/20% of turns reworded
  tail       — clone with last turns dropped
  substring  — two unrelated convs sharing one >= L-char verbatim span
  boiler     — one template, many light variants (hot LSH bucket)
  single     — independent convs (precision guard)
  edge       — 1- and 2-turn convs (+ one exact clone pair)

truth_pairs carries the exact turn-level 3-gram Jaccard computed on the SAME
shingle definition the pipeline uses; truth_clusters = connected components
of {pairs with J >= tau_truth} ∪ {substring pairs}.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

SEP = "\x1e"
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser", "calc", None]

_WORDS = [
    f"w{i:03d}" for i in range(400)
] + "the a and of to in is on for with data spark query table join hash value row scan".split()


@dataclass
class SynthConfig:
    seed: int = 42
    n_single: int = 80
    n_exact: int = 20
    n_near: int = 30  # per rewording tier
    n_tail: int = 15
    n_substring: int = 10  # pairs
    n_boiler: int = 30  # variants of one template
    n_edge: int = 8
    turns_lo: int = 12
    turns_hi: int = 40
    toks_lo: int = 5
    toks_hi: int = 25
    substring_len: int = 260
    tau_truth: float = 0.5
    scale: int = 1  # multiplies every family count (bench corpora)

    def scaled(self) -> "SynthConfig":
        c = SynthConfig(**{**self.__dict__})
        if self.scale > 1:
            for f in ("n_single", "n_exact", "n_near", "n_tail", "n_substring", "n_boiler", "n_edge"):
                setattr(c, f, getattr(self, f) * self.scale)
            c.scale = 1
        return c


@dataclass
class SynthCorpus:
    transcripts: pd.DataFrame
    truth_pairs: pd.DataFrame
    truth_clusters: pd.DataFrame
    config: SynthConfig = field(default_factory=SynthConfig)


_WORDS_ARR = np.array(_WORDS)


def _mk_turns(rng: np.random.Generator, cfg: SynthConfig, n_turns: int | None = None) -> list[str]:
    # `is None`, not falsy-or: an explicit n_turns=0 must mean an empty
    # conversation, not a random-length one
    nt = int(
        n_turns if n_turns is not None else rng.integers(cfg.turns_lo, cfg.turns_hi + 1)
    )
    # batch the RNG work: one draw for all token counts, one for all tokens
    ks = rng.integers(cfg.toks_lo, cfg.toks_hi + 1, size=nt)
    idx = rng.integers(0, len(_WORDS), size=int(ks.sum()))
    toks = _WORDS_ARR[idx]
    out = []
    pos = 0
    for k in ks:
        out.append(" ".join(toks[pos : pos + k]))
        pos += k
    return out


def _reword(rng: np.random.Generator, turns: list[str], frac: float) -> list[str]:
    out = list(turns)
    n_mut = max(1, int(round(frac * len(turns))))
    pos = rng.choice(len(turns), size=min(n_mut, len(turns)), replace=False)
    for p in pos:
        toks = out[p].split()
        j = int(rng.integers(0, len(toks)))
        toks[j] = _WORDS[int(rng.integers(0, len(_WORDS)))] + "x"
        out[p] = " ".join(toks)
    return out


def _shingle_set(turns: list[str], n: int = 3) -> set[str]:
    if len(turns) < n:
        return set()
    return {SEP.join(turns[i : i + n]) for i in range(len(turns) - n + 1)}


def _jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def generate(cfg: SynthConfig | None = None) -> SynthCorpus:
    cfg = (cfg or SynthConfig()).scaled()
    rng = np.random.default_rng(cfg.seed)
    convs: dict[str, list[str]] = {}
    pairs: list[tuple[str, str, str, float]] = []
    cid = 0

    def nid() -> str:
        nonlocal cid
        cid += 1
        return f"conv_{cid:08d}"

    def add(turns: list[str]) -> str:
        i = nid()
        convs[i] = turns
        return i

    def plant_pair(a: str, b: str, family: str):
        ja = _jaccard(_shingle_set(convs[a]), _shingle_set(convs[b]))
        lo, hi = min(a, b), max(a, b)
        pairs.append((lo, hi, family, ja))

    for _ in range(cfg.n_single):
        add(_mk_turns(rng, cfg))

    for _ in range(cfg.n_exact):
        t = _mk_turns(rng, cfg)
        plant_pair(add(t), add(list(t)), "exact")

    for frac, fam in ((0.05, "near_f05"), (0.10, "near_f10"), (0.20, "near_f20")):
        for _ in range(cfg.n_near):
            t = _mk_turns(rng, cfg)
            plant_pair(add(t), add(_reword(rng, t, frac)), fam)

    for _ in range(cfg.n_tail):
        t = _mk_turns(rng, cfg)
        drop = int(rng.integers(1, max(2, len(t) // 6)))
        plant_pair(add(t), add(t[:-drop]), "tail")

    # substring pairs: same long span inserted as one turn in two unrelated convs
    for _ in range(cfg.n_substring):
        span_words = []
        while sum(len(w) + 1 for w in span_words) < cfg.substring_len:
            span_words.append(_WORDS[int(rng.integers(0, len(_WORDS)))])
        span = " ".join(span_words)
        ta, tb = _mk_turns(rng, cfg), _mk_turns(rng, cfg)
        ta.insert(int(rng.integers(0, len(ta))), span)
        tb.insert(int(rng.integers(0, len(tb))), span)
        plant_pair(add(ta), add(tb), "substring")

    # boilerplate hot bucket: 1 template x n_boiler light variants
    template = _mk_turns(rng, cfg, n_turns=max(cfg.turns_lo, 16))
    boiler_ids = []
    for _ in range(cfg.n_boiler):
        v = list(template)
        v.append("variant " + _WORDS[int(rng.integers(0, len(_WORDS)))])
        boiler_ids.append(add(v))
    for i in range(1, len(boiler_ids)):
        plant_pair(boiler_ids[0], boiler_ids[i], "boiler")

    # edge cases: tiny convs, incl. one exact clone pair
    edge_first = None
    for j in range(cfg.n_edge):
        t = _mk_turns(rng, cfg, n_turns=1 + (j % 2))
        i = add(t)
        if j == 0:
            edge_first = t
    if edge_first is not None:
        a = add(list(edge_first))
        # pair with the original edge conv (first edge id)
        orig = [k for k, v in convs.items() if v == edge_first][0]
        plant_pair(orig, a, "edge_exact")

    # ---- materialize transcripts rows ----
    rows = []
    t0 = np.datetime64("2026-01-01T00:00:00")
    for conv_id in sorted(convs):
        turns = convs[conv_id]
        base = t0 + np.timedelta64(int(rng.integers(0, 10_000_000)), "s")
        for ti, text in enumerate(turns):
            role = ROLES[ti % len(ROLES)]
            tool = TOOLS[ti % len(TOOLS)] if role == "tool" else None
            rows.append(
                (
                    conv_id,
                    np.int32(ti),
                    role,
                    text,
                    tool,
                    base + np.timedelta64(ti * 7, "s"),
                )
            )
    tdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")

    pdf = pd.DataFrame(pairs, columns=["a_conv_id", "b_conv_id", "family", "exact_jaccard"])

    # truth clusters: union-find over qualifying pairs.  A planted pair
    # qualifies when its shingle Jaccard clears tau_truth OR the two convs
    # share a verbatim span >= substring-detection length L (clone families
    # below tau still share long unmodified turn runs — those ARE duplicates
    # per the north rule's suffix/substring criterion).
    def _shares_span(a_id: str, b_id: str, L: int = 200, k: int = 50) -> bool:
        """Fast 'longest common substring >= L' test: shared k-gram rolling
        hash + maximal extension around one witness (same guarantee family
        as the pipeline's winnowing pass; O(n) per pair vs O(n^2) LCS)."""
        from sketch_spark.operators.suffix import _kgram_hashes

        ab = SEP.join(convs[a_id])
        bb = SEP.join(convs[b_id])
        ha = _kgram_hashes(ab, k)
        hb = _kgram_hashes(bb, k)
        if ha.size == 0 or hb.size == 0:
            return False
        common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
        na, nb = len(ab), len(bb)
        for pa, pb in zip(ia.tolist(), ib.tolist()):
            l = 0
            while pa - l - 1 >= 0 and pb - l - 1 >= 0 and ab[pa - l - 1] == bb[pb - l - 1]:
                l += 1
            r = 0
            while pa + r < na and pb + r < nb and ab[pa + r] == bb[pb + r]:
                r += 1
            if l + r >= L:
                return True
        return False

    substr_detectable = pdf.apply(
        lambda r: r.exact_jaccard < cfg.tau_truth
        and r.family != "substring"
        and _shares_span(r.a_conv_id, r.b_conv_id),
        axis=1,
    ) if len(pdf) else pd.Series(dtype=bool)
    pdf["substr_detectable"] = substr_detectable
    qual = pdf[
        (pdf.exact_jaccard >= cfg.tau_truth)
        | (pdf.family == "substring")
        | pdf.substr_detectable
    ]
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, r in qual.iterrows():
        ra, rb = find(r.a_conv_id), find(r.b_conv_id)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[str, str] = {}
    for conv_id in convs:
        members[conv_id] = find(conv_id) if conv_id in parent else conv_id
    cdf = pd.DataFrame(
        sorted(members.items()), columns=["conv_id", "cluster_id"]
    )
    return SynthCorpus(tdf, pdf, cdf, cfg)


def to_spark(spark, corpus: SynthCorpus):
    """Create the three DataFrames (transcripts repartitioned by conv bucket,
    the Iceberg-partitioning stand-in)."""
    from pyspark.sql import functions as F

    t = spark.createDataFrame(corpus.transcripts)
    t = t.withColumn("turn_idx", F.col("turn_idx").cast("int")).repartition(
        max(spark.sparkContext.defaultParallelism, 8), "conv_id"
    )
    p = spark.createDataFrame(corpus.truth_pairs)
    c = spark.createDataFrame(corpus.truth_clusters)
    return t, p, c
