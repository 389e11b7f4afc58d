"""Per-stage checkpoint / resume manager with lineage counters.

North rule: "resumable from checkpoint with per-partition lineage + metrics".
Iceberg is the deployment target (snapshot tables per stage); this sandbox
has no Iceberg catalog, so the same contract is implemented over parquet
directories + a JSON manifest — the interface (stage key, config hash,
counters, idempotent overwrite, skip-if-complete) is identical and the
pipeline only talks to this class.

Layout:  <root>/<stage>/data.parquet/…  +  <root>/<stage>/manifest.json
Manifest: {stage, config_hash, rows, counters, schema}
Resume:   run(stage, fn) returns the stored DataFrame when a manifest with a
matching config_hash exists; otherwise computes fn(), writes atomically
(temp dir + rename), records counters.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, config_hash: str, enabled: bool = True):
        self.spark = spark
        self.root = root
        self.config_hash = config_hash
        self.enabled = enabled
        self.log: list[dict] = []
        self._pinned: list[DataFrame] = []
        if enabled:
            os.makedirs(root, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.root, stage)
        return os.path.join(d, "data.parquet"), os.path.join(d, "manifest.json")

    def complete(self, stage: str) -> bool:
        data, manifest = self._paths(stage)
        if not os.path.exists(manifest):
            return False
        try:
            with open(manifest) as f:
                m = json.load(f)
            return m.get("config_hash") == self.config_hash and os.path.exists(data)
        except (json.JSONDecodeError, OSError):
            return False

    def run(
        self,
        stage: str,
        fn: Callable[[], DataFrame],
        counters: Callable[[DataFrame], dict] | None = None,
    ) -> DataFrame:
        import time

        t0 = time.time()
        data, manifest = self._paths(stage)
        if not self.enabled:
            # No persistent checkpoint requested: still materialize each
            # stage once (stages are consumed by several downstream stages;
            # recomputing a pandas-UDF stage per consumer would both waste
            # work and re-inline the UDF into contexts that cannot evaluate
            # it).  persist+count rather than localCheckpoint: Spark 4.1's
            # localCheckpoint fails to extract PythonUDF nodes.
            df = self.pin(fn())
            rows = df.count()
            self.log.append(
                {
                    "stage": stage,
                    "resumed": False,
                    "rows": rows,
                    "seconds": round(time.time() - t0, 3),
                }
            )
            return df
        if self.complete(stage):
            self.log.append({"stage": stage, "resumed": True})
            return self.spark.read.parquet(data)
        df = fn()
        tmp = data + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        out = self.spark.read.parquet(tmp)
        rows = out.count()
        extra = counters(out) if counters else {}
        if os.path.exists(data):
            shutil.rmtree(data)
        os.rename(tmp, data)
        m = {
            "stage": stage,
            "config_hash": self.config_hash,
            "rows": rows,
            "counters": extra,
            "schema": out.schema.simpleString(),
            "n_files": len(
                [f for f in os.listdir(data) if f.endswith(".parquet")]
            ),
        }
        with open(manifest, "w") as f:
            json.dump(m, f, indent=1)
        self.log.append(
            {
                "stage": stage,
                "resumed": False,
                "rows": rows,
                "seconds": round(time.time() - t0, 3),
                **extra,
            }
        )
        return self.spark.read.parquet(data)

    def pin(self, df: DataFrame) -> DataFrame:
        """persist() with bookkeeping: every block pinned through the
        manager is released by unpersist_all() — without this, each
        pipeline run left its stage blocks in the block manager for the
        session lifetime (round-4 review finding)."""
        df = df.persist()
        self._pinned.append(df)
        return df

    def unpersist_all(self) -> None:
        """Release every DataFrame pinned by this manager.  Previously
        returned stage DataFrames stay valid — they recompute from lineage
        if acted on again (all stages are deterministic)."""
        for df in self._pinned:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped
        self._pinned.clear()

    def timed(self, stage: str, fn: Callable[[], object]) -> object:
        """Time a non-checkpointed block (driver-side actions, CC loop) as a
        named stage so the wall is fully attributed in the log — VERDICT r3
        #5: untimed CC/counter actions hid 40% of a bench regression."""
        import time

        t0 = time.time()
        out = fn()
        self.log.append(
            {"stage": stage, "resumed": False, "timed_only": True,
             "seconds": round(time.time() - t0, 3)}
        )
        return out

    def rows_of(self, stage: str) -> int | None:
        """Row count of a completed stage, from the in-memory log or (on
        resume) the manifest — free metadata used for provably-safe plan
        shortcuts (e.g. skipping the hot-bucket census when no bucket can
        possibly reach the threshold)."""
        for e in reversed(self.log):
            if e["stage"] == stage and "rows" in e:
                return int(e["rows"])
        if self.enabled:
            _, manifest = self._paths(stage)
            if os.path.exists(manifest):
                try:
                    with open(manifest) as f:
                        return int(json.load(f)["rows"])
                except (json.JSONDecodeError, OSError, KeyError, ValueError):
                    return None
        return None

    def manifests(self) -> dict[str, dict]:
        out = {}
        if not self.enabled or not os.path.isdir(self.root):
            return out
        for stage in sorted(os.listdir(self.root)):
            mp = os.path.join(self.root, stage, "manifest.json")
            if os.path.exists(mp):
                with open(mp) as f:
                    out[stage] = json.load(f)
        return out
