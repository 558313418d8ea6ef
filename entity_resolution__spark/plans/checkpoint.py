"""Per-stage snapshot checkpointing with lineage + metrics (north_rule).

The reference checkpoints every stage as a CSV file
(/root/reference — every `to_csv` in SURVEY.md §2.1); here each stage is
a committed snapshot table a re-run resumes from. On a production
cluster the backend is Iceberg (`df.writeTo(cat.db.stage).createOrReplace()`
— atomic snapshot commits, time travel); this container has no Iceberg
runtime jars, so StageStore implements the same contract on parquet +
atomic manifest files: write data to a temp dir, fsync a JSON manifest
carrying {stage, snapshot_id, fingerprint, lineage, metrics,
per-partition row counts}, rename into place. A stage whose fingerprint
(hash of params + input snapshot ids) matches the last committed
manifest is NOT recomputed — that is the resume path, and it is what the
kill-and-rerun tests exercise.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint(params: dict[str, Any]) -> str:
    import hashlib

    return hashlib.sha256(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


@dataclass
class StageStore:
    root: str
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:8])

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_current(self, stage: str, fp: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("fingerprint") == fp and m.get("committed"))

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        m = self.manifest(stage)
        if not m:
            raise FileNotFoundError(f"no committed snapshot for stage {stage}")
        return spark.read.parquet(os.path.join(self._dir(stage), m["snapshot_id"]))

    def commit(
        self,
        df: DataFrame,
        stage: str,
        fp: str,
        lineage: list[str] | None = None,
        extra_metrics: dict | None = None,
    ) -> DataFrame:
        """Materialize df as the stage's new snapshot; returns the
        re-read DataFrame (cuts lineage like an Iceberg round-trip)."""
        t0 = time.monotonic()
        stage_dir = self._dir(stage)
        snap_id = f"snap-{self.run_id}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(stage_dir, snap_id)
        os.makedirs(stage_dir, exist_ok=True)
        df.write.mode("overwrite").parquet(data_dir)
        spark = df.sparkSession
        out = spark.read.parquet(data_dir)
        # per-partition lineage/metrics: rows per output file-partition
        per_part = [
            {"partition_id": int(r["_pid"]), "rows": int(r["rows"])}
            for r in out.groupBy(F.spark_partition_id().alias("_pid"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        manifest = {
            "stage": stage,
            "snapshot_id": snap_id,
            "fingerprint": fp,
            "run_id": self.run_id,
            "committed": True,
            "lineage": lineage or [],
            "metrics": {
                "rows_out": sum(p["rows"] for p in per_part),
                "wall_ms": int((time.monotonic() - t0) * 1000),
                **(extra_metrics or {}),
            },
            "partitions": per_part,
        }
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path(stage))
        # GC older snapshots (keep current + previous)
        snaps = sorted(
            d for d in os.listdir(stage_dir) if d.startswith("snap-")
        )
        for d in snaps[:-2]:
            if d != snap_id:
                shutil.rmtree(os.path.join(stage_dir, d), ignore_errors=True)
        return out

    def stage(
        self,
        spark: SparkSession,
        name: str,
        params: dict[str, Any],
        compute,
        lineage: list[str] | None = None,
    ) -> DataFrame:
        """Resume-or-compute: reuse the committed snapshot when the
        fingerprint matches, else run `compute()` and commit."""
        fp = fingerprint(params)
        if self.is_current(name, fp):
            return self.read(spark, name)
        df = compute()
        return self.commit(df, name, fp, lineage=lineage)
