"""Per-superstep checkpointing with lineage manifests (SURVEY §2.9).

The reference is restartable only at phase granularity (phase state is
``(G_coarse, C_orig)``, ``runMultiPhaseBasic.cpp:87-161``); the engine
checkpoints every superstep: each ``save`` writes the state DataFrames as
Parquet plus a JSON manifest carrying iteration metadata, metrics, the
schema, and per-partition row counts (the lineage record). ``load_latest``
returns the newest manifest whose data files are all present, so a run
killed mid-write resumes from the previous consistent step.

Layout:
    <dir>/<name>/step_<k>/<df_name>.parquet
    <dir>/<name>/step_<k>/manifest.json      (written last — commit marker)
"""

from __future__ import annotations

import json
import pathlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CheckpointState:
    meta: dict
    dataframes: dict[str, DataFrame] = field(default_factory=dict)


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = pathlib.Path(base_dir)
        self.base.mkdir(parents=True, exist_ok=True)
        self._step = {}

    def save(self, name: str, meta: dict, dataframes: dict[str, DataFrame]) -> None:
        step = self._step.get(name, self._next_step(name))
        step_dir = self.base / name / f"step_{step:06d}"
        step_dir.mkdir(parents=True, exist_ok=True)
        lineage = {}
        for df_name, df in dataframes.items():
            path = step_dir / f"{df_name}.parquet"
            df.write.mode("overwrite").parquet(str(path))
            parts = (
                df.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            lineage[df_name] = {
                "schema": df.schema.json(),
                "partition_rows": {str(r["pid"]): r["count"] for r in parts},
                "rows": sum(r["count"] for r in parts),
            }
        manifest = {"step": step, "meta": meta, "lineage": lineage}
        tmp = step_dir / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        tmp.rename(step_dir / "manifest.json")  # atomic commit marker
        self._step[name] = step + 1

    def _next_step(self, name: str) -> int:
        d = self.base / name
        if not d.exists():
            return 0
        steps = [int(p.name.split("_")[1]) for p in d.glob("step_*")]
        return max(steps) + 1 if steps else 0

    def load_latest(self, name: str) -> CheckpointState | None:
        d = self.base / name
        if not d.exists():
            return None
        for step_dir in sorted(d.glob("step_*"), reverse=True):
            mf = step_dir / "manifest.json"
            if not mf.exists():
                continue  # incomplete write — fall back to the previous step
            manifest = json.loads(mf.read_text())
            dfs = {}
            ok = True
            for df_name in manifest["lineage"]:
                path = step_dir / f"{df_name}.parquet"
                if not path.exists():
                    ok = False
                    break
                dfs[df_name] = self.spark.read.parquet(str(path))
            if ok:
                self._step[name] = manifest["step"] + 1
                return CheckpointState(meta=manifest["meta"], dataframes=dfs)
        return None
