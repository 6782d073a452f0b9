"""Per-round checkpointing with resume — the engine's durability layer.

The reference is resumable only by rerunning from the input file; the graft
contract (BASELINE.json north_rule) requires every superstep to checkpoint
contracted-edge and label tables with round metrics so a killed job resumes
mid-Boruvka. In a catalog deployment these would be Iceberg tables with
snapshot metadata; this container has no Iceberg jars, so the same contract
is implemented as parquet round directories plus an atomically-replaced JSON
manifest (write-to-temp + rename). Checkpointing also truncates Catalyst
lineage — without it, iterative join plans grow without bound.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


class RoundCheckpointer:
    """Persists (edges, labels) per round under ``root`` and resumes from the
    last completed round."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _read_manifest(self) -> dict:
        path = self._manifest_path()
        if not os.path.exists(path):
            return {"rounds": [], "final": None}
        with open(path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path())  # atomic commit

    # -- rounds -----------------------------------------------------------
    @staticmethod
    def _partition_lineage(path: str) -> list[dict]:
        """Per-partition file lineage for a written table: one entry per
        parquet part file with its byte size (the Iceberg-manifest analogue —
        snapshot membership is exactly this file list; north_rule's
        'per-partition lineage')."""
        out = []
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                full = os.path.join(path, name)
                out.append({"file": name, "bytes": os.path.getsize(full)})
        return out

    def save_round(
        self,
        rnd: int,
        edges: DataFrame,
        labels: DataFrame,
        metrics: dict | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """Write both tables, commit the manifest (with per-partition file
        lineage and optional round metrics), return re-read (lineage-free)
        DataFrames."""
        edir = os.path.join(self.root, f"round={rnd}", "edges")
        ldir = os.path.join(self.root, f"round={rnd}", "labels")
        edges.write.mode("overwrite").parquet(edir)
        labels.write.mode("overwrite").parquet(ldir)
        manifest = self._read_manifest()
        manifest["rounds"] = [r for r in manifest["rounds"] if r["round"] < rnd]
        manifest["rounds"].append(
            {
                "round": rnd,
                "edges": edir,
                "labels": ldir,
                "ts": time.time(),
                "edges_files": self._partition_lineage(edir),
                "labels_files": self._partition_lineage(ldir),
                "metrics": metrics or {},
            }
        )
        self._write_manifest(manifest)
        return self.spark.read.parquet(edir), self.spark.read.parquet(ldir)

    def save_final(self, labels: DataFrame) -> DataFrame:
        # Versioned dir (snapshot semantics): overwriting a fixed location
        # would invalidate DataFrames returned by an earlier run that still
        # point at the old files.
        manifest = self._read_manifest()
        version = manifest.get("final_version", 0) + 1
        fdir = os.path.join(self.root, f"final_labels_v{version}")
        labels.write.mode("overwrite").parquet(fdir)
        manifest["final"] = fdir
        manifest["final_version"] = version
        self._write_manifest(manifest)
        return self.spark.read.parquet(fdir)

    def resume(self) -> tuple[int, DataFrame, DataFrame] | None:
        """(next_round, edges, labels) from the last committed round, or None."""
        manifest = self._read_manifest()
        if not manifest["rounds"]:
            return None
        last = max(manifest["rounds"], key=lambda r: r["round"])
        return (
            last["round"] + 1,
            self.spark.read.parquet(last["edges"]),
            self.spark.read.parquet(last["labels"]),
        )

    def final(self) -> DataFrame | None:
        manifest = self._read_manifest()
        if manifest.get("final"):
            return self.spark.read.parquet(manifest["final"])
        return None

    def clear(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)
