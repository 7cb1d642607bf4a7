"""Snapshot catalog: Iceberg-semantics table store with a parquet fallback.

North-rule requirements this implements (BASELINE.json): every stage writes
its output as a table *snapshot* keyed by the fingerprint of its inputs +
parameters, so a re-run **resumes** — any stage whose output snapshot already
exists for its input fingerprint is skipped and read back instead of
recomputed (reference analogue: incremental pickles, storage/index.py:32-58,
but content-addressed and distributed).

On a real cluster with the Iceberg runtime jar, ``session.get_spark`` attaches
the Iceberg catalog and these tables map 1:1 onto Iceberg tables (snapshot id
↔ Iceberg snapshot, manifest.json ↔ Iceberg metadata, input_fingerprint ↔
snapshot summary property). The sandbox has no Iceberg jar, so the same
semantics run on a directory layout:

    {warehouse}/{table}/manifest.json          — snapshot list (atomic rename)
    {warehouse}/{table}/snap-{fingerprint}/    — parquet data files

Fingerprints are content-addressed: sha256 of (stage name, params, input
fingerprints) — deterministic across runs, so resume needs no mutable state.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def fingerprint(*parts: Any) -> str:
    """Deterministic 16-hex-char fingerprint of stage name + params + inputs."""
    raw = json.dumps(parts, sort_keys=True, default=str).encode()
    return hashlib.sha256(raw).hexdigest()[:16]


class ParquetCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.warehouse, table, "manifest.json")

    def _load_manifest(self, table: str) -> list[dict]:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _save_manifest(self, table: str, snapshots: list[dict]) -> None:
        p = self._manifest_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snapshots, f, indent=1)
        os.replace(tmp, p)  # atomic commit, Iceberg-style

    # -- snapshots ---------------------------------------------------------
    def snapshot_dir(self, table: str, snap: str) -> str:
        return os.path.join(self.warehouse, table, f"snap-{snap}")

    def has_snapshot(self, table: str, snap: str) -> bool:
        return any(s["id"] == snap for s in self._load_manifest(table))

    def write(self, df: DataFrame, table: str, snap: str, meta: dict | None = None) -> str:
        """Materialize df as snapshot ``snap`` of ``table``; returns data dir."""
        path = self.snapshot_dir(table, snap)
        df.write.mode("overwrite").parquet(path)
        manifest = [s for s in self._load_manifest(table) if s["id"] != snap]
        manifest.append(
            {
                "id": snap,
                "ts": time.time(),
                "path": path,
                **(meta or {}),
            }
        )
        self._save_manifest(table, manifest)
        return path

    def read(self, table: str, snap: str | None = None) -> DataFrame:
        """Read a snapshot (default: latest committed)."""
        manifest = self._load_manifest(table)
        if not manifest:
            raise FileNotFoundError(f"no snapshots for table {table}")
        if snap is None:
            entry = max(manifest, key=lambda s: s["ts"])
        else:
            entry = next(s for s in manifest if s["id"] == snap)
        return self.spark.read.parquet(entry["path"])

    def snapshots(self, table: str) -> list[dict]:
        return self._load_manifest(table)
