"""Checkpointed stage boundaries + per-partition lineage.

The reference's durability discipline — autoCommit every 20k docs with a
single commit/optimize at the end (``solrconfig.xml:30-33``,
``MarcImporter.finish`` ``MarcImporter.java:418-442``) and restartable
per-id-range indexing scripts — maps to snapshot-committed stage outputs:
each build stage writes to a staging path, then atomically publishes by
recording the stage in ``manifest.json`` along with per-partition lineage
rows (partition id, row count) and config fingerprint. A re-run with the
same fingerprint skips completed stages (resume without recomputation);
a changed fingerprint invalidates downstream stages.

On a real cluster the same boundaries are Iceberg snapshot commits
(``writeTo(...).append()`` / MERGE INTO); this file-based store keeps the
semantics runnable in the sandbox (no Iceberg jars) behind the same API.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import threading
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def config_fingerprint(conf: dict[str, Any]) -> str:
    return hashlib.sha256(
        json.dumps(conf, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class IndexStore:
    """Directory-backed index store with manifest-gated stages."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.manifest_path = os.path.join(path, "manifest.json")
        # independent stages (docs || segments) commit from concurrent
        # driver threads; the manifest read-modify-write must be atomic
        self._lock = threading.Lock()

    # -- manifest -----------------------------------------------------------
    def _read_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"stages": {}, "fingerprint": None}

    def _write_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self.manifest_path)  # atomic publish

    def set_meta(self, meta: dict[str, Any]) -> None:
        """Record build parameters (n_salts, chain, ...) in the manifest so
        readers can size query-time partitioning without scanning data."""
        m = self._read_manifest()
        m.setdefault("meta", {}).update(meta)
        self._write_manifest(m)

    def get_meta(self) -> dict[str, Any]:
        return self._read_manifest().get("meta", {})

    def set_fingerprint(self, fp: str) -> None:
        m = self._read_manifest()
        if m.get("fingerprint") != fp:
            # config changed -> invalidate everything
            m = {"stages": {}, "fingerprint": fp}
            for name in list(os.listdir(self.path)):
                p = os.path.join(self.path, name)
                if os.path.isdir(p):
                    shutil.rmtree(p)
            self._write_manifest(m)

    def stage_complete(self, stage: str) -> bool:
        return stage in self._read_manifest()["stages"]

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.path, stage)

    # -- stage IO -----------------------------------------------------------
    def commit_stage(self, stage: str, df: DataFrame,
                     partition_sort: list[str] | None = None,
                     repartition_range: list[str] | None = None) -> DataFrame:
        """Write a stage output (if not already committed) and record
        per-partition lineage. Returns the re-read DataFrame (so downstream
        stages read the committed snapshot, not the live plan)."""
        spark = df.sparkSession
        if not self.stage_complete(stage):
            t_start = time.time()
            out = self.stage_path(stage)
            staging = out + ".staging"
            if os.path.exists(staging):
                shutil.rmtree(staging)
            w = df
            if repartition_range:
                w = w.repartitionByRange(*repartition_range)
            if partition_sort:
                w = w.sortWithinPartitions(*partition_sort)
            # Dictionary encoding OFF for stage tables: their dominant
            # columns are high-cardinality (terms with a long unique tail,
            # unique urls/doc_ids, compressed binary blobs), so the
            # dictionary always overflows and falls back — but only after
            # hashing every value into a per-chunk map. Measured on the
            # 220k-doc tf stage: the write dropped from ~165s of overhead
            # to ~8s (8 cores) with dictionary off, identical reads.
            (
                w.write.mode("overwrite")
                .option("parquet.enable.dictionary", "false")
                .parquet(staging)
            )
            if os.path.exists(out):
                shutil.rmtree(out)
            os.replace(staging, out)
            # per-partition lineage from parquet footers (no extra Spark
            # job; the Iceberg-manifest analog of per-file row counts)
            import pyarrow.parquet as pq

            names = sorted(
                f for f in os.listdir(out) if f.endswith(".parquet")
            )

            def _footer(args: tuple[int, str]) -> dict:
                i, name = args
                fpath = os.path.join(out, name)
                return {
                    "partition": i,
                    "file": name,
                    "rows": pq.ParquetFile(fpath).metadata.num_rows,
                    "bytes": os.path.getsize(fpath),
                }

            # footer reads release the GIL inside pyarrow; a thread pool
            # turns ~64 serial driver-side reads into one parallel sweep
            # (per-rep fixed overhead acts as the serial term against the
            # scaling criterion)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(names) or 1)) as ex:
                lineage = list(ex.map(_footer, enumerate(names)))
            with self._lock:
                m = self._read_manifest()
                m["stages"][stage] = {
                    "committed_at": time.time(),
                    # stage metrics next to the per-partition lineage rows:
                    # wall duration + output volume (the Iceberg snapshot
                    # summary analog — added-files/records/size)
                    "duration_sec": round(time.time() - t_start, 3),
                    "rows": int(sum(x["rows"] for x in lineage)),
                    "bytes": int(sum(x["bytes"] for x in lineage)),
                    "partitions": lineage,
                }
                self._write_manifest(m)
        return spark.read.parquet(self.stage_path(stage))

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self.stage_path(stage))

    def lineage(self) -> dict:
        return self._read_manifest()
