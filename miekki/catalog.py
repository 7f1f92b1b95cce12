"""Table catalog abstraction (SURVEY.md §2.8, O22/O23).

The pipeline speaks only this interface. Two implementations:

- ``HadoopCatalog`` — parquet directories + a ``_MANIFEST.json`` per
  table standing in for snapshot metadata. This is what runs in the
  sandbox (no Iceberg runtime jar exists here and the sandbox is
  offline — SURVEY.md §0.2).
- ``IcebergCatalog`` — the real-cluster path: DataFrameWriterV2
  ``writeTo(...).using('iceberg')``, snapshot ids from the table's
  ``.snapshots`` metadata. It cannot execute in this sandbox; its
  logic is unit-tested through interface-level fakes and kept
  deliberately thin.

Writes are atomic at the manifest level: data lands under
``_tmp_<run_id>`` and the manifest flips last, so a crashed half-write
is invisible to readers and simply overwritten on retry (idempotent
resume, BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class Catalog(ABC):
    @abstractmethod
    def read(self, name: str) -> DataFrame: ...

    @abstractmethod
    def overwrite(self, name: str, df: DataFrame, run_id: str) -> None: ...

    @abstractmethod
    def append(self, name: str, df: DataFrame) -> None: ...

    @abstractmethod
    def exists(self, name: str) -> bool: ...

    @abstractmethod
    def snapshot_id(self, name: str) -> str | None:
        """Opaque version token; changes on every successful write."""


class HadoopCatalog(Catalog):
    """Parquet-dir catalog with manifest-last atomic overwrite."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self._dir(name), "_MANIFEST.json")

    def read(self, name: str) -> DataFrame:
        with open(self._manifest(name)) as f:
            m = json.load(f)
        return self.spark.read.parquet(os.path.join(self._dir(name), m["data"]))

    def overwrite(self, name: str, df: DataFrame, run_id: str) -> None:
        d = self._dir(name)
        os.makedirs(d, exist_ok=True)
        data = f"data_{run_id}_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(d, data))
        old = None
        if os.path.exists(self._manifest(name)):
            with open(self._manifest(name)) as f:
                old = json.load(f)["data"]
        tmp = self._manifest(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"data": data, "run_id": run_id,
                       "snapshot": uuid.uuid4().hex,
                       "written_at": time.time()}, f)
        os.replace(tmp, self._manifest(name))   # the atomic flip
        if old and old != data and os.path.exists(os.path.join(d, old)):
            shutil.rmtree(os.path.join(d, old), ignore_errors=True)

    def append(self, name: str, df: DataFrame) -> None:
        d = self._dir(name)
        first = not self.exists(name)
        data = "data_append"
        df.write.mode("append").parquet(os.path.join(d, data))
        if first:
            tmp = self._manifest(name) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"data": data, "run_id": "append",
                           "snapshot": uuid.uuid4().hex,
                           "written_at": time.time()}, f)
            os.replace(tmp, self._manifest(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest(name))

    def snapshot_id(self, name: str) -> str | None:
        if not self.exists(name):
            return None
        with open(self._manifest(name)) as f:
            return json.load(f)["snapshot"]


class IcebergCatalog(Catalog):
    """Real-cluster implementation (requires the Iceberg runtime jar +
    a configured Spark catalog; NOT executable in this sandbox)."""

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.ns = namespace

    def _tbl(self, name: str) -> str:
        return f"{self.ns}.{name}"

    def read(self, name: str) -> DataFrame:
        return self.spark.table(self._tbl(name))

    def overwrite(self, name: str, df: DataFrame, run_id: str) -> None:
        (df.writeTo(self._tbl(name))
           .tableProperty("write.run-id", run_id)
           .using("iceberg").createOrReplace())

    def append(self, name: str, df: DataFrame) -> None:
        if not self.exists(name):
            df.writeTo(self._tbl(name)).using("iceberg").create()
        else:
            df.writeTo(self._tbl(name)).append()

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(name))

    def snapshot_id(self, name: str) -> str | None:
        if not self.exists(name):
            return None
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(name)}.snapshots"
            " ORDER BY committed_at DESC LIMIT 1").first()
        return str(row["snapshot_id"]) if row else None
