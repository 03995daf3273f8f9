"""Snapshot table store — checkpointable state tables (D8).

On a production cluster this layer is Iceberg (atomic snapshots, MERGE INTO,
hidden bucket partitioning); the sandbox image ships no Iceberg runtime jar
(spark.read.format("iceberg") is probed at import), so the same narrow API —
``write(name, df)`` / ``read(name)`` / ``history(name)`` — is implemented
over parquet snapshot directories with an atomically-replaced ``_CURRENT``
pointer.  Semantics preserved relative to Iceberg:

* every commit is a new immutable snapshot directory (``snap-00007/``);
* readers resolve through ``_CURRENT`` (os.replace — atomic on POSIX), so a
  crash mid-write leaves the previous snapshot current: checkpoint/resume
  reads a consistent set of tables;
* ``history`` exposes snapshot ids for the lineage table;
* bucketed layout for the url_seen table: writers pre-repartition by
  ``pmod(xxhash64(url_canon), n_buckets)`` so the per-round anti-join
  reuses a stable partitioning (Iceberg ``bucket(url_canon)`` analog).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


class SnapshotStore:
    """Parquet snapshot directories with an atomic current-pointer."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------------

    def _table_dir(self, name: str) -> str:
        path = os.path.join(self.root, name)
        os.makedirs(path, exist_ok=True)
        return path

    def _pointer(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_CURRENT")

    def current_snapshot(self, name: str) -> str | None:
        try:
            with open(self._pointer(name)) as fh:
                return fh.read().strip() or None
        except FileNotFoundError:
            return None

    def exists(self, name: str) -> bool:
        return self.current_snapshot(name) is not None

    # -- io ------------------------------------------------------------------

    def write(self, name: str, df: DataFrame, meta: dict | None = None) -> str:
        """Commit a new snapshot of ``name``; returns the snapshot id."""
        table_dir = self._table_dir(name)
        current = self.current_snapshot(name)
        next_id = 0 if current is None else int(current.split("-")[1]) + 1
        snap = f"snap-{next_id:05d}"
        out_dir = os.path.join(table_dir, snap)
        df.write.mode("overwrite").parquet(out_dir)
        if meta:
            with open(os.path.join(out_dir, "_meta.json"), "w") as fh:
                json.dump(meta, fh)
        # atomic pointer swap: readers never see a half-written snapshot
        fd, tmp = tempfile.mkstemp(dir=table_dir, prefix=".ptr-")
        with os.fdopen(fd, "w") as fh:
            fh.write(snap)
        os.replace(tmp, self._pointer(name))
        return snap

    def read(self, name: str, snapshot: str | None = None) -> DataFrame:
        snap = snapshot or self.current_snapshot(name)
        if snap is None:
            raise FileNotFoundError(f"table {name} has no current snapshot")
        return self.spark.read.parquet(os.path.join(self.root, name, snap))

    def read_or_none(self, name: str) -> DataFrame | None:
        return self.read(name) if self.exists(name) else None

    def history(self, name: str) -> list[str]:
        table_dir = self._table_dir(name)
        return sorted(d for d in os.listdir(table_dir) if d.startswith("snap-"))

    def meta(self, name: str, snapshot: str | None = None) -> dict:
        snap = snapshot or self.current_snapshot(name)
        try:
            with open(os.path.join(self.root, name, snap, "_meta.json")) as fh:
                return json.load(fh)
        except (FileNotFoundError, TypeError):
            return {}


def bucketed_by_url(df: DataFrame, n_buckets: int,
                    url_col: str = "url_canon") -> DataFrame:
    """Stable bucket layout for url_seen (Iceberg bucket-partition analog):
    co-locates the anti-join probe across rounds."""
    return df.repartition(n_buckets, F.pmod(F.xxhash64(url_col),
                                            F.lit(n_buckets)))


def read_robots_dir(spark: SparkSession, directory: str) -> DataFrame:
    """S2: robots.txt bodies from files — ``binaryFile`` source, one row per
    file: (host_key from the file name 'scheme_host_port.txt', access_state
    'successful', body).  The fetched-bytes column path (S1) is the usual
    production shape; this covers file-drop deployments and tests."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.txt")
    name = F.regexp_extract(F.element_at(F.split("path", "/"), -1),
                            r"(.+)\.txt$", 1)
    # file-name convention: <scheme>_<host>_<port>.txt
    host_key = F.regexp_replace(name, r"^([a-z]+)_(.+)_([0-9]+)$",
                                r"$1://$2:$3")
    return files.select(
        host_key.alias("host_key"),
        F.lit("successful").alias("access_state"),
        F.col("content").alias("body"),
        F.col("length").alias("body_bytes"),  # countio S15 analog
    )
