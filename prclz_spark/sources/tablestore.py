"""Snapshot/manifest table layer on Parquet with per-partition lineage +
metrics — the engine's checkpoint store.

The reference resumes work three ways: skip-if-output-exists
(/root/reference/midway/midway_blocks.py:31), per-block ``.block.cache``
files (midway/single_file_complexity.py:28-46), and the ``CheckPointer``
keyed result store with a ``completed`` set saved every iteration
(reblock/i_reblock.py:103-165). The distributed analog (SURVEY.md §2.1 S9,
§2.8): every stage writes an atomically-committed snapshot of Parquet
files plus a ``_lineage`` record per partition; resume = anti-join of the
input's partition keys against committed lineage.

Iceberg itself isn't installable in this sandbox (SURVEY.md §7.1), so this
is a minimal stand-in with the same semantics the pipeline needs:

    warehouse/<table>/data/<uuid>.parquet          immutable data files
    warehouse/<table>/snapshots/<N>.json           manifest: file list,
                                                   lineage, parent snapshot
    warehouse/<table>/snapshots/LATEST             pointer (atomic rename)

- commits are atomic: data files land first, the manifest next, the
  LATEST pointer last via os.replace (POSIX-atomic);
- readers resolve LATEST → manifest → exact file list, so half-written
  data files are invisible;
- time travel: read any older snapshot id;
- lineage rows carry (stage, partition_id, rows_out, wall_ms, committed_at)
  — the _lineage/_metrics contract of the north_rule.

If real Iceberg jars are available the layer swaps to ``writeTo``.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, root: str):
        self.root = root

    # -- paths ------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snapdir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "snapshots")

    def _latest_path(self, table: str) -> str:
        return os.path.join(self._snapdir(table), "LATEST")

    # -- snapshot resolution ----------------------------------------------
    def latest_snapshot_id(self, table: str) -> int | None:
        p = self._latest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, table: str, snapshot_id: int | None = None) -> dict | None:
        sid = snapshot_id if snapshot_id is not None else self.latest_snapshot_id(table)
        if sid is None:
            return None
        with open(os.path.join(self._snapdir(table), f"{sid}.json")) as f:
            return json.load(f)

    # -- write ------------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        table: str,
        partition_col: str,
        stage: str | None = None,
        extra: dict | None = None,
    ) -> int:
        """Append ``df`` as one atomic snapshot, one data file per value of
        ``partition_col`` (repartitioned by it so each task owns whole
        partitions), with a lineage record per partition. ``extra`` merges
        stage-level metrics (e.g. broadcast dimension size, plan choice)
        into every lineage row — visible via read_lineage; metrics_df keeps
        its fixed per-partition schema.

        Returns the new snapshot id. A killed job leaves data files but no
        manifest/LATEST update — invisible to readers, re-runnable."""
        tdir = self._tdir(table)
        datadir = os.path.join(tdir, "data")
        os.makedirs(datadir, exist_ok=True)
        os.makedirs(self._snapdir(table), exist_ok=True)

        staging = os.path.join(tdir, f"_staging_{uuid.uuid4().hex}")
        t0 = time.time()
        (
            df.repartition(partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(staging)
        )
        wall_ms = int((time.time() - t0) * 1000)

        spark = df.sparkSession
        files: list[dict] = []
        lineage: list[dict] = []
        for entry in sorted(os.listdir(staging)):
            if not entry.startswith(f"{partition_col}="):
                continue
            pkey = entry.split("=", 1)[1]
            pdir = os.path.join(staging, entry)
            outdir = os.path.join(datadir, entry)  # keep hive layout so the
            os.makedirs(outdir, exist_ok=True)     # partition column survives
            parts = sorted(p for p in os.listdir(pdir) if p.endswith(".parquet"))
            moved = []
            for p in parts:
                new_name = f"{uuid.uuid4().hex}.parquet"
                os.replace(os.path.join(pdir, p), os.path.join(outdir, new_name))
                moved.append(f"{entry}/{new_name}")
            rows = spark.read.option("basePath", datadir).parquet(
                *[os.path.join(datadir, m) for m in moved]
            ).count() if moved else 0
            files.append({"partition": pkey, "files": moved})
            lineage.append(
                {
                    "stage": stage or table,
                    "partition_id": pkey,
                    "rows_out": rows,
                    "wall_ms": wall_ms,
                    "committed_at": time.time(),
                    **(extra or {}),
                }
            )
        # clean staging skeleton
        for root, dirs, fs in os.walk(staging, topdown=False):
            for fname in fs:
                os.remove(os.path.join(root, fname))
            for d in dirs:
                os.rmdir(os.path.join(root, d))
        os.rmdir(staging)

        prev = self.latest_snapshot_id(table)
        sid = (prev or 0) + 1
        prev_manifest = self.manifest(table, prev) if prev else None
        all_files = list(prev_manifest["files"]) if prev_manifest else []
        all_files.extend(files)
        all_lineage = list(prev_manifest["lineage"]) if prev_manifest else []
        all_lineage.extend(lineage)
        manifest = {
            "snapshot_id": sid,
            "parent": prev,
            "partition_col": partition_col,
            "files": all_files,
            "lineage": all_lineage,
        }
        mpath = os.path.join(self._snapdir(table), f"{sid}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        ltmp = self._latest_path(table) + ".tmp"
        with open(ltmp, "w") as f:
            f.write(str(sid))
        os.replace(ltmp, self._latest_path(table))
        return sid

    def commit_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
        stage: str | None = None,
    ) -> int:
        """Write ``df`` as a Spark-bucketed snapshot: files are hash-clustered
        on ``bucket_cols`` into ``n_buckets`` (optionally sorted within each
        bucket), so every later join or aggregation on the bucket key is
        EXCHANGE-FREE — the one-time shuffle at write amortizes across all
        downstream reads. This is the 100-TB co-location path: bucket the big
        fact tables once, and repeated joins/rollups on the key never shuffle
        again (reference analog: the per-region file partitioning that
        midway_blocks.py:31 keys all downstream stages on).

        Spark only honors bucketing through the catalog, so the snapshot is
        registered as an external catalog table whose files live under the
        store; ``read_bucketed`` re-issues the DDL in a fresh session.

        Unlike ``commit`` (which appends files to the manifest), every
        bucketed commit is a FULL REWRITE: the bucket layout is a property of
        the whole file set, so appending would break the per-bucket hash
        invariant. Latest snapshot wins; older full snapshots stay readable
        via ``snapshot_id`` (time travel) and lineage accumulates."""
        prev = self.latest_snapshot_id(table)
        sid = (prev or 0) + 1
        datadir = os.path.join(self._tdir(table), f"bucketed_{sid}")
        os.makedirs(self._snapdir(table), exist_ok=True)
        catalog_name = f"prclz_store_{table}_{sid}"

        t0 = time.time()
        writer = (
            df.write.format("parquet")
            .mode("overwrite")
            .option("path", datadir)
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(catalog_name)
        wall_ms = int((time.time() - t0) * 1000)

        spark = df.sparkSession
        rows = spark.table(catalog_name).count()
        prev_manifest = self.manifest(table, prev) if prev else None
        all_lineage = list(prev_manifest["lineage"]) if prev_manifest else []
        all_lineage.append(
            {
                "stage": stage or table,
                "partition_id": f"bucketed_{sid}",
                "rows_out": rows,
                "wall_ms": wall_ms,
                "committed_at": time.time(),
            }
        )
        manifest = {
            "snapshot_id": sid,
            "parent": prev,
            "partition_col": None,
            "files": [],
            "lineage": all_lineage,
            "bucket": {
                "catalog_name": catalog_name,
                "path": datadir,
                "cols": list(bucket_cols),
                "n": n_buckets,
                "sort": list(sort_cols) if sort_cols else [],
                "schema_ddl": ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}"
                    for f in df.schema.fields
                ),
            },
        }
        mpath = os.path.join(self._snapdir(table), f"{sid}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        ltmp = self._latest_path(table) + ".tmp"
        with open(ltmp, "w") as f:
            f.write(str(sid))
        os.replace(ltmp, self._latest_path(table))
        return sid

    def read_bucketed(
        self, spark: SparkSession, table: str, snapshot_id: int | None = None
    ) -> DataFrame | None:
        """Read a bucketed snapshot WITH its bucketing metadata intact (a raw
        ``spark.read.parquet`` of the same files would silently drop the
        cluster info and re-shuffle on every join). Re-registers the external
        catalog table from the manifest when the session doesn't have it."""
        m = self.manifest(table, snapshot_id)
        if m is None or "bucket" not in m:
            return None
        b = m["bucket"]
        if not spark.catalog.tableExists(b["catalog_name"]):
            sort_clause = (
                f" SORTED BY ({', '.join(b['sort'])})" if b["sort"] else ""
            )
            spark.sql(
                f"CREATE TABLE {b['catalog_name']} ({b['schema_ddl']}) "
                f"USING parquet "
                f"CLUSTERED BY ({', '.join(b['cols'])}){sort_clause} "
                f"INTO {b['n']} BUCKETS "
                f"LOCATION '{b['path']}'"
            )
        return spark.table(b["catalog_name"])

    # -- read -------------------------------------------------------------
    def read(
        self, spark: SparkSession, table: str, snapshot_id: int | None = None
    ) -> DataFrame | None:
        m = self.manifest(table, snapshot_id)
        if m is None:
            return None
        datadir = os.path.join(self._tdir(table), "data")
        paths = [
            os.path.join(datadir, f) for entry in m["files"] for f in entry["files"]
        ]
        if not paths:
            return None
        # basePath lets Spark recover the partition column from the
        # hive-style subdirectories the manifest's files live in
        return spark.read.option("basePath", datadir).parquet(*paths)

    def read_lineage(self, table: str, snapshot_id: int | None = None) -> list[dict]:
        m = self.manifest(table, snapshot_id)
        return m["lineage"] if m else []

    def metrics_df(
        self, spark: SparkSession, table: str, snapshot_id: int | None = None
    ) -> DataFrame | None:
        """The north_rule's per-partition METRICS TABLE: the snapshot's
        lineage as a queryable DataFrame — one row per committed partition
        with (stage, partition_id, rows_out, wall_ms, committed_at). The
        Iceberg analog is the `<table>.files`/`<table>.snapshots` metadata
        tables; here the manifest IS the metadata, so this is a driver-side
        materialization (manifests are dimension-sized: one row per
        committed partition, not per data row)."""
        lineage = self.read_lineage(table, snapshot_id)
        if not lineage:
            return None
        keys = ("stage", "partition_id", "rows_out", "wall_ms", "committed_at")
        return spark.createDataFrame(
            [{k: rec.get(k) for k in keys} for rec in lineage],
            "stage string, partition_id string, rows_out long, "
            "wall_ms long, committed_at double",
        )

    # -- resume -----------------------------------------------------------
    def completed_partitions(self, table: str) -> set[str]:
        return {rec["partition_id"] for rec in self.read_lineage(table)}

    def resume_filter(
        self, df: DataFrame, table: str, partition_col: str
    ) -> DataFrame:
        """Drop rows whose partition is already committed — the distributed
        CheckPointer.completed anti-join (i_reblock.py:254-255). String-
        compare because parquet partition keys are strings on disk."""
        from pyspark.sql import functions as F

        done = self.completed_partitions(table)
        if not done:
            return df
        return df.filter(
            ~F.col(partition_col).cast("string").isin(*sorted(done))
        )
