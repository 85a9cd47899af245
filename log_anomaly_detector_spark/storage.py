"""Storage layer: partitioned parquet tables + a JSONL checkpoint manifest.

The engine is storage-agnostic by design: on a cluster with an Iceberg
catalog, ``overwrite_partitions`` becomes ``MERGE INTO`` / ``overwritePartitions``
and the manifest becomes a snapshot-tagged metadata table. This sandbox has
no Iceberg runtime jar, so the same semantics are provided over hive-style
partition directories with explicit delete+insert — exactly the reference's
idempotency primitive (per-block DELETE then batch INSERT,
``database/upsert_log_line.py:27-52``).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class IcebergStore:
    """Iceberg-backed sink/lineage (used when an Iceberg catalog is on the
    classpath — not in this sandbox, so instantiation requires an explicit
    catalog and every method is a thin wrapper over the public Iceberg SQL /
    DataFrame API; `HiveParquetStore` below provides identical semantics over
    plain directories and is what runs here).

    Semantics parity with the reference's sinks:
    * ``merge_upsert``  ≙ INSERT ... ON CONFLICT DO UPDATE
      (``database/upsert_log_block.py:47-103``)
    * ``overwrite_partitions`` ≙ per-block DELETE + batch INSERT
      (``database/upsert_log_line.py:1-92``)
    * ``snapshot_id`` feeds the manifest's lineage records.
    """

    def __init__(self, spark: SparkSession, catalog: str):
        self.spark = spark
        self.catalog = catalog
        try:
            spark.sql(f"SHOW NAMESPACES IN {catalog}")
        except Exception as e:  # no Iceberg runtime on the classpath
            raise RuntimeError(
                f"Iceberg catalog '{catalog}' unavailable: {e}"
            ) from e

    def overwrite_partitions(self, df: DataFrame, table: str, part_ids) -> None:
        df.writeTo(f"{self.catalog}.{table}").overwritePartitions()

    def merge_upsert(self, updates: DataFrame, table: str, key: str) -> None:
        updates.createOrReplaceTempView("_updates")
        cols = updates.columns
        sets = ", ".join(f"t.{c} = u.{c}" for c in cols if c != key)
        vals = ", ".join(f"u.{c}" for c in cols)
        self.spark.sql(
            f"MERGE INTO {self.catalog}.{table} t USING _updates u "
            f"ON t.{key} = u.{key} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) VALUES ({vals})"
        )

    def snapshot_id(self, table: str) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.catalog}.{table}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return row["snapshot_id"]


def overwrite_partitions(df: DataFrame, path: str, part_ids: list[int]) -> None:
    """Idempotently replace exactly ``part_ids`` of the target table with the
    contents of ``df`` (which must only contain those partitions).

    Explicit delete+insert rather than relying on dynamic partition overwrite
    alone: a rerun that produces ZERO rows for a previously-violating
    partition must still clear the stale rows.
    """
    for pid in part_ids:
        shutil.rmtree(os.path.join(path, f"part_id={pid}"), ignore_errors=True)
    df.write.mode("append").partitionBy("part_id").parquet(path)


def list_partitions(path: str) -> list[int] | None:
    """part_ids from storage METADATA (hive-style ``part_id=N`` directory
    listing — the Iceberg analogue is the ``.partitions`` metadata table).
    Returns None when the layout is not partitioned by part_id, in which case
    the engine falls back to a distinct scan. Listing is O(partitions) driver
    work and launches NO Spark job — at 10^12 rows a ``select distinct
    part_id`` would be a full-column scan just to plan the run."""
    if not os.path.isdir(path):
        return None
    parts = [
        int(e.split("=", 1)[1])
        for e in os.listdir(path)
        if e.startswith("part_id=")
    ]
    return sorted(parts) if parts else None


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a partitioned parquet table; None if nothing written yet."""
    if not os.path.isdir(path) or not any(
        e.startswith("part_id=") for e in os.listdir(path)
    ):
        return None
    return spark.read.parquet(path)


# --- bucketed tables (the Iceberg bucket-transform analogue) ---------------
#
# Both big tables bucketed by doc_id makes the snapshot join and the
# uniqueness aggregation SHUFFLE-FREE (storage-co-located). Bucket metadata
# lives in the session catalog, so a fresh session re-registers the existing
# files with CREATE TABLE ... CLUSTERED BY ... LOCATION.

SEQ_DDL = "doc_id string, tokens array<int>, n_tok int, source string, part_id int"
SNAP_DDL = "doc_id string, ref_tokens array<int>"


def write_bucketed(
    df: DataFrame,
    name: str,
    location: str,
    n_buckets: int = 32,
    partition_col: str | None = None,
) -> None:
    w = df.write.option("path", location).mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.bucketBy(n_buckets, "doc_id").sortBy("doc_id").saveAsTable(name)


def register_bucketed(
    spark: SparkSession,
    name: str,
    ddl_cols: str,
    location: str,
    n_buckets: int = 32,
    partition_col: str | None = None,
) -> DataFrame:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    part = f"PARTITIONED BY ({partition_col})" if partition_col else ""
    spark.sql(
        f"CREATE TABLE {name} ({ddl_cols}) USING PARQUET {part} "
        f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )
    if partition_col:
        spark.sql(f"MSCK REPAIR TABLE {name}")
    return spark.table(name)


# --- manifest (per-partition completion checkpoint, R10) ------------------


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> list[dict]:
    """Parse the manifest, skipping an unparseable (torn) trailing line: a
    crash mid-append must degrade to 'that batch gets revalidated', never to
    'resume is permanently broken'. A torn line anywhere but the tail is
    still surfaced (it means external corruption, not a crashed append)."""
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        lines = [ln for ln in f if ln.strip()]
    out: list[dict] = []
    for i, ln in enumerate(lines):
        try:
            out.append(json.loads(ln))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                continue  # torn tail from a crashed append — revalidate
            raise
    return out


def append_manifest(out_dir: str, records: list[dict]) -> None:
    """Append all records in ONE os-level write (serialize first, then a
    single f.write + flush): a crash can tear at most the final line, which
    read_manifest tolerates. Each record is one self-describing JSON line
    (last write wins per part_id)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = "".join(json.dumps(r, sort_keys=True) + "\n" for r in records)
    with open(manifest_path(out_dir), "a") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())


def completed_partitions(out_dir: str, input_digest: str, rule_versions: dict) -> set[int]:
    """part_ids whose latest manifest entry is 'done' for THIS input snapshot
    and THIS rule-pack version set — anything else is recomputed."""
    latest: dict[int, dict] = {}
    for r in read_manifest(out_dir):
        latest[r["part_id"]] = r
    return {
        pid
        for pid, r in latest.items()
        if r.get("status") == "done"
        and r.get("input_digest") == input_digest
        and r.get("rule_versions") == rule_versions
    }
