"""Incremental MERGE (upsert) into a bucket-partitioned table — the
flat-parquet analog of Iceberg's MERGE INTO with a bucket(doc_id)
partition spec.

North-rule context: a 10^12-doc corpus is never rewritten wholesale; new
crawls arrive as update/insert batches. The scale property that matters is
that a merge touches ONLY the partitions containing changed keys:

  1. updates get the same xxhash64(doc_id) % B bucket as the table layout
     (pipeline.bucket_col — one hash function everywhere);
  2. the affected bucket list is collected (bounded by B, never by rows);
  3. only those bucket directories are read back (partition pruning on the
     bucket=N layout written by pipeline.write_bucketed_input), old
     versions of updated keys are dropped with a left-anti join against
     the update keys, and the union is written with DYNAMIC partition
     overwrite — untouched bucket directories are never read or replaced.

Cost: O(|updates| + |table ∩ affected buckets|), independent of table
size when updates cluster into few buckets. The anti-join's update side
is broadcast (an update batch is small relative to a bucket's corpus
slice; for giant backfills Spark falls back to sort-merge on size).

On a real cluster this maps 1:1 onto Iceberg MERGE INTO with
write.distribution-mode=hash and a bucket partition transform; the
per-bucket dynamic overwrite below is the same commit granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline import DEFAULT_BUCKETS, bucket_col


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """Upsert `updates` (same schema as the table, sans bucket column)
    into the bucket-partitioned parquet table at table_path. Last-writer
    wins per key; duplicate keys WITHIN the update batch are reduced to
    one deterministic survivor first (max by struct order of the non-key
    columns) so the merge is idempotent. Returns merge stats."""
    data_cols = [c for c in updates.columns if c != "bucket"]
    upd = updates.select(*data_cols).withColumn(
        "bucket", bucket_col(num_buckets, key=key)
    )
    # deterministic survivor per key: greatest struct of the other columns
    others = [c for c in data_cols if c != key]
    upd = (
        upd.groupBy(key, "bucket")
        .agg(F.max(F.struct(*others)).alias("_s"))
        .select(key, "bucket", *[F.col(f"_s.{c}").alias(c) for c in others])
    )
    # one action yields both the affected-bucket list and the update count
    # (upd is a shuffle DAG — don't re-run it per statistic)
    per_bucket = upd.groupBy("bucket").count().collect()
    affected = sorted(r.bucket for r in per_bucket)
    n_updates = sum(r["count"] for r in per_bucket)
    # a brand-new key may route to a bucket with no directory yet — only
    # read back the partitions that exist
    dirs = [
        d
        for b in affected
        if os.path.isdir(d := os.path.join(table_path, f"bucket={b}"))
    ]
    merged = upd.select(key, *others, "bucket")
    if dirs:
        existing = spark.read.option("basePath", table_path).parquet(*dirs)
        kept = existing.join(
            F.broadcast(upd.select(key).distinct()), on=key, how="left_anti"
        )
        merged = kept.select(key, *others, "bucket").unionByName(merged)
    (
        merged.repartition(max(len(affected), 1), "bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(table_path)
    )
    return {
        "affected_buckets": len(affected),
        "total_buckets": num_buckets,
        "updates": n_updates,
    }


def scd2_versions(
    updates: "DataFrame",
    key_col: str,
    value_col: str,
    ts_col: str,
    current: "DataFrame | None" = None,
) -> "DataFrame":
    """Type-2 slowly-changing-dimension history from an update stream:
    (key, value, valid_from, valid_to) with valid_to NULL on the open
    version — the warehouse pattern for "what was this key's value at
    time T" against tables that only ever receive upserts.

    Semantics: updates are ordered per key by (ts, value); consecutive
    updates carrying the SAME value collapse into one version (a re-stated
    value does not open a new version); each version's valid_to is the
    next version's valid_from. Passing `current` (an existing SCD2 table)
    seeds the chain: its OPEN rows join the ordering as version starts and
    close if a later update changes the value; its closed history rows
    pass through untouched.

    Scale shape: ONE window over the per-key update stream (lag for
    change detection, lead for interval close) — a single hash shuffle on
    the key, no joins, no iteration; history rows are appended as-is.
    Deterministic given the input (ties broken by value), so the whole
    operator is SQL-mirrorable for the oracle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ups = updates.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("ts"),
    )
    if current is not None:
        open_rows = current.filter(F.col("valid_to").isNull()).select(
            F.col("key"), F.col("value"), F.col("valid_from").alias("ts")
        )
        ups = open_rows.unionByName(ups)

    w = Window.partitionBy("key").orderBy("ts", "value")
    chg = ups.withColumn("_prev", F.lag("value").over(w)).filter(
        F.col("_prev").isNull() | (F.col("value") != F.col("_prev"))
    )
    w2 = Window.partitionBy("key").orderBy("ts", "value")
    out = chg.select(
        "key",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    if current is not None:
        closed = current.filter(F.col("valid_to").isNotNull()).select(
            "key", "value", "valid_from", "valid_to"
        )
        out = closed.unionByName(out)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    digest_col: str = "digest",
) -> DataFrame:
    """(doc_id, status) with status in added / removed / changed /
    unchanged — the changelog between two corpus snapshots keyed by a
    content digest (Iceberg's create_changelog_view / CDC read, computed
    relationally when the table format's snapshot metadata isn't at
    hand). This is what incremental consumers key resume/invalidation
    off: re-embed `changed`, ingest `added`, tombstone `removed`.

    Both inputs need (id_col, digest_col); build the digest with
    md5(text) upstream so the compare never moves document bodies —
    the full-outer join shuffles 16-byte digests, not payloads (the
    exact_dedup digest-first discipline).

    Scale shape: ONE sort-merge full-outer join on the id key (both
    sides corpus-sized — not broadcastable by definition), narrow
    status projection after. With both snapshots bucket-partitioned by
    the pipeline's xxhash64(doc_id) layout the exchange is avoidable
    entirely (storage-partitioned join); on flat inputs AQE handles
    skew. Driver state: none."""
    o = old.select(
        F.col(id_col).alias("id"), F.col(digest_col).alias("od")
    )
    n = new.select(
        F.col(id_col).alias("id"), F.col(digest_col).alias("nd")
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("od").isNull(), F.lit("added"))
        .when(F.col("nd").isNull(), F.lit("removed"))
        .when(F.col("od") == F.col("nd"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("id").alias(id_col), status.alias("status"))


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Persist a frame as a Hive-bucketed, bucket-sorted table: Spark's
    declared-layout analog of an Iceberg `bucket(key)` partition spec.
    Joins and aggregations between tables bucketed the SAME way on the
    SAME key need NO exchange at all — the scan's output partitioning
    already satisfies the join requirement (verified by
    tests/test_merge.py::test_bucketed_join_runs_without_exchange).
    At 10^12 docs this is the difference between a corpus-sized shuffle
    per join and none."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
