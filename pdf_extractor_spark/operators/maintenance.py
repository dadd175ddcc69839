"""Table-maintenance operators — the Iceberg upkeep jobs a 10^12-row
corpus table needs between pipeline runs, expressed as plain DataFrame
ops over the table's file/manifest metadata:

  * compaction_plan — the planning half of Iceberg's rewrite_data_files
    binpack action: group small data files into ~target-size rewrite
    bins, per partition, so the rewrite executor gets an explicit,
    deterministic work list (and skips already-right-sized files).

At production scale the input is the metadata table
(`table.files`: partition, file_path, file_size_in_bytes) — millions of
rows for a 10^12-row corpus, i.e. itself a DataFrame problem, never a
driver loop. Planning is one window per partition; no global sort.

No reference counterpart (SURVEY §2.8): the reference is a desktop app;
table maintenance belongs to the Spark/Iceberg re-expression of its
batch layer (north_rule: "Iceberg tables ... partitioning handled
explicitly").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_name",
    size_col: str = "bytes",
) -> DataFrame:
    """(part, bin, n_files, bin_bytes, needs_rewrite) — greedy in-order
    bin packing of data files into ~`target_bytes` rewrite groups within
    each partition (Iceberg rewrite_data_files / binpack semantics):
    files are taken in deterministic name order and cut at the running
    byte total, bin = floor(small-bytes-before-me / target) — the same
    first-fit-in-order rule as pack_sequences, applied to file metadata.
    A file >= target is already compact: it gets a singleton bin of its
    own (negative bin ids, in name order) and does NOT advance the
    running total, so it never drags neighbouring small files into its
    group — Iceberg binpack likewise excludes right-sized files from
    rewrite groups. A bin with a single file needs no rewrite
    (needs_rewrite = false) — that is exactly the file the compactor
    must NOT churn.

    Scale shape: ONE hash shuffle on the partition key, then a window
    per partition over file-count-sized data (the files metadata table,
    not the data). Partition skew equals metadata skew (file counts),
    which compaction itself is busy fixing."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_small = F.col(size_col) < F.lit(target_bytes)
    small_bytes = F.when(is_small, F.col(size_col)).otherwise(F.lit(0))
    cum_small_before = F.sum(small_bytes).over(w) - small_bytes
    big_ordinal = F.sum(F.when(is_small, 0).otherwise(1)).over(w)
    binned = files.withColumn(
        "bin",
        F.when(is_small, F.floor(cum_small_before / F.lit(target_bytes)))
        .otherwise(-big_ordinal)
        .cast("long"),
    )
    return (
        binned.groupBy(F.col(part_col).alias("part"), "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum(size_col).cast("long").alias("bin_bytes"),
            (F.count("*") > 1).alias("needs_rewrite"),
        )
        .orderBy("part", "bin")
    )


def rendezvous_shards(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    new_shards: "int | None" = None,
) -> DataFrame:
    """(doc_id, shard[, shard_new, moved]) — highest-random-weight
    (rendezvous / HRW) shard assignment: a document's shard is the one
    whose md5-derived weight w(doc, s) is highest. The property that
    matters for a living 10^12-doc corpus: growing the shard count from
    S to S' moves ONLY the documents whose argmax becomes one of the new
    shards — an expected (S'-S)/S' fraction — while modulo sharding
    reshuffles almost everything. Pass `new_shards` to emit the
    before/after assignment and the `moved` flag in one pass (every
    moved doc provably lands on a NEW shard id >= num_shards).

    Scale shape: zero shuffle — the per-doc argmax is a bounded
    S-element array expression evaluated map-side (S is shard count,
    never corpus-sized). Weights reuse the cross-engine md5 recipe
    (dedup.simhash_token_hash), so the DuckDB oracle reproduces every
    assignment exactly."""
    from .dedup import simhash_token_hash

    def weight(s: int):
        return simhash_token_hash(
            F.concat(
                F.col(id_col).cast("string"), F.lit("_"), F.lit(str(s))
            )
        )

    def argmax_shard(n: int):
        # struct max = lexicographic (w, s): highest weight, ties (md5
        # collisions, practically impossible) to the highest shard id
        return F.array_max(
            F.array(
                *[
                    F.struct(weight(s).alias("w"), F.lit(s).alias("s"))
                    for s in range(n)
                ]
            )
        )["s"].alias("shard")

    out = df.select(F.col(id_col).alias("doc_id"), argmax_shard(num_shards))
    if new_shards is None:
        return out
    return df.select(
        F.col(id_col).alias("doc_id"),
        argmax_shard(num_shards),
        argmax_shard(new_shards).alias("shard_new"),
    ).withColumn("moved", F.col("shard") != F.col("shard_new"))


def synthesize_meta_drift(
    df: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """documents with deterministically corrupted n_chars metadata: docs
    with doc_id % 9 == 0 report n_chars inflated by 1 + doc_id % 5 —
    the stale-derived-column drift a conformance audit must catch (the
    test corpus itself conforms perfectly, which would make the audit
    vacuous)."""
    drift = F.when(
        F.col(id_col) % 9 == 0, 1 + F.col(id_col) % 5
    ).otherwise(F.lit(0))
    return df.withColumn("n_chars", F.col("n_chars") + drift)


def column_conformance(
    df: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(source, n_rows, n_mismatch, max_abs_dev) — derived-column
    conformance audit: does the stored n_chars metadata equal
    length(text)? Stale derived columns are the classic silent corruption
    of incrementally-maintained tables (a rewrite that forgot to refresh
    metadata); every 10^12-row pipeline runs this class of check before
    trusting pushed-down n_chars filters.

    Scale: single scan + one aggregate on the source key; the comparison
    is columnar. At 100 TB this is the cheapest possible audit shape —
    no joins, no windows.
    """
    dev = F.abs(F.col("n_chars") - F.length(F.coalesce("text", F.lit(""))))
    return df.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum((dev > 0).cast("long")).cast("long").alias("n_mismatch"),
        F.max(dev).cast("long").alias("max_abs_dev"),
    )


def synthesize_file_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    docs_per_file: int = 32,
) -> DataFrame:
    """(file_id, min_id, max_id, min_len, max_len, n_rows) — zone-map
    file inventory synthesized from the documents table: docs group into
    files of `docs_per_file` by id order (file_id = doc_id div
    docs_per_file), each file carrying min/max column statistics — the
    per-file metadata an Iceberg/Parquet footer publishes."""
    return df.groupBy(
        (F.col(id_col) / docs_per_file).cast("long").alias("file_id")
    ).agg(
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
        F.min("n_chars").alias("min_len"),
        F.max("n_chars").alias("max_len"),
        F.count("*").cast("long").alias("n_rows"),
    )


def zone_map_prune(
    files: DataFrame,
    docs: DataFrame,
    len_lo: int = 600,
    len_hi: int = 900,
    id_col: str = "doc_id",
    docs_per_file: int = 32,
) -> DataFrame:
    """One row: (n_files, n_pruned, n_scanned, n_false_positive,
    rows_scanned, rows_matching) — scan-planning audit for the predicate
    `len_lo <= n_chars < len_hi`: a file is PRUNED when its zone map
    proves no row can match (max_len < len_lo or min_len >= len_hi); a
    scanned file is a FALSE POSITIVE when it actually contains no
    matching row (the zone map was too coarse to prune it). This is the
    manifest-pruning arithmetic every Iceberg scan runs before touching
    data — the audit quantifies how much the current clustering helps.

    Scale: the files side is metadata (rows = files, millions at 100 TB
    — trivially aggregable); the truth side is one predicate aggregate
    per file over the data, joined on file_id. At production scale the
    truth check runs on a SAMPLE of scanned files; here the corpus is
    small enough to check exactly.
    """
    truth = docs.groupBy(
        (F.col(id_col) / docs_per_file).cast("long").alias("file_id")
    ).agg(
        F.sum(
            (
                (F.col("n_chars") >= len_lo) & (F.col("n_chars") < len_hi)
            ).cast("long")
        ).alias("n_match")
    )
    j = files.join(truth, "file_id", "left").select(
        "*",
        (
            (F.col("max_len") < len_lo) | (F.col("min_len") >= len_hi)
        ).alias("pruned"),
    )
    return j.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(F.col("pruned").cast("long")).cast("long").alias("n_pruned"),
        F.sum((~F.col("pruned")).cast("long"))
        .cast("long")
        .alias("n_scanned"),
        F.sum(
            ((~F.col("pruned")) & (F.coalesce("n_match", F.lit(0)) == 0))
            .cast("long")
        )
        .cast("long")
        .alias("n_false_positive"),
        F.sum(
            F.when(~F.col("pruned"), F.col("n_rows")).otherwise(0)
        )
        .cast("long")
        .alias("rows_scanned"),
        F.sum(F.coalesce("n_match", F.lit(0))).cast("long").alias(
            "rows_matching"
        ),
    )


def expire_snapshots(
    snapshots: DataFrame,
    keep_last: int = 7,
) -> DataFrame:
    """(snapshot_id, snap_date, status, reason) — Iceberg
    expire_snapshots-style retention planning: the newest `keep_last`
    snapshots are retained as 'recent', the FIRST snapshot of every ISO
    week is retained as 'weekly_head' (point-in-time recovery grid),
    everything else is 'expired'. Recent beats weekly_head when both
    apply. Planning only — the actual delete is the engine's job, this
    emits the auditable decision table first (the safe pattern for a
    destructive maintenance op).

    Scale: windows over the SNAPSHOT timeline — metadata, thousands of
    rows regardless of data volume.
    """
    wr = Window.orderBy(F.desc("snap_date"), F.desc("snapshot_id"))
    ww = Window.partitionBy(F.date_trunc("week", F.col("snap_date"))).orderBy(
        "snap_date", "snapshot_id"
    )
    marked = snapshots.select(
        "snapshot_id",
        "snap_date",
        F.row_number().over(wr).alias("_recency"),
        F.row_number().over(ww).alias("_week_rank"),
    )
    status = (
        F.when(F.col("_recency") <= keep_last, F.lit("retained"))
        .when(F.col("_week_rank") == 1, F.lit("retained"))
        .otherwise(F.lit("expired"))
    )
    reason = (
        F.when(F.col("_recency") <= keep_last, F.lit("recent"))
        .when(F.col("_week_rank") == 1, F.lit("weekly_head"))
        .otherwise(F.lit("age"))
    )
    return marked.select(
        "snapshot_id",
        F.col("snap_date").cast("string").alias("snap_date"),
        status.alias("status"),
        reason.alias("reason"),
    )


def encoding_advisor(lineitem: DataFrame) -> DataFrame:
    """(column, n, ndv, n_runs, avg_run_len, suggested) — columnar
    encoding advisory per lineitem column under the table's physical
    sort order: run counts from lag inequality WITHIN each l_orderkey
    group (ordered by l_linenumber), then the standard chooser — long
    runs -> RLE, small dictionaries -> DICT, else PLAIN (thresholds:
    avg_run_len >= 4, ndv <= n/10). The "why is this file big" layout
    audit that pairs with zorder_key (which CHANGES the order this op
    measures). Group-local runs slightly undercount cross-order runs —
    the price of a partitioned (scalable) window; a global-order window
    would serialize the corpus. 2 dp.

    Physical shape: ONE partitioned window pass shared by every column's
    lag, then a 1-row aggregate reshaped with a literal stack."""
    from pyspark.sql import Window

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag"]
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    with_runs = lineitem.select(
        *cols,
        *[
            (
                F.lag(c).over(w).isNull()
                | (F.col(c) != F.lag(c).over(w))
            )
            .cast("long")
            .alias(f"_r_{c}")
            for c in cols
        ],
    )
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count_distinct(F.col(c)).alias(f"_d_{c}"),
            F.sum(f"_r_{c}").alias(f"_nr_{c}"),
        ]
    wide = with_runs.agg(*aggs)
    rows = []
    for c in cols:
        avg_run = F.col("_n") / F.col(f"_nr_{c}")
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("long").alias("n"),
                F.col(f"_d_{c}").cast("long").alias("ndv"),
                F.col(f"_nr_{c}").cast("long").alias("n_runs"),
                F.round(avg_run, 2).alias("avg_run_len"),
                F.when(avg_run >= 4, "RLE")
                .when(F.col(f"_d_{c}") <= F.col("_n") / 10, "DICT")
                .otherwise("PLAIN")
                .alias("suggested"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
