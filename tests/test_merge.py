"""Bucket-pruned MERGE upsert (merge.py): correctness of last-writer-wins
semantics, idempotency, and the scale property — untouched bucket
partitions are byte-identical (never read back or rewritten)."""

import os

import pyspark.sql.functions as F

from pdf_extractor_spark.merge import merge_upsert
from pdf_extractor_spark.pipeline import write_bucketed_input

SCHEMA = "doc_id string, text string, version long"
BUCKETS = 8


def _files(table, bucket):
    d = os.path.join(table, f"bucket={bucket}")
    if not os.path.isdir(d):
        return {}
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def _as_dict(spark, table):
    return {
        r.doc_id: (r.text, r.version)
        for r in spark.read.parquet(table).collect()
    }


def test_merge_upsert_semantics_and_pruning(spark, tmp_path):
    table = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(f"d{i}", f"text {i}", 1) for i in range(100)], SCHEMA
    )
    write_bucketed_input(base, table, num_buckets=BUCKETS)

    # which bucket holds d0? craft updates touching ONLY d0's bucket plus
    # one new key routed to the same bucket family
    from pdf_extractor_spark.pipeline import bucket_col

    bmap = {
        r.doc_id: r.b
        for r in base.select(
            "doc_id", bucket_col(BUCKETS).alias("b")
        ).collect()
    }
    touched = bmap["d0"]
    untouched = next(b for b in range(BUCKETS) if b != touched)
    before = _files(table, untouched)
    assert before  # the untouched bucket exists and has files

    same_bucket_keys = [k for k, b in bmap.items() if b == touched]
    updates = spark.createDataFrame(
        [("d0", "UPDATED", 2), ("brand_new", "NEW ROW", 1)], SCHEMA
    )
    stats = merge_upsert(
        spark, table, updates, key="doc_id", num_buckets=BUCKETS
    )
    got = _as_dict(spark, table)

    assert got["d0"] == ("UPDATED", 2)            # update applied
    assert got["brand_new"] == ("NEW ROW", 1)     # insert applied
    assert len(got) == 101                        # nothing lost
    for k in same_bucket_keys:
        if k != "d0":
            assert got[k] == (f"text {k[1:]}", 1)  # co-bucket rows survive

    # scale property: only the touched buckets were replaced
    assert stats["affected_buckets"] <= 2
    assert _files(table, untouched) == before

    # idempotency: replaying the same batch changes nothing
    merge_upsert(spark, table, updates, key="doc_id", num_buckets=BUCKETS)
    assert _as_dict(spark, table) == got


def test_merge_dedupes_batch_deterministically(spark, tmp_path):
    table = str(tmp_path / "tbl2")
    write_bucketed_input(
        spark.createDataFrame([("a", "orig", 1)], SCHEMA),
        table,
        num_buckets=BUCKETS,
    )
    # two versions of the same key in ONE batch: max-struct survivor wins
    updates = spark.createDataFrame(
        [("a", "v2", 2), ("a", "v9", 9)], SCHEMA
    )
    merge_upsert(spark, table, updates, key="doc_id", num_buckets=BUCKETS)
    assert _as_dict(spark, table) == {"a": ("v9", 9)}


def test_merge_into_missing_bucket_dir(spark, tmp_path):
    """A key routing to a bucket with no directory yet (tiny table) must
    insert cleanly instead of failing the partition read."""
    table = str(tmp_path / "tbl3")
    write_bucketed_input(
        spark.createDataFrame([("a", "orig", 1)], SCHEMA),
        table,
        num_buckets=256,  # 1 row -> 255 empty bucket dirs
    )
    # find a key landing in a bucket different from 'a'
    from pdf_extractor_spark.pipeline import bucket_col

    rows = spark.createDataFrame(
        [(f"k{i}", "x", 1) for i in range(50)], SCHEMA
    ).select("doc_id", bucket_col(256).alias("b")).collect()
    a_bucket = (
        spark.createDataFrame([("a", "x", 1)], SCHEMA)
        .select(bucket_col(256).alias("b"))
        .collect()[0]
        .b
    )
    newkey = next(r.doc_id for r in rows if r.b != a_bucket)
    merge_upsert(
        spark,
        table,
        spark.createDataFrame([(newkey, "fresh", 1)], SCHEMA),
        key="doc_id",
        num_buckets=256,
    )
    assert _as_dict(spark, table) == {
        "a": ("orig", 1),
        newkey: ("fresh", 1),
    }


def test_snapshot_diff_statuses(spark):
    from pdf_extractor_spark.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, digest string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], "doc_id long, digest string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_bucketed_join_runs_without_exchange(spark, tmp_path):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.merge import write_bucketed_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed_table(docs.select("doc_id", "text"), "bkt_a", buckets=8)
    write_bucketed_table(
        docs.select("doc_id", "lang", "source"), "bkt_b", buckets=8
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the big-x-big plan shape (at corpus scale neither side
        # broadcasts); the bucketed layout must then join with NO exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("bkt_a")
        b = spark.table("bkt_b")
        joined = a.join(b, "doc_id").groupBy("lang").agg(
            F.count("*").alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point of the declared bucket layout: the co-located
        # join needs no shuffle of either scan
        assert "Exchange hashpartitioning(doc_id" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
