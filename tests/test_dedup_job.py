"""jobs/run_dedup.py end-to-end: the minhash strategy on a corpus with
known duplicate classes writes survivors/clusters/pairs and keeps exactly
one canonical doc per class."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_dedup_job_minhash(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest looking for more interesting food"
    )
    rows = []
    for i in range(40):
        if i < 10:  # duplicate class A: identical long docs
            rows.append((i, base + " alpha " + base))
        elif i < 16:  # class B: identical docs from a disjoint vocabulary
            alt = (
                "colorless green ideas sleep furiously while the committee "
                "debates quarterly revenue projections in the main hall "
                "under flickering lights near the harbor district offices"
            )
            rows.append((i, alt + " beta " + alt))
        else:  # singletons: fully disjoint token streams
            rows.append(
                (i, " ".join(f"w{i}x{j} token{i * 100 + j}" for j in range(30)))
            )
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)

    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_dedup.py"),
         "--input", inp, "--output", out, "--strategy", "minhash"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["docs_in"] == 40
    # classes A (10 members) and B (6) collapse to one survivor each
    assert stats["docs_out"] == 40 - 9 - 5
    surv = spark.read.parquet(os.path.join(out, "survivors"))
    ids = {r.doc_id for r in surv.select("doc_id").collect()}
    assert len(ids & set(range(10))) == 1
    assert len(ids & set(range(10, 16))) == 1
    assert set(range(16, 40)) <= ids
    clusters = spark.read.parquet(os.path.join(out, "clusters"))
    assert clusters.count() == 40


def test_run_dedup_job_write_index(spark, tmp_path):
    rows = [(i, " ".join(f"u{i}v{j} tok{i * 37 + j}" for j in range(20)))
            for i in range(12)]
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_dedup.py"),
         "--input", inp, "--output", out, "--strategy", "minhash",
         "--write-index"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    idx = spark.read.parquet(os.path.join(out, "index_buckets"))
    # every survivor appears in exactly 16 bands
    assert stats["index_buckets"] == stats["docs_out"] * 16
    assert idx.columns == ["band", "bucket", "doc_id"]
    per = idx.groupBy("doc_id").count().collect()
    assert all(r["count"] == 16 for r in per)
