"""jobs/run_regression.py end-to-end: two span corpora with one diverging
doc and one B-only doc -> diff parquet + JSON summary + CI exit code."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _spans(*texts):
    return [("text", t, None, i) for i, t in enumerate(texts)]


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_regression.py"),
         *args],
        capture_output=True, text=True, timeout=420, env=env,
    )


def test_regression_job_detects_divergence(spark, tmp_path):
    a_rows = [
        ("d1", _spans("same", "here")),
        ("d2", _spans("alpha", "beta")),
    ]
    b_rows = [
        ("d1", _spans("same", "here")),
        ("d2", _spans("alpha", "CHANGED")),
        ("d3", _spans("new doc")),
    ]
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    out = str(tmp_path / "diff")
    spark.createDataFrame(a_rows, SCHEMA).write.parquet(pa)
    spark.createDataFrame(b_rows, SCHEMA).write.parquet(pb)

    proc = _run(["--run-a", pa, "--run-b", pb, "--output", out])
    # divergence above the default 0.0 threshold -> CI failure exit code
    assert proc.returncode == 1, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary == {
        "n_docs": 3, "n_equal": 1, "n_only_a": 0, "n_only_b": 1,
        "regression_rate": round(2 / 3, 6), "fail_threshold": 0.0,
        "pass": False,
    }
    diff = {
        r.doc_id: (r.equal, r.first_diff)
        for r in spark.read.parquet(out).collect()
    }
    assert diff["d1"] == (True, None)
    assert diff["d2"] == (False, 2)
    assert diff["d3"] == (False, 1)

    # same input under a tolerant threshold -> pass
    proc2 = _run(["--run-a", pa, "--run-b", pb, "--output", out,
                  "--fail-threshold", "0.7"])
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert json.loads(proc2.stdout.strip().splitlines()[-1])["pass"] is True
