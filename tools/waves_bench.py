"""Measure the waves>1 input-re-scan cost with and without write-time
bucket partitioning (BENCH.md 'waves' section; round-1 verdict item #9).

Three runs over the same generated corpus:
  A  waves=1, flat parquet input          (baseline)
  B  waves=4, flat parquet input          (round-1: ~2.1x A — full re-scan
                                           per wave)
  C  waves=4, bucket-partitioned input    (wave filter prunes at the scan;
                                           target: within ~1.2x of A)

Usage: python tools/waves_bench.py [--docs 400000] [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    from pdf_extractor_spark.pipeline import run_pipeline, write_bucketed_input
    from pdf_extractor_spark.session import build_session
    from pdf_extractor_spark.sources.corpus import write_corpus

    spark = build_session(
        "waves-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    work = tempfile.mkdtemp(prefix="waves_bench_")
    flat = os.path.join(work, "flat")
    bucketed = os.path.join(work, "bucketed")

    print(f"generating {args.docs} docs ...", file=sys.stderr)
    write_corpus(spark, flat, args.docs, partitions=args.cpus * 8)
    write_bucketed_input(spark.read.parquet(flat), bucketed, args.buckets)

    # warmup: JVM codegen + python UDF worker pool startup dominate the
    # first run on this host — burn them on a throwaway pass
    run_pipeline(
        spark, spark.read.parquet(flat).limit(20_000),
        os.path.join(work, "warmup"), run_id="warmup",
        num_buckets=args.buckets, waves=1, resume=False,
    )

    configs = (
        ("A_waves1_flat", flat, 1),
        ("B_waves4_flat", flat, 4),
        ("C_waves4_bucketed", bucketed, 4),
    )
    results: dict[str, float] = {}
    for trial in range(int(os.environ.get("WAVES_TRIALS", "2"))):
        for name, path, waves in configs:
            out = os.path.join(work, f"out_{name}_{trial}")
            docs = spark.read.parquet(path)
            t0 = time.time()
            run_pipeline(
                spark, docs, out, run_id=name, num_buckets=args.buckets,
                waves=waves, resume=False,
            )
            dt = time.time() - t0
            results[name] = round(min(dt, results.get(name, 1e9)), 1)
            print(f"{name} trial {trial}: {dt:.1f}s", file=sys.stderr)
            shutil.rmtree(out, ignore_errors=True)

    a, b, c = (results[k] for k in sorted(results))
    print(json.dumps({
        "docs": args.docs, "cpus": args.cpus, "buckets": args.buckets,
        "waves1_flat_sec": a, "waves4_flat_sec": b,
        "waves4_bucketed_sec": c,
        "flat_overhead_x": round(b / a, 2),
        "bucketed_overhead_x": round(c / a, 2),
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
