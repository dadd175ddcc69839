"""Build the spark-submit artifact: dist/pdf_extractor_spark.zip containing
the package (code + conf JSON), importable via --py-files (north_rule:
'ships as a spark-submit --py-files package').

Usage:
    python tools/make_package.py
    spark-submit --py-files dist/pdf_extractor_spark.zip jobs/run_extract.py \
        --input <documents parquet/iceberg> --output <dir>
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pdf_extractor_spark"


def build(dist_dir: str | None = None) -> str:
    dist_dir = dist_dir or os.path.join(ROOT, "dist")
    os.makedirs(dist_dir, exist_ok=True)
    zip_path = os.path.join(dist_dir, f"{PKG}.zip")
    src = os.path.join(ROOT, PKG)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(src):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith((".py", ".json")):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return zip_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
