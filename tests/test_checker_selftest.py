"""The correctness checker's dtype-family gate must flag the divergences
that %.9g canonicalization hides (DuckDB DECIMAL vs Spark DOUBLE,
tz-aware vs naive timestamps) — the driver's hash distinguishes them."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_checker_flags_seeded_dtype_divergences():
    import check_correctness

    check_correctness.selftest()
