"""PLAN_AUDIT.md freshness gate (round-4 verdict #6): the committed
audit must have been generated from the CURRENT audited sources — a
stale audit describes plans that no longer exist (round 4 shipped
markov_stationary's retired 108-exchange row exactly this way). The
stamp is a content hash of every audited source file, so uncommitted
edits trip it too. Regenerate with `python tools/plan_audit.py` (the
mandatory final round-close step, BENCH.md "Plan-audit freshness")."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.plan_audit import check_stale, source_fingerprint  # noqa: E402


def test_plan_audit_is_fresh_at_head():
    assert check_stale() is None, check_stale()


def test_fingerprint_is_content_sensitive(tmp_path, monkeypatch):
    """The stamp mechanism itself: stable across calls, and any byte
    change in an audited source changes it."""
    a = source_fingerprint()
    assert a == source_fingerprint()

    import tools.plan_audit as pa

    real = pa._audited_sources()
    extra = tmp_path / "phantom_operator.py"
    extra.write_text("X = 1\n")
    monkeypatch.setattr(
        pa, "_audited_sources", lambda: sorted(real + [str(extra)])
    )
    assert pa.source_fingerprint() != a
