"""bench.py contract invariants: every headline name resolves to a real
queries() entry (a typo would silently drop a query from the driver's
per-round measurement), and headline coverage spans the catalog."""


def test_headline_subset_of_queries():
    import bench

    import __spark_entry__ as entry

    qs = set(entry.queries())
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []


def test_headline_has_no_duplicates():
    import bench

    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
