"""scd2_versions: hand-computed version chains — change detection,
re-stated-value collapse, and seeding from an existing SCD2 table."""

import datetime as dt

from pdf_extractor_spark.merge import scd2_versions

D = dt.date


def _rows(df):
    return sorted(
        (r.key, r.value, r.valid_from, r.valid_to) for r in df.collect()
    )


def test_scd2_from_scratch(spark):
    ups = spark.createDataFrame(
        [
            ("u1", "a", D(2024, 1, 1)),
            ("u1", "a", D(2024, 1, 2)),  # re-stated: no new version
            ("u1", "b", D(2024, 1, 3)),
            ("u1", "a", D(2024, 1, 5)),  # back to a: NEW version
            ("u2", "x", D(2024, 1, 2)),
        ],
        "key string, value string, ts date",
    )
    got = _rows(scd2_versions(ups, "key", "value", "ts"))
    assert got == [
        ("u1", "a", D(2024, 1, 1), D(2024, 1, 3)),
        ("u1", "a", D(2024, 1, 5), None),
        ("u1", "b", D(2024, 1, 3), D(2024, 1, 5)),
        ("u2", "x", D(2024, 1, 2), None),
    ]


def test_scd2_seeded_from_current(spark):
    current = spark.createDataFrame(
        [
            ("u1", "old", D(2023, 12, 1), D(2024, 1, 1)),  # closed history
            ("u1", "a", D(2024, 1, 1), None),  # open
            ("u3", "z", D(2023, 12, 15), None),  # open, no updates
        ],
        "key string, value string, valid_from date, valid_to date",
    )
    ups = spark.createDataFrame(
        [
            ("u1", "a", D(2024, 1, 4)),  # same as open value: collapses
            ("u1", "b", D(2024, 1, 6)),  # closes the open 'a'
        ],
        "key string, value string, ts date",
    )
    got = _rows(scd2_versions(ups, "key", "value", "ts", current=current))
    assert got == [
        ("u1", "a", D(2024, 1, 1), D(2024, 1, 6)),
        ("u1", "b", D(2024, 1, 6), None),
        ("u1", "old", D(2023, 12, 1), D(2024, 1, 1)),
        ("u3", "z", D(2023, 12, 15), None),
    ]
