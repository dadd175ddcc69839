"""Property tests (hypothesis) for the layout/sketch family: zorder_key
against an independent Python bit model, Bloom membership's
no-false-negative guarantee, and CMS's overestimate-only guarantee —
randomized inputs, one Spark round-trip per example batch."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.sketches import (
    bloom_build,
    bloom_member,
    cms_estimates,
)
from pdf_extractor_spark.operators.zorder import zorder_key


def _morton(x: int, y: int, bits: int = 20) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**20 - 1),
            st.integers(min_value=0, max_value=2**20 - 1),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_matches_bit_model(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton(r.x, r.y)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=60),
    st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=60),
)
def test_bloom_no_false_negatives_property(spark, members, probes):
    mdf = spark.createDataFrame([(m,) for m in members], "key string")
    bloom = bloom_build(mdf, "key", bits=1024, hashes=4)
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(members + probes)], "id long, key string"
    )
    res = {
        r.id: r.bloom_hit
        for r in bloom_member(pdf, "key", bloom, "id", bits=1024, hashes=4).collect()
    }
    # every member must hit, whatever the key contents
    assert all(res[i] for i in range(len(members)))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=200
    )
)
def test_cms_overestimates_property(spark, keys):
    df = spark.createDataFrame(
        [(str(k),) for k in keys], "k string"
    )
    est = cms_estimates(df, "k", depth=3, width=8).collect()
    exact = {}
    for k in keys:
        exact[str(k)] = exact.get(str(k), 0) + 1
    assert len(est) == len(exact)
    for r in est:
        assert r.exact_n == exact[r.key]
        assert r.cms_est >= r.exact_n
