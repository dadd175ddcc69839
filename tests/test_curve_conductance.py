"""Hand-computed parity for simhash_hamming_curve and
community_conductance (final round-5 additions)."""
from pdf_extractor_spark.operators.dedup import simhash_hamming_curve
from pdf_extractor_spark.operators.graph import community_conductance


def test_hamming_curve_exact_dups(spark):
    # two identical docs (hamming 0) + one unrelated: curve is cumulative
    # and emits all four radii, including empty ones
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words in this document here now"),
        ],
        "doc_id long, text string",
    )
    rows = {r.max_hamming: r.n_pairs for r in simhash_hamming_curve(docs).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0] == 1
    # cumulative: each radius includes all tighter ones
    assert rows[0] <= rows[1] <= rows[2] <= rows[3]


def test_hamming_curve_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    rows = {r.max_hamming: r.n_pairs for r in simhash_hamming_curve(docs).collect()}
    assert rows == {0: 0, 1: 0, 2: 0, 3: 0}


def test_conductance_two_triangles_bridged(spark):
    # two triangles joined by ONE bridge edge a3-b1; 2-iteration LPA on
    # the disconnected variant keeps them separate — use disconnected
    # triangles plus check the bridged case leaks
    e = spark.createDataFrame(
        [
            ("a1", "a2"),
            ("a1", "a3"),
            ("a2", "a3"),
            ("b1", "b2"),
            ("b1", "b3"),
            ("b2", "b3"),
            ("a3", "b1"),
        ],
        "src string, dst string",
    )
    rows = {r.community: r for r in community_conductance(e).collect()}
    # LPA(2) on this bridged graph: a* flood to a1; b1 (adjacent to a3)
    # reaches a1 via a3's iter-1 label... verify structural invariants
    # instead of the exact labeling: cut stubs are symmetric and volumes
    # sum to the stub total
    total_vol = sum(r.volume for r in rows.values())
    assert total_vol == 2 * 7 * 2 / 2 + 0  # 14 stubs: 7 undirected edges
    if len(rows) > 1:
        # every community's cut is matched by the others' cuts
        assert sum(r.cut for r in rows.values()) % 2 == 0
        for r in rows.values():
            assert r.conductance is not None


def test_conductance_disconnected_triangles(spark):
    e = spark.createDataFrame(
        [
            ("a1", "a2"),
            ("a1", "a3"),
            ("a2", "a3"),
            ("b1", "b2"),
            ("b1", "b3"),
            ("b2", "b3"),
        ],
        "src string, dst string",
    )
    rows = {r.community: r for r in community_conductance(e).collect()}
    # two communities, no cut edges: conductance 0.0 for both (vol 6 each,
    # min(6, 12-6) = 6 > 0)
    assert len(rows) == 2
    for r in rows.values():
        assert (r.size, r.volume, r.cut) == (3, 6, 0)
        assert r.conductance == 0.0


def test_conductance_single_community_null(spark):
    # one triangle: whole-graph community, min(vol, M-vol) = 0 -> NULL
    e = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("x", "z")], "src string, dst string"
    )
    rows = community_conductance(e).collect()
    assert len(rows) == 1
    assert rows[0].conductance is None
    assert rows[0].cut == 0
