"""ANN recall scoreboard (queries.ann_recall_eval): contract and
cross-method consistency on the driver corpus."""


def test_ann_recall_eval_contract(spark):
    import __spark_entry__ as e

    rows = {
        r.method: r
        for r in e.queries()["ann_recall_eval"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"ivf", "pq_adc", "ivfpq"}
    assert rows["ivf"].total == 50
    assert rows["pq_adc"].total == 80 and rows["ivfpq"].total == 80
    for r in rows.values():
        assert 0 <= r.hits <= r.total
        assert abs(r.recall_at_10 - round(r.hits / r.total, 6)) < 1e-12
    # list pruning can only remove candidates ADC would have scored, so
    # ivfpq's recall is within a small band below/around the pure scan's
    assert (
        rows["ivfpq"].recall_at_10 >= rows["pq_adc"].recall_at_10 - 0.1
    )
    # ivf probes 8/16 lists with exact rerank — far better than the
    # compressed-code scans on this corpus
    assert rows["ivf"].recall_at_10 >= 0.5
