"""Corpus-curation operators for training-data pipelines — the
corpus-LEVEL quality/dedup signals that complement the per-row textstats:

  * dup_ngram_stats   — per doc, the fraction of its distinct n-gram
                        shingles that occur in more than one document
                        (the "duplicate n-gram mass" reject signal from
                        the public LM data-curation literature).
  * decontaminate     — n-gram overlap of every corpus document against a
                        (small) held-out evaluation set; the standard
                        benchmark-decontamination step before training.
  * token_entropy     — per-doc Shannon entropy of the unigram
                        distribution (degenerate/low-entropy text filter).
  * dedup_survivors   — per near-dup cluster, the canonical document to
                        KEEP (longest text, ties to smallest id) — the
                        final step that turns pair detection into an
                        actual deduplicated corpus.

All pure DataFrame ops with DuckDB oracles in __spark_entry__.py.

Scale notes: dup_ngram_stats and token_entropy are one hash shuffle each
(shingle / (doc,term) keys) with map-side partial aggregation; the
shingle-frequency join reuses the exploded index's exchange. decontaminate
broadcasts the EVAL side only — eval sets are benchmark-sized (thousands
of docs), never corpus-sized, so the corpus pass stays narrow.
dedup_survivors is a per-cluster window over the cluster assignment —
cluster cardinality is bounded by the dup-class size, so no skew surface
beyond what the pair detection already bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_index
from .textstats import tokens_col


def dup_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, n_shingles, dup_ngram_frac) — dup_ngram_frac is the share
    of the document's DISTINCT n-gram shingles that appear in >= 2
    documents. Docs with fewer than n tokens have no shingles and score 0.

    Physical shape: explode distinct shingles -> shingle document-frequency
    aggregate (map-side combine; the df table is corpus-sized, NOT
    broadcast) -> shuffle join back on the shingle key -> per-doc
    aggregate. Both sides of the join hash-partition on `shingle` from the
    same child, so AQE reuses the exchange rather than shuffling twice."""
    idx = shingle_index(df, text_col, id_col, n, max_df=None)
    dfreq = idx.groupBy("shingle").agg(F.count("*").alias("sdf"))
    per_doc = (
        idx.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("sdf") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == per_doc.id, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.round(
                F.when(
                    F.col("n_shingles") > 0, F.col("n_dup") / F.col("n_shingles")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_ngram_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every CORPUS document: n_hits is
    how many of its distinct n-gram shingles also occur anywhere in the
    eval set; contaminated = n_hits >= min_hits. The corpus/eval id spaces
    are assumed disjoint (callers filter eval docs out of the corpus —
    a doc trivially "contaminates" against itself).

    Scale: the eval side is reduced to a DISTINCT shingle set and
    broadcast — benchmark suites are thousands of documents, so the
    broadcast is megabytes while the corpus side streams through a narrow
    left-semi-style join with no corpus shuffle at all."""
    corpus_idx = shingle_index(corpus, text_col, id_col, n, max_df=None)
    eval_shingles = (
        shingle_index(eval_set, text_col, id_col, n, max_df=None)
        .select("shingle")
        .distinct()
    )
    hits = (
        corpus_idx.join(F.broadcast(eval_shingles), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits, F.col(id_col) == hits.id, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, entropy) — Shannon entropy (nats) of the per-doc
    unigram frequency distribution; 0.0 for empty/degenerate docs. Low
    entropy flags repetitive/boilerplate text that length filters miss.

    explode -> (doc, term) count -> per-doc -sum(p ln p), both aggregates
    with map-side combine; one shuffle on (doc, term), one on doc."""
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    ent = (
        tf.withColumn("n", F.sum("tf").over(Window.partitionBy("id")))
        .groupBy("id")
        .agg(
            F.max("n").alias("n_tokens"),
            (
                F.round(
                    -F.sum(
                        (F.col("tf") / F.col("n")) * F.log(F.col("tf") / F.col("n"))
                    ),
                    6,
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (single-token-type docs)
            ).alias("entropy"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(ent, F.col(id_col) == ent.id, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def dedup_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """(cluster, survivor_id, n_members) — for each near-dup cluster (the
    output of neardup_clusters), the single document to keep: longest by
    `length_col`, ties broken toward the smallest id. Joining survivors
    back to the corpus IS the deduplicated dataset.

    One broadcast-or-shuffle join on the doc id plus a per-cluster window;
    duplicate classes are small after LSH+verify, so the window partition
    is bounded and skew-free."""
    member = clusters.join(
        docs.select(F.col(id_col), F.col(length_col)), id_col
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc(length_col), F.col(id_col)
    )
    return (
        member.withColumn("_rn", F.row_number().over(w))
        .groupBy("cluster")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col(id_col))).alias("survivor_id"),
            F.count("*").alias("n_members"),
        )
    )
