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
  * line_dedup        — CCNet-style duplicate-LINE removal: drop every
                        line whose corpus-wide occurrence count exceeds a
                        threshold, and rebuild the document from the
                        surviving lines in order. ("Lines" are fixed
                        token-count chunks — the synthetic corpus has no
                        newlines.)
  * pii_scrub         — columnar PII masking (email / phone / IPv4 ->
                        typed placeholders) with per-doc match counts;
                        regexes kept in the Java ∩ RE2 dialect subset so
                        the DuckDB oracle runs the same patterns.

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

from ..session import fan_out
from .dedup import shingle_index, simhash_token_hash
from .textstats import token_count, tokens_col


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


def source_similarity(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
    max_sf: int | None = None,
) -> DataFrame:
    """(src1, src2, n_shared, jaccard) — the cross-source content-overlap
    matrix: for every unordered pair of sources, how many DISTINCT n-gram
    shingles they share and the Jaccard of their shingle sets. This is the
    corpus-accounting view that tells a curation run which feeds are
    re-crawling each other (syndication, mirrors, CommonCrawl-snapshot
    overlap) BEFORE any pairwise doc dedup runs — the source pair with
    jaccard 0.9 is one dedup pass, not two ingest pipelines.

    Physical shape: distinct (source, shingle) pairs -> per-shingle sorted
    source set (bounded by the SOURCE dimension's cardinality — crawls /
    feeds / snapshots are tens-to-thousands, never corpus-scale) ->
    combination pairs generated array-side -> count per (src1, src2). One
    shuffle on the shingle key with map-side distinct, one on the bounded
    pair key; per-source totals are a 2nd tiny aggregate broadcast back.
    max_sf optionally drops shingles present in more than max_sf sources
    (stop-shingles contribute ~uniformly to every pair and only flatten
    the matrix; dropping them is the same guard shingle_index applies at
    the doc level)."""
    idx = shingle_index(df, text_col, source_col, n, max_df=None).distinct()
    per_shingle = idx.groupBy("shingle").agg(
        F.sort_array(F.collect_set("id")).alias("srcs")
    )
    if max_sf is not None:
        per_shingle = per_shingle.filter(F.size("srcs") <= max_sf)
    pairs = (
        per_shingle.select(
            F.explode_outer(
                F.flatten(
                    F.transform(
                        F.col("srcs"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("srcs"),
                                i + 2,
                                F.size("srcs") - i - 1,
                            ),
                            lambda y: F.struct(
                                x.alias("s1"), y.alias("s2")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .where(F.col("p").isNotNull())
        .groupBy(F.col("p.s1").alias("src1"), F.col("p.s2").alias("src2"))
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    totals = idx.groupBy("id").agg(F.count("*").alias("n_sh"))
    ta = totals.select(F.col("id").alias("src1"), F.col("n_sh").alias("_n1"))
    tb = totals.select(F.col("id").alias("src2"), F.col("n_sh").alias("_n2"))
    return (
        pairs.join(F.broadcast(ta), "src1")
        .join(F.broadcast(tb), "src2")
        .select(
            "src1",
            "src2",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("_n1") + F.col("_n2") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def source_similarity_kmv(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
    k: int = 64,
    prefilter_factor: int = 8,
) -> DataFrame:
    """(src1, src2, n_common, est_jaccard) — KMV (k-minimum-values)
    bottom-k sketch estimate of the cross-source shingle Jaccard: the
    SCALE-path twin of source_similarity. The exact matrix touches every
    distinct (source, shingle) pair — fine until the shingle space is
    10^11; the sketch reduces each source to its k smallest 60-bit md5
    shingle hashes and estimates J(X,Y) = |X∩Y∩bottomk(X∪Y)| /
    |bottomk(X∪Y)| (the classic KMV Jaccard estimator; std err
    ~ sqrt(J(1-J)/k)). Bottom-k under a global hash ranking is a
    semilattice, so per-shard sketches merge exactly — the per-snapshot
    summary that answers "which crawls overlap" without re-scanning.

    Scale shape mirrors sample_sketch: distinct (source, hash) ->
    per-source counts -> broadcast hash-space cut keeping ~factor*k rows
    per source -> rank window over the tiny survivor set -> the pair
    matrix runs on sources^2 k-length arrays, never on the corpus. The
    DuckDB oracle ranks UNFILTERED, so a prefilter shortfall fails
    correctness loudly (the mergeable-summary family rule). Deterministic
    md5 hashing makes the ESTIMATE itself reproducible cross-engine."""
    from pyspark.sql import Window

    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.where(F.col(source_col).isNotNull()).select(
        F.col(source_col).alias("g"), toks.alias("_toks")
    )
    sh = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - n),
            lambda i: simhash_token_hash(
                F.array_join(F.slice(F.col("_toks"), i + 1, n), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    idx = (
        base.withColumn("_sh", sh)
        .select("g", F.explode_outer("_sh").alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    counts = idx.groupBy("g").agg(F.count("*").cast("long").alias("_n"))
    max_h = float(1 << 60)
    cut = counts.withColumn(
        "_cut",
        F.when(
            F.col("_n") <= F.lit(prefilter_factor * k), F.lit(max_h)
        ).otherwise(
            F.lit(max_h) * F.lit(float(prefilter_factor * k)) / F.col("_n")
        ),
    )
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    sk = (
        idx.join(F.broadcast(cut), "g")
        .where(F.col("h") <= F.col("_cut"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
    )
    a = sk.select(F.col("g").alias("src1"), F.col("sk").alias("_ska"))
    b = sk.select(F.col("g").alias("src2"), F.col("sk").alias("_skb"))
    pairs = a.join(F.broadcast(b), F.col("src1") < F.col("src2"))
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat("_ska", "_skb"))), 1, k
    )
    pairs = pairs.withColumn("_u", u).withColumn(
        "_nc",
        F.size(
            F.filter(
                F.col("_u"),
                lambda x: F.array_contains(F.col("_ska"), x)
                & F.array_contains(F.col("_skb"), x),
            )
        ),
    )
    return pairs.select(
        "src1",
        "src2",
        F.col("_nc").cast("long").alias("n_common"),
        F.round(F.col("_nc") / F.size("_u"), 6).alias("est_jaccard"),
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


def decontaminate_near(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate decontamination: where `decontaminate` flags ANY
    shared shingle, this scores each corpus doc against each eval doc by
    shingle CONTAINMENT = |shingles(doc) ∩ shingles(eval)| / |shingles(doc)|
    and reports the best-matching eval doc (ties broken toward the smallest
    eval id). Containment, not Jaccard: a short eval item fully embedded in
    a long corpus doc is exactly the leak we must catch, and symmetric
    Jaccard would dilute it.

    Returns (doc_id, n_shingles, best_eval_id, containment, contaminated)
    for every corpus doc; docs with no overlap (or too short to shingle)
    get (0-or-n, null, 0.0, false).

    Scale: the eval side — (eval_id, shingle) distinct pairs — is broadcast
    (benchmark suites are thousands of docs → megabytes of shingles). The
    corpus side streams through the broadcast join; the only shuffles are
    the partial-aggregated counts keyed (doc, eval) then doc. Never a
    corpus×eval cross product: the join fans out only on actual shingle
    hits."""
    corpus_idx = shingle_index(corpus, text_col, id_col, n, max_df=None)
    eval_idx = (
        shingle_index(eval_set, text_col, id_col, n, max_df=None)
        .select(F.col("id").alias("eval_id"), "shingle")
        .distinct()
    )
    per_doc = corpus_idx.groupBy("id").agg(
        F.count("*").alias("n_shingles")
    )
    overlap = (
        corpus_idx.join(F.broadcast(eval_idx), "shingle")
        .groupBy("id", "eval_id")
        .agg(F.count("*").alias("n_common"))
    )
    best = (
        overlap.join(per_doc, "id")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.col("n_shingles"), 6),
        )
        .groupBy("id")
        .agg(
            # argmax by containment, smallest eval_id on ties
            F.max(
                F.struct(F.col("containment"), (-F.col("eval_id")).alias("neg"))
            ).alias("top")
        )
        .select(
            "id",
            (-F.col("top.neg")).cast("long").alias("best_eval_id"),
            F.col("top.containment").alias("containment"),
        )
    )
    return (
        corpus.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == per_doc.id, "left")
        .drop("id")
        .join(best, F.col(id_col) == best.id, "left")
        .drop("id")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.col("best_eval_id"),
            F.coalesce("containment", F.lit(0.0)).alias("containment"),
            (F.coalesce("containment", F.lit(0.0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novel) — temporal novelty: how many
    of a document's distinct n-gram shingles appear in NO earlier document
    (earlier = smaller id; ids are ingest-ordered). The forward-dedup /
    freshness signal for continuously-crawled corpora: recrawls and
    syndicated copies score near zero, genuinely new content near its
    shingle count. `novel` flags docs with a majority of first-seen
    shingles.

    Physical shape: one shingle-key aggregate taking min(id) per shingle
    (map-side combine — no window, no sort), joined back to the inverted
    index on the SAME shingle partitioning (AQE reuses the exchange), then
    a per-doc count. A doc is credited exactly the shingles it is the
    corpus-wide first bearer of, so sum(n_novel) == distinct shingles."""
    idx = shingle_index(df, text_col, id_col, n, max_df=None)
    firsts = idx.groupBy("shingle").agg(F.min("id").alias("_first"))
    per = (
        idx.join(firsts, "shingle")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("id") == F.col("_first"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per, F.col(id_col) == per.id, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            (
                F.coalesce("n_novel", F.lit(0)) * 2
                > F.coalesce("n_shingles", F.lit(0))
            ).alias("novel"),
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


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 8,
    max_occ: int = 1,
) -> DataFrame:
    """(doc_id, n_lines, n_kept, cleaned_text) — CCNet-style duplicate-line
    removal. Every document is split into consecutive `chunk`-token lines;
    a line whose occurrence count across the WHOLE corpus exceeds
    `max_occ` is boilerplate and is dropped from every document; the
    cleaned text is the surviving lines re-joined in original order.

    Physical shape: posexplode lines -> line-frequency aggregate (map-side
    combine on the line key; the frequency table is corpus-sized and joins
    back by SHUFFLE, with AQE free to broadcast when small) -> per-doc
    rebuild via collect_list(struct(pos, line)) + array_sort, which is
    order-correct regardless of shuffle order. One line-key shuffle, one
    doc-key shuffle — no window, no UDF."""
    # tokens bound as a COLUMN before the line build: a raw `toks`
    # expression inside the transform lambda is part of the lambda body and
    # re-tokenizes per line position — O(tokens^2/chunk) per doc. As a
    # multi-referenced non-cheap alias, CollapseProject keeps the boundary
    # and the split runs once per row per consumer.
    toks = F.col("_toks")
    n_lines = F.ceil(F.size(toks) / F.lit(chunk)).cast("int")
    lines = F.when(F.size(toks) <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(
                F.slice(toks, i * chunk + 1, chunk), " "
            ),
        )
    )
    # tokenize ORIGINAL case: the CCNet rule keys duplicate detection on
    # the normalized (lowercased) line but the surviving text must keep
    # its case — rebuilding from folded tokens would rewrite every
    # document it touches
    base = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), lines.alias("_lines"))
    # posexplode_OUTER + isNotNull, not plain posexplode: the inferred
    # size(_lines)>0 filter would be pushed below the projection, inlining
    # the whole tokenize+line-build expression per conjunct (measured 21
    # split() copies in the optimized plan). Null rows (token-less docs)
    # are dropped on the generator OUTPUT attribute instead.
    exploded = (
        base.select(
            F.col(id_col).alias("id"),
            F.posexplode_outer("_lines").alias("pos", "line"),
        )
        .where(F.col("line").isNotNull())
        .withColumn("lkey", F.lower("line"))
    )
    freq = exploded.groupBy("lkey").agg(F.count("*").alias("occ"))
    kept = (
        exploded.join(freq, "lkey")
        .filter(F.col("occ") <= max_occ)
        .groupBy("id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )
    return (
        base.join(kept, base[id_col] == kept.id, "left")
        .select(
            F.col(id_col),
            F.size("_lines").cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# PII patterns restricted to the Java ∩ RE2 regex subset (character
# classes, bounded repetition, \b word boundary) so Spark and the DuckDB
# oracle execute the IDENTICAL pattern strings.
# mixed-case classes (not a case-insensitive flag): the Java ∩ RE2 dialect
# subset keeps the DuckDB oracle running the identical string, and real
# corpora write John.Doe@Example.COM
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def intra_doc_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 8,
) -> DataFrame:
    """(doc_id, n_lines, n_kept, cleaned_text) — WITHIN-document repeated-
    line removal (the intra-document half of the RefinedWeb/MassiveText
    line-dedup recipe, complementing the corpus-level line_dedup): split
    the document into consecutive `chunk`-token lines, keep only the FIRST
    occurrence of each distinct line (case-folded comparison, original
    case preserved), and rebuild the text in order. Catches nav menus /
    footers repeated inside one page without any cross-document state.

    Scale: pure per-row array work — ZERO shuffle, embarrassingly
    parallel, the cheapest dedup in the family. The first-occurrence scan
    is O(lines^2) per document via array_position, bounded by document
    length, never corpus size."""
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks"))
    n_lines = F.ceil(F.size("_toks") / F.lit(chunk)).cast("int")
    lines = F.when(
        F.size("_toks") <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(
                F.slice(F.col("_toks"), i * chunk + 1, chunk), " "
            ),
        )
    )
    # both arrays bound as columns: a raw `lines` expression referenced
    # from the filter lambda would re-build every line per comparison
    base = base.withColumn("_lines", lines).withColumn(
        "_lkeys", F.transform(F.col("_lines"), F.lower)
    )
    # _kept bound as a column: the O(lines^2) first-occurrence filter is
    # referenced twice below (count + rebuild) and would otherwise be
    # re-evaluated per consumer (multi-referenced non-cheap aliases are
    # kept as projection boundaries, inline expressions are not)
    base = base.withColumn(
        "_kept",
        F.filter(
            F.col("_lines"),
            lambda x, i: F.array_position(F.col("_lkeys"), F.lower(x))
            == i + 1,
        ),
    )
    return base.select(
        F.col(id_col),
        F.size("_lines").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_kept"),
        F.array_join("_kept", " ").alias("cleaned_text"),
    )


def host_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    site_col: str = "source",
    id_col: str = "doc_id",
    k: int = 3,
    min_docs: int = 5,
    share: float = 0.5,
) -> DataFrame:
    """(doc_id, site, prefix_share, templated) — templated-page detection:
    group a site's documents by their first-k-token (case-folded) prefix;
    a document is `templated` when its prefix is shared by >= `share` of
    the site's docs AND the site has >= min_docs docs (small sites can't
    establish a template). The standard pre-filter for site-chrome pages
    (search results, tag indexes, login walls) that per-document quality
    scores rate as fine text.

    Physical shape: one aggregate on the (site, prefix) key, one tiny
    per-site total (site is a bounded dimension -> broadcast back), and
    the doc-side join back on the SAME (site, prefix) partitioning, so
    AQE reuses the exchange rather than shuffling twice. Prefix keys are
    k tokens — bounded width, no skew surface beyond genuinely templated
    sites, which is the signal itself."""
    prefix = F.lower(
        F.array_join(F.slice(tokens_col(F.col(text_col)), 1, k), " ")
    )
    base = df.select(
        F.col(id_col),
        F.col(site_col).alias("site"),
        F.coalesce(prefix, F.lit("")).alias("_prefix"),
    )
    per_prefix = base.groupBy("site", "_prefix").agg(
        F.count("*").alias("_pc")
    )
    per_site = base.groupBy("site").agg(F.count("*").alias("_sc"))
    pp = per_prefix.select(
        F.col("site").alias("_ps"),
        F.col("_prefix").alias("_pp"),
        "_pc",
    )
    ps = per_site.select(F.col("site").alias("_ss"), "_sc")
    return (
        base.join(
            pp,
            F.col("site").eqNullSafe(F.col("_ps"))
            & (F.col("_prefix") == F.col("_pp")),
        )
        .join(F.broadcast(ps), F.col("site").eqNullSafe(F.col("_ss")))
        .select(
            F.col(id_col),
            F.col("site"),
            F.round(F.col("_pc") / F.col("_sc"), 6).alias("prefix_share"),
            (
                (F.col("_pc") / F.col("_sc") >= F.lit(share))
                & (F.col("_sc") >= F.lit(min_docs))
            ).alias("templated"),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(lang, n_docs, n_words, n_subwords, fertility) — tokenizer
    fertility per language: subword tokens emitted per whitespace word
    (the standard multilingual-tokenizer health metric — a language whose
    fertility is 2-3x the corpus median is being over-fragmented and pays
    that multiple in sequence length and training cost). Uses the same
    BPE-pretokenizer counter the token-budget path uses, so the numbers
    reconcile with pack_sequences / bpe_token_count exactly.

    One per-language aggregate with map-side combine — language is a
    bounded dimension; no joins, no second pass."""
    from .textstats import bpe_token_count

    return (
        df.groupBy(F.col(lang_col).alias("lang"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(token_count(F.col(text_col))).cast("long").alias("n_words"),
            F.sum(bpe_token_count(F.col(text_col)))
            .cast("long")
            .alias("n_subwords"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_subwords",
            F.round(
                F.when(
                    F.col("n_words") > 0,
                    F.col("n_subwords") / F.col("n_words"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("fertility"),
        )
    )


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, scrubbed) — mask emails, then
    phone numbers, then IPv4 addresses with typed placeholders, counting
    matches BEFORE masking. Fully columnar (regexp_count/regexp_replace in
    whole-stage codegen): a narrow map over the corpus, no shuffle, no
    Python — the shape that streams through 100 TB at scan speed.

    Masking order matters and is part of the contract: emails are masked
    first so their host dots can never be re-matched as IPv4 octets."""
    text = F.col(text_col)
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(text, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        scrub.alias("scrubbed"),
    )


def mix_weights(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_tokens, corpus_frac, target_frac, weight) — the
    data-mixing step of a training pipeline: given the corpus's actual
    per-source token mass and a TARGET mixture (fractions summing to 1),
    the per-source sampling/repetition weight that reshapes the corpus into
    the target: weight = target_frac / corpus_frac. weight < 1 means
    downsample the source, > 1 means repeat it (epoch oversampling).

    Scale: one per-source aggregate with map-side combine — the result is
    sources-sized (dozens of rows), so the total-token denominator is a
    broadcast cross join of a 1-row frame, never a global window."""
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    # two consumers (the result and the total) would each re-run the corpus
    # scan+tokenize+aggregate — checkpoint the sources-sized result instead
    per = per.localCheckpoint(eager=False)
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    target = F.coalesce(
        *[
            F.when(F.col("source") == k, F.lit(float(v)))
            for k, v in sorted(targets.items())
        ],
        F.lit(0.0),
    )
    return (
        per.join(F.broadcast(tot))
        # _tot = 0 (all-empty corpus) must yield frac 0.0, not an ANSI
        # DIVIDE_BY_ZERO (the weight branch is safe: n_tokens > 0 ⇒ _tot > 0)
        .withColumn(
            "corpus_frac",
            F.when(
                F.col("_tot") > 0,
                F.round(F.col("n_tokens") / F.col("_tot"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("target_frac", F.round(target, 6))
        .withColumn(
            "weight",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("target_frac") / (F.col("n_tokens") / F.col("_tot")), 6),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "source", "n_docs", "n_tokens", "corpus_frac", "target_frac", "weight"
        )
    )


def epoch_plan(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    max_epochs: int = 4,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_tokens, target_tokens, full_epochs, tail_tokens,
    planned_tokens, shortfall, clipped) — the epoch-assembly step that
    turns `mix_weights`-style target fractions plus a total token budget
    into a concrete per-source read plan: how many FULL passes over each
    source, how many extra tokens of a final partial pass, and how much
    of the target is unsatisfiable under the repeat cap (data-constrained
    sources — the signal that the mixture, not the corpus, must change).

    Everything after the one per-source token aggregate is exact integer
    arithmetic (DIV / ×  / least), so the plan is bit-identical across
    engines — ratios are left to the consumer (the round(x, k) cross-
    engine hazard class). The repeat cap is the Muennighoff-style
    data-constrained bound: tokens repeated beyond ~4 epochs stop adding
    model quality, so the planner clips there and reports the shortfall
    instead of silently over-repeating.

    Scale: identical to mix_weights — one map-side-combined aggregate to
    a sources-sized frame; the budget and cap ride as plan literals."""
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    target = F.coalesce(
        *[
            F.when(F.col("source") == k, F.lit(float(v)))
            for k, v in sorted(targets.items())
        ],
        F.lit(0.0),
    )
    budget = F.lit(int(budget_tokens)).cast("long")
    out = (
        per.withColumn(
            "target_tokens",
            F.floor(target * budget + F.lit(0.5)).cast("long"),
        )
        .withColumn(
            "_capacity", F.lit(int(max_epochs)).cast("long") * F.col("n_tokens")
        )
        .withColumn(
            "planned_tokens", F.least("target_tokens", "_capacity")
        )
        .withColumn("clipped", F.col("target_tokens") > F.col("_capacity"))
        .withColumn(
            "full_epochs",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("planned_tokens DIV n_tokens"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "tail_tokens",
            F.col("planned_tokens") - F.col("full_epochs") * F.col("n_tokens"),
        )
        .withColumn(
            "shortfall", F.col("target_tokens") - F.col("planned_tokens")
        )
    )
    return out.select(
        "source",
        "n_tokens",
        "target_tokens",
        "full_epochs",
        "tail_tokens",
        "planned_tokens",
        "shortfall",
        "clipped",
    )


def lang_alpha_weights(
    df: DataFrame,
    alpha: float = 0.3,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, n_tokens, p, q, weight) — exponentiated-smoothing language
    sampling (the multilingual-LM recipe: sample language l with
    probability q_l ∝ p_l^alpha where p_l is its corpus token share).
    alpha < 1 upsamples tail languages and downsamples the head, bounding
    head dominance without dropping data; weight = q_l / p_l is the
    per-language repetition factor a sampler applies. alpha=1 is the
    natural distribution, alpha=0 uniform.

    Scale: same shape as mix_weights — one per-language aggregate with
    map-side combine, result bounded by the language dimension (hundreds),
    totals broadcast back as 1-row frames. A NULL language is a real group
    (groupBy keeps it) so unidentified docs stay accounted."""
    per = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens")
    )
    # two consumers (totals and the result) — checkpoint the langs-sized agg
    per = per.localCheckpoint(eager=False)
    per = per.withColumn("_pa", F.pow(F.col("n_tokens").cast("double"), alpha))
    tot = per.agg(
        F.sum("n_tokens").alias("_tot"), F.sum("_pa").alias("_tot_a")
    )
    return (
        per.join(F.broadcast(tot))
        .withColumn(
            "p",
            F.when(
                F.col("_tot") > 0, F.col("n_tokens") / F.col("_tot")
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q",
            F.when(
                F.col("_tot_a") > 0, F.col("_pa") / F.col("_tot_a")
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "lang",
            "n_tokens",
            F.round("p", 6).alias("p"),
            F.round("q", 6).alias("q"),
            F.round(
                F.when(F.col("p") > 0, F.col("q") / F.col("p")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("weight"),
        )
    )


def corpus_digest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> DataFrame:
    """(bucket, n_docs, digest) — an order-independent, mergeable content
    digest of the corpus, bucketed for incremental verification: digest is
    the XOR of a 60-bit md5-derived word per (doc_id, text) row. Two runs
    (or two replicas) produced the same corpus iff every bucket row
    matches — the data-versioning primitive that catches silent row loss,
    duplication, or mutation after a migration/compaction without sorting
    or moving the data. XOR is commutative/associative, so per-bucket
    digests combine across shards and partial digests of disjoint
    increments merge exactly (same family as the bottom-k sample sketch:
    pair any scale prefilter with an unfiltered oracle).

    One map-side-combined aggregate on a bounded bucket key; no joins.
    60-bit words (15 md5 hex chars) keep the arithmetic inside BIGINT on
    both engines — DuckDB overflows building 1<<63 literals."""
    key = F.concat(
        F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        F.lit("|"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    word = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(key), 16, 2), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    return (
        df.select(bucket.alias("bucket"), word.alias("_w"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.bit_xor("_w").alias("digest"),
        )
    )


def global_shuffle(
    df: DataFrame, seed: str = "shuf1", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shard, shuffle_pos) — deterministic global training order:
    every document gets a unique 1-based position, ordered by
    md5(seed || '_' || doc_id). Rerun-stable (same seed => same order on
    any cluster size) — the reproducible alternative to RNG shuffles for
    epoch ordering.

    Scale shape: a naive global row_number() is a single-partition window.
    Instead the md5 key's FIRST BYTE is the shard (the hex prefix, so
    (shard, key) order == key order), positions are per-shard windows, and
    the global offset of each shard is a running sum over the 256-row
    shard-count table — the only single-partition step touches 256 rows,
    never the corpus. One shuffle on the shard key, as any global sort
    would need; unlike a sort, the heavy side never compares keys across
    shards."""
    # coalesce before the concat: md5(concat(seed, NULL)) is NULL, which
    # would land NULL-id docs in a NULL shard that is COUNTED into the
    # offsets but dropped by the equi-join — every position would shift
    # and the NULL-id rows would vanish
    key = F.md5(
        F.concat(
            F.lit(seed + "_"),
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        )
    )
    base = df.select(
        F.col(id_col),
        key.alias("_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("shard"),
    )
    counts = base.groupBy("shard").agg(F.count("*").alias("_n"))
    offsets = counts.select(
        "shard",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return (
        base.join(F.broadcast(offsets), "shard")
        .select(
            F.col(id_col),
            "shard",
            (F.col("_off") + F.row_number().over(w)).cast("long").alias(
                "shuffle_pos"
            ),
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


def dedup_apply(
    docs: DataFrame,
    clusters: DataFrame,
    survivors: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The deduplicated corpus itself — docs minus every non-survivor
    cluster member. Completes the dedup pipeline end-to-end: pair
    detection -> connected components -> survivor selection -> THIS
    (previously only prose in dedup_survivors' docstring).

    The drop list is (members − survivors): duplicate-class-sized, i.e.
    tiny relative to the corpus after dedup did its job, so it broadcasts
    and the corpus pass is one broadcast anti-join — the full-table side
    never shuffles."""
    drop = (
        clusters.join(survivors.select("cluster", "survivor_id"), "cluster")
        .filter(F.col(id_col) != F.col("survivor_id"))
        .select(id_col)
    )
    return docs.join(F.broadcast(drop), id_col, "left_anti")


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy, perplexity) — CCNet-style
    perplexity quality scoring with a bigram language model trained on the
    corpus itself (the self-supervised stand-in for CCNet's external
    KenLM): the first token is scored by the add-k unigram model, every
    later token by add-k bigram p(w_i | w_{i-1}); cross_entropy is the
    mean negative log-likelihood in nats, perplexity = exp(it). High
    perplexity flags text unlike the corpus (gibberish, boilerplate
    soup) — the classic LM quality filter.

    Scale shape: unigram and bigram count tables are corpus-sized —
    shuffle aggregates with map-side combine, never broadcast; the scoring
    pass re-joins the exploded token/bigram rows on those keys, so the
    whole op is three hash shuffles (token, bigram, doc) over narrow rows.
    The model tables are reusable state: at production scale they'd be
    built once at write time and the scoring pass alone reruns."""
    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    words = base.select(F.explode("t").alias("w"))
    # the model tables have multiple consumers (uni: first-token scoring,
    # bigram-denominator join, totals; pairs: bigram counts and the scoring
    # rows) — without a checkpoint each consumer re-runs the corpus
    # explode+aggregate (Catalyst has no CTE sharing). At production scale
    # these are the persisted model tables the docstring describes.
    uni = (
        words.groupBy("w")
        .agg(F.count("*").alias("cw"))
        .localCheckpoint(eager=False)
    )
    tot = uni.agg(
        F.sum("cw").cast("double").alias("N"),
        F.count("*").cast("double").alias("V"),
    )

    pairs = base.select(
        F.col("id"),
        F.posexplode(
            F.when(F.size("t") >= 2, F.expr("slice(t, 1, size(t) - 1)"))
            .otherwise(F.array().cast("array<string>"))
        ).alias("pos", "w1"),
        F.col("t"),
    ).select("id", "pos", "w1", F.expr("t[pos + 1]").alias("w2"))
    pairs = pairs.localCheckpoint(eager=False)
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))

    first = (
        base.filter(F.size("t") >= 1)
        .select("id", F.expr("t[0]").alias("w"))
        .join(uni, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.log((F.col("cw") + F.lit(k)) / (F.col("N") + F.lit(k) * F.col("V"))).alias("logp"),
        )
    )
    rest = (
        pairs.join(bi, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.log((F.col("cb") + F.lit(k)) / (F.col("cw") + F.lit(k) * F.col("V"))).alias("logp"),
        )
    )
    scored = (
        first.unionByName(rest)
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (-F.sum("logp") / F.count("*")).alias("_h"),
        )
        .select(
            "id",
            "n_tokens",
            F.round("_h", 6).alias("cross_entropy"),
            F.round(F.exp("_h"), 4).alias("perplexity"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, F.col(id_col) == scored.id, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("cross_entropy", F.lit(0.0)).alias("cross_entropy"),
            F.coalesce("perplexity", F.lit(1.0)).alias("perplexity"),
        )
    )


def curation_funnel(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
):
    """One-row funnel report for the standard curation pipeline composed
    end-to-end — quality rules -> learned classifier -> exact dedup:

      n_input      — documents scanned
      n_quality    — survive the Gopher-style 6-rule filter
      n_classifier — additionally accepted by the hashed-BoW linear model
      n_unique     — distinct md5(text) among classifier survivors
                     (what exact dedup would keep)

    This is the RefinedWeb/FineWeb-shaped funnel: each stage is a columnar
    projection appended to the SAME frame, so the whole pipeline is ONE
    corpus scan + one tiny aggregate — no joins between stages, no
    intermediate materialization. At 10^12 docs the funnel costs exactly
    what the most expensive single filter costs. The only non-projection
    work is count(DISTINCT digest), whose partial aggregation ships one
    16-byte digest per surviving doc to the final exchange."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.textstats import (
        gopher_filter,
        hash_lr_score,
    )

    x = gopher_filter(
        df.select(id_col, text_col, lang_col),
        text_col=text_col,
        id_col=id_col,
        lang_col=lang_col,
        as_columns=True,
    )
    x = hash_lr_score(x, text_col=text_col, id_col=id_col, as_columns=True)
    both = F.col("accept") & F.col("lr_accept")
    return x.agg(
        F.count("*").cast("long").alias("n_input"),
        F.count_if(F.col("accept")).cast("long").alias("n_quality"),
        F.count_if(both).cast("long").alias("n_classifier"),
        F.count_distinct(
            F.when(both, F.md5(F.col(text_col)))
        ).cast("long").alias("n_unique"),
    )


def incremental_dedup(
    batch: DataFrame,
    seen_digests: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(digest, doc_id) — incoming-batch documents that survive exact dedup
    against an already-ingested corpus: batch-internal first occurrence
    (min id per digest) followed by an ANTI-JOIN against the seen-digest
    index. The daily-increment step of a continuously-ingested corpus.

    Scale shape: the one big-big anti-join in the operator inventory. Both
    sides reduce to 16-byte digests before any exchange (map-side combine
    collapses the batch to one row per digest), so the shuffle moves keys,
    never text. AQE picks broadcast when the index side is small; at
    10^12-doc scale the index is bucketed by digest at write time (the
    write_bucketed_input pattern), which deletes its exchange and makes
    the join storage-partitioned — the batch side alone shuffles, sized
    by the increment, not the corpus."""
    d = batch.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
    firsts = d.groupBy("digest").agg(F.min(id_col).alias(id_col))
    # null-safe anti-join: md5(NULL text) is a NULL digest, which groups
    # as one batch-internal class above but would NEVER match the seen
    # index on a plain equi-join — a NULL-text doc ingested once would
    # re-emit as "new" in every later batch
    seen = seen_digests.select(F.col("digest").alias("_seen"))
    return firsts.join(
        seen, F.col("digest").eqNullSafe(F.col("_seen")), "left_anti"
    )


def host_quota_sample(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 20,
    seed: str = "hq1",
    buckets: int | None = None,
) -> DataFrame:
    """(doc_id, host, host_rank, kept) — cap each host's contribution to
    the corpus at `quota` documents, chosen by a deterministic seeded
    hash order (NOT ingestion order, which over-samples whatever the
    crawler saw first). The anti-domination step of crawl curation: one
    link-farm host cannot flood the training mix.

    Per-host rank = row_number over md5(seed, doc_id) — rerun-stable, and
    re-seeding draws an independent sample. One window shuffle on the
    host key; host skew is exactly the thing being capped. `buckets` is
    the 10^12-doc path: rank within (host, md5-bucket) sub-partitions and
    keep quota/buckets per bucket — every window partition shrinks by the
    bucket factor (bounded memory under a single mega-host) while the
    kept sample stays deterministic and uniformly hash-drawn; quota must
    be divisible by buckets so the cap is exact."""
    okey = F.md5(F.concat(F.lit(seed + "_"), F.col(id_col).cast("string")))
    if buckets is not None:
        if quota % buckets:
            raise ValueError("quota must be divisible by buckets")
        sub = F.pmod(
            F.conv(F.substring(okey, 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        )
        w = Window.partitionBy(F.col(host_col), sub).orderBy(
            okey, F.col(id_col)
        )
        return df.select(
            F.col(id_col),
            F.col(host_col).alias("host"),
            F.row_number().over(w).alias("host_rank"),
        ).withColumn("kept", F.col("host_rank") <= quota // buckets)
    w = Window.partitionBy(host_col).orderBy(okey, F.col(id_col))
    return df.select(
        F.col(id_col),
        F.col(host_col).alias("host"),
        F.row_number().over(w).alias("host_rank"),
    ).withColumn("kept", F.col("host_rank") <= quota)


def quality_tiers(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_tiers: int = 3,
    approx: bool = False,
) -> DataFrame:
    """(lang, tier, n_docs, min_ppl, max_ppl) — CCNet-style quality
    bucketing: within each language, rank documents by LM perplexity and
    cut into n_tiers equal buckets (tier 1 = head / lowest perplexity,
    tier n = tail). Downstream pipelines train on head+middle and drop or
    re-weight the tail — this is the canonical CCNet partition.

    Determinism across engines: the ntile ORDER BY is the ROUNDED
    cross-entropy (6 dp — the same value the lm_perplexity oracle proves
    bit-stable cross-engine) with doc_id as the total tie-break, so bucket
    boundaries cannot flip on last-ulp float differences.

    Scale shape: lm_perplexity's three narrow-key shuffles, one join back
    to the corpus on doc_id for the language, then per-language EXACT
    ntile via ranking.grouped_ntile — per-language cut points split each
    language into range sub-buckets so a dominant language (half the
    corpus in one language is the norm) sorts across n_buckets parallel
    tasks, never one; output is bit-identical to the naive per-language
    window (same oracle). `approx=True` drops the in-bucket ordering too:
    tiers come straight from broadcast percentile_approx cut points —
    counts are then sketch-bounded approximate instead of exactly
    balanced, the cheapest form when balance tolerance allows."""
    ppl = lm_perplexity(df, text_col, id_col)
    joined = ppl.join(df.select(F.col(id_col), F.col(lang_col)), id_col)
    if approx:
        cuts = joined.groupBy(F.col(lang_col).alias("_cl")).agg(
            F.percentile_approx(
                "cross_entropy",
                [i / n_tiers for i in range(1, n_tiers)],
                10_000,
            ).alias("cuts")
        )
        bucketed = joined.join(
            # null-safe: a NULL language is a tier group of its own in the
            # exact path's window — the approx path must not drop it
            F.broadcast(cuts),
            F.col(lang_col).eqNullSafe(F.col("_cl")),
        ).withColumn(
            "tier",
            F.aggregate(
                "cuts",
                F.lit(1),
                lambda acc, c: acc
                + F.when(F.col("cross_entropy") > c, 1).otherwise(0),
            ),
        )
        return bucketed.groupBy(
            F.col(lang_col).alias("lang"), "tier"
        ).agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("perplexity").alias("min_ppl"),
            F.max("perplexity").alias("max_ppl"),
        )
    from .ranking import grouped_ntile

    # truncate the lm_perplexity dag before grouped_ntile reads the
    # frame three times (per-lang cuts, bucket counts, ranked join):
    # one narrow 4-column materialization vs three perplexity re-derives
    joined = joined.localCheckpoint(eager=True)
    tiered = grouped_ntile(
        joined, lang_col, "cross_entropy", [id_col], n_tiers
    )
    return (
        tiered.groupBy(F.col(lang_col).alias("lang"), "tier")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("perplexity").alias("min_ppl"),
            F.max("perplexity").alias("max_ppl"),
        )
    )


def ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """(w1, w2, c12, c1, p) — the corpus bigram language-model table
    itself: the top_n bigrams by count with their MLE conditional
    probability p = c12 / c1 (c1 = occurrences of w1 as a bigram prefix).
    This is the persisted model table the lm_perplexity scorer consumes —
    materializing it is the "train" half of the train-once / score-many
    split the perplexity docstring describes.

    Scale shape: one explode + hash-shuffle count on (w1, w2) with
    map-side combine, one window over w1 for the prefix totals (a second
    narrow-key shuffle), and a TakeOrderedAndProject for the top_n — no
    corpus-sized collect anywhere. Ordering is fully tie-broken
    (count desc, w1, w2) so the limit is deterministic cross-engine."""
    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.select(toks.alias("t")).where(F.size("t") >= 2)
    pairs = base.select(
        F.posexplode(F.expr("slice(t, 1, size(t) - 1)")).alias("pos", "w1"),
        F.col("t"),
    ).select("w1", F.expr("t[pos + 1]").alias("w2"))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    w1_tot = Window.partitionBy("w1")
    return (
        bi.withColumn("c1", F.sum("c12").over(w1_tot))
        .withColumn(
            "p", F.round(F.col("c12") / F.col("c1"), 6)
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(top_n)
    )


def kn_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """(rank, w1, w2, c12, c1, n_follow, n_prec, p_kn) — interpolated
    Kneser-Ney bigram model (the KenLM/CCNet-standard smoothing; Kneser &
    Ney 1995, public knowledge) over the corpus, reported for the top_n
    bigrams by (count desc, w1, w2):

        p_kn(w2|w1) = max(c12 - d, 0)/c1
                      + (d * n_follow / c1) * (n_prec / B)

    with discount d = 3/4, c1 = bigram-prefix count of w1, n_follow =
    |{w: c(w1 w) > 0}| (the backoff mass donor), n_prec = |{v: c(v w2)
    > 0}| (the continuation count — KN's insight: how many contexts a
    word FOLLOWS, not how often it occurs), B = distinct bigram types.
    d = 3/4 is exact in binary, so the whole probability reduces to ONE
    division of exact 64-bit integers:

        (max(4*c12 - 3, 0) * B + 3 * n_follow * n_prec) / (4 * c1 * B)

    — bit-identical across engines after the 6-dp round (valid while
    c12 * B < 2^61 AND the denominator's c1 * B < 2^61: c1 — the total
    bigram tokens of w1 — can exceed that well within a 100 TB corpus
    too, and the 64-bit multiply would wrap silently in non-ANSI mode
    while DuckDB's 4.0*c1*B computes in double; at 10^12-doc scale
    promote BOTH numerator and denominator to double, the formula is
    unchanged). Completes the trained-artifact trio:
    hashed-LR classifier (train_hash_lr), subword tokenizers
    (BPE/WordPiece/lattice), and now a smoothed language model.

    Scale shape: one (w1, w2) count shuffle with map-side combine; the
    context/continuation/type-total tables all derive from that bigram
    table (vocabulary-squared-bounded, corpus-sublinear); the top_n cut
    is TakeOrderedAndProject and the enrichment joins run on the top_n
    rows, never the full model table."""
    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.select(toks.alias("t")).where(F.size("t") >= 2)
    pairs = base.select(
        F.posexplode(F.expr("slice(t, 1, size(t) - 1)")).alias("pos", "w1"),
        F.col("t"),
    ).select("w1", F.expr("t[pos + 1]").alias("w2"))
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n_follow"),
    )
    prec = bi.groupBy("w2").agg(F.count("*").cast("long").alias("n_prec"))
    btot = bi.agg(F.count("*").cast("long").alias("B"))
    top = bi.orderBy(F.desc("c12"), "w1", "w2").limit(top_n)
    out = (
        top.join(ctx, "w1")
        .join(prec, "w2")
        .crossJoin(F.broadcast(btot))
    )
    numer = (
        F.greatest(F.col("c12") * 4 - 3, F.lit(0)) * F.col("B")
        + F.lit(3) * F.col("n_follow") * F.col("n_prec")
    )
    denom = F.lit(4) * F.col("c1") * F.col("B")
    w = Window.orderBy(F.desc("c12"), "w1", "w2")
    return (
        out.withColumn("p_kn", F.round(numer / denom, 6))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank", "w1", "w2", "c12", "c1", "n_follow", "n_prec",
            (F.col("p_kn") + 0.0).alias("p_kn"),
        )
    )


def kn_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_trans, kn_cross_entropy, kn_perplexity) — the scoring
    half of the Kneser-Ney split (kn_bigram_lm is the train half): every
    bigram TRANSITION of a document scored by the corpus-trained
    interpolated-KN model, cross-entropy = mean -ln p_kn over the doc's
    transitions (6 dp; perplexity = exp, 4 dp — the lm_perplexity
    rounding precedent that absorbs cross-engine sum-order noise in
    ln-space). Documents under 2 tokens score (0, 0.0, 1.0). Transitions
    only — no unigram back-off row — so every scored bigram is corpus-
    attested and p_kn is strictly positive (numerator >= B).

    Scale shape: the model tables derive from one (w1, w2) count shuffle
    (lazily checkpointed — at production scale they are the persisted
    artifact); scoring re-joins the exploded transition rows on those
    keys, then one doc-key aggregate."""
    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    pairs = base.where(F.size("t") >= 2).select(
        "id",
        F.posexplode(F.expr("slice(t, 1, size(t) - 1)")).alias("pos", "w1"),
        F.col("t"),
    ).select("id", "w1", F.expr("t[pos + 1]").alias("w2"))
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n_follow"),
    )
    prec = bi.groupBy("w2").agg(F.count("*").cast("long").alias("n_prec"))
    btot = bi.agg(F.count("*").cast("long").alias("B"))
    numer = (
        F.greatest(F.col("c12") * 4 - 3, F.lit(0)) * F.col("B")
        + F.lit(3) * F.col("n_follow") * F.col("n_prec")
    )
    denom = F.lit(4) * F.col("c1") * F.col("B")
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(ctx, "w1")
        .join(prec, "w2")
        .crossJoin(F.broadcast(btot))
        .select("id", F.log(numer / denom).alias("logp"))
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_trans"),
        (-F.sum("logp") / F.count("*")).alias("h"),
    )
    return df.select(F.col(id_col)).join(
        per_doc, F.col(id_col) == F.col("id"), "left"
    ).select(
        id_col,
        F.coalesce("n_trans", F.lit(0).cast("long")).alias("n_trans"),
        (F.coalesce(F.round("h", 6), F.lit(0.0)) + 0.0).alias(
            "kn_cross_entropy"
        ),
        (F.coalesce(F.round(F.exp("h"), 4), F.lit(1.0)) + 0.0).alias(
            "kn_perplexity"
        ),
    )


def curation_transform(df: DataFrame) -> DataFrame:
    """Per-doc quality-annotation stage for the checkpointed pipeline
    (jobs/run_curation.py): Gopher rule flags + hashed-LR columns + text
    digest + the combined `keep` decision, appended to the input columns.
    Purely doc-local, so it is bucket-safe: any subset of buckets can be
    (re)computed independently and the resume machinery stays idempotent.
    Global stages (exact/near dedup) run downstream on the digest column
    this stage emits."""
    from pdf_extractor_spark.operators.textstats import (
        gopher_filter,
        hash_lr_score,
    )

    x = gopher_filter(df, as_columns=True)
    x = hash_lr_score(x, as_columns=True)
    return x.withColumn("digest", F.md5(F.col("text"))).withColumn(
        "keep", F.col("accept") & F.col("lr_accept")
    )


def curation_metrics(df: DataFrame, run_id: str, wave: int) -> DataFrame:
    """Lineage/metrics row per document for the curation job — the same
    per-partition resume contract as the extraction metrics table."""
    return df.select(
        F.lit(run_id).alias("run_id"),
        F.lit(wave).alias("wave"),
        F.col("bucket").alias("partition_id"),
        "doc_id",
        F.col("keep").alias("success"),
        F.col("lr_score").alias("confidence"),
        F.current_timestamp().alias("timestamp"),
    )


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_occ: int = 1,
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, cleaned_text) — duplicated-SUBSTRING
    removal, the k-gram-granular approximation of exact-substring training
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): every k-token gram whose corpus-wide occurrence count
    exceeds `max_occ` marks its k token positions for removal, and the
    document is rebuilt from the unmarked tokens in order — so any
    duplicated run of >= k tokens disappears (overlapping flagged grams
    merge into maximal runs by position-set union), while the unique text
    around it survives. Complements line_dedup (fixed chunk boundaries;
    this op is boundary-free) and dup_ngram_stats (signal only; this op
    rewrites).

    Physical shape: doc-local columnar gram hashing (same 60-bit
    engine-portable md5 hash as winnowing; posexplode_outer + isNotNull
    keeps the gram pipeline out of pushed-down predicates), ONE gram-key
    shuffle for the frequency table, a shuffle join back on the gram key
    (corpus-sized — NOT broadcastable at scale; AQE may still elect
    broadcast at test scale), then one doc-key shuffle to assemble removal
    positions. The rebuild is per-doc array work bounded by doc length
    (membership scans cost O(n_tokens * n_removed) per doc — acceptable
    because both factors are document-local, never corpus-scale)."""
    # tokens keep ORIGINAL case (they rebuild the document); the gram
    # hash folds case so duplicate detection stays case-insensitive —
    # lower(join(tokens)) == join(lower(tokens)) for whitespace tokens
    toks = tokens_col(F.col(text_col))
    base = (
        df.select(F.col(id_col), F.col(text_col))
        .withColumn("_toks", toks)
        .drop(text_col)
    )
    grams = F.when(
        F.size("_toks") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - k),
            lambda i: simhash_token_hash(
                F.lower(F.array_join(F.slice("_toks", i + 1, k), " "))
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = (
        base.withColumn("_grams", grams)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode_outer("_grams").alias("pos", "gram"),
        )
        .where(F.col("gram").isNotNull())
    )
    freq = g.groupBy("gram").agg(F.count("*").alias("occ"))
    starts = g.join(
        freq.filter(F.col("occ") > max_occ).select("gram"), "gram"
    ).select("id", "pos")
    removed = starts.groupBy("id").agg(
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.collect_list("pos"),
                    lambda s: F.sequence(s, s + k - 1),
                )
            )
        ).alias("_rm")
    )
    return (
        base.join(removed, base[id_col] == removed.id, "left")
        .select(
            F.col(id_col),
            F.size("_toks").cast("long").alias("n_tokens"),
            F.coalesce(F.size("_rm"), F.lit(0))
            .cast("long")
            .alias("n_removed"),
            F.when(
                F.col("_rm").isNull(), F.array_join("_toks", " ")
            )
            .otherwise(
                F.array_join(
                    F.filter(
                        "_toks",
                        lambda t, i: ~F.array_contains("_rm", i),
                    ),
                    " ",
                )
            )
            .alias("cleaned_text"),
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    total: int = 100,
    prefilter_factor: int = 8,
) -> DataFrame:
    """(doc_id, stratum, sample_rank) — a deterministic stratified sample
    of exactly `total` documents, allocated across strata proportionally
    with LARGEST-REMAINDER (Hamilton) rounding: quota_h =
    floor(total*c_h/N) plus one for the R = total - sum(floor) strata with
    the largest remainders (ties toward the smaller stratum; all integer
    arithmetic, so allocation is exact cross-engine). Within a stratum the
    sample is the quota_h documents with the smallest 60-bit md5 id hash
    (ties impossible modulo md5 collisions; id tiebreak anyway) — i.e. a
    deterministic uniform draw that is STABLE under corpus growth: a doc's
    hash never changes, so re-sampling a grown corpus keeps most picks
    (the property consistent eval-set carving needs).

    Scale shape: per-stratum counts (one partial-agg shuffle; table stats
    at production scale) -> tiny quota table broadcast -> the corpus is
    PRE-FILTERED to hash < prefilter_factor*quota_h/c_h of the hash space
    before the rank window, so the skew-prone per-stratum sort sees
    ~prefilter_factor*total rows, not the corpus (a giant stratum no
    longer funnels into one sort partition). The pre-filter keeps the
    exact result whenever it retains >= quota_h rows per stratum — md5
    uniformity makes the shortfall probability negligible at factor 8,
    and the DuckDB oracle computes the UNFILTERED exact answer, so any
    shortfall fails correctness loudly instead of silently skewing."""
    h = F.conv(
        F.substring(
            F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit(""))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("c")
    )
    tot = counts.agg(F.sum("c").alias("n"))
    q = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("base", F.expr(f"(c * {total}) div n"))
        .withColumn("rem", (F.col("c") * total) % F.col("n"))
    )
    spill = q.agg((F.lit(total) - F.sum("base")).alias("r"))
    w_rem = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    quotas = (
        q.crossJoin(F.broadcast(spill))
        .withColumn("_rk", F.row_number().over(w_rem))
        .withColumn(
            "quota",
            F.col("base")
            + F.when(F.col("_rk") <= F.col("r"), 1).otherwise(0),
        )
        .select("stratum", "c", "quota")
    )
    # hash-space cut: keep ~prefilter_factor * quota rows per stratum
    max_h = float(1 << 60)
    quotas = quotas.withColumn(
        "_cut",
        F.least(
            F.lit(max_h),
            F.lit(float(prefilter_factor)) * F.col("quota") / F.col("c")
            * F.lit(max_h),
        ),
    )
    w = Window.partitionBy("stratum").orderBy("h", id_col)
    return (
        df.select(
            F.col(id_col),
            F.col(stratum_col).alias("stratum"),
            h.alias("h"),
        )
        # null-safe: a NULL stratum is a real stratum (counted into the
        # quota allocation above) — a plain equi-join would drop its rows
        # and return fewer than `total` documents
        .join(
            F.broadcast(quotas.withColumnRenamed("stratum", "_qs")),
            F.col("stratum").eqNullSafe(F.col("_qs")),
        )
        .drop("_qs")
        .where(F.col("h") < F.col("_cut"))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.col("quota"))
        .select(id_col, "stratum", "sample_rank")
    )


def corpus_rollup(
    df: DataFrame,
    dims: tuple[str, str] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """(lang, source, gid, n_docs, total_chars, avg_chars) — the corpus
    accounting panel as one ROLLUP: per (lang, source), per lang subtotal,
    and the grand total in a single pass (gid = grouping_id bitmask
    disambiguates subtotal NULLs from genuine NULL dimension values).
    This is the engine's grouping-sets surface: Spark expands the rollup
    into partial aggregates per grouping set BEFORE the shuffle, so the
    pass stays one scan + one exchange at any corpus size.

    Cross-engine exactness: counts and char totals are integer sums;
    avg_chars is the rounded quotient of the two exact integers, so the
    DuckDB oracle (GROUP BY ROLLUP + GROUPING()) matches bit-for-bit."""
    d1, d2 = dims
    return (
        df.rollup(d1, d2)
        .agg(
            # grouping_id() is only legal inside the rollup's agg list
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        )
        .select(
            F.col(d1),
            F.col(d2),
            "gid",
            "n_docs",
            "total_chars",
            F.round(
                F.col("total_chars").cast("double") / F.col("n_docs"), 6
            ).alias("avg_chars"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """(lhs, rhs, pair_count) — corpus-wide adjacent-symbol pair
    frequencies at the character level, weighted by word frequency: the
    exact statistic the first BPE merge iteration maximizes (the public
    byte-pair-encoding tokenizer-training recipe; Sennrich et al.'s
    algorithm counts pairs over the word-frequency table, not the raw
    stream). One call = one merge-selection table; a driver loop applying
    the argmax merge and re-counting reproduces full BPE training.

    Scale shape: the corpus collapses to the DISTINCT-WORD table first
    (one word-key shuffle with map-side combine), so the character-pair
    explode and the (lhs, rhs) aggregate run over vocabulary-sized data —
    corpus size only ever affects the first aggregate. This is the
    standard corpus-collapse trick that makes BPE training tractable.

    No reference counterpart (SURVEY §2.8): tokenizer-training support
    for the LLM-pipeline family."""
    words = (
        fan_out(df)
        .select(
            F.explode_outer(tokens_col(F.lower(F.col(text_col)))).alias("w")
        )
        # length >= 2: single-char words have no adjacent pair, and the
        # guard keeps sequence(1, length-1) strictly ascending (Spark's
        # sequence(1, 0) would DESCEND, not return empty)
        .where(F.col("w").isNotNull() & (F.length("w") >= 2))
    )
    wf = words.groupBy("w").agg(F.count("*").cast("long").alias("wf"))
    pairs = (
        wf.withColumn(
            "ps",
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> "
                "struct(substring(w, i, 1) AS lhs, "
                "substring(w, i + 1, 1) AS rhs))"
            ),
        )
        .select(F.explode_outer("ps").alias("p"), "wf")
        .where(F.col("p").isNotNull())
    )
    return (
        pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("wf").alias("pair_count"))
        .where(F.col("pair_count") >= F.lit(min_count))
    )


def pmi_cooccurrence(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    min_pairs: int = 5,
) -> DataFrame:
    """(a, b, pair_n, pmi) — directed token co-occurrence counts within a
    forward positional window of `window` tokens, plus each pair's
    pointwise mutual information ln(p(a,b) / (p(a) p(b))) against the
    corpus unigram distribution. The classic collocation / phrase-mining
    statistic (word2vec-era SGNS is implicit PMI factorization); in a
    curation pipeline it powers phrase vocabularies and template-boilerplate
    discovery. `min_pairs` prunes the long random-cooccurrence tail BEFORE
    the unigram joins, which is also what bounds the output at corpus
    scale (vocabulary² worst case otherwise).

    Physical shape: the pair list is built per row as ONE bound array
    column (window zip_with slices — no self-join, no window function on
    the token stream), exploded, then aggregated with map-side combine.
    The two unigram joins are vocabulary-sized (AQE broadcasts them when
    small); the two scalar totals ride in via broadcast cross joins.

    No reference counterpart (SURVEY §2.8): corpus-statistics support for
    the LLM-pipeline family."""
    toks = fan_out(df).select(
        tokens_col(F.lower(F.col(text_col))).alias("toks")
    )
    # zip_with pads the shorter (shifted) side with nulls, so padding rows
    # drop on p.b IS NOT NULL; explode_outer keeps the generator from
    # re-inlining the tokenize pipeline (see dedup.py note)
    pair_col = F.concat(
        *[
            F.expr(
                f"zip_with(toks, slice(toks, {d + 1}, "
                f"greatest(size(toks) - {d}, 0)), "
                "(x, y) -> struct(x AS a, y AS b))"
            )
            for d in range(1, window + 1)
        ]
    )
    pairs = (
        toks.select(pair_col.alias("prs"))
        .select(F.explode_outer("prs").alias("p"))
        .where(F.col("p.b").isNotNull())
    )
    # ONE corpus tokenize per stream: the pair totals and the unigram
    # totals are sums over the (vocabulary-sized, checkpointed) aggregates,
    # not separate corpus re-scans — without the checkpoints Catalyst
    # re-derives the tokenize/explode pipeline for each consumer (the
    # mix_weights / lm_perplexity pattern; measured 5 split() copies in
    # the optimized plan before, 2 after)
    pc_full = (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("pair_n"))
        .localCheckpoint(eager=False)
    )
    pc = pc_full.where(F.col("pair_n") >= F.lit(min_pairs))
    uni = toks.select(F.explode_outer("toks").alias("t")).where(
        F.col("t").isNotNull()
    )
    uc = (
        uni.groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    nt = uc.agg(F.sum("c").cast("long").alias("nt"))
    np_ = pc_full.agg(F.sum("pair_n").cast("long").alias("np"))
    ca = uc.select(F.col("t").alias("a"), F.col("c").alias("ca"))
    cb = uc.select(F.col("t").alias("b"), F.col("c").alias("cb"))
    return (
        pc.join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(np_))
        .select(
            "a",
            "b",
            "pair_n",
            F.round(
                F.log(
                    (F.col("pair_n") / F.col("np"))
                    / (
                        (F.col("ca") / F.col("nt"))
                        * (F.col("cb") / F.col("nt"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


def _bpe_apply_merge(syms: "F.Column", lhs: str, rhs: str) -> "F.Column":
    """One greedy left-to-right non-overlapping BPE merge pass over a
    symbol array (Sennrich et al.'s merge_word loop as a Catalyst
    aggregate fold). The accumulator carries (out, pend): `pend` is the
    last not-yet-consumed ORIGINAL symbol, so a freshly merged symbol can
    never re-match as lhs within the same pass — exactly the reference
    loop's i += 2 semantics. Column-bound literals (no SQL-string
    interpolation), so arbitrary symbol text is safe."""
    merged = F.lit(lhs + rhs)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit("").alias("pend"),
    )

    def step(acc, s):
        hit = (acc["pend"] == F.lit(lhs)) & (s == F.lit(rhs))
        return (
            F.when(
                hit,
                F.struct(
                    F.array_append(acc["out"], merged).alias("out"),
                    F.lit("").alias("pend"),
                ),
            )
            .when(
                acc["pend"] == F.lit(""),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], acc["pend"]).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["pend"] == F.lit(""), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["pend"])
        )

    return F.aggregate(syms, init, step, fin)


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 3,
) -> DataFrame:
    """(step, lhs, rhs, pair_count) — the first `n_merges` BPE merge rules
    learned from the corpus: the actual tokenizer-TRAINING loop, not just
    the first-merge statistic (`bpe_pair_counts` is one iteration's
    selection table; this runs selection -> apply -> recount).

    Semantics follow the public BPE recipe (Sennrich et al. 2016): pair
    counts are word-frequency weighted over the distinct-word table; the
    argmax pair (ties broken by (lhs, rhs) lexicographic order so every
    engine picks the same rule) becomes a merge; merging rewrites each
    word's symbol sequence greedily left-to-right non-overlapping; repeat.

    Scale shape: the corpus collapses to the vocabulary ONCE (the same
    word-key shuffle as bpe_pair_counts), and every iteration after that
    touches only vocabulary-sized data — pair recount with map-side
    combine, argmax via TakeOrderedAndProject (a bounded 1-row driver
    collect, the ivf-centroid pattern), merge application as a narrow
    per-word fold. Each round's symbol table is persisted and the
    previous round's unpersisted, so iteration k never replays rounds
    1..k-1. Driver state is O(n_merges) rule rows.

    No reference counterpart (SURVEY §2.8): tokenizer-training support
    for the LLM-pipeline family."""
    from ..session import values_df

    spark = df.sparkSession
    words = (
        fan_out(df)
        .select(
            F.explode_outer(tokens_col(F.lower(F.col(text_col)))).alias("w")
        )
        .where(F.col("w").isNotNull() & (F.length("w") >= 2))
    )
    wf = words.groupBy("w").agg(F.count("*").cast("long").alias("wf"))
    syms = (
        wf.select(
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("syms"),
            "wf",
        )
        .persist()
    )
    rules: list[tuple[int, str, str, int]] = []
    try:
        cur = syms
        for step_no in range(1, n_merges + 1):
            pc = (
                cur.select(
                    F.expr(
                        "zip_with(syms, slice(syms, 2, "
                        "greatest(size(syms) - 1, 0)), "
                        "(x, y) -> struct(x AS lhs, y AS rhs))"
                    ).alias("prs"),
                    "wf",
                )
                .select(F.explode_outer("prs").alias("p"), "wf")
                .where(F.col("p.rhs").isNotNull())
                .groupBy(
                    F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
                )
                .agg(F.sum("wf").cast("long").alias("pair_count"))
            )
            top = (
                pc.orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], top[0]["pair_count"]
            rules.append((step_no, lhs, rhs, int(cnt)))
            if step_no < n_merges:
                nxt = cur.select(
                    _bpe_apply_merge(F.col("syms"), lhs, rhs).alias("syms"),
                    "wf",
                ).persist()
                nxt.count()  # materialize before releasing the parent
                cur.unpersist()
                cur = nxt
    finally:
        cur.unpersist()
    schema = "step int, lhs string, rhs string, pair_count bigint"
    if not rules:
        # empty VALUES doesn't parse; an empty createDataFrame is a pure
        # zero-row LocalRelation (no Python scan to pay for)
        return spark.createDataFrame([], schema)
    return values_df(spark, rules, schema)



def _bpe_trained_rules(df, text_col, id_col, n_merges, rules):
    """Resolve merge rules for the apply-side ops: train via bpe_merges
    when not supplied, ordered by training step (shared by bpe_encode and
    bpe_vocab so the cache-key / ordering protocol lives in one place)."""
    if rules is not None:
        return rules
    learned = bpe_merges(df, text_col, id_col, n_merges).collect()
    return [
        (r["lhs"], r["rhs"])
        for r in sorted(learned, key=lambda r: r["step"])
    ]


def _bpe_char_fold(words: DataFrame, rules) -> DataFrame:
    """The shared encode kernel: split each word `w` to characters, then
    one greedy left-to-right merge fold per trained rule (narrow,
    vocabulary-sized work — never corpus-sized)."""
    enc = words.withColumn(
        "syms",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
    )
    for lhs, rhs in rules:
        enc = enc.withColumn("syms", _bpe_apply_merge(F.col("syms"), lhs, rhs))
    return enc

def bpe_encode(
    df: DataFrame,
    rules: "list[tuple[str, str]] | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 3,
) -> DataFrame:
    """(doc_id, n_words, n_subwords) — the APPLY half of the BPE tokenizer
    family: encode every document with a trained merge-rule table
    (`bpe_merges` is the TRAIN half). rules=None trains the first
    `n_merges` rules from the corpus itself — the self-contained shape the
    oracle replays; production passes the persisted rule list (tokenizer
    rules are write-once index state, like IVF centroids).

    Scale shape: the token stream collapses to the DISTINCT-WORD
    vocabulary (one word-key shuffle with map-side combine), each
    vocabulary word is encoded ONCE (chars -> one greedy left-to-right
    fold per rule, narrow and vocabulary-sized), and the per-doc rollup
    joins the word stream back against the encoded vocabulary (AQE
    broadcasts the vocab side when small; at 10^12 docs both sides
    hash-partition on the word key). Merge rules are O(n_merges) driver
    rows riding as column literals — the broadcast-dim analogue. Total
    cost: O(corpus) stream scan + O(vocab x n_merges) folds, never
    O(corpus x n_merges).

    No reference counterpart (SURVEY §2.8): tokenizer support for the
    LLM-pipeline family."""
    rules = _bpe_trained_rules(df, text_col, id_col, n_merges, rules)
    stream = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens_col(F.lower(F.col(text_col)))).alias("w"),
    )
    vocab = stream.where(F.col("w").isNotNull()).select("w").distinct()
    enc = _bpe_char_fold(vocab, rules)
    enc = enc.select("w", F.size("syms").cast("long").alias("n_sub"))
    return (
        stream.join(enc, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("w").cast("long").alias("n_words"),
            F.coalesce(F.sum("n_sub"), F.lit(0))
            .cast("long")
            .alias("n_subwords"),
        )
    )


def dsir_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    target_mod: int = 97,
) -> DataFrame:
    """(doc_id, n_feats, log_w) — Data Selection via Importance Resampling
    weights (the DSIR recipe from the public data-selection literature):
    each document scored by log p_target(x) - log p_raw(x) under hashed
    bag-of-words models with add-1 smoothing. The target distribution is
    fit on the small in-domain sample (here doc_id % target_mod == 0 —
    the same held-out convention as decontaminate); raw is everything
    else. Downstream selection keeps the Gumbel-perturbed top weights;
    the weights are the distributed computation, so that is the surface.

    Scale shape — train once, score once (the DSIR deployment reality):
    the MODEL pass folds the token stream into the two hashed unigram
    models — a `buckets`-row aggregate with map-side combine (the model
    is vocabulary-independent by construction; that is the point of the
    hashing trick) — and collects them as bounded driver state
    (`buckets` cells, the ivf-centroid / heavy_hitters pattern). The
    log-ratios then ride the SCORING pass as a foldable array literal:
    one explode, per-token element_at, one doc-key aggregate — no join,
    no broadcast, nothing corpus-sized ever cached. Exactly two corpus
    scans, which is the minimum for train-then-apply without persisting
    a corpus-scale intermediate. Token hash = the cross-engine md5
    recipe (simhash_token_hash), so the DuckDB oracle rebuilds the
    identical models and ratios.

    No reference counterpart (SURVEY §2.8): data-selection support for
    the LLM-pipeline family."""
    import math

    def stream_of(frame):
        return (
            fan_out(frame)
            .select(
                F.col(id_col).alias("doc_id"),
                (F.col(id_col) % target_mod == 0).alias("is_t"),
                F.explode_outer(
                    tokens_col(F.lower(F.col(text_col)))
                ).alias("t"),
            )
            .withColumn(
                "bk", (simhash_token_hash(F.col("t")) % buckets).cast("int")
            )
        )

    # model pass: bounded (buckets-row) collect — train-once driver state
    cells = (
        stream_of(df)
        .where(F.col("t").isNotNull())
        .groupBy("bk")
        .agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
            F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cr"),
        )
        .collect()
    )
    ct = [0] * buckets
    cr = [0] * buckets
    for row in cells:
        ct[row["bk"]] = row["ct"]
        cr[row["bk"]] = row["cr"]
    tt, tr = sum(ct), sum(cr)
    ratios = [
        math.log((ct[b] + 1.0) / (tt + buckets))
        - math.log((cr[b] + 1.0) / (tr + buckets))
        for b in range(buckets)
    ]
    arr = F.array(*[F.lit(r) for r in ratios])

    # scoring pass: per-token literal lookup, one doc-key aggregate.
    # null-token rows (empty/null-text docs) carry bk NULL -> element_at
    # NULL -> they score (0, 0) without a corpus re-join.
    return (
        stream_of(df)
        .select(
            "doc_id",
            F.col("t").isNotNull().cast("long").alias("one"),
            F.element_at(arr, F.col("bk") + 1).alias("r"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("one").cast("long").alias("n_feats"),
            F.round(F.coalesce(F.sum("r"), F.lit(0.0)), 6).alias("log_w"),
        )
    )


def bpe_word_pieces(
    df: DataFrame,
    rules: "list[tuple[str, str]] | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 3,
) -> DataFrame:
    """(w, wf, syms) — every distinct corpus word with its corpus
    frequency and its trained-rules BPE encoding: the per-word encoded
    table that `bpe_vocab` (and coverage/OOV analyses) roll up. This is
    the BPE family's persistable index artifact, directly analogous to
    the lattice tokenizer's `lattice_pieces/` table
    (`jobs/run_index.py`): the ONE corpus-sized word-key shuffle happens
    at build time; every recurring consumer is vocabulary-sized.

    No reference counterpart (SURVEY §2.8): tokenizer support for the
    LLM-pipeline family."""
    rules = _bpe_trained_rules(df, text_col, id_col, n_merges, rules)
    words = (
        fan_out(df)
        .select(
            F.explode_outer(tokens_col(F.lower(F.col(text_col)))).alias("w")
        )
        .where(F.col("w").isNotNull())
    )
    wf = words.groupBy("w").agg(F.count("*").cast("long").alias("wf"))
    return _bpe_char_fold(wf, rules).select("w", "wf", "syms")


def bpe_vocab(
    df: DataFrame,
    rules: "list[tuple[str, str]] | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 3,
    word_pieces: "DataFrame | None" = None,
) -> DataFrame:
    """(symbol, freq) — the subword vocabulary induced by the trained
    merge rules over the corpus: every distinct word encoded once
    (chars -> one greedy fold per rule, `bpe_encode`'s kernel), its final
    symbols weighted by the word's corpus frequency. This is the third
    artifact of the tokenizer family — pair stats (`bpe_pair_counts`),
    merge rules (`bpe_merges`), encoded stream (`bpe_encode`), and now
    the persisted vocabulary+frequency table a tokenizer ships (and the
    table coverage/OOV analyses read).

    Scale shape: identical to bpe_encode's — ONE word-key shuffle
    collapses the corpus to the frequency-weighted vocabulary, folds are
    narrow and vocabulary-sized, and the symbol rollup aggregates
    vocabulary-sized data. Rules are O(n_merges) driver rows. When the
    persisted `bpe_word_pieces` artifact is supplied (`jobs/run_index.py`
    — the `lattice_pieces/` discipline), the corpus shuffle AND the fold
    are both skipped: the recurring query is a vocabulary-sized
    explode+rollup over the parquet.

    No reference counterpart (SURVEY §2.8): tokenizer support for the
    LLM-pipeline family."""
    enc = (
        word_pieces
        if word_pieces is not None
        else bpe_word_pieces(df, rules, text_col, id_col, n_merges)
    )
    return (
        enc.select(F.explode("syms").alias("symbol"), "wf")
        .groupBy("symbol")
        .agg(F.sum("wf").cast("long").alias("freq"))
    )


LATTICE_BIG = 1 << 44  # fewest-pieces dominates any total-count term
LATTICE_MAX_PIECE = 4
LATTICE_MAX_WORD = 16


def lattice_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_piece: int = LATTICE_MAX_PIECE,
    top_k: int = 200,
) -> DataFrame:
    """(piece, cnt, is_single) — character n-gram piece vocabulary for
    the lattice tokenizer (the unigram-LM/SentencePiece family's vocab
    selection, integer-exact): every substring of length 1..max_piece of
    every corpus word scores its corpus occurrence count (word
    occurrences x in-word positions); ALL single characters are kept
    (never pruned — the standard unigram rule that guarantees every word
    stays segmentable) plus the top_k multi-char pieces by
    (cnt desc, piece asc) — a deterministic integer ordering, so the
    selection is bit-identical across engines with no probability model.

    Scale shape: the corpus collapses to the distinct-word table before
    the substring explode (vocabulary-sized work, like the BPE family),
    one count shuffle, and the multi-piece cut is TakeOrdered."""
    words = (
        fan_out(df)
        .select(F.explode(tokens_col(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wcnt"))
    )
    n = F.length("w")

    def _sub_of(length: int):
        # a one-parameter lambda: a `lambda s, _l=l` default-arg closure
        # would be introspected by F.transform as the (element, index)
        # two-arg form and receive the INDEX as _l
        return lambda s: F.substring(F.col("w"), s, length)

    per_l = [
        F.when(
            n >= l,
            F.transform(F.sequence(F.lit(1), n - l + 1), _sub_of(l)),
        ).otherwise(F.array().cast("array<string>"))
        for l in range(1, max_piece + 1)
    ]
    occ = words.select(
        "wcnt", F.explode(F.flatten(F.array(*per_l))).alias("piece")
    )
    counts = occ.groupBy("piece").agg(F.sum("wcnt").cast("long").alias("cnt"))
    singles = counts.where(F.length("piece") == 1).withColumn(
        "is_single", F.lit(True)
    )
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(top_k)
        .withColumn("is_single", F.lit(False))
    )
    return singles.unionByName(multi)


def _lattice_word_pieces(
    words: DataFrame,
    vocab: "list[tuple[str, int]]",
    max_piece: int = LATTICE_MAX_PIECE,
    max_word: int = LATTICE_MAX_WORD,
) -> DataFrame:
    """words(w) + (pieces array<string>, n_pieces) — per-word Viterbi DP
    over the piece lattice minimizing the single exact-integer score
    `n_pieces * LATTICE_BIG - total_piece_count` (fewest pieces, then
    highest total count; ties resolve to the SHORTEST candidate piece by
    first-wins iteration order l=1..max_piece). The vocabulary rides the
    plan as a map literal (train-once state, the dsir/hash_lr pattern).
    Words longer than max_word (or empty) fall back to one whole-word
    piece. The DP unrolls max_word steps as chained columns and the
    backpointer walk as another max_word steps — fully columnar,
    whole-row-parallel, and expression-for-expression mirrored by the
    DuckDB oracle (generated from the same loops).

    The vocabulary does NOT ride the plan as a create_map literal: the
    DP references the count lookup ~max_word*max_piece times and
    Catalyst expands a map literal per reference (a 250-entry map x 64
    references hung analysis outright). Instead each word pre-gathers
    its OWN candidate costs — explode the <=64 (i,l) substrings, one
    broadcast join against the vocab, regroup to a small per-word map
    COLUMN — and the DP references that attribute, which project
    collapsing duplicates by name only."""
    w = F.col("w")
    n = F.length(w)
    vocab_df = words.sparkSession.createDataFrame(
        [(p, int(c)) for p, c in vocab], "piece string, cnt long"
    )
    cand_structs = []
    for i in range(1, max_word + 1):
        for l in range(1, min(max_piece, i) + 1):
            cand_structs.append(
                F.when(
                    n >= i,
                    F.struct(
                        F.lit(f"{i}_{l}").alias("k"),
                        F.substring(w, i - l + 1, l).alias("p"),
                    ),
                )
            )
    cands = (
        words.select(
            "w",
            F.explode(
                F.filter(
                    F.array(*cand_structs), lambda s: s.isNotNull()
                )
            ).alias("c"),
        )
        .select("w", "c.k", "c.p")
        .join(F.broadcast(vocab_df), F.col("p") == F.col("piece"))
        .groupBy("w")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("k", "cnt"))
            ).alias("_cm")
        )
    )
    out = words.join(cands, "w", "left").withColumn(
        "_b0", F.lit(0).cast("long")
    )
    for i in range(1, max_word + 1):
        best, back = None, None
        for l in range(1, min(max_piece, i) + 1):
            cnt = F.element_at("_cm", f"{i}_{l}")
            prev = F.col(f"_b{i - l}")
            sc = F.when(
                prev.isNotNull() & cnt.isNotNull(),
                prev + F.lit(LATTICE_BIG) - cnt,
            )
            if best is None:
                best = sc
                back = F.when(sc.isNotNull(), F.lit(l))
            else:
                better = sc.isNotNull() & (best.isNull() | (sc < best))
                back = F.when(better, F.lit(l)).otherwise(back)
                best = F.when(better, sc).otherwise(best)
        out = out.withColumn(
            f"_b{i}", F.when(n >= i, best)
        ).withColumn(f"_k{i}", F.when(n >= i, back))
    out = out.withColumn(
        "_back", F.array(*[F.col(f"_k{i}") for i in range(1, max_word + 1)])
    )
    out = out.withColumn(
        "_pos0",
        F.when((n >= 1) & (n <= max_word), n.cast("int")).otherwise(
            F.lit(0)
        ),
    ).withColumn("_lens0", F.array().cast("array<int>"))
    for s in range(1, max_word + 1):
        pos = F.col(f"_pos{s - 1}")
        lens = F.col(f"_lens{s - 1}")
        step = F.element_at("_back", pos)
        out = out.withColumn(
            f"_lens{s}",
            F.when(pos > 0, F.concat(lens, F.array(step))).otherwise(lens),
        ).withColumn(
            f"_pos{s}",
            F.when(pos > 0, pos - step).otherwise(pos),
        )
    lens_rev = F.reverse(F.col(f"_lens{max_word}"))
    # piece at 0-based index j starts at 1 + sum of the first j lengths
    # (slice(arr, 1, j) = the first j elements; empty for j=0)
    starts = F.transform(
        lens_rev,
        lambda _x, j: F.aggregate(
            F.slice(lens_rev, 1, j),
            F.lit(1),
            lambda acc, v: acc + v,
        ),
    )
    pieces = F.transform(
        lens_rev,
        lambda v, j: F.substring(w, F.element_at(starts, j + 1), v),
    )
    # null-safe: a word containing an out-of-vocab char null-poisons the
    # walk (null backpointer -> null pos), which must also fall back
    fallback = (n > max_word) | F.coalesce(
        F.col(f"_pos{max_word}") != 0, F.lit(True)
    )
    pieces = F.when(fallback, F.array(w)).otherwise(pieces)
    keep = [c for c in words.columns]
    return out.select(
        *keep,
        pieces.alias("pieces"),
        F.size(pieces).cast("int").alias("n_pieces"),
    )


def lattice_encode(
    df: DataFrame,
    vocab: "list[tuple[str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    pieces: "DataFrame | None" = None,
) -> DataFrame:
    """(doc_id, n_words, n_pieces, piece_digest) — the corpus encoded
    through the lattice tokenizer: distinct words DP-segmented ONCE
    (vocabulary-sized work), joined back onto the token stream, and each
    document reports its piece count plus an md5 over its full in-order
    piece sequence (driver-hashable, like extract_pipeline_digest).

    One distinct-word DP + one word-key join + one doc regroup — the
    train-once/apply-many split of the BPE encode path.

    `pieces` (w, pieces array<string>, n_pieces) — the PERSISTED
    encoded-word artifact (jobs/run_index.py `lattice_pieces/`, the
    neardup_pairs / IVF-centroid discipline): when given, the recurring
    query skips the unrolled Viterbi DP entirely (whose Catalyst
    analysis/codegen cost is paid per invocation) and collapses to one
    word-key join against the parquet. A word absent from the artifact
    (stale index) falls back to the whole-word piece — the same fallback
    the DP applies to OOV-character words."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.lower(F.col(text_col)))).alias(
            "pos", "w"
        ),
    )
    if pieces is not None:
        joined = toks.join(
            pieces.select("w", "pieces", "n_pieces"), "w", "left"
        ).select(
            id_col,
            "pos",
            F.coalesce(F.col("pieces"), F.array(F.col("w"))).alias(
                "pieces"
            ),
            F.coalesce(F.col("n_pieces"), F.lit(1)).cast("int").alias(
                "n_pieces"
            ),
        )
    else:
        words = toks.select("w").distinct()
        encoded = _lattice_word_pieces(words, vocab)
        joined = toks.join(encoded, "w")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_pieces").cast("long").alias("n_pieces"),
        F.md5(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "pieces"))
                        ),
                        lambda s: s["pieces"],
                    )
                ),
                "\x01",
            )
        ).alias("piece_digest"),
    )
    return per_doc


def synthesize_pages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 6,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, page) — deterministic newline-structured page per document,
    built columnar from the flat token text (the `synthesize_html` pattern:
    the driver corpus carries a single-space token bag, so line structure
    for the C4 family is synthesized, and the construction is pure
    split/slice/concat so the DuckDB oracle rebuilds the identical page).

    Per document: tokens are chunked into `line_tokens`-word lines; line i
    is decorated by (doc_id + i) % 5 — 0: no terminal punctuation (fails
    C4's terminal-punct rule), 1: truncated to 3 words + '.' (fails the
    min-words rule), else the full line + '.'. Three deterministic page
    poisons exercise the page-level rules: doc_id % 17 == 0 appends a
    'lorem ipsum' line, % 19 a '{'-bearing code line, % 23 a
    blocklist-word line."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )
    out = docs.withColumn("_toks", toks).withColumn(
        "_nl", F.ceil(F.size("_toks") / F.lit(line_tokens)).cast("int")
    )

    def _line(i):
        start = ((i - 1) * line_tokens + 1).cast("int")
        chunk = F.slice(F.col("_toks"), start, line_tokens)
        body = F.array_join(chunk, " ")
        m = (F.col(id_col) + i) % 5
        return (
            F.when(m == 0, body)
            .when(
                m == 1,
                F.concat(F.array_join(F.slice(chunk, 1, 3), " "), F.lit(".")),
            )
            .otherwise(F.concat(body, F.lit(".")))
        )

    lines = F.when(
        F.col("_nl") > 0,
        F.transform(F.sequence(F.lit(1), F.col("_nl")), _line),
    ).otherwise(F.array().cast("array<string>"))
    page = F.concat(
        F.array_join(lines, "\n"),
        F.when(
            F.col(id_col) % 17 == 0,
            F.lit("\nlorem ipsum dolor sit amet today."),
        ).otherwise(F.lit("")),
        F.when(
            F.col(id_col) % 19 == 0,
            F.lit("\nvar f = function() { return 1; }."),
        ).otherwise(F.lit("")),
        F.when(
            F.col(id_col) % 23 == 0,
            F.lit("\ncasino jackpot bonus spins here now."),
        ).otherwise(F.lit("")),
    )
    return out.select(
        F.col(id_col), page.alias("page"), *[F.col(c) for c in keep_cols]
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "page",
    id_col: str = "doc_id",
    badwords: "tuple[str, ...]" = ("casino", "jackpot"),
    min_sentences: int = 3,
    min_words: int = 5,
) -> DataFrame:
    """(doc_id, n_lines, n_kept, n_sentences, has_brace, has_lorem,
    has_badword, accept, clean_text) — the C4 cleaning filter from the
    public LM data-curation literature (the T5 corpus recipe), applied to
    newline-structured page text:

      * line rule   — keep only lines that end in terminal punctuation
                      ('.', '!', '?', '"') AND have >= `min_words` words;
                      `clean_text` is the surviving lines in order.
      * page rules  — reject pages containing '{' (code), the phrase
                      'lorem ipsum' (placeholder text), or any blocklist
                      word (word-boundary match); require >=
                      `min_sentences` sentences in the cleaned text
                      (sentence = terminal-punctuation occurrence).
      * accept      — AND of the page rules.

    Every rule is doc-local and exact (integer counts, no float
    boundary), so the DuckDB oracle matches bit-for-bit. Regexes stay in
    the Java ∩ RE2 dialect subset (the pii_scrub convention).

    Scale: zero shuffle, zero Python — a narrow codegen projection that
    filters at scan speed, same shape as gopher_filter. The line array
    sits behind a projection boundary (withColumn) so Catalyst cannot
    re-inline the split into each rule."""
    page = F.coalesce(F.col(text_col), F.lit(""))
    out = df.withColumn("_page", page).withColumn(
        "_lines", F.split(F.col("_page"), "\n")
    )
    kept = F.filter(
        F.col("_lines"),
        lambda x: F.substring(x, -1, 1).isin(".", "!", "?", '"')
        & (F.size(F.split(x, " ")) >= min_words),
    )
    out = out.withColumn("_kept", kept).withColumn(
        "_clean", F.array_join(F.col("_kept"), "\n")
    )
    import re as _re

    low = F.lower(F.col("_page"))
    # escape entries (a metachar would corrupt the alternation) and make
    # the empty blocklist a constant false — '\b()\b' matches everything
    bad_re = (
        r"\b(" + "|".join(_re.escape(w) for w in badwords) + r")\b"
        if badwords
        else None
    )
    n_sent = (
        F.length("_clean")
        - F.length(F.regexp_replace(F.col("_clean"), r"[.!?]", ""))
    ).cast("long")
    out = (
        out.withColumn("n_lines", F.size("_lines").cast("long"))
        .withColumn("n_kept", F.size("_kept").cast("long"))
        .withColumn("n_sentences", n_sent)
        .withColumn("has_brace", F.instr("_page", "{") > 0)
        .withColumn("has_lorem", F.instr(low, "lorem ipsum") > 0)
        .withColumn(
            "has_badword",
            low.rlike(bad_re) if bad_re is not None else F.lit(False),
        )
    )
    accept = (
        ~F.col("has_brace")
        & ~F.col("has_lorem")
        & ~F.col("has_badword")
        & (F.col("n_sentences") >= min_sentences)
    )
    return out.select(
        F.col(id_col),
        "n_lines",
        "n_kept",
        "n_sentences",
        "has_brace",
        "has_lorem",
        "has_badword",
        accept.alias("accept"),
        F.col("_clean").alias("clean_text"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: "list[str]",
    k: int = 5,
) -> DataFrame:
    """(quasi..., k_count, at_risk) — k-anonymity audit over a
    quasi-identifier tuple: every distinct combination of the quasi
    columns is an equivalence class, k_count is its occupancy, and a
    class with fewer than `k` members is re-identification-risky (its
    rows are nearly unique under linkage attacks). The privacy-side
    companion to pii_scrub: scrubbing removes DIRECT identifiers, this
    measures whether the remaining demographics still single people out.

    NULL quasi values form their own class (both engines group NULLs
    together). One hash shuffle on the tuple with map-side partial
    aggregation; output is class-count-bounded, never row-bounded."""
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count("*").cast("long").alias("k_count"))
        .withColumn("at_risk", F.col("k_count") < F.lit(int(k)))
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    val_per_10k: int = 100,
    test_per_10k: int = 100,
    salt: str = "split1_",
) -> DataFrame:
    """(strata, split, n_docs, n_chars, frac) — deterministic
    train/val/test assignment by salted md5 bucket (0..9999): the
    reproducible alternative to RNG splits for corpus freezes. A doc's
    split is a pure function of its id, so re-runs, incremental appends
    and cross-team reproductions all agree; changing the salt re-rolls
    the whole split. Reports per-(strata, split) accounting, so the
    oracle checks both the bucketing arithmetic and the stratified
    rollup (reference analytics/reporter.py:41-63 computes the same
    style of per-dimension accounting after its filter stages).

    Scale: the split column is a narrow per-row expression (no shuffle);
    the rollup is one hash aggregation on (strata, split) with map-side
    combine — output is strata x 3 rows regardless of corpus size."""
    from pdf_extractor_spark.operators.dedup import simhash_token_hash

    bucket = F.pmod(
        simhash_token_hash(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ),
        F.lit(10000),
    )
    split = (
        F.when(bucket < F.lit(int(val_per_10k)), F.lit("val"))
        .when(
            bucket < F.lit(int(val_per_10k + test_per_10k)),
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
    )
    per = df.select(
        F.col(strata_col).alias("strata"),
        split.alias("split"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("_nc"),
    )
    counts = per.groupBy("strata", "split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nc").cast("long").alias("n_chars"),
    )
    tot = Window.partitionBy("strata")
    return counts.select(
        "strata",
        "split",
        "n_docs",
        "n_chars",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(tot), 6
        ).alias("frac"),
    )


def pareto_frontier(
    df: DataFrame,
    id_col: str = "doc_id",
    x_col: str = "n_chars",
    score_expr: "F.Column | None" = None,
) -> DataFrame:
    """(lang, doc_id, n_chars, score) — per-language Pareto frontier
    (skyline) over (length, quality score): a document survives iff no
    other same-language document strictly dominates it (>= on both axes,
    > on at least one). The curation use: frontier docs are the
    best-of-corpus exemplars per length band — candidates for few-shot
    pools and eval seeds.

    Scale: the naive skyline is an O(n^2) self-join (the oracle does
    exactly that, independently, via NOT EXISTS). The Spark plan is one
    sort-based window per language: scan docs in descending (x, score)
    order and keep a row iff its score strictly exceeds the running max
    score of every strictly-longer doc — linear after one shuffle, no
    join. Tie groups share an x, so the running max is taken over the
    PRECEDING x-RANGE (not rows), which makes equal-x rows compare only
    against longer docs; duplicates inside a tie group then resolve by
    the per-(lang,x) max score (>= on x, > on score dominates).
    Deterministic: ids never tie; NULL-text docs score on the empty
    string."""
    score = (
        score_expr
        if score_expr is not None
        else (
            F.size(
                F.split(
                    F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"
                )
            ).cast("double")
            / (F.col(x_col).cast("double") + F.lit(1.0))
        )
    )
    base = df.select(
        "lang",
        F.col(id_col).alias("doc_id"),
        F.col(x_col).cast("long").alias("n_chars"),
        # RAW doubles throughout, including the output column: both
        # engines derive score from the same integers with one IEEE
        # division, so the doubles are bit-identical and rounding would
        # only add a cross-engine half-even/half-up seam
        score.alias("score"),
    ).where(F.col("lang").isNotNull() & F.col(x_col).isNotNull())
    # running max score over STRICTLY longer docs (range excludes ties)
    w_longer = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # max score among same-(lang, x) rows, to resolve intra-tie dominance
    w_tie = Window.partitionBy("lang", "n_chars")
    scored = base.select(
        "*",
        F.max("score").over(w_longer).alias("_mx_longer"),
        F.max("score").over(w_tie).alias("_mx_tie"),
    )
    keep = (
        F.col("_mx_longer").isNull()
        | (F.col("score") > F.col("_mx_longer"))
    ) & (F.col("score") >= F.col("_mx_tie"))
    return scored.where(keep).select(
        "lang", "doc_id", "n_chars", "score"
    )


# Stand-in safety blocklist (index state): real deployments swap in a
# per-language wordlist; the match/normalize semantics are what's tested.
BADWORDS: tuple[str, ...] = ("slow", "big")

# leetspeak digit <-> letter table used by both the obfuscation synthesis
# and the filter's normalization (translate is columnar on both engines).
_LEET_LETTERS = "oieas"
_LEET_DIGITS = "01345"


def synthesize_obfuscation(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, otext) — deterministic leetspeak obfuscation: tokens at
    positions ≡ 0 (mod 13) get o→0 i→1 e→3 a→4 s→5, the classic filter
    evasion a blocklist must normalize away. Pure transform/translate so
    the DuckDB oracle rebuilds the identical string."""
    toks = F.split(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
    )
    otext = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                i % 13 == 0, F.translate(t, _LEET_LETTERS, _LEET_DIGITS)
            ).otherwise(t),
        ),
        " ",
    )
    return df.select(F.col(id_col), otext.alias("otext"))


def badword_filter(
    df: DataFrame,
    text_col: str = "otext",
    id_col: str = "doc_id",
    badwords: tuple[str, ...] = BADWORDS,
    max_frac: float = 0.08,
) -> DataFrame:
    """(doc_id, n_tokens, n_flagged, flagged_frac, keep) — wordlist
    safety filter with obfuscation normalization: each token is
    lowercased and leet-normalized (0→o 1→i 3→e 4→a 5→s) before the
    blocklist membership test; documents whose flagged-token fraction
    reaches `max_frac` are dropped (keep = false). The normalize-then-
    match shape is the standard public blocklist-filter design (e.g.
    the C4 badwords step).

    Scale: fully columnar — one filter+aggregate per doc over the token
    array (no explode, no join, no UDF); the blocklist rides the plan as
    an IN-list. Zero shuffles beyond the per-doc aggregate.
    """
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    norm = lambda t: F.translate(F.lower(t), _LEET_DIGITS, _LEET_LETTERS)
    flagged = F.filter(toks, lambda t: norm(t).isin(*badwords))
    out = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(flagged).cast("long").alias("n_flagged"),
    ).where(F.col("n_tokens") > 0)
    frac = F.round(F.col("n_flagged") / F.col("n_tokens"), 6)
    return out.select(
        id_col,
        "n_tokens",
        "n_flagged",
        (frac + 0.0).alias("flagged_frac"),
        (frac < max_frac).alias("keep"),
    )


def sample_alloc(
    df: DataFrame,
    strata_cols: tuple[str, str] = ("lang", "source"),
    id_col: str = "doc_id",
    budget: int = 100,
) -> DataFrame:
    """(lang, source, n_docs, quota) — largest-remainder (Hamilton)
    integer allocation of an evaluation-sample budget across strata,
    proportional to stratum size: base = floor(budget * n / N) per
    stratum, then the leftover seats go to the strata with the largest
    integer remainders (budget * n mod N), ties broken by stratum key
    ascending. Σ quota == budget exactly — the property naive
    round(budget * n / N) does NOT have, and the reason every
    stratified-eval sampler uses this method. All-integer arithmetic, so
    the cross-engine comparison is exact.

    Scale: one groupBy over the strata (the only data-sized shuffle);
    the allocation itself runs on the stratum table — bounded domain
    (languages x sources, thousands at most), so the single-partition
    ranking window is over a tiny table, never over documents.
    """
    a, b = strata_cols
    strata = df.groupBy(a, b).agg(F.count(id_col).alias("n_docs"))
    tot = Window.partitionBy()
    withbase = strata.select(
        a,
        b,
        "n_docs",
        F.sum("n_docs").over(tot).alias("_N"),
    ).select(
        a,
        b,
        "n_docs",
        F.expr(f"({budget} * n_docs) div _N").alias("_base"),
        F.expr(f"({budget} * n_docs) % _N").alias("_rem"),
    )
    wr = Window.orderBy(F.col("_rem").desc(), F.col(a), F.col(b))
    leftover = Window.partitionBy()
    return (
        withbase.withColumn("_rank", F.row_number().over(wr))
        .withColumn("_left", F.lit(budget) - F.sum("_base").over(leftover))
        .select(
            a,
            b,
            F.col("n_docs").cast("long"),
            (
                F.col("_base")
                + F.when(F.col("_rank") <= F.col("_left"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )


def _luhn_terms(digits: "F.Column", double_odd: bool) -> "F.Column":
    """Luhn weighted digit sum over a digit-string column: positions are
    1-based FROM THE RIGHT; `double_odd` selects which parity doubles
    (odd for check-digit synthesis over a base number, even for
    validation of a full number). Doubled digits >= 5 subtract 9 — the
    classic casting-out trick."""
    rev = F.split(F.reverse(digits), "(?!$)")
    parity = 1 if double_odd else 0
    weighted = F.zip_with(
        rev,
        F.sequence(F.lit(1), F.size(rev)),
        lambda d, i: F.when(
            i % 2 == parity,
            d.cast("int") * 2
            - F.when(d.cast("int") >= 5, 9).otherwise(0),
        ).otherwise(d.cast("int")),
    )
    return F.aggregate(weighted, F.lit(0), lambda acc, x: acc + x)


def synthesize_pans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, ptext) — deterministic payment-card-like digit runs:
    docs with doc_id % 4 == 0 get a VALID 16-digit Luhn number appended
    ('4' + 14 id-derived digits + computed check digit), % 4 == 1 an
    INVALID one (check digit + 1), % 4 == 2 a too-short run ('123', the
    length-filter case), % 4 == 3 no digits at all."""
    base15 = F.concat(
        F.lit("4"),
        F.lpad(
            ((F.col(id_col) * 7919) % F.lit(10**14)).cast("string"),
            14,
            "0",
        ),
    )
    check = (10 - _luhn_terms(base15, double_odd=True) % 10) % 10
    valid = F.concat(base15, check.cast("string"))
    invalid = F.concat(base15, ((check + 1) % 10).cast("string"))
    ptext = F.when(
        F.col(id_col) % 4 == 0, F.concat(F.col(text_col), F.lit(" "), valid)
    ).when(
        F.col(id_col) % 4 == 1,
        F.concat(F.col(text_col), F.lit(" "), invalid),
    ).when(
        F.col(id_col) % 4 == 2, F.concat(F.col(text_col), F.lit(" 123"))
    ).otherwise(F.col(text_col))
    return df.select(F.col(id_col), ptext.alias("ptext"))


def luhn_scan(
    df: DataFrame,
    text_col: str = "ptext",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_candidates, n_luhn_valid) — payment-card PII detector:
    digit runs of 13-19 characters are candidates; a candidate is a
    plausible card number when its Luhn checksum passes (the public
    mod-10 algorithm every card-PII scanner uses — pii_scrub's regex
    family catches emails/phones/IPs, this adds the checksummed class).

    Scale: regexp_extract_all + an array fold per row — no explode, no
    shuffle; the same per-doc columnar shape as the other textstats.
    """
    cands = F.expr(
        f"regexp_extract_all({text_col}, '[0-9]{{13,19}}', 0)"
    )
    valid = F.filter(cands, lambda c: _luhn_terms(c, False) % 10 == 0)
    return df.select(
        F.col(id_col),
        F.size(cands).cast("long").alias("n_candidates"),
        F.size(valid).cast("long").alias("n_luhn_valid"),
    )


# byte multipliers for the storage-unit extractor; index state shared
# with the oracle.
UNIT_BYTES: tuple[tuple[str, int], ...] = (
    ("kb", 1024),
    ("mb", 1024 * 1024),
    ("gb", 1024 * 1024 * 1024),
)


def synthesize_quantities(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, utext) — deterministic storage quantities appended to
    each document: value 1 + doc_id % 97 with unit kb/mb/gb by
    doc_id % 3, plus a second quantity '7 kb' for doc_id % 4 == 0 and a
    decoy '12 zz' (unknown unit) that extraction must skip."""
    v = (1 + F.col(id_col) % 97).cast("string")
    unit = (
        F.when(F.col(id_col) % 3 == 0, F.lit("kb"))
        .when(F.col(id_col) % 3 == 1, F.lit("mb"))
        .otherwise(F.lit("gb"))
    )
    extra = F.when(F.col(id_col) % 4 == 0, F.lit(" 7 kb")).otherwise(
        F.lit("")
    )
    utext = F.concat(
        F.col(text_col), F.lit(" "), v, F.lit(" "), unit, extra,
        F.lit(" 12 zz"),
    )
    return df.select(F.col(id_col), utext.alias("utext"))


def unit_normalize(
    df: DataFrame,
    text_col: str = "utext",
    id_col: str = "doc_id",
    units: tuple[tuple[str, int], ...] = UNIT_BYTES,
) -> DataFrame:
    """(doc_id, n_quantities, total_bytes) — numeric-quantity extraction
    with unit normalization: '<int> kb|mb|gb' pairs are parsed and
    converted to bytes (binary multipliers); unknown units never match.
    The measurement-canonicalization step of document ingestion,
    all-integer so the cross-engine check is exact.

    Scale: one regexp_extract_all + an array fold per row — no explode,
    no shuffle.
    """
    alts = "|".join(u for u, _ in units)
    pairs = F.expr(
        f"regexp_extract_all({text_col}, '([0-9]+) ({alts})', 0)"
    )
    byte_vals = F.transform(
        pairs,
        lambda p: F.element_at(F.split(p, " "), 1).cast("long")
        * F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(u) for u, _ in units]),
                F.array(*[F.lit(b).cast("long") for _, b in units]),
            ),
            F.element_at(F.split(p, " "), 2),
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(pairs).cast("long").alias("n_quantities"),
        F.coalesce(
            F.aggregate(
                byte_vals, F.lit(0).cast("long"), lambda a, x: a + x
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("total_bytes"),
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    modulus: int = 8,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_hash, n_toks) — content-defined chunking
    over tokens (gear/Rabin-style, as in CDC storage dedup): a chunk
    boundary falls AFTER token position i when the rolling sum of the last
    `w` token hashes is divisible by `modulus` (and always at end-of-doc).
    Expected chunk length ~= modulus tokens. Because the boundary test
    depends only on local CONTENT, an insertion early in a document shifts
    chunk ids but not downstream boundaries — unlike fixed-size chunks
    (line_dedup), edits don't cascade, so shared passages keep their chunk
    hashes and stay detectable.

    Physical shape: posexplode tokens -> rolling window sum over
    (doc, pos) -> boundary flag -> chunk index as the running count of
    PRIOR boundaries (lagged cumulative sum) -> per-(doc, chunk) rebuild
    via array_sort(collect_list(struct(pos, tok))). Two doc-key window
    passes share ONE doc-hash shuffle (same partitioning, Exchange
    reused), then one (doc, chunk) aggregate. Hashes are the 60-bit
    md5-derived construction shared with winnowing, so the DuckDB oracle
    reproduces every boundary bit-for-bit. Window sums of w * 2^60 stay
    well inside int64 for w <= 7."""
    base = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = (
        base.select("id", F.posexplode_outer("_toks").alias("pos", "tok"))
        .where(F.col("tok").isNotNull())
        .withColumn("h", simhash_token_hash(F.lower("tok")))
    )
    roll = Window.partitionBy("id").orderBy("pos").rowsBetween(-(w - 1), 0)
    prior = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = toks.withColumn(
        "boundary",
        (F.col("pos") >= F.lit(w - 1))
        & (F.sum("h").over(roll) % F.lit(modulus) == 0),
    ).withColumn(
        "chunk_idx",
        F.coalesce(
            F.sum(F.col("boundary").cast("long")).over(prior), F.lit(0)
        ).cast("int"),
    )
    return (
        flagged.groupBy(F.col("id").alias(id_col), "chunk_idx")
        .agg(
            F.md5(
                F.lower(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "tok"))
                            ),
                            lambda s: s["tok"],
                        ),
                        " ",
                    )
                )
            ).alias("chunk_hash"),
            F.count("*").cast("long").alias("n_toks"),
        )
    )


def cdc_chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    modulus: int = 8,
) -> DataFrame:
    """(doc_id, n_tokens, n_chunks, n_dup_chunks, dup_token_ratio) —
    corpus-level duplicate-passage signal on top of cdc_chunks: a chunk is
    duplicated when its hash occurs more than once corpus-wide;
    dup_token_ratio is the fraction of the document's tokens inside
    duplicated chunks (rounded to 6 dp). Token-less documents report
    zeros.

    Physical shape: chunk inventory (above) -> chunk-hash frequency
    aggregate (map-side combined; the shuffle carries one row per distinct
    chunk per mapper) -> shuffle join back on chunk_hash (corpus-sized,
    NOT broadcastable at scale) -> per-doc rollup. The frequency table is
    the only corpus-scale exchange added beyond the inventory itself."""
    chunks = cdc_chunks(df, text_col, id_col, w, modulus)
    freq = chunks.groupBy("chunk_hash").agg(F.count("*").alias("occ"))
    per_doc = (
        chunks.join(freq, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("occ") > 1).cast("long")).alias("n_dup_chunks"),
            F.sum("n_toks").alias("_n_toks"),
            F.sum(F.when(F.col("occ") > 1, F.col("n_toks")).otherwise(0)).alias(
                "_dup_toks"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_n_toks", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0))
            .cast("long")
            .alias("n_dup_chunks"),
            F.round(
                F.coalesce(
                    F.col("_dup_toks") / F.col("_n_toks"), F.lit(0.0)
                ),
                6,
            ).alias("dup_token_ratio"),
        )
    )


def rouge_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """(doc_a, doc_b, n_overlap, n_ref, rouge_recall) — ROUGE-N recall of
    each document against its successor (doc_b = doc_a + 1): the fraction
    of doc_b's DISTINCT token n-grams that also appear in doc_a. The
    summarization-eval metric repurposed as an adjacent-document
    redundancy probe (crawl snapshots land in id order, so neighbors are
    the cheapest near-dup prior). Pairs whose reference has no n-gram are
    dropped; recall is rounded to 6 dp.

    Physical shape: one distinct-(id, gram) inventory, consumed twice.
    The overlap join is a pure EQUI-join on the composite (successor id,
    gram) key — the successor constraint is folded INTO the key (a.id+1,
    a.gram) = (b.id, b.gram), so there is no fan-out beyond true matches
    and no theta-join. Gram keys are lowercase-folded md5 60-bit hashes
    (16 bytes shuffled, not the gram text)."""
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: simhash_token_hash(
                    F.lower(F.array_join(F.slice(toks, i + 1, n), " "))
                ),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    inv = (
        df.select(
            F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("_toks")
        )
        .select("id", F.explode_outer(grams).alias("gram"))
        .where(F.col("gram").isNotNull())
    )
    ref_counts = inv.groupBy("id").agg(F.count("*").alias("n_ref"))
    overlap = (
        inv.select((F.col("id") + 1).alias("bid"), "gram")
        .join(
            inv.select(F.col("id").alias("bid"), "gram"),
            ["bid", "gram"],
        )
        .groupBy("bid")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        ref_counts.withColumnRenamed("id", "bid")
        .join(overlap, "bid", "left")
        .select(
            (F.col("bid") - 1).alias("doc_a"),
            F.col("bid").alias("doc_b"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("n_ref"), 6
            ).alias("rouge_recall"),
        )
        .join(
            df.select(F.col(id_col).alias("doc_a")).distinct(), "doc_a"
        )
    )


def collocations_llr(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pairs: int = 3,
) -> DataFrame:
    """(a, b, pair_n, n_a, n_b, llr) — Dunning log-likelihood-ratio
    collocation scores for adjacent token bigrams: the 2x2 contingency
    test (bigram vs its unigram margins) that stays calibrated for RARE
    words where PMI (pmi_cooccurrence) explodes — the standard
    collocation ranking since Dunning 1993. llr = 2*(S(k11)+S(k12)+
    S(k21)+S(k22) - S(row sums) - S(col sums) + S(N)) with S(k) =
    k·ln k, S(0) = 0; 4 dp.

    Physical shape: one bigram explode -> pair counts (map-side
    combined), pruned by `min_pairs` BEFORE the two unigram joins
    (output stays vocabulary-bounded); margins are unigram counts of the
    LEFT/RIGHT bigram positions so the contingency table is exact even at
    document boundaries; N rides in as a broadcast 1-row sum. All counts
    are exact integers — the only float work is the final ln."""
    toks = F.col("_toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.lower(F.element_at(toks, i + 1)).alias("a"),
                F.lower(F.element_at(toks, i + 2)).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    prs = (
        fan_out(df)
        .select(tokens_col(F.col(text_col)).alias("_toks"))
        .select(F.explode_outer(bigrams).alias("p"))
        .where(F.col("p").isNotNull())
        .select("p.a", "p.b")
    )
    pair_counts = prs.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("pair_n")
    )
    left = prs.groupBy("a").agg(F.count("*").cast("long").alias("n_a"))
    right = prs.groupBy("b").agg(F.count("*").cast("long").alias("n_b"))
    total = prs.agg(F.count("*").cast("long").alias("_N"))

    def S(k):
        return F.when(k > 0, k * F.log(k.cast("double"))).otherwise(F.lit(0.0))

    out = (
        pair_counts.where(F.col("pair_n") >= min_pairs)
        .join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(total))
    )
    k11 = F.col("pair_n")
    k12 = F.col("n_a") - k11
    k21 = F.col("n_b") - k11
    k22 = F.col("_N") - F.col("n_a") - F.col("n_b") + k11
    llr = 2.0 * (
        S(k11) + S(k12) + S(k21) + S(k22)
        - S(F.col("n_a")) - S(F.col("_N") - F.col("n_a"))
        - S(F.col("n_b")) - S(F.col("_N") - F.col("n_b"))
        + S(F.col("_N"))
    )
    return out.select(
        "a", "b", "pair_n", "n_a", "n_b", F.round(llr, 4).alias("llr")
    )


def dedup_audit_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    top_k: int = 10,
    prefix_chars: int = 40,
) -> DataFrame:
    """(id1, id2, jaccard, text_a, text_b) — the human-audit view of the
    exact n-gram dedup: the `top_k` highest-Jaccard pairs (ties to the
    id pair) with a `prefix_chars` preview of both texts. Every dedup
    rollout ends with someone eyeballing pairs before flipping the
    delete switch — this is that sample, produced without ever
    collecting the corpus.

    Physical shape: ngram_jaccard_pairs (inverted-index join) -> global
    top-k (TakeOrderedAndProject — k rows cross the driver boundary, not
    the pair set) -> two broadcast-eligible joins back to the text for
    ONLY the k winners."""
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(df, text_col, id_col, n, threshold)
    top = pairs.orderBy(
        F.desc("jaccard"), F.asc("id1"), F.asc("id2")
    ).limit(top_k)
    texts = df.select(
        F.col(id_col).alias("_tid"),
        F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, prefix_chars).alias(
            "_prefix"
        ),
    )
    return (
        top.join(texts, top["id1"] == texts["_tid"])
        .withColumnRenamed("_prefix", "text_a")
        .drop("_tid")
        .join(texts, top["id2"] == texts["_tid"])
        .withColumnRenamed("_prefix", "text_b")
        .drop("_tid")
        .select("id1", "id2", "jaccard", "text_a", "text_b")
    )


def pps_sample(
    df: DataFrame,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """(doc_id, weight, incl_prob, picked) — Poisson probability-
    proportional-to-size sampling: row i is included independently with
    probability min(1, k * w_i / W), giving an expected sample size of
    ~k concentrated on heavy rows (the length-weighted corpus-audit
    sample: a 1M-token document deserves more review probability than a
    tweet). Horvitz-Thompson estimators divide by exactly the emitted
    incl_prob, so the column IS the estimator input, not diagnostics.
    Inclusion draws are md5 uniforms of the id — deterministic, so the
    SAMPLE ITSELF is oracle-checkable. Rows with null/non-positive
    weight are never picked. 6 dp.

    Physical shape: one 1-row total-weight aggregate broadcast onto a
    pure projection + filter — no sort, no per-group state; expected
    output k rows regardless of corpus size."""
    w = F.col(weight_col).cast("double")
    tot = df.agg(F.sum(F.when(w > 0, w).otherwise(0.0)).alias("_W"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pps:"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    out = df.crossJoin(F.broadcast(tot)).select(
        F.col(id_col),
        F.coalesce(w, F.lit(0.0)).alias("weight"),
        F.round(
            F.least(F.lit(1.0), F.lit(float(k)) * w / F.col("_W")), 6
        ).alias("incl_prob"),
        (
            w.isNotNull()
            & (w > 0)
            & (u < F.least(F.lit(1.0), F.lit(float(k)) * w / F.col("_W")))
        ).alias("picked"),
    )
    return out.where(F.col("picked"))


def dup_rate_by_source(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_unique, dup_rate) — exact-duplicate pressure
    per ingest source: distinct lowercase-text digests vs document count,
    dup_rate = 1 - unique/docs (6 dp). The per-feed health report that
    decides which crawl sources get re-fetched less often. Null text
    hashes as the empty digest and dedups like any other value.

    Physical shape: digest computed map-side (16-byte md5), ONE
    (source, digest)-key partial-distinct aggregate, then the per-source
    rollup — shuffle volume is distinct digests, never text bytes."""
    digests = df.select(
        F.col(source_col).alias("source"),
        F.md5(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("_d"),
    )
    per_src = digests.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("_d").cast("long").alias("n_unique"),
    )
    return per_src.select(
        "source",
        "n_docs",
        "n_unique",
        F.round(1 - F.col("n_unique") / F.col("n_docs"), 6).alias(
            "dup_rate"
        ),
    )


def filter_committee(
    gopher: DataFrame, c4: DataFrame, lr: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_accept, verdict, unanimous) — majority vote across the
    three quality filters (Gopher rules, C4 rules, hashed-LR classifier):
    the ensemble-curation pattern (DCLM/FineWeb keep what most filters
    keep) plus the disagreement surface — non-unanimous docs are exactly
    the borderline set worth human audit (dedup_audit_pairs' quality
    twin). Inputs are the filters' (doc_id, accept) outputs.

    Physical shape: three same-keyed joins (all derived from one
    documents scan upstream; AQE co-plans them) + a pure projection.
    Inner joins: a doc must be scored by all three to vote."""
    g = gopher.select(F.col(id_col), F.col("accept").alias("_g"))
    c = c4.select(F.col(id_col), F.col("accept").alias("_c"))
    h = lr.select(F.col(id_col), F.col("accept").alias("_l"))
    j = g.join(c, id_col).join(h, id_col)
    n_acc = (
        F.col("_g").cast("int") + F.col("_c").cast("int")
        + F.col("_l").cast("int")
    )
    return j.select(
        F.col(id_col),
        n_acc.cast("long").alias("n_accept"),
        (n_acc >= 2).alias("verdict"),
        ((n_acc == 0) | (n_acc == 3)).alias("unanimous"),
    )


def filter_pr(
    gopher: DataFrame, c4: DataFrame, lr: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(filter, tp, fp, fn, tn, precision, recall, f1) — each quality
    filter evaluated against the committee majority verdict as the
    pseudo-ground-truth: the standard ensemble-analysis step that shows
    which member is the strict one (high precision, low recall) and
    which is the permissive one. Zero-denominator cases report null.
    6 dp.

    Physical shape: the committee join (three same-keyed joins) feeding
    three conditional-count aggregates in one pass, reshaped with a
    literal stack."""
    g = gopher.select(F.col(id_col), F.col("accept").alias("_g"))
    c = c4.select(F.col(id_col), F.col("accept").alias("_c"))
    h = lr.select(F.col(id_col), F.col("accept").alias("_l"))
    j = g.join(c, id_col).join(h, id_col)
    verdict = (
        F.col("_g").cast("int") + F.col("_c").cast("int")
        + F.col("_l").cast("int")
        >= 2
    )
    j = j.withColumn("_v", verdict)
    aggs = []
    names = [("gopher", "_g"), ("c4", "_c"), ("hash_lr", "_l")]
    for name, col in names:
        p = F.col(col)
        aggs += [
            F.sum((p & F.col("_v")).cast("long")).alias(f"_tp_{name}"),
            F.sum((p & ~F.col("_v")).cast("long")).alias(f"_fp_{name}"),
            F.sum((~p & F.col("_v")).cast("long")).alias(f"_fn_{name}"),
            F.sum((~p & ~F.col("_v")).cast("long")).alias(f"_tn_{name}"),
        ]
    wide = j.agg(*aggs)
    rows = []
    for name, _ in names:
        tp = F.col(f"_tp_{name}")
        fp = F.col(f"_fp_{name}")
        fn = F.col(f"_fn_{name}")
        prec = F.when(tp + fp > 0, tp / (tp + fp))
        rec = F.when(tp + fn > 0, tp / (tp + fn))
        rows.append(
            F.struct(
                F.lit(name).alias("filter"),
                tp.cast("long").alias("tp"),
                fp.cast("long").alias("fp"),
                fn.cast("long").alias("fn"),
                F.col(f"_tn_{name}").cast("long").alias("tn"),
                F.round(prec, 6).alias("precision"),
                F.round(rec, 6).alias("recall"),
                F.round(
                    F.when(
                        prec.isNotNull() & rec.isNotNull()
                        & (prec + rec > 0),
                        2 * prec * rec / (prec + rec),
                    ),
                    6,
                ).alias("f1"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def roc_auc(
    scored: DataFrame,
    score_col: str = "margin",
    label_col: str = "label",
) -> DataFrame:
    """1-row (n_pos, n_neg, tie_pairs, auc) — ROC AUC of a continuous
    score against a boolean label via the Mann-Whitney rank-sum
    identity with the standard tie correction:

        AUC = (U + T/2) / (P * N)
        U = #{(pos, neg) pairs: score_pos > score_neg},  T = tied pairs

    computed WITHOUT enumerating pairs and WITHOUT a global sort:
    scores collapse to per-score class counts (one corpus aggregate),
    U = sum over score groups of p_s * (negatives strictly below), and
    the strictly-below cumulative comes from the range-partitioned rank
    engine (ranking.partitioned_running_sum) — no unbounded-entity
    single-partition window anywhere, the repo's scalable-rank
    discipline. All counts are exact integers, so the single final
    division (2U + T) / (2 * P * N) is bit-identical cross-engine.
    Null auc when either class is empty."""
    from .ranking import partitioned_running_sum

    g = scored.groupBy(F.col(score_col).alias("_s")).agg(
        F.sum(F.col(label_col).cast("long")).alias("_pm"),
        F.sum((~F.col(label_col)).cast("long")).alias("_nm"),
    )
    r = partitioned_running_sum(
        g, score_col="_s", tiebreak_cols=[], val_col="_nm", out_col="_rs"
    )
    # scores are unique per group row, so strictly-below = inclusive - own
    c = r.withColumn("_below", F.col("_rs") - F.col("_nm"))
    a = c.agg(
        F.sum(F.col("_pm") * F.col("_below")).alias("_u"),
        F.sum(F.col("_pm") * F.col("_nm")).alias("_t"),
        F.sum("_pm").alias("n_pos"),
        F.sum("_nm").alias("n_neg"),
    )
    return a.select(
        F.col("n_pos"),
        F.col("n_neg"),
        F.col("_t").alias("tie_pairs"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (2 * F.col("_u") + F.col("_t"))
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """(doc_id, weight, draw_key, pick_rank) — EXACT-k weighted sampling
    without replacement by the exponential-draw formulation of
    Efraimidis-Spirakis A-ES (public sampling literature): each row
    draws key_i = -ln(u_i) / w_i with u_i a deterministic md5 uniform
    of its id, and the k SMALLEST keys are the sample — equivalent to
    sequential draws with probability proportional to the remaining
    weights. The fixed-size companion to `pps_sample` (Poisson PPS,
    expected-k): mixture quotas need exactly-k, and A-ES is the
    mergeable/streaming-friendly way to get it (a top-k over keys is a
    bounded sketch any partition can maintain).

    Determinism/oracle discipline: u in (0, 1] (never 0, so ln is
    finite), key rounded to 12 dp BEFORE ranking with id tiebreak —
    sub-ulp ln() differences across engines cannot flip the order.
    Physical shape: one projection + TakeOrderedAndProject (per-
    partition top-k then a k-row merge — no corpus sort, no global
    window; pick_rank numbers the k-row post-limit frame)."""
    w = F.col(weight_col).cast("double")
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("aes:"), F.col(id_col).cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(1.0)
        )
        / F.lit(float(1 << 60))
    )
    keyed = (
        df.where(w.isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            w.alias("weight"),
            F.round(-F.log(u) / w, 12).alias("draw_key"),
        )
        .orderBy(F.asc("draw_key"), F.asc(id_col))
        .limit(k)
    )
    win = Window.orderBy(F.asc("draw_key"), F.asc(id_col))
    return keyed.withColumn(
        "pick_rank", F.row_number().over(win)
    )


def stupid_backoff_score(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """(doc_id, n_trigrams, avg_logscore) — trigram Stupid Backoff
    scoring (Brants et al. 2007, the web-scale LM that skips proper
    discounting because at corpus scale the backoff factor alone
    suffices): every trigram position of a scoring doc gets

        S(w3|w1 w2) = c(w1 w2 w3)/c(w1 w2)            if seen
                    = a * c(w2 w3)/c(w2)              elif bigram seen
                    = a^2 * c(w3)/N                   elif unigram seen
                    = a^2 * 1/N                       else (OOV floor)

    with a = 0.4, and the doc reports the mean ln S over its trigram
    positions (6 dp — the lm_perplexity discipline). Train and score
    sets are DIFFERENT slices (the kn_perplexity train/score split):
    scoring the training corpus itself never backs off, so the chain
    would be dead code.

    Scale shape: the three count tables are corpus-sized shuffle
    aggregates with map-side combine (persisted model state at
    production scale); scoring is three left joins of the exploded
    trigram rows against them — narrow keys, no broadcast of anything
    corpus-sized, one doc-grain aggregate at the end."""
    toks = tokens_col(F.lower(F.col(text_col)))
    tbase = train.select(toks.alias("t"))
    uni = (
        tbase.select(F.explode("t").alias("w3"))
        .groupBy("w3")
        .agg(F.count("*").alias("c3u"))
        .localCheckpoint(eager=False)
    )
    tot = uni.agg(F.sum("c3u").cast("double").alias("N"))

    def _ngrams(base, n, cols):
        sl = F.when(
            F.size("t") >= n, F.expr(f"slice(t, 1, size(t) - {n - 1})")
        ).otherwise(F.array().cast("array<string>"))
        out = base.select(
            *[c for c in base.columns if c != "t"],
            F.posexplode(sl).alias("pos", cols[0]),
            F.col("t"),
        )
        for j, c in enumerate(cols[1:], start=1):
            out = out.withColumn(c, F.expr(f"t[pos + {j}]"))
        return out.drop("t")

    bi = (
        _ngrams(tbase, 2, ["w2", "w3"])
        .groupBy("w2", "w3")
        .agg(F.count("*").alias("c23"))
        .localCheckpoint(eager=False)
    )
    bi_ctx = bi.groupBy("w2").agg(F.sum("c23").alias("c2"))
    tri = (
        _ngrams(tbase, 3, ["w1", "w2", "w3"])
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c123"))
    )
    tri_ctx = tri.groupBy("w1", "w2").agg(F.sum("c123").alias("c12"))

    sbase = score.select(F.col(id_col).alias("id"), toks.alias("t"))
    pos = _ngrams(sbase, 3, ["w1", "w2", "w3"])
    j = (
        pos.join(tri, ["w1", "w2", "w3"], "left")
        .join(tri_ctx, ["w1", "w2"], "left")
        .join(bi, ["w2", "w3"], "left")
        .join(bi_ctx, ["w2"], "left")
        .join(uni, ["w3"], "left")
        .crossJoin(F.broadcast(tot))
    )
    a = F.lit(float(alpha))
    s = (
        F.when(
            F.col("c123").isNotNull(), F.col("c123") / F.col("c12")
        )
        .when(F.col("c23").isNotNull(), a * F.col("c23") / F.col("c2"))
        .when(
            F.col("c3u").isNotNull(), a * a * F.col("c3u") / F.col("N")
        )
        .otherwise(a * a / F.col("N"))
    )
    return (
        j.select("id", F.log(s).alias("lns"))
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.round(F.avg("lns"), 6).alias("avg_logscore"),
        )
        .select(F.col("id").alias(id_col), "n_trigrams", "avg_logscore")
    )
