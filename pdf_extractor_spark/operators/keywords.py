"""Keyword extraction and stored-query matching over the document corpus.

Two classic text-pipeline operators, both fully columnar (no Python UDF):

  * keyword_rake    — RAKE (Rapid Automatic Keyword Extraction, Rose et
                      al. 2010, public knowledge): split each document
                      into candidate phrases at stopword boundaries,
                      score words by degree/frequency over the phrase
                      co-occurrence graph, rank phrases by the sum of
                      their word scores. The per-document keyword signal
                      every corpus-curation dashboard wants next to
                      tf-idf (tfidf_top_terms is the corpus-level twin).
  * reverse_search  — percolator-style stored-query matching: a small
                      set of standing conjunctive term queries is matched
                      against every document (the inverse of phrase
                      search — queries are the index, documents are the
                      stream). The alerting primitive of a continuously
                      ingested corpus ("tell me when a doc mentioning X
                      and Y arrives").

Scale design: RAKE is entirely per-document — posexplode + windows +
groupBys all keyed by doc_id, so the whole operator rides ONE hash
shuffle on the document key (the same partitioning the rest of the
pipeline uses; AQE handles stragglers). reverse_search broadcasts the
stored-query term table (standing queries are small by construction —
thousands, not billions) and joins it against per-doc DISTINCT terms, so
the join input is bounded by per-doc vocabulary, not token count; the
single shuffle is the (doc, query) match-count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# RAKE phrase delimiters. The synthetic corpus's function words; a real
# deployment swaps in a full stopword list per language (lang_id upstream).
RAKE_STOPWORDS: tuple[str, ...] = ("a", "the")

# Standing conjunctive queries (index state, like textstats.WORDPIECE_VOCAB):
# (query_id, terms). A document matches when it contains EVERY term.
STORED_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("spark", "join")),
    (2, ("window", "merge", "batch")),
    (3, ("slow", "fast", "query")),
    (4, ("vector",)),
    (5, ("spark", "nosuchterm")),  # can never match — the zero-row case
)


def _doc_phrases(
    df: DataFrame, text_col: str, id_col: str, stopwords: tuple[str, ...]
) -> DataFrame:
    """(doc_id, phrase_id, pos, tok) — candidate-phrase membership: tokens
    between stopword boundaries share a phrase_id; stopwords themselves
    are dropped after numbering."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    is_stop = F.col("tok").isin(*stopwords)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("_b", is_stop)
        .withColumn("phrase_id", F.sum(F.col("_b").cast("int")).over(w))
        .where(~F.col("_b"))
        .drop("_b")
    )


def keyword_rake(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    top_k: int = 3,
) -> DataFrame:
    """(doc_id, rank, phrase, score) — RAKE keywords per document.

    Candidate phrases are maximal stopword-free token runs. Within a
    document, word freq = occurrences across all phrases, word degree =
    sum of the lengths of the phrases each occurrence sits in (the
    classic degree = co-occurrence-graph degree + self), word score =
    degree / freq, phrase score = sum of member word scores (repeated
    members count each occurrence, per the original formulation). The
    top_k DISTINCT phrase strings per doc are ranked by (score desc,
    phrase asc); a phrase string occurring twice scores identically both
    times, so distinctness is well-defined. Scores are rounded to 6
    decimals to keep the cross-engine comparison float-stable.
    """
    members = _doc_phrases(df, text_col, id_col, stopwords)
    # phrase length rides every member row (window, not a join)
    wp = Window.partitionBy(id_col, "phrase_id")
    members = members.withColumn("plen", F.count("*").over(wp))
    # per-(doc, word): freq and degree
    ww = Window.partitionBy(id_col, "tok")
    scored = members.withColumn(
        "wscore",
        F.sum("plen").over(ww) / F.count("*").over(ww),
    )
    phrases = scored.groupBy(id_col, "phrase_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.round(F.sum("wscore"), 6).alias("score"),
    )
    distinct = phrases.groupBy(id_col, "phrase", "score").agg(
        F.count("*").alias("_n")
    )
    wr = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        distinct.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_k)
        .select(id_col, "rank", "phrase", (F.col("score") + 0.0).alias("score"))
    )


def reverse_search(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    queries: tuple[tuple[int, tuple[str, ...]], ...] = STORED_QUERIES,
) -> DataFrame:
    """(query_id, n_terms, n_docs, first_doc) — how many documents match
    each standing conjunctive query, plus the smallest matching doc id
    (NULL when nothing matches; every query emits a row).

    Match semantics: doc matches iff its token SET contains every query
    term. The term table is broadcast (standing queries are small), the
    document side explodes array_distinct(tokens) — bounded by per-doc
    vocabulary — and a (doc, query) distinct-term count equal to the
    query's arity is a full conjunctive hit. One shuffle.
    """
    spark = df.sparkSession
    qterms = spark.createDataFrame(
        [
            (qid, t, len(set(terms)))
            for qid, terms in queries
            for t in set(terms)
        ],
        "query_id int, term string, n_terms int",
    )
    qdim = spark.createDataFrame(
        [(qid, len(set(terms))) for qid, terms in queries],
        "query_id int, n_terms int",
    )
    doc_terms = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
            )
        ).alias("term"),
    ).where(F.col("term") != "")
    hits = (
        doc_terms.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "query_id", "n_terms")
        .agg(F.count("*").alias("_matched"))
        .where(F.col("_matched") == F.col("n_terms"))
    )
    per_query = hits.groupBy("query_id").agg(
        F.count("*").alias("n_docs"),
        F.min(id_col).alias("first_doc"),
    )
    return (
        qdim.join(per_query, "query_id", "left")
        .select(
            "query_id",
            "n_terms",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.col("first_doc").cast("long"),
        )
    )


def assoc_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_support: tuple[int, int] = (1, 5),
    top_k: int = 20,
) -> DataFrame:
    """(antecedent, consequent, n_pair, n_ante, n_cons, confidence,
    lift) — market-basket association rules over documents-as-baskets
    (Agrawal et al.'s Apriori family, public knowledge): items are a
    document's DISTINCT tokens, a pair is frequent when it appears in
    >= min_support (a num/den rational — the support comparison is pure
    integer cross-multiplication, exact on both engines; a float
    threshold at an exact boundary like 100 docs * 0.2 diverges between
    double and DECIMAL arithmetic) of documents, and each frequent pair
    emits both directional rules. confidence = P(cons | ante), lift =
    P(pair) / (P(ante) * P(cons)); the top_k rules are ranked by
    (lift desc, antecedent asc, consequent asc).

    Scale: Apriori pruning — singleton counts first, only tokens that
    are themselves frequent enter pair generation. The frequent-item set
    at relative support s has at most L/s members where L is the MEAN
    distinct-token count per document (sum of doc frequencies <= N*L,
    each frequent item contributes >= s*N) — bounded independent of
    corpus size, so it rides the plan as a 1-row broadcast map and the
    basket prune is a per-row array filter: NO frequent-items join and
    NO basket regroup shuffle (the r3/r4 plan regrouped the exploded
    item table per doc; baskets here never leave their input row — the
    input array IS the basket). The corpus is exploded and shuffled
    exactly once (the singleton doc-frequency count); the a<b pairs
    materialize as an in-row comprehension over the pruned array, and
    pair counting map-side-combines before its one (a, b) shuffle. The
    final top-k is TakeOrdered, not a global rules window — rules can
    be vocabulary² and must not sort in one task.
    """
    from ..session import fan_out

    tok_arr = F.array_distinct(
        F.array_remove(
            F.split(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
            ),
            "",
        )
    )
    docs = fan_out(df).select(F.col(id_col), tok_arr.alias("_toks"))
    # doc counts a basket iff it has >= 1 token (empty-after-trim docs
    # split to [''] which array_remove drops) — same population the
    # exploded-distinct-id count saw, computed WITHOUT tokenizing (a
    # trim-length check on the raw scan, no fan_out shuffle) and
    # checkpointed eagerly: the 1-row table broadcasts into TWO filters
    # (frequent singletons, frequent pairs) and would otherwise replay
    # its scan per consumer
    totals = df.agg(
        F.sum(
            F.when(
                F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0,
                1,
            ).otherwise(0)
        ).alias("n_total")
    ).localCheckpoint(eager=True)
    num, den = min_support
    freq = (
        docs.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
        .crossJoin(F.broadcast(totals))
        .where(F.col("n_tok") * den >= F.col("n_total") * num)
    )
    fmap = freq.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("tok", "n_tok")))
        ).alias("_fm")
    )
    # prune with ONE map probe per token: build the struct, drop misses
    # on the null lookup (map_contains_key compiles to an
    # array_contains(map_keys(..)) scan PLUS the lookup — twice the work)
    baskets = docs.crossJoin(F.broadcast(fmap)).select(
        F.array_sort(
            F.filter(
                F.transform(
                    F.col("_toks"),
                    lambda t: F.struct(
                        t.alias("tok"), F.col("_fm")[t].alias("n_tok")
                    ),
                ),
                lambda s: s["n_tok"].isNotNull(),
            )
        ).alias("_b")
    )
    k = F.size("_b")
    pair_arr = F.flatten(
        F.transform(
            F.col("_b"),
            lambda x, i: F.transform(
                F.slice(F.col("_b"), i + 2, k),
                lambda y: F.struct(
                    x["tok"].alias("a"),
                    x["n_tok"].alias("n_a"),
                    y["tok"].alias("b"),
                    y["n_tok"].alias("n_b"),
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("_p"))
        .select("_p.a", "_p.n_a", "_p.b", "_p.n_b")
        .groupBy("a", "n_a", "b", "n_b")
        .agg(F.count("*").alias("n_pair"))
        .crossJoin(F.broadcast(totals))
        .where(F.col("n_pair") * den >= F.col("n_total") * num)
    )
    # both directional rules explode from ONE pass over the pair table —
    # a fwd/rev unionByName would recompute the whole upstream subtree
    # (items -> freq -> baskets -> pairs) per branch, doubling every
    # exchange (the r3 plan's 16-shuffle bloat)
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("antecedent"),
                    F.col("b").alias("consequent"),
                    F.col("n_pair").alias("n_pair"),
                    F.col("n_a").alias("n_ante"),
                    F.col("n_b").alias("n_cons"),
                    F.col("n_total").alias("n_total"),
                ),
                F.struct(
                    F.col("b").alias("antecedent"),
                    F.col("a").alias("consequent"),
                    F.col("n_pair").alias("n_pair"),
                    F.col("n_b").alias("n_ante"),
                    F.col("n_a").alias("n_cons"),
                    F.col("n_total").alias("n_total"),
                ),
            )
        ).alias("_r")
    ).select("_r.*").select(
        "antecedent",
        "consequent",
        F.col("n_pair").cast("long"),
        F.col("n_ante").cast("long"),
        F.col("n_cons").cast("long"),
        F.round(F.col("n_pair") / F.col("n_ante"), 6).alias("confidence"),
        F.round(
            F.col("n_pair") * F.col("n_total")
            / (F.col("n_ante") * F.col("n_cons")),
            6,
        ).alias("lift"),
    )
    # exact top-k via TakeOrderedAndProject (per-partition heads + one
    # driver merge of k-row samples — never a global sort); the rank
    # window then runs over <= top_k rows, a bounded single partition
    top = rules.orderBy(
        F.col("lift").desc(), F.col("antecedent"), F.col("consequent")
    ).limit(top_k)
    w = Window.orderBy(
        F.col("lift").desc(), F.col("antecedent"), F.col("consequent")
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "antecedent", "consequent", "n_pair", "n_ante",
        "n_cons", "confidence", "lift",
    )


def synthesize_acronyms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, atext) — deterministic acronym-definition sites: append
    ' <t1> <t2> (<I1><I2>) (Z)' where t1/t2 are the document's first two
    tokens and I1/I2 their uppercased initials — except docs with
    doc_id % 3 == 0, whose second initial is replaced by 'Q' (usually a
    mismatch, but genuinely valid when t2 itself starts with 'q' — the
    oracle reproduces that exact condition). '(Z)' is the 1-letter decoy
    below the extractor's length floor."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    t1 = F.element_at(toks, 1)
    t2 = F.element_at(toks, 2)
    i2 = F.when(
        F.col(id_col) % 3 == 0, F.lit("Q")
    ).otherwise(F.upper(F.substring(t2, 1, 1)))
    atext = F.concat(
        F.col(text_col),
        F.lit(" "), t1, F.lit(" "), t2,
        F.lit(" ("), F.upper(F.substring(t1, 1, 1)), i2, F.lit(")"),
        F.lit(" (Z)"),
    )
    return df.select(F.col(id_col), atext.alias("atext"))


def acronym_extract(
    df: DataFrame,
    text_col: str = "atext",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_candidates, n_valid, first_acronym) — Schwartz-Hearst-
    style acronym-definition mining (public knowledge): a parenthesized
    ALL-CAPS token of 2-5 letters is a candidate; it is VALID when the
    |acronym| tokens immediately before it have matching initials
    (case-insensitive). first_acronym is the earliest valid acronym
    (NULL when none).

    Scale: pure array work per row — positions filtered by regex, the
    initial-match check is a forall over a zip of acronym letters and
    preceding-token initials. No explode, no join, no shuffle.
    """
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    df2 = df.select(F.col(id_col), toks.alias("_toks"))
    cand_pos = F.filter(
        F.sequence(F.lit(1), F.size("_toks")),
        lambda p: F.element_at(F.col("_toks"), p).rlike(
            r"^\([A-Z]{2,5}\)$"
        ),
    )

    def _is_valid(p):
        acr = F.regexp_extract(
            F.element_at(F.col("_toks"), p), r"^\(([A-Z]{2,5})\)$", 1
        )
        ln = F.length(acr)
        return (p > ln) & F.forall(
            F.sequence(F.lit(1), ln),
            lambda j: F.lower(
                F.substring(acr, 1, 5).substr(j, F.lit(1))
            )
            == F.lower(
                F.substring(
                    F.element_at(F.col("_toks"), (p - ln - 1 + j)), 1, 1
                )
            ),
        )

    valid_pos = F.filter(cand_pos, _is_valid)
    first_acr = F.when(
        F.size(valid_pos) > 0,
        F.regexp_extract(
            F.element_at(F.col("_toks"), F.element_at(valid_pos, 1)),
            r"^\(([A-Z]{2,5})\)$",
            1,
        ),
    )
    return df2.select(
        F.col(id_col),
        F.size(cand_pos).cast("long").alias("n_candidates"),
        F.size(valid_pos).cast("long").alias("n_valid"),
        first_acr.alias("first_acronym"),
    )


def autocomplete_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 3,
) -> DataFrame:
    """(prefix, n_tokens, top_token, top_count) — autocomplete prefix
    index: for every `prefix_len`-char prefix, the total token
    occurrences under it and the most frequent completion (count desc,
    token asc). The suggest-as-you-type index a search layer keeps next
    to the inverted index; tokens shorter than the prefix are skipped.

    Scale: one (prefix, token) count aggregate (map-side partial), one
    per-prefix max_by — shuffle volume is distinct (prefix, token)
    pairs, bounded by vocabulary.
    """
    toks = df.select(
        F.explode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("tok")
    ).where(F.length("tok") >= prefix_len)
    counts = toks.groupBy(
        F.substring("tok", 1, prefix_len).alias("prefix"), "tok"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("prefix").orderBy(F.desc("n"), F.asc("tok"))
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .groupBy("prefix")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.max(F.when(F.col("_r") == 1, F.col("tok"))).alias(
                "top_token"
            ),
            F.max(F.when(F.col("_r") == 1, F.col("n")))
            .cast("long")
            .alias("top_count"),
        )
    )
