"""Deduplication operators for web-scale training-data pipelines.

Five families, each with a distinct scale profile:

  * exact_dedup        — md5(text) groupBy; one shuffle on the digest.
  * ngram_jaccard_pairs— shingle inverted index self-join; DF-capped shingles
                         bound the join fan-out (hot-shingle guard).
  * minhash_lsh_pairs  — MinHash signatures (permutation family
                         h_i(x) = (a_i*x + b_i) mod p over xxhash64 shingle
                         ids) banded into LSH buckets; candidate pairs then
                         verified with true Jaccard. The scale path: cost is
                         O(docs x bands), never O(docs^2).
  * simhash64          — 64-bit SimHash over token hashes; near-dups =
                         signatures within Hamming distance k (bit tricks,
                         no UDF).
  * embedding_neardup_pairs — cosine > tau within blocking keys.

All pure DataFrame ops; determinism comes from xxhash64 + fixed
coefficients, so results are stable across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: canonical (min) id + duplicate count.
    Digest first so the shuffle moves 16-byte keys, not document bodies."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
    )


def _shingles(text_col: str, n: int) -> "F.Column":
    toks = tokens_col(F.lower(F.col(text_col)))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = 1000,
) -> DataFrame:
    """(id, shingle) inverted index with optional hot-shingle cap: shingles
    appearing in more than max_df docs are dropped from BOTH sides (standard
    guard — a stop-shingle would otherwise explode the self-join)."""
    idx = df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("shingle")
    )
    if max_df is not None:
        hot = (
            idx.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        idx = idx.join(F.broadcast(hot), "shingle", "left_anti")
    return idx


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.
    inter/union from the inverted-index self-join + per-doc shingle counts."""
    idx = shingle_index(df, text_col, id_col, n, max_df).cache()
    counts = idx.groupBy("id").agg(F.count("*").alias("n_shingles"))

    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    out = (
        inter.join(ca, F.col("id1") == F.col("ca.id"))
        .join(cb, F.col("id2") == F.col("cb.id"))
        .select(
            "id1",
            "id2",
            F.round(
                F.col("inter")
                / (F.col("ca.n_shingles") + F.col("cb.n_shingles") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


# -- MinHash + LSH -----------------------------------------------------------

def _minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) — min over shingle ids of (a*x+b) mod p per hash
    function. Shingle id = xxhash64 (deterministic, JVM-side).

    Physical shape: explode shingles -> hash once -> groupBy(id) with
    num_hashes min() aggregates. Shingling runs ONCE per document (a single
    array expression inlined into num_hashes aggregates would be re-evaluated
    num_hashes times by Catalyst's project collapsing); the hash-aggregate's
    map-side combine collapses each doc to one 64-long row before the
    shuffle, so shuffled bytes are O(docs), not O(shingles). Docs with no
    shingles (< n tokens) emit no signature."""
    coeffs = _minhash_coeffs(num_hashes, seed)
    # shingle id bounded to 2^31 so (id * a + b) stays well inside int64
    # (a, b < 2^30); modulus on a Mersenne-like prime keeps uniformity
    ids = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(text_col, n)).alias("s"),
    ).select("id", (F.abs(F.xxhash64("s")) % F.lit(1 << 31)).alias("x"))
    aggs = [
        F.min((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        ids.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Banded LSH: split the signature into `bands` rows-per-band groups,
    bucket-join on (band, hash(band slice)), then estimate similarity from
    full-signature agreement for candidate pairs. O(docs x bands)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, seed).filter(
        F.col("sig").isNotNull()
    )

    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")

    # self-join as sort-merge, NOT broadcast: the two sides are identical
    # plans, so SMJ's two shuffles collapse into one computation via
    # ReusedExchange — a broadcast side would recompute the whole signature
    # pipeline inside a single-threaded broadcast build (and at 10^12 docs
    # the signature table isn't broadcastable anyway)
    a = banded.hint("merge").alias("a")
    b2 = banded.hint("merge").alias("b")
    cands = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.sig").alias("sig1"),
            F.col("b.sig").alias("sig2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig1", "sig2", lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(num_hashes)
    return cands.select(
        "id1", "id2", F.round(est, 6).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= threshold)


# -- SimHash -----------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """63-bit SimHash (sign bit kept clear): per token, xxhash64 -> for each
    bit, +1 if set else -1; sign of the per-bit balance forms the signature.

    Physical shape: explode token hashes once -> groupBy(id) with 63
    conditional-sum aggregates -> assemble the signature from the balances.
    Tokenization runs ONCE per document (63 aggregates over an inline array
    expression would re-tokenize 63 times after Catalyst project collapsing);
    map-side combine collapses each doc to one row pre-shuffle. explode_outer
    keeps zero-token docs (balance 0 -> signature 0, matching an aggregate
    over an empty array)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    h = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.transform(toks, lambda t: F.xxhash64(t))).alias("h"),
    )
    aggs = [
        F.sum(
            F.when(F.col("h").isNull(), 0)
            .when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(63)
    ]
    bal = h.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(63):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bal.select("id", sig.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs at Hamming distance <= max_hamming via the pigeonhole
    block trick: split 64 bits into `blocks` segments; any pair within
    distance < blocks must agree on >=1 segment -> join per segment, verify
    with bit_count(xor). Requires max_hamming < blocks for completeness."""
    sigs = simhash64(df, text_col, id_col)
    seg_bits = 64 // blocks
    segged = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftrightunsigned("simhash", s * seg_bits)
                        .bitwiseAND(F.lit((1 << seg_bits) - 1))
                        .alias("key"),
                    )
                    for s in range(blocks)
                ]
            )
        ).alias("sb"),
    ).select("id", "simhash", "sb.seg", "sb.key")

    # sort-merge self-join for the same ReusedExchange reason as minhash
    a = segged.hint("merge").alias("a")
    b = segged.hint("merge").alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )


# -- Embedding near-dup ------------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold. Blocked on block_col when
    given (turns O(n^2) into sum of per-block squares); at 100 TB the block
    key would be an LSH bucket (see similarity.lsh_buckets)."""
    norm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm.alias("nrm"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(0).alias("blk")] ),
    )
    a = base.alias("a")
    b = base.alias("b")
    dot = F.aggregate(
        F.zip_with("a.vec", "b.vec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
