"""Link-graph operators for web-crawl curation — the host-level quality
signals a 10^12-document crawl pipeline derives from its own link
structure (the `extract_links` output of the HTML family feeds this).

`pagerank` is the classic damped power iteration expressed as DataFrame
joins (no RDDs, no GraphX dependency): each iteration is

    contribs = edges ⋈ ranks ⋈ outdeg  →  groupBy(dst).sum(rank/out)
    ranks'   = (1-d)/N + d * contribs   (left join back onto the node set)

Scale design (the point at web scale):
  * ONE rank-sized shuffle per iteration (the groupBy on dst); the edge ⋈
    rank join co-partitions on src. On a production graph the edge table
    is written bucketed by src so that join is shuffle-free and only the
    contribution aggregation moves data.
  * Iteration state is truncated with an EAGER localCheckpoint every
    round (the round-2 lesson: Catalyst has no CTE sharing, so without it
    iteration k re-derives all k-1 predecessors — exponential plan blowup
    is the classic PageRank-on-DataFrames failure mode). Edges, degrees,
    and the node set are checkpointed ONCE and reused by every iteration.
  * No driver-side collect anywhere: the node count N rides the plan as a
    broadcast 1-row aggregate, so the same code runs when N itself is too
    large to care about.
  * Dangling nodes (no outlinks) leak their damped mass — the standard
    simplification of the public Spark/Pregel formulations; ranks remain
    a fixed deterministic function of the graph, which is what the
    cross-engine oracle checks (3 unrolled iterations in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def khop_reachable(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
) -> DataFrame:
    """(node, hops) — every node reachable from the seed set within k
    hops, with the MINIMUM hop count at which it is first reached (seeds
    themselves are hops 0). The crawl-frontier expansion step of a
    focused-crawl / link-spam-neighborhood pipeline.

    Frontier BFS, not k self-joins: each round joins only the NEWLY
    reached frontier against the edge table (the standard optimization —
    joining the full visited set re-derives known nodes), then anti-joins
    the visited set, so per-round work is proportional to the frontier,
    never to hops × graph. Edges are checkpointed once and each round's
    frontier once (both have multiple consumers); the visited set is a
    lazy union OVER those checkpoints, so no extra materialization job
    per round and lineage depth stays O(1) regardless of k.
    Early-exits when the frontier empties — the probe is one scalar read
    of an already-checkpointed frame, not a plan re-derivation."""
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # the only frames worth materializing are the ones consumed more than
    # once: the edge set (k joins) and each round's frontier (expand +
    # emptiness probe + final union). `visited` is a lazy union of
    # already-checkpointed rounds — checkpointing it too would add a
    # whole materialization job per round for no lineage benefit.
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .coalesce(1)
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    rounds = [frontier]
    for depth in range(1, k + 1):
        visited = rounds[0]
        for r in rounds[1:]:
            visited = visited.unionByName(r)
        nxt = (
            e.join(frontier.select(F.col("node").alias("_s")), "_s")
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        rounds.append(nxt)
        frontier = nxt
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after `iters` damped power iterations over the
    de-duplicated, self-loop-free edge set. rank is rounded to 6 dp (the
    cross-engine float-parity convention)."""
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .where(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    # N rides the plan as a broadcast single-row aggregate — no collect
    nodes = nodes.crossJoin(
        F.broadcast(nodes.agg(F.count("*").cast("double").alias("_N")))
    ).localCheckpoint(eager=True)
    outdeg = (
        e.groupBy(F.col("_s").alias("node"))
        .agg(F.count("*").cast("double").alias("_out"))
        .localCheckpoint(eager=True)
    )

    ranks = nodes.select(
        "node", "_N", (F.lit(1.0) / F.col("_N")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            e.join(
                ranks.select(F.col("node").alias("_s"), "rank"), "_s"
            )
            .join(outdeg.select(F.col("node").alias("_s"), "_out"), "_s")
            .select(
                F.col("_d").alias("node"),
                (F.col("rank") / F.col("_out")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                "_N",
                (
                    (1.0 - damping) / F.col("_N")
                    + damping * F.coalesce("_contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
