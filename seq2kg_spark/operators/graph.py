"""Graph analytics over the materialized KG tables.

The reference ships its triples to Neo4j and queries there
(redcoat_parser/build_triples.py:206-214 documents the LOAD CSV block);
in this engine the ``nodes``/``edges`` tables are plain DataFrames, so
the standard graph queries run in Spark itself:

* :func:`degree_topk` — highest-degree entities (the "most connected
  mentions" question) — one hash-agg + top-k, no window over the full
  node set.
* :func:`pagerank_int` — fixed-point integer PageRank.  Like
  :func:`seq2kg_spark.nlp.gru.gru_forward_int`, every arithmetic step
  (integer sums, ``floor`` of a double division of exact-representable
  ints) is bit-reproducible in any engine, so the DuckDB driver oracle
  replays all iterations exactly — float PageRank could only ever be
  rows-only.

Scale shape: each PageRank iteration is one join edges⋈ranks (shuffle on
src — co-partitioned across iterations since the key never changes) and
one aggregation by dst.  ``localCheckpoint`` per iteration truncates the
growing lineage, same as connected_components — at 10^12 edges an
unbounded plan chain is an OOM, not a nicety.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# rank unit: 1.0 == 10^6 — integer micro-ranks.  Damping 0.85 is applied
# as floor(m * 85 / 100.0): exact for |m| < 2^46, far above any real mass.
PR_SCALE = 1_000_000


def degree_topk(edges: DataFrame, k: int = 20,
                src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Top-k nodes by total degree (in + out), deterministic tiebreak.

    One explode → hash-agg (map-side combined) → ``TakeOrderedAndProject``
    via orderBy+limit — never a window over all nodes.
    """
    deg = (
        edges.select(F.explode(F.array(src_col, dst_col)).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    return (
        deg.orderBy(F.desc("degree"), F.asc("node"))
        .limit(k)
    )


def pagerank_int(edges: DataFrame, n_iter: int = 5,
                 src_col: str = "src", dst_col: str = "dst",
                 checkpoint: bool = True) -> DataFrame:
    """Fixed-point integer PageRank: (node, rank) after ``n_iter`` rounds.

    rank_0 = PR_SCALE for every node; each round
    ``rank' = 0.15·PR_SCALE + floor(0.85 · Σ_in floor(rank_src/outdeg))``
    with every division a ``floor`` over a double quotient of
    exact-representable ints — both engines compute the identical IEEE
    double, so results are hash-exact (dangling-node mass is dropped, the
    standard simplification; deterministic either way).
    """
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(PR_SCALE).cast("long"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(PR_SCALE * 15 // 100)
                + F.coalesce(
                    F.floor(F.col("m") * 85 / F.lit(100.0)).cast("long"),
                    F.lit(0),
                )
            ).cast("long").alias("rank"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_topk(edges: DataFrame, k: int = 20, n_iter: int = 5,
                  src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Top-k of :func:`pagerank_int` with deterministic tiebreak."""
    return (
        pagerank_int(edges, n_iter=n_iter, src_col=src_col,
                     dst_col=dst_col)
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(k)
    )
