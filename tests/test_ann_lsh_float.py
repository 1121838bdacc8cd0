"""Float sign-LSH on the broadcast-matmul path (round-4 de-literalization).

The plan-literal expression tree (n_tables·n_bits planes × dim literals +
one aggregate(zip_with) per plane) was replaced by the same broadcast-numpy
Arrow matmul `lsh_topk_int` uses.  These tests pin:

1. row-identical output vs the former literal implementation (kept here,
   verbatim, as the equality reference) on the sf0.01 embeddings;
2. the new plan carries ArrowEvalPython and no per-plane literal arrays;
3. production dims work (dim=768, n_tables=8) — the literal version would
   compile ~25k literals into the plan there.
"""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from seq2kg_spark.operators.ann import (
    _hyperplane,
    float_cosine,
    float_hyperplanes,
    ivf_topk,
    kmeans_centroids,
    lsh_bucketed_topk,
)

SF001_EMB = "/root/testdata/sf0.01/embeddings.parquet"


def _lsh_bucketed_topk_literal(emb, query_ids, k=5, dim=64, n_bits=8,
                               n_tables=4, seed=42):
    """The pre-round-4 implementation (plan-literal hyperplanes), kept as
    the equality reference for the broadcast rewrite."""
    def bucket_expr(vec):
        tables = []
        for t in range(n_tables):
            bits = []
            for b in range(n_bits):
                plane = _hyperplane(seed, dim, t, b)
                dot = F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(p) for p in plane]),
                               lambda x, y: x.cast("double") * y),
                    F.lit(0.0), lambda acc, v: acc + v)
                bits.append(F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
            code = bits[0]
            for x in bits[1:]:
                code = code + x
            tables.append(F.struct(F.lit(t).alias("t"), code.alias("code")))
        return F.array(*tables)

    base = emb.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("v"),
        F.explode(bucket_expr(F.col("embedding"))).alias("bk"),
    ).select("vid", "v", F.col("bk.t").alias("t"),
             F.col("bk.code").alias("code"))
    q = base.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"), "t", "code")
    cands = (
        F.broadcast(q).join(base, ["t", "code"])
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", "qv", F.col("vid").alias("neighbor_id"),
                F.col("v").alias("cv"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", float_cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cosine", 4).alias("cosine"))
    )


def test_broadcast_matches_literal_on_sf001(spark):
    emb = spark.read.parquet(SF001_EMB)
    qids = list(range(10))
    new = sorted(map(tuple, lsh_bucketed_topk(emb, qids, k=5).collect()))
    old = sorted(map(tuple, _lsh_bucketed_topk_literal(emb, qids, k=5)
                     .collect()))
    assert new == old and len(new) > 0


def test_plan_is_arrow_not_literals(spark):
    emb = spark.read.parquet(SF001_EMB)
    plan = lsh_bucketed_topk(emb, [0, 1], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan
    # the literal version inlined one float array per hyperplane into the
    # plan (hundreds of "0.xxx" literals).  aggregate(zip_with ...) does
    # legitimately appear — it's the JVM-side cosine of the scoring stage —
    # so the literal-count guard is asserted unconditionally instead of
    # being OR-ed behind it (the OR made it vacuous).
    assert plan.count("0.") < 100


def test_production_dims(spark):
    rng = [(i, [float(_hyperplane(9, 768, i, 0)[j]) for j in range(768)])
           for i in range(24)]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    out = lsh_bucketed_topk(emb, query_ids=[0, 1], k=3, dim=768,
                            n_bits=8, n_tables=8)
    rows = out.collect()
    assert all(r.rank <= 3 for r in rows)
    assert {r.query_id for r in rows} <= {0, 1}


def test_float_hyperplanes_shape():
    P = float_hyperplanes(3, 4, 16, seed=1)
    assert P.shape == (12, 16) and P.dtype == np.float64
    # row t*n_bits+b must equal plane (t, b)
    assert P[1 * 4 + 2].tolist() == pytest.approx(_hyperplane(1, 16, 1, 2))


def test_ivf_precomputed_codebook(spark):
    emb = spark.read.parquet(SF001_EMB)
    cents = kmeans_centroids(emb, k=8)  # same defaults the inline fit uses
    inline = sorted(map(tuple, ivf_topk(emb, [0, 1, 2], k=5, n_cells=8)
                        .collect()))
    precomp = sorted(map(tuple, ivf_topk(emb, [0, 1, 2], k=5,
                                         codebook=cents).collect()))
    assert inline == precomp and len(precomp) > 0
