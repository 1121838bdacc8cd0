"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact top-k by quantized-integer dot product.
  Quantization (round(x*1000) → int64) makes the arithmetic exact, so
  ranking is deterministic across engines (the DuckDB oracle matches
  bit-for-bit) and across partitionings.  The join is
  queries × corpus — fine when the query set is small (broadcast) —
  ranking via a window, ties broken by vec_id.

* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH buckets
  (signs of dot with seeded deterministic hyperplanes), candidates only
  within bucket (multi-probe via n_tables), then exact re-rank.  At 10^9
  vectors the bucket join replaces the full cross product; recall is
  tunable with n_bits/n_tables.

* true-cosine variants keep float math JVM-side via aggregate/zip_with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantized(vec_col, quant: int = 1000):
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * quant, 0).cast("long")
    )


def int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def float_cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    quant: int = 1000,
) -> DataFrame:
    """(query_id, rank, neighbor_id, dot) — exact top-k, integer math."""
    q = emb.select(
        F.col(id_col).alias("query_id"),
        quantized(F.col(vec_col), quant).alias("qv"),
    )
    if query_ids is not None:
        q = q.where(F.col("query_id").isin(query_ids))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        quantized(F.col(vec_col), quant).alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", int_dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


def _hyperplane(seed: int, dim: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (splitmix-style, no RNG dep)."""
    out = []
    x = (seed * 0x9E3779B97F4A7C15 + table * 0xBF58476D1CE4E5B9
         + bit * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    for i in range(dim):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        v = ((x >> 33) & 0xFFFF) / 32768.0 - 1.0
        out.append(v)
    return out


def lsh_bucketed_topk(
    emb: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, exact re-rank in-bucket.

    The hyperplanes are deterministic literals compiled into the plan
    (broadcast by value); the bucket id is a pure Column expression, so the
    whole thing is three narrow projections + one equi-join.
    """
    def bucket_expr(vec):
        tables = []
        for t in range(n_tables):
            bits = []
            for b in range(n_bits):
                plane = _hyperplane(seed, dim, t, b)
                dot = F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(p) for p in plane]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                bits.append(F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
            code = bits[0]
            for x in bits[1:]:
                code = code + x
            tables.append(F.struct(F.lit(t).alias("t"), code.alias("code")))
        return F.array(*tables)

    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.explode(bucket_expr(F.col(vec_col))).alias("bk"),
    ).select("vid", "v", F.col("bk.t").alias("t"), F.col("bk.code").alias("code"))

    q = base.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"), "t", "code"
    )
    cands = (
        F.broadcast(q)
        .join(base, ["t", "code"])
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", "qv", F.col("vid").alias("neighbor_id"),
                F.col("v").alias("cv"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", float_cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cosine", 4).alias("cosine"))
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[float]]:
    """Deterministic Lloyd's iterations, DataFrame-native.

    Seeds = the k vectors with the smallest ids (deterministic, no RNG).
    Each iteration: assign via argmin over broadcast centroid literals
    (pure Column expressions), then average per cluster — one shuffle per
    iteration.  Returns plain Python lists (the coarse quantizer is tiny
    and rides in closures).
    """
    seeds = (
        emb.orderBy(F.col(id_col).asc()).limit(k)
        .select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in seeds]
    for _ in range(n_iter):
        assigned = emb.select(
            F.col(vec_col).alias("v"),
            _nearest_centroid_expr(F.col(vec_col), centroids).alias("c"),
        )
        sums = assigned.select(
            "c", *[F.col("v")[i].cast("double").alias(f"x{i}")
                   for i in range(dim)]
        ).groupBy("c").agg(
            F.count("*").alias("n"),
            *[F.sum(f"x{i}").alias(f"s{i}") for i in range(dim)],
        ).collect()
        new = list(centroids)
        for r in sums:
            if r["n"] > 0:
                new[r["c"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        centroids = new
    return centroids


def _nearest_centroid_expr(vec, centroids: list[list[float]]):
    """argmin_c ||v - c||² as a Column expression (broadcast-by-literal)."""
    best_ix = F.lit(0)
    best_d = None
    for ix, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec, carr,
                       lambda a, b: (a.cast("double") - b)
                       * (a.cast("double") - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        if best_d is None:
            best_d = d
            best_ix = F.lit(ix)
        else:
            best_ix = F.when(d < best_d, F.lit(ix)).otherwise(best_ix)
            best_d = F.least(d, best_d)
    return best_ix


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF approximate top-k: coarse k-means cells, probe the n_probe
    nearest cells per query, exact cosine re-rank inside probed cells.

    At 10^9 vectors the cell assignment is a narrow projection and the
    search touches n_probe/n_cells of the corpus; centroids broadcast as
    plan literals.
    """
    cents = kmeans_centroids(emb, k=n_cells, id_col=id_col, vec_col=vec_col,
                             dim=dim)
    base = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
        _nearest_centroid_expr(F.col(vec_col), cents).alias("cell"),
    )

    # per-query probe cells: distances to all centroids, take n_probe best
    def probe_cells_expr(vec):
        pairs = []
        for ix, c in enumerate(cents):
            carr = F.array(*[F.lit(float(x)) for x in c])
            d = F.aggregate(
                F.zip_with(vec, carr,
                           lambda a, b: (a.cast("double") - b)
                           * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            pairs.append(F.struct(d.alias("d"), F.lit(ix).alias("ix")))
        arr = F.array_sort(F.array(*pairs))
        return F.transform(F.slice(arr, 1, n_probe), lambda s: s["ix"])

    q = (
        base.where(F.col("vid").isin(query_ids))
        .select(F.col("vid").alias("query_id"), F.col("v").alias("qv"),
                F.explode(probe_cells_expr(F.col("v"))).alias("cell"))
    )
    cands = (
        F.broadcast(q).join(base, "cell")
        .where(F.col("vid") != F.col("query_id"))
        .dropDuplicates(["query_id", "vid"])
        .withColumn("cosine", float_cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vid"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias("neighbor_id"),
                F.round("cosine", 4).alias("cosine"))
    )


def fixed_codebook(n_cells: int = 8, dim: int = 64, seed: int = 7,
                   quant: int = 1000) -> list[list[int]]:
    """Deterministic integer coarse-quantizer codebook (offline-trained
    codebooks are broadcast like this in production IVF; here the cells are
    seeded hyperplanes scaled to the same integer grid as ``quantized``)."""
    return [[int(round(x * quant)) for x in _hyperplane(seed, dim, c, 0)]
            for c in range(n_cells)]


def ivf_topk_int(
    emb: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
    n_cells: int = 8,
    dim: int = 64,
    quant: int = 1000,
) -> DataFrame:
    """IVF top-k over a FIXED integer codebook with quantized-int re-rank —
    every arithmetic step is exact 64-bit integer math, so a DuckDB oracle
    can reproduce it bit-for-bit (unlike the float-cosine k-means variant).

    Same scale shape as :func:`ivf_topk`: cell assignment is a narrow
    projection over plan-literal centroids, the probe touches
    n_probe/n_cells of the corpus, re-rank is in-cell only.
    """
    cents = fixed_codebook(n_cells=n_cells, dim=dim, quant=quant)

    def dist_structs(qv):
        pairs = []
        for ix, c in enumerate(cents):
            carr = F.array(*[F.lit(v).cast("long") for v in c])
            d = F.aggregate(
                F.zip_with(qv, carr, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            )
            pairs.append(F.struct(d.alias("d"), F.lit(ix).alias("ix")))
        return F.array_sort(F.array(*pairs))

    base = emb.select(
        F.col(id_col).alias("vid"), quantized(F.col(vec_col), quant).alias("qv")
    ).withColumn("cell", dist_structs(F.col("qv"))[0]["ix"])

    q = (
        base.where(F.col("vid").isin(query_ids))
        .select(F.col("vid").alias("query_id"), F.col("qv").alias("qq"),
                F.explode(
                    F.transform(F.slice(dist_structs(F.col("qv")), 1, n_probe),
                                lambda s: s["ix"])).alias("cell"))
    )
    cands = (
        F.broadcast(q).join(base, "cell")
        .where(F.col("vid") != F.col("query_id"))
        .dropDuplicates(["query_id", "vid"])
        .withColumn("dot", int_dot(F.col("qq"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vid"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias("neighbor_id"), "dot")
    )
