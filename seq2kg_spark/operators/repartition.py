"""Salted, size-bucketed repartition — the skew defense for NLP inference.

Web documents are log-normal in length with heavy outliers; a plain hash
repartition by url gives some tasks 10× the token count of others and the
stage runs at straggler speed.  The north-star design (SURVEY.md §4.1):

* bucket documents by length decile (``width_bucket``-style on a log scale),
* salt within each bucket with a deterministic hash of the key,
* repartition on (bucket, salt) so every task draws a near-uniform mix of
  document sizes.

At 100 TB this is the difference between a stage bounded by mean task time
and one bounded by the largest document in the corpus.  Deterministic: no
``rand()`` — the salt derives from ``xxhash64(key)``, so reruns and resumes
place every row identically (required for lineage/resume).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_size_repartition(
    df: DataFrame,
    size_col: Column | str,
    key_col: Column | str = "url",
    num_partitions: int | None = None,
    salt_buckets: int = 64,
    size_buckets: int = 8,
) -> DataFrame:
    """Repartition so each task gets a balanced mix of document sizes.

    ``size_col`` is any monotone size proxy (``length(text)`` is fine —
    token count correlates).  Rows land in ``log2``-ish size buckets; the
    shuffle key is (size_bucket, xxhash64(key) % salt_buckets), spreading
    each size class across ``salt_buckets`` tasks.

    The partition count is always PINNED (``repartition(N, cols)`` carries
    the REPARTITION_BY_NUM shuffle origin, which AQE must preserve).  A
    column-only ``repartition(cols)`` is AQE-coalescable, and AQE's byte
    heuristic (~64 MB targets) starves the CPU-bound mapInPandas stage this
    exchange feeds: extraction costs ~100 CPU-ms per KB of text, so a few
    tens of MB of compressed prose is hours of Python work — measured at
    10 M pages, byte-coalescing left a 32-core box running 13 tasks
    (0.263 ms/page vs 0.141 at 5 M where more bytes masked it).  Default N =
    max(spark.sql.shuffle.partitions, 2 × defaultParallelism): a multiple of
    total cores, never a function of bytes.
    """
    size_c = F.col(size_col) if isinstance(size_col, str) else size_col
    key_c = F.col(key_col) if isinstance(key_col, str) else key_col
    bucket = F.least(
        F.lit(size_buckets - 1),
        F.floor(F.log2(F.greatest(size_c.cast("double"), F.lit(1.0)))),
    ).alias("__size_bucket")
    salt = F.pmod(F.xxhash64(key_c), F.lit(salt_buckets)).alias("__salt")
    out = df.withColumns({"__size_bucket": bucket, "__salt": salt})
    if not num_partitions:
        spark = df.sparkSession
        num_partitions = max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
            2 * spark.sparkContext.defaultParallelism,
        )
    out = out.repartition(num_partitions, "__size_bucket", "__salt")
    return out.drop("__size_bucket", "__salt")
