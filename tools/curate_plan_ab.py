"""Curate-plan shootout (round-7 follow-up to the 10M e2e superlinearity).

Three formulations of the same min-url-per-md5 curation semantics, ABBA
order so box drift (hypervisor steal) cancels instead of deciding:

* ``join``    — the pre-round-7 keeper-table plan: gate the corpus twice
                (once for the keeper groupBy, once for the output side)
                and equi-join the two corpus-sized relations on md5.
* ``window``  — one gate pass, row_number window over md5(text).
* ``barrier`` — lang gate (cheap column pushdown) → project the html→text
                decode ONCE → shuffle on md5(text) → window picks the
                winner → quality gate ABOVE the window.  Filters do not
                push through a Window on non-partition columns, so the
                expensive quality_label runs on materialized text of the
                winner rows only — never re-inlining the decode chain.
                (FilterExec does no subexpression elimination across its
                predicate splits, so a quality filter below the project
                re-evaluates the 25-step decode per reference.)

Identical output is asserted via an order-free (count, bit_xor) content
fingerprint.  Per-leg /proc/stat steal is reported so a co-tenancy burst
is visible instead of silently deciding the winner.

Usage: python tools/curate_plan_ab.py <pages_parquet> [plans...]
       (default: join window barrier window join — ABBA + center point)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 32


def _steal_sec() -> float:
    with open("/proc/stat") as f:
        ticks = int(f.readline().split()[8])
    return ticks / os.sysconf("SC_CLK_TCK")


def _gate_exprs():
    from pyspark.sql import functions as F

    from seq2kg_spark.functions import text_stats as TS
    from seq2kg_spark.functions.html_text import (decode_html_expr,
                                                  html_to_text_expr)

    text = F.coalesce(
        F.col("text"), html_to_text_expr(decode_html_expr(F.col("html"))))
    return text, TS.quality_label


def plan_join(pages):
    """Pre-round-7 formulation: keeper groupBy + corpus×corpus equi-join."""
    from pyspark.sql import functions as F

    text_expr, quality_label = _gate_exprs()

    def gate(df):
        df = df.withColumn("text", text_expr)
        return df.where((F.col("lang") == "en")
                        & (quality_label(F.col("text")) == "ok"))

    from seq2kg_spark.operators.lineage import with_bucket
    bucketed = with_bucket(pages, "url", N_BUCKETS)
    keep = gate(pages).groupBy(F.md5("text").alias("_h")).agg(
        F.min("url").alias("_keep_url"))
    g = gate(bucketed).withColumn("_h", F.md5("text"))
    return (g.join(keep, "_h")
            .where(F.col("url") == F.col("_keep_url"))
            .drop("_h", "_keep_url"))


def plan_window(pages):
    """Superseded intermediate: one gate pass, window BELOW the quality
    gate (inline replica — the pipeline now uses the barrier plan)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from seq2kg_spark.operators.lineage import with_bucket

    text_expr, quality_label = _gate_exprs()
    g = (
        with_bucket(pages, "url", N_BUCKETS)
        .withColumn("text", text_expr)
        .where((F.col("lang") == "en")
               & (quality_label(F.col("text")) == "ok"))
        .withColumn("_h", F.md5("text"))
    )
    w = Window.partitionBy("_h").orderBy("url")
    return (g.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn", "_h"))


def plan_barrier(pages):
    """The live pipeline plan (plans/pipeline.py:curate_stage_fn):
    decode-once, quality gate above the window barrier."""
    from seq2kg_spark.operators.lineage import with_bucket
    from seq2kg_spark.plans.pipeline import curate_stage_fn

    bucketed = with_bucket(pages, "url", N_BUCKETS)
    return curate_stage_fn(pages, n_buckets=N_BUCKETS)(bucketed)


PLANS = {"join": plan_join, "window": plan_window, "barrier": plan_barrier}


def run_leg(pages_path: str, plan: str, cpus: int, idx: int) -> dict:
    from pyspark.sql import functions as F

    from seq2kg_spark.session import get_spark
    from seq2kg_spark.sources.pages import read_pages

    out_dir = f"/tmp/curate_ab_{idx}_{plan}"
    shutil.rmtree(out_dir, ignore_errors=True)
    spark = get_spark(f"curate-ab-{plan}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = read_pages(spark, pages_path)
    s0, t0 = _steal_sec(), time.monotonic()
    PLANS[plan](pages).write.mode("overwrite").partitionBy(
        "bucket").parquet(out_dir)
    wall = time.monotonic() - t0
    steal = _steal_sec() - s0
    cur = spark.read.parquet(out_dir)
    fp = cur.select(F.xxhash64(*[F.col(c) for c in sorted(cur.columns)])
                    .alias("h")).agg(
        F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")).collect()[0]
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"plan": plan, "wall_s": round(wall, 1),
            "steal_s": round(steal, 1), "rows": fp["n"],
            "fingerprint": [fp["n"], fp["x"]]}


def main() -> None:
    pages_path = sys.argv[1]
    order = sys.argv[2:] or ["join", "window", "barrier", "window", "join"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    legs = [run_leg(pages_path, p, cpus, i) for i, p in enumerate(order)]
    fps = {tuple(l["fingerprint"]) for l in legs}
    best = {}
    for l in legs:
        best.setdefault(l["plan"], []).append(l["wall_s"])
    print(json.dumps({
        "corpus": pages_path, "identical_output": len(fps) == 1,
        "min_wall_by_plan": {p: min(w) for p, w in best.items()},
        "legs": legs,
    }))


if __name__ == "__main__":
    main()
