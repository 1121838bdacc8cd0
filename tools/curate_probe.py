"""Curate-stage superlinearity probe (round-7 follow-up to the 10M e2e).

The 10M run showed curate at 489 s vs 194 s at 5M (2.52x wall for 2x
rows, consistent across three attempts while steal varied) — the only
stage off the linear curve.  Suspect: the dynamic-partition parquet
write.  With ``spark.sql.maxConcurrentOutputFileWriters`` at its default
0, Spark's FileFormatWriter SORTS every write task's rows by the
partition column (bucket) before writing, an extra O(n log n) pass plus
a full UnsafeExternalSorter materialization of the curated text — per
task, on top of the join sort the stage already paid.

This probe runs curate ONLY (same stage_fn the pipeline uses, same
lineage write path) on an existing pages corpus, A/B over
``maxConcurrentOutputFileWriters`` in {0, 40}, and prints per-leg wall
plus the write-job task-time breakdown from the UI REST API.

Usage: python tools/curate_probe.py <pages_parquet> <n_rows_label> [writers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ui_json(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def run_leg(pages_path: str, writers: int, cpus: int) -> dict:
    """One curate-only leg in a FRESH SparkSession (conf is session-wide)."""
    from seq2kg_spark.operators.lineage import run_stage_checkpointed
    from seq2kg_spark.plans.pipeline import curate_stage_fn
    from seq2kg_spark.session import get_spark
    from seq2kg_spark.sources.pages import read_pages

    wd = f"/tmp/curate_probe_w{writers}"
    shutil.rmtree(wd, ignore_errors=True)
    spark = get_spark(
        f"curate-probe-w{writers}", cpus=cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.maxConcurrentOutputFileWriters": str(writers),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = read_pages(spark, pages_path)
    t0 = time.monotonic()
    run_stage_checkpointed(
        pages, curate_stage_fn(pages, n_buckets=32), stage="curate",
        out_path=os.path.join(wd, "curated"),
        lineage_path=os.path.join(wd, "lineage"),
        key_col="url", n_buckets=32, wave_size=None,
    )
    wall = time.monotonic() - t0
    n_out = spark.read.parquet(os.path.join(wd, "curated")).count()
    # order-free content hash so the A/B legs can be compared bit-for-bit
    from pyspark.sql import functions as F
    cur = spark.read.parquet(os.path.join(wd, "curated"))
    fp = cur.select(F.xxhash64(*[F.col(c) for c in sorted(cur.columns)])
                    .alias("h")).agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(h)").alias("x")).collect()[0]
    # biggest stages by task time for the attribution story
    app = _ui_json(spark, "applications")[0]["id"]
    stages = _ui_json(spark, f"applications/{app}/stages?status=complete")
    top = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:4]
    stage_rows = [
        {"stage": s["stageId"], "name": s["name"].split("\n")[0][:60],
         "task_time_s": round(s["executorRunTime"] / 1000, 1),
         "tasks": s["numCompleteTasks"],
         "spill_mb": round(s.get("memoryBytesSpilled", 0) / 2**20, 1)}
        for s in top
    ]
    spark.stop()
    return {"writers": writers, "wall_s": round(wall, 1), "rows": n_out,
            "fingerprint": [fp["n"], fp["x"]], "top_stages": stage_rows}


def main() -> None:
    pages_path = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else "?"
    writer_settings = [int(w) for w in sys.argv[3:]] or [0, 40]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    legs = [run_leg(pages_path, w, cpus) for w in writer_settings]
    fps = {tuple(l["fingerprint"]) for l in legs}
    print(json.dumps({"corpus": pages_path, "n_rows": label,
                      "identical_output": len(fps) == 1, "legs": legs}))


if __name__ == "__main__":
    main()
