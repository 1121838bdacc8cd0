"""Scale proof: run the full KG pipeline end-to-end on a big corpus.

Usage:
    python tools/scale_proof.py build <n_rows> [path]     # materialize corpus
    python tools/scale_proof.py run <pages_parquet> <workdir> [n_buckets]

``run`` executes curate -> extract -> canonicalize via
``run_kg_pipeline`` on local[$SPARK_GRAFT_CPUS] (default 32) and prints a
one-line JSON report: per-stage wall, CC rounds + distinct mentions at the
canonicalize stage, output counts, and peak/total shuffle bytes pulled
from the Spark UI REST API.  Rerunning ``run`` on the same workdir after a
kill exercises bucket-grain resume (skipped buckets show up in the
report) — the driver for VERDICT r4 ask #2.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shuffle_metrics(spark) -> dict:
    """Peak per-stage and total shuffle write bytes from the UI REST API."""
    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return {}
        apps = json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30))
        writes = [s.get("shuffleWriteBytes", 0) for s in stages]
        spills = [s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
                  for s in stages]
        top_spill = sorted(
            ({"stage": s["stageId"],
              "name": s["name"].split("\n")[0][:60],
              "spill_mb": round((s.get("memoryBytesSpilled", 0)
                                 + s.get("diskBytesSpilled", 0)) / 2**20, 1)}
             for s in stages),
            key=lambda r: -r["spill_mb"])[:3]
        return {
            "peak_stage_shuffle_write_mb": round(max(writes, default=0) / 2**20, 1),
            "total_shuffle_write_mb": round(sum(writes) / 2**20, 1),
            "total_spill_mb": round(sum(spills) / 2**20, 1),
            "top_spill_stages": [r for r in top_spill if r["spill_mb"] > 0],
            "n_stages": len(stages),
        }
    except Exception as exc:  # telemetry only — never fail the run
        return {"metrics_error": str(exc)}


def main() -> None:
    mode = sys.argv[1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from seq2kg_spark.session import get_spark
    # UI on: the REST API under uiWebUrl is where shuffle/spill telemetry
    # comes from (get_spark disables it by default for test speed)
    spark = get_spark("scale-proof", cpus=int(cpus),
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.showConsoleProgress": "false"})

    if mode == "build":
        n_rows = int(sys.argv[2])
        path = sys.argv[3] if len(sys.argv) > 3 else None
        from seq2kg_spark.sources.pages import ensure_pages_parquet_distributed
        t0 = time.monotonic()
        out = ensure_pages_parquet_distributed(spark, n_rows, path=path)
        print(json.dumps({"corpus": out, "rows": n_rows,
                          "build_s": round(time.monotonic() - t0, 1)}))
    elif mode == "run":
        pages_path, workdir = sys.argv[2], sys.argv[3]
        n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        extractor = sys.argv[5] if len(sys.argv) > 5 else "rule"
        # extract crash grain: an int wave size, or "none" for the
        # single-job fast path (pipeline default: waves of 4)
        wave = sys.argv[6] if len(sys.argv) > 6 else "4"
        wave_size = None if wave.lower() == "none" else int(wave)
        from seq2kg_spark.plans.pipeline import run_kg_pipeline
        from seq2kg_spark.sources.pages import read_pages

        pages = read_pages(spark, pages_path)
        t0 = time.monotonic()
        report = run_kg_pipeline(pages, workdir, n_buckets=n_buckets,
                                 extractor=extractor,
                                 extract_wave_size=wave_size)
        wall = time.monotonic() - t0
        counts = {
            name: spark.read.parquet(report["paths"][name]).count()
            for name in ("curated", "triples", "nodes", "edges")
        }
        # per-stage wall from lineage: job_wall_ms is shared by every
        # bucket row of one committed job (a wave, or the whole stage on
        # the single-job path) — sum one value per (stage, run, commit)
        from pyspark.sql import functions as F
        lin = spark.read.parquet(report["paths"]["lineage"])
        stage_walls = {
            r["stage"]: round(r["wall_s"], 1)
            for r in lin.select("stage", "run_id", "committed_at",
                                "job_wall_ms").distinct()
            .groupBy("stage").agg(
                (F.sum("job_wall_ms") / 1000.0).alias("wall_s")).collect()
        }
        out = {
            "wall_s": round(wall, 1),
            "cpus": int(cpus),
            "n_buckets": n_buckets,
            "extractor": extractor,
            "curate": {k: (len(v) if isinstance(v, list) else v)
                       for k, v in report["curate"].items() if k != "run_id"},
            "extract": {k: (len(v) if isinstance(v, list) else v)
                        for k, v in report["extract"].items() if k != "run_id"},
            "canonical": report["canonical"],
            "stage_walls_s": stage_walls,
            "counts": counts,
            "shuffle": _shuffle_metrics(spark),
        }
        print(json.dumps(out))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()


if __name__ == "__main__":
    main()
