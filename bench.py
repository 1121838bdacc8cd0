"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE json
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline mix = the KG pipeline (NLP mapInPandas, the throughput-critical
stage) + the relational/ dedup/ ANN operators using their *scale* variants
(xxhash64 MinHash, 64-bit SimHash) rather than the md5 oracle-parity
variants.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as E
    from seq2kg_spark.operators.ann import brute_force_topk
    from seq2kg_spark.operators.dedup import minhash_lsh_pairs, simhash64
    from seq2kg_spark.session import get_spark

    spark = get_spark("seq2kg-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Extraction is benched on the FIXED prose corpus (reference eval docs +
    # seeded verb-bearing synthetic prose, log-normal skew), NOT the sf
    # documents table: that table is verbless word salad by construction, so
    # its triple yield collapses under agreement rules and the bench silently
    # measured a 6x different output volume r1->r2.  The corpus is seeded and
    # scales with sf, so rows/docs-per-sec are exactly reproducible
    # round-over-round at the same sf.
    n_pages = max(300, int(50_000 * sf))
    from seq2kg_spark.packaging import ship_package
    from seq2kg_spark.sources.pages import ensure_pages_parquet

    ship_package(spark)
    # materialize OUTSIDE the timed section (cached across runs)
    pages_path = ensure_pages_parquet(spark, n_rows=n_pages)
    # one-time codebook sink write (the offline-training analog) happens in
    # setup — the timed ann_ivf_int below measures read+broadcast+probe only
    E.ensure_ivf_codebook(spark)

    def kg_extract(s, d):
        from seq2kg_spark.operators.extract import extract_triples

        return extract_triples(s.read.parquet(pages_path),
                               num_partitions=max(16, cpus))

    def neural_extract(s, d):
        from seq2kg_spark.operators.tagger_infer import neural_extract_triples

        return neural_extract_triples(s.read.parquet(pages_path),
                                      num_partitions=max(16, cpus))

    def minhash_scale(s, d):
        return minhash_lsh_pairs(
            E._t(s, d, "documents"), n_bands=8, threshold=0.002,
            hash_fn="xxhash64",
        )

    def simhash_scale(s, d):
        return simhash64(E._t(s, d, "documents"))

    def ann_scale(s, d):
        return brute_force_topk(
            E._t(s, d, "embeddings"), query_ids=list(range(20)), k=10
        )

    bench_queries = {
        "kg_extract_triples": kg_extract,
        "kg_filter_battery": E.q_kg_filter_battery,
        "q1_pricing_summary": E.q_q1_pricing_summary,
        "q3_top_revenue": E.q_q3_top_revenue,
        "topk_orders_per_customer": E.q_topk_orders_per_customer,
        "collect_parts_per_order": E.q_collect_parts_per_order,
        "events_hourly": E.q_events_hourly,
        "dedup_minhash_lsh_xx64": minhash_scale,
        "dedup_simhash64": simhash_scale,
        "ann_topk": ann_scale,
        "text_quality": E.q_text_quality,
        "fingerprint": E.q_fingerprint,
    }
    # round-2+ additions, timed separately so the headline total stays
    # comparable round-over-round
    extra_queries = {
        "ann_ivf_int": E.q_ann_ivf_int,
        # float IVF variant (consolidated out of the driver registry in
        # round 7 — anchored by ann_ivf_int; still timed here)
        "ann_ivf_topk": E.q_ann_ivf_topk,
        "kg_m4_decode": E.q_kg_m4_decode,
        "lsh_topk_int": E.q_lsh_topk_int,
        "streaming_sessions": E.q_streaming_sessions,
        # round-4 additions
        "sessions_batch": E.q_sessions_batch,
        "window_counts_batch": E.q_window_counts_batch,
        "media_features_int": E.q_media_features_int,
        "clean_text_unicode": E.q_clean_text_unicode,
        "lsh_bucketed_topk": E.q_lsh_bucketed_topk,
        # round-5: stage-0 boilerplate extraction (pure Catalyst regex
        # chain over synthesized page HTML — the html_extract oracle query)
        "html_extract": E.q_html_extract,
        # round-5: the neural (F1->M5) path on the same prose corpus —
        # tokenize + hash-encode + BiGRU + decode through the salted
        # repartition, weights broadcast once.  Cold first, then warm
        # (same cold-start decomposition as rule-based extraction).
        "kg_neural_triples": neural_extract,
        "kg_neural_warm": neural_extract,
        # steady-state extraction: the headline kg_extract_triples is the
        # session's FIRST job and absorbs every cold-start cost (JVM JIT,
        # Arrow init, python-worker fork, package-zip broadcast); this
        # second, warm run is the per-executor throughput a long-running
        # cluster actually sustains (the north-rule docs/sec figure)
        "kg_extract_warm": kg_extract,
    }

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    total = 0.0
    for name, fn in bench_queries.items():
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        rows[name] = n
        total += dt
    extra_timings: dict[str, float] = {}
    for name, fn in extra_queries.items():
        t0 = time.monotonic()
        rows[name] = fn(spark, sf_dir).count()
        extra_timings[name] = round(time.monotonic() - t0, 3)

    extract_dps = round(n_pages / timings["kg_extract_triples"], 2)
    extract_dps_warm = round(n_pages / extra_timings["kg_extract_warm"], 2)
    neural_dps = round(n_pages / extra_timings["kg_neural_triples"], 2)
    neural_dps_warm = round(n_pages / extra_timings["kg_neural_warm"], 2)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "cpus": cpus,
                    "rows": rows,
                    "kg_extract_docs_per_sec": extract_dps,
                    "kg_extract_docs_per_sec_warm": extract_dps_warm,
                    "kg_neural_docs_per_sec": neural_dps,
                    "kg_neural_docs_per_sec_warm": neural_dps_warm,
                    "kg_extract_corpus": f"prose:{n_pages}",
                    "extra_queries": extra_timings,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
