"""Extra benchmarks (round 8): per-query noop-sink isolation.

Not part of the driver contract — ``bench.py`` stays frozen.  This harness
times individual queries with the noop sink (guide §1.4) so the computation
is measured without count()'s column pruning, supports repeat runs, and can
emit ``.explain("formatted")`` to plans/r08/.

Usage:
    python bench_extra.py q1 q2 ...         # time with noop sink
    python bench_extra.py --explain q1 ...  # dump formatted plans
    python bench_extra.py --count q1 ...    # time with count() (bench parity)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM, REPEAT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_queries(spark, sf_dir, cpus):
    import __spark_entry__ as E
    from seq2kg_spark.operators.ann import brute_force_topk
    from seq2kg_spark.operators.dedup import minhash_lsh_pairs, simhash64
    from seq2kg_spark.sources.pages import ensure_pages_parquet

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_pages = max(300, int(50_000 * sf))
    pages_path = ensure_pages_parquet(spark, n_rows=n_pages)
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

    def minhash_prod(s, d):
        # the production r=4x32 banded shape (VERDICT r7 ask #4)
        return minhash_lsh_pairs(
            E._t(s, d, "documents"), n_bands=32, threshold=0.5,
            hash_fn="xxhash64", band_rows=4,
        )

    def simhash_scale(s, d):
        return simhash64(E._t(s, d, "documents"))

    def ann_scale(s, d):
        return brute_force_topk(
            E._t(s, d, "embeddings"), query_ids=list(range(20)), k=10
        )

    q = {
        "kg_extract_triples": kg_extract,
        "kg_extract_warm": kg_extract,
        "kg_neural_triples": neural_extract,
        "kg_neural_warm": neural_extract,
        "kg_filter_battery": E.q_kg_filter_battery,
        "q1_pricing_summary": E.q_q1_pricing_summary,
        "q3_top_revenue": E.q_q3_top_revenue,
        "topk_orders_per_customer": E.q_topk_orders_per_customer,
        "collect_parts_per_order": E.q_collect_parts_per_order,
        "events_hourly": E.q_events_hourly,
        "dedup_minhash_lsh_xx64": minhash_scale,
        "minhash_lsh_prod_r4": minhash_prod,
        "dedup_simhash64": simhash_scale,
        "ann_topk": ann_scale,
        "text_quality": E.q_text_quality,
        "fingerprint": E.q_fingerprint,
        "ann_ivf_int": E.q_ann_ivf_int,
        "ann_ivf_topk": E.q_ann_ivf_topk,
        "kg_m4_decode": E.q_kg_m4_decode,
        "lsh_topk_int": E.q_lsh_topk_int,
        "streaming_sessions": E.q_streaming_sessions,
        "sessions_batch": E.q_sessions_batch,
        "window_counts_batch": E.q_window_counts_batch,
        "media_features_int": E.q_media_features_int,
        "clean_text_unicode": E.q_clean_text_unicode,
        "lsh_bucketed_topk": E.q_lsh_bucketed_topk,
        "html_extract": E.q_html_extract,
    }
    return q


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("REPEAT", "1"))
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    use_count = "--count" in args
    names = [a for a in args if not a.startswith("--")]

    from seq2kg_spark.session import get_spark

    spark = get_spark("seq2kg-bench-extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries(spark, sf_dir, cpus)
    if not names:
        print("available:", ", ".join(queries))
        return

    out: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        if explain:
            os.makedirs("plans/r08", exist_ok=True)
            txt = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            path = f"plans/r08/{name}_current.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
            continue
        times = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.monotonic()
            if use_count:
                n = fn(spark, sf_dir).count()
            else:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                n = -1
            times.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(json.dumps({"query": name, "times": times, "rows": n}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
