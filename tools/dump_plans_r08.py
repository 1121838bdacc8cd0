"""Dump formatted physical plans for the round-8-touched queries.

Usage: python tools/dump_plans_r08.py <repo_root> <out_dir> <suffix>
Runs against the tree at <repo_root> (so the same script can produce
_before plans from a git worktree of the round-start commit and _after
plans from the current tree) and writes <out_dir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
sys.path.insert(0, ROOT)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    import __spark_entry__ as E
    from seq2kg_spark.operators.ann import brute_force_topk
    from seq2kg_spark.operators.dedup import minhash_lsh_pairs, simhash64
    from seq2kg_spark.operators.extract import extract_triples
    from seq2kg_spark.session import get_spark
    from seq2kg_spark.sources.pages import ensure_pages_parquet

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans-r08", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = ensure_pages_parquet(spark, n_rows=300)

    queries = {
        "kg_filter_battery": lambda: E.q_kg_filter_battery(spark, sf_dir),
        "dedup_minhash_lsh_xx64": lambda: minhash_lsh_pairs(
            E._t(spark, sf_dir, "documents"), n_bands=8, threshold=0.002,
            hash_fn="xxhash64"),
        "dedup_minhash_lsh_md5": lambda: minhash_lsh_pairs(
            E._t(spark, sf_dir, "documents"), n_bands=8, threshold=0.1),
        "dedup_simhash64": lambda: simhash64(E._t(spark, sf_dir, "documents")),
        "ann_topk": lambda: brute_force_topk(
            E._t(spark, sf_dir, "embeddings"), query_ids=list(range(20)),
            k=10),
        "q3_top_revenue": lambda: E.q_q3_top_revenue(spark, sf_dir),
        "kg_extract_triples": lambda: extract_triples(
            spark.read.parquet(pages_path), num_partitions=32),
    }
    os.makedirs(OUT, exist_ok=True)
    for name, fn in queries.items():
        path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan_of(fn()) + "\n")
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
