"""Recall/cost study for similarity_edges' cap and band_rows knobs
(round-7 ask #5).

The cap=1k default was justified on word-salad corpora (maximally LSH-hot).
This measures, on BOTH corpus shapes:

* zipf-entity corpus (sources/zipf_entities.py): shared real-word vocab,
  power-law mention frequencies, same-entity near-dup variants — ground
  truth by construction;
* word-salad corpus: uniform word combinations over the same vocab.

Two legs:

* SMALL (exact): recall against an EXACT all-pairs Jaccard ground truth
  (the operator's spec: char-3-shingle Jaccard >= threshold).  Precision
  is 1.0 by construction (similarity_edges verifies every candidate with
  the same Jaccard), so recall is the whole story.
* BIG (where the cap binds): zipf recall against the same-entity exact
  truth (within-entity all-pairs — linear in entities, no n² blowup);
  salad reports cost only (candidates, wall) — an uncapped r=1 run on big
  salad IS the quadratic blowup the cap exists to stop, so there is no
  obtainable exact denominator there.

band_rows settings pair each r with an n_bands holding the THEORETICAL
band-miss at jaccard=threshold roughly constant (r=1/b=6: P(hit)=0.993 at
s=0.55; r=2/b=10: 0.973; r=4/b=32: 0.953) — otherwise the study conflates
the r knob with a shrinking band budget.  The r hash cost is visible in
wall seconds (r×b array-min passes per norm: 6 / 20 / 128).

Usage: python tools/zipf_recall_study.py [--entities 3000] [--salad 8000]
       [--big-entities 150000] [--big-salad 400000] [--threshold 0.55]
       [--skip-big] [--markdown]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SETTINGS = [(1, 6), (2, 10), (4, 32)]   # (band_rows, n_bands)
CAPS = (1_000, 10_000)


def _shingled(norms, k=3):
    from seq2kg_spark.operators.canonicalize import _char_shingles

    return norms.select(
        "*",
        F.array_sort(_char_shingles(F.col("norm"), k)).alias("sh"),
        F.size(_char_shingles(F.col("norm"), k)).alias("n"),
    )


def _jaccard_filter(df, threshold):
    return (
        df.withColumn("ni", F.size(F.array_intersect("sh_a", "sh_b")))
        .where(F.col("ni") / (F.col("n_a") + F.col("n_b") - F.col("ni"))
               >= threshold)
        .select("a", "b")
    )


def exact_truth(spark, norms, threshold: float):
    """All-pairs exact Jaccard — O(n²) by design; SMALL leg only."""
    s = _shingled(norms).persist()
    s.count()
    a = s.select(F.col("norm").alias("a"), F.col("sh").alias("sh_a"),
                 F.col("n").alias("n_a"))
    b = s.select(F.col("norm").alias("b"), F.col("sh").alias("sh_b"),
                 F.col("n").alias("n_b"))
    t = _jaccard_filter(
        a.crossJoin(b).where(F.col("a") < F.col("b")), threshold).persist()
    n = t.count()
    s.unpersist()
    return t, n


def same_entity_truth(spark, norms_with_entity, threshold: float):
    """Within-entity all-pairs exact Jaccard — linear in entities (each
    entity has <= max_variants norms), usable at any scale."""
    s = _shingled(norms_with_entity).persist()
    s.count()
    a = s.select(F.col("entity_id").alias("e"), F.col("norm").alias("a"),
                 F.col("sh").alias("sh_a"), F.col("n").alias("n_a"))
    b = s.select(F.col("entity_id").alias("e"), F.col("norm").alias("b"),
                 F.col("sh").alias("sh_b"), F.col("n").alias("n_b"))
    t = _jaccard_filter(
        a.join(b, "e").where(F.col("a") < F.col("b")), threshold).persist()
    n = t.count()
    s.unpersist()
    return t, n


def run_setting(spark, norms, cap, r, n_bands, threshold, truths):
    """truths: {label: (df, n)} — recall per labelled truth set."""
    from seq2kg_spark.operators.canonicalize import (release_caches,
                                                     similarity_edges)

    stats: dict = {}
    t0 = time.monotonic()
    edges = similarity_edges(norms, threshold=threshold, max_bucket=cap,
                             band_rows=r, n_bands=n_bands, stats=stats)
    found = edges.persist()
    n_found = found.count()
    wall = time.monotonic() - t0
    rec = {"cap": cap, "band_rows": r, "n_bands": n_bands,
           "found": n_found, "candidates": stats.get("n_candidates"),
           "wall_s": round(wall, 2)}
    for label, (tdf, n_truth) in truths.items():
        hit = found.join(tdf, ["a", "b"]).count()
        rec[label] = round(hit / n_truth, 4) if n_truth else 1.0
    found.unpersist()
    release_caches(edges)
    return rec


def study_corpus(spark, name, norms, truths, threshold, results, md_rows,
                 big=False, include_infeasible=False):
    n_norms = norms.count()
    rows = []
    for cap in CAPS:
        for r, nb in SETTINGS:
            if big and cap == 10_000 and r == 1 and not include_infeasible:
                # Measured infeasible: at 150k-entity zipf (300k norms) the
                # cap=10k/r=1 candidate join degenerates into straggler
                # tasks on ~10k-wide bucket pairs (>17 min on one 2-task
                # stage before the run was killed) — exactly the skew the
                # cap=1k default was introduced to stop.  Recorded as a
                # finding, not a timing.
                rows.append({"cap": cap, "band_rows": r, "n_bands": nb,
                             "infeasible": "straggler bucket-pair join; "
                                           "killed after >17 min"})
                print(f"[{name}] cap={cap} r={r} b={nb} -> SKIPPED "
                      "(measured infeasible; see tool source)", flush=True)
                continue
            rec = run_setting(spark, norms, cap, r, nb, threshold, truths)
            rows.append(rec)
            print(f"[{name}] cap={cap} r={r} b={nb} -> "
                  + " ".join(f"{k}={rec[k]}" for k in rec
                             if k.startswith("recall"))
                  + f" cand={rec['candidates']} wall={rec['wall_s']}s",
                  flush=True)
    results[name] = {
        "n_norms": n_norms,
        "truth_sizes": {k: n for k, (_, n) in truths.items()},
        "settings": rows,
    }
    md_rows[name] = rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=3_000)
    ap.add_argument("--salad", type=int, default=8_000)
    ap.add_argument("--big-entities", type=int, default=150_000)
    ap.add_argument("--big-salad", type=int, default=400_000)
    ap.add_argument("--threshold", type=float, default=0.55)
    ap.add_argument("--skip-big", action="store_true")
    ap.add_argument("--skip-small", action="store_true")
    ap.add_argument("--include-infeasible", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    from seq2kg_spark.operators.canonicalize import normalize_mention
    from seq2kg_spark.session import get_spark
    from seq2kg_spark.sources.zipf_entities import (build_salad_norms,
                                                    build_zipf_mentions)

    spark = get_spark("zipf-recall-study", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def zipf_norms(n_entities):
        m = build_zipf_mentions(spark, n_entities=n_entities)
        return (
            m.withColumn("norm", normalize_mention(F.col("mention")))
            .where(F.col("norm") != "")
            .groupBy("norm").agg(F.min("entity_id").alias("entity_id"))
            .persist()
        )

    results: dict = {}
    md_rows: dict = {}

    # ---- SMALL leg: exact all-pairs truth ----
    if not args.skip_small:
        zn = zipf_norms(args.entities)
        truth, n_truth = exact_truth(
            spark, zn.select("norm"), args.threshold)
        st, n_st = same_entity_truth(spark, zn, args.threshold)
        study_corpus(spark, "zipf-small", zn.select("norm"),
                     {"recall_exact": (truth, n_truth),
                      "recall_same_entity": (st, n_st)},
                     args.threshold, results, md_rows)
        truth.unpersist(); st.unpersist(); zn.unpersist()

        sn = build_salad_norms(
            spark, n_norms=args.salad).distinct().persist()
        truth, n_truth = exact_truth(spark, sn, args.threshold)
        study_corpus(spark, "salad-small", sn,
                     {"recall_exact": (truth, n_truth)},
                     args.threshold, results, md_rows)
        truth.unpersist(); sn.unpersist()

    # ---- BIG leg: where the cap binds ----
    if not args.skip_big:
        zb = zipf_norms(args.big_entities)
        st, n_st = same_entity_truth(spark, zb, args.threshold)
        study_corpus(spark, "zipf-big", zb.select("norm"),
                     {"recall_same_entity": (st, n_st)},
                     args.threshold, results, md_rows, big=True,
                     include_infeasible=args.include_infeasible)
        st.unpersist(); zb.unpersist()

        sb = build_salad_norms(
            spark, n_norms=args.big_salad).distinct().persist()
        study_corpus(spark, "salad-big", sb, {},    # cost only
                     args.threshold, results, md_rows, big=True,
                     include_infeasible=args.include_infeasible)
        sb.unpersist()

    print(json.dumps(results, indent=2))
    if args.markdown:
        for name, rows in md_rows.items():
            res = results[name]
            print(f"\n### {name} — {res['n_norms']} norms; truth sizes "
                  f"{res['truth_sizes']}")
            print("| cap | r | bands | recall(exact) | recall(same-ent) |"
                  " candidates | wall (s) |")
            print("|---|---|---|---|---|---|---|")
            for s in rows:
                if "infeasible" in s:
                    print(f"| {s['cap']} | {s['band_rows']} | "
                          f"{s['n_bands']} | — | — | INFEASIBLE: "
                          f"{s['infeasible']} | — |")
                    continue
                print(f"| {s['cap']} | {s['band_rows']} | {s['n_bands']} | "
                      f"{s.get('recall_exact', '—')} | "
                      f"{s.get('recall_same_entity', '—')} | "
                      f"{s['candidates']} | {s['wall_s']} |")
    spark.stop()


if __name__ == "__main__":
    main()
