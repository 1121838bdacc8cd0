"""Fast (Spark-free) triple-parity measurement vs reference outputs.

Usage: python tools/parity_check.py [model] [dataset ...]
Prints per-dataset and overall exact-match P/R of our rule-based extractor
against the reference's committed output CSVs.
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REF = "/root/reference"
_DATASETS = ("cateringServices", "automotiveEngineering", "bbn")


def _extract(args):
    idx, text = args
    from seq2kg_spark.functions.text_clean import clean_text_py
    from seq2kg_spark.nlp.assemble import extract_triples_from_clean_text

    return idx, {tuple(t) for t in
                 extract_triples_from_clean_text(clean_text_py(text))}


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "candidate_extraction"
    datasets = sys.argv[2:] or _DATASETS
    tot_p = tot_g = tot_h = 0
    for ds in datasets:
        ref: dict[int, set] = {}
        path = os.path.join(_REF, "sourcecode", model, "output", f"{ds}.csv")
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            print(f"{ds}: no reference output for {model} (skipped)")
            continue
        with open(path, newline="", encoding="utf-8") as f:
            r = csv.reader(f)
            next(r)
            for row in r:
                if len(row) >= 4:
                    ref.setdefault(int(row[0]), set()).add(
                        (row[1], row[2], row[3]))
        docs: dict[int, str] = {}
        with open(os.path.join(_REF, "datasets", ds, "test.csv"),
                  newline="", encoding="utf-8") as f:
            for row in csv.reader(f):
                docs[int(row[0])] = row[1]
        n_p = n_g = n_h = 0
        for item in sorted(docs.items()):
            idx, ours = _extract(item)
            golden = ref.get(idx, set())
            n_p += len(ours)
            n_g += len(golden)
            n_h += len(ours & golden)
        tot_p += n_p
        tot_g += n_g
        tot_h += n_h
        print(f"{ds}: ours={n_p} ref={n_g} hit={n_h} "
              f"P={n_h/max(n_p,1):.3f} R={n_h/max(n_g,1):.3f}")
    print(f"TOTAL: P={tot_h/max(tot_p,1):.3f} R={tot_h/max(tot_g,1):.3f} "
          f"(hit {tot_h}, ours {tot_p}, ref {tot_g})")


if __name__ == "__main__":
    main()
