"""Per-doc diff of our triples vs the reference output CSV.

Usage: python tools/parity_diff.py <dataset> <doc_id> [doc_id ...]
       python tools/parity_diff.py <dataset> --worst N   (docs ranked by miss count)
"""
from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REF = "/root/reference"


def load(ds, model="candidate_extraction"):
    ref: dict[int, set] = {}
    with open(os.path.join(_REF, "sourcecode", model, "output", f"{ds}.csv"),
              newline="", encoding="utf-8") as f:
        r = csv.reader(f)
        next(r)
        for row in r:
            if len(row) >= 4:
                ref.setdefault(int(row[0]), set()).add((row[1], row[2], row[3]))
    docs: dict[int, str] = {}
    with open(os.path.join(_REF, "datasets", ds, "test.csv"),
              newline="", encoding="utf-8") as f:
        for row in csv.reader(f):
            docs[int(row[0])] = row[1]
    return ref, docs


def ours_for(text):
    from seq2kg_spark.functions.text_clean import clean_text_py
    from seq2kg_spark.nlp.assemble import extract_triples_from_clean_text
    return {tuple(t) for t in
            extract_triples_from_clean_text(clean_text_py(text))}


def main():
    ds = sys.argv[1]
    ref, docs = load(ds)
    if sys.argv[2] == "--worst":
        n = int(sys.argv[3])
        scored = []
        for idx, text in sorted(docs.items()):
            o = ours_for(text)
            g = ref.get(idx, set())
            scored.append((len(g - o) + len(o - g), len(g - o), len(o - g), idx))
        scored.sort(reverse=True)
        for tot, miss, extra, idx in scored[:n]:
            g = ref.get(idx, set())
            o = ours_for(docs[idx])
            print(f"doc {idx}: miss={miss} extra={extra} hit={len(o & g)}")
        return
    for idx in map(int, sys.argv[2:]):
        o = ours_for(docs[idx])
        g = ref.get(idx, set())
        print(f"=== doc {idx}  hit={len(o & g)} miss={len(g - o)} extra={len(o - g)}")
        print("--- TEXT:", docs[idx][:600].replace("\n", " "))
        for t in sorted(g - o):
            print("  MISS ", t)
        for t in sorted(o - g):
            print("  EXTRA", t)
        for t in sorted(o & g):
            print("  HIT  ", t)


if __name__ == "__main__":
    main()
