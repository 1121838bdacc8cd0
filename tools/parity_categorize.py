"""Categorize parity misses by structural failure mode.

For every missed reference triple, decide which mechanism would have had
to produce it:

* ``same-sentence window``  — subject and object co-occur in one
  '.'-delimited sentence of the cleaned text: reachable by the windowed
  assembly (A1-A6); a miss here is chunk-boundary or POS noise.
* ``cross-sentence``        — subject and object never share a sentence:
  only the coref substitution (A6) or the capitalized-entity shortest-path
  pass (A7-A9) can emit it, so the miss depends on the full graph /
  cluster structure the reference got from neuralcoref + the spaCy parse.
* ``node absent``           — a node string that appears nowhere in the
  cleaned text (coref main rewritten, spaCy NER artifact, or tokenizer
  divergence): unreachable without the reference's exact models.

Within same-sentence misses, sub-classify: all parts exist in our node
set (pure window/assembly), node boundary variant exists (chunking), or
node entirely missing from our output.
"""
from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.parity_diff import load, ours_for  # noqa: E402


def main():
    from seq2kg_spark.functions.text_clean import clean_text_py

    cats = Counter()
    sub = Counter()
    total_miss = 0
    for ds in ("cateringServices", "automotiveEngineering"):
        ref, docs = load(ds)
        for idx, text in sorted(docs.items()):
            o = ours_for(text)
            g = ref.get(idx, set())
            clean = clean_text_py(text)
            sentences = clean.split(".")
            nodes = {t[0] for t in o} | {t[2] for t in o}
            preds = {t[1] for t in o}
            for s, p, obj in g - o:
                total_miss += 1
                s_in_text = s in clean
                o_in_text = obj in clean
                if not (s_in_text and o_in_text):
                    cats["node absent from cleaned text (coref-main "
                         "rewrite / NER artifact)"] += 1
                    continue
                same_sent = any(s in sent and obj in sent
                                for sent in sentences)
                if not same_sent:
                    cats["cross-sentence (path pass or coref cluster "
                         "required)"] += 1
                    continue
                cats["same-sentence window"] += 1
                s_ok, o_ok = s in nodes, obj in nodes
                if s_ok and o_ok and p in preds:
                    sub["window pairing (all parts are our nodes/preds)"] += 1
                elif s_ok and o_ok:
                    sub["predicate differs (verb grouping/POS)"] += 1
                else:
                    near = any(
                        (part not in nodes
                         and any(part in n or n in part for n in nodes))
                        for part in (s, obj))
                    sub["node boundary variant (chunking)" if near
                        else "node not in our output"] += 1
    print(f"total misses: {total_miss}")
    for k, v in cats.most_common():
        print(f"  {v:5d}  {k}")
    print("same-sentence sub-categories:")
    for k, v in sub.most_common():
        print(f"  {v:5d}  {k}")


if __name__ == "__main__":
    main()
