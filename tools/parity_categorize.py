"""Categorize parity misses: span-level vs assembly-level.

For every missed reference triple, check whether its subject and object
strings exist anywhere in OUR extracted node set for that doc.
"""
from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.parity_diff import load, ours_for  # noqa: E402


def main():
    cats = Counter()
    missing_nodes = Counter()
    for ds in ("cateringServices", "automotiveEngineering"):
        ref, docs = load(ds)
        for idx, text in sorted(docs.items()):
            o = ours_for(text)
            g = ref.get(idx, set())
            nodes = {t[0] for t in o} | {t[2] for t in o}
            preds = {t[1] for t in o}
            for s, p, obj in g - o:
                s_in, o_in, p_in = s in nodes, obj in nodes, p in preds
                if s_in and o_in and p_in:
                    cats["assembly (all parts exist)"] += 1
                elif s_in and o_in:
                    cats["pred missing only"] += 1
                else:
                    cats["node missing"] += 1
                    for part, ok in ((s, s_in), (obj, o_in)):
                        if not ok:
                            missing_nodes[part] += 1
    for k, v in cats.most_common():
        print(f"{k}: {v}")
    print("\ntop missing node strings:")
    for node, n in missing_nodes.most_common(40):
        print(f"  {n}x {node!r}")


if __name__ == "__main__":
    main()
