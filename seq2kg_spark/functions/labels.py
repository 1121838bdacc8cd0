"""F3/F4 — training featurization: label matrices + mention bitmap.

Pure Catalyst re-expression of joint_model/build_data.py:227-238 (per-token
multi-hot label vectors over the frozen hierarchy; wordpieces inherit their
token's labels) and :129-130 (mention bitmap = 1 iff any label set).

The hierarchy is frozen driver-side and compiled into the expressions as a
literal array — the Spark analog of the reference's broadcast one-hot
codec (data_utils.py:160-188).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def multi_hot(labels_col: Column, hierarchy: list[str]) -> Column:
    """array<string> labels → array<int> multi-hot over ``hierarchy``."""
    vocab = F.array(*[F.lit(h) for h in hierarchy])
    return F.transform(
        vocab,
        lambda h: F.when(F.array_contains(labels_col, h), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )


def token_label_matrix(
    tokens_col: Column,
    mentions_col: Column,
    hierarchy: list[str],
) -> Column:
    """F3 — per-token multi-hot matrix: array (len = n_tokens) of
    array<int> (len = |hierarchy|).  A token's labels are the union of the
    labels of every mention whose [start, end) covers it."""
    n = F.size(tokens_col)
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    token_labels = F.transform(
        idx,
        lambda i: F.array_distinct(
            F.flatten(
                F.transform(
                    F.filter(
                        mentions_col,
                        lambda m: (m["start"] <= i) & (i < m["end"]),
                    ),
                    lambda m: m["labels"],
                )
            )
        ),
    )
    return F.transform(token_labels, lambda ls: multi_hot(ls, hierarchy))


def mention_bitmap(label_matrix_col: Column) -> Column:
    """F4 — 1 per token iff any label bit is set (build_data.py:129-130)."""
    return F.transform(
        label_matrix_col,
        lambda row: F.when(
            F.exists(row, lambda x: x == 1), F.lit(1)
        ).otherwise(F.lit(0)),
    )


def frozen_hierarchy(annotated, mention_cols=("mentions_triples",)) -> list[str]:
    """Scan train+dev label space and freeze it sorted
    (build_data.py:198-213 + data_utils.py:161) — one distinct-collect."""
    dfs = []
    for c in mention_cols:
        dfs.append(
            annotated.select(
                F.explode(
                    F.flatten(
                        F.transform(F.col(c), lambda m: m["labels"])
                    )
                ).alias("label")
            )
        )
    alll = dfs[0]
    for d in dfs[1:]:
        alll = alll.unionByName(d)
    return sorted(r.label for r in alll.distinct().collect())
