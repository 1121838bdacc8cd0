"""A10 — the triple filter battery as a pure Catalyst filter chain.

The order-insensitive subset of reference
``candidate_extraction/triples_from_text.py:492-519`` re-expressed as
Column predicates + string cleanup, so at scale it runs inside whole-stage
codegen directly over the triples table (the order-dependent raw-vs-cleaned
dedup quirk lives in the in-UDF variant,
:func:`seq2kg_spark.nlp.assemble.filter_battery`, used on the parity path).

Semantics (applied to columns subj/pred/obj):
  drop stopword subj/obj · subj==pred · all-digit · '%' · len<2 ·
  all-lower len<4 · subj==obj; then strip edge punctuation, drop
  determiners/possessives, collapse spaces, drop empties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seq2kg_spark.nlp.assemble import ALL_STOP_WORDS, DROP_WORDS

# str.strip char-sets used by the reference (subj/obj vs pred variants)
_EDGE_SO = "[\\[,\\- :'\"\\n\\]*]"
_EDGE_P = "[\\[\\- :'\"\\n\\]*.]"


def _strip_edges(col: Column, cls: str) -> Column:
    return F.regexp_replace(col, f"^{cls}+|{cls}+$", "")


def _drop_words(col: Column) -> Column:
    # isin -> In/InSet: hash-set membership instead of an O(|DROP_WORDS|)
    # array scan per token.  Same null semantics as array_contains over a
    # non-null literal array (null token -> null -> dropped by the filter).
    return F.array_join(
        F.filter(
            F.split(col, " "),
            lambda w: ~w.isin(*DROP_WORDS) & (w != F.lit("")),
        ),
        " ",
    )


def apply_filter_battery(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Catalyst A10: filter chain + cleanup projection.

    Stopword membership is ``isin`` (InSet hash lookup, codegen'd) rather
    than ``array_contains`` over a 203-literal array (O(n) scan per row,
    measured 6.6s -> 4.3s at sf1.0 for identical rows).
    """
    s, p, o = F.col(subj), F.col(pred), F.col(obj)
    kept = triples.where(
        ~F.lower(s).isin(*ALL_STOP_WORDS)
        & ~F.lower(o).isin(*ALL_STOP_WORDS)
        & (s != p)
        & ~s.rlike("^[0-9]+$")
        & ~o.rlike("^[0-9]+$")
        & ~s.contains("%")
        & ~o.contains("%")
        & (F.length(s) >= 2)
        & (F.length(o) >= 2)
        & ~((s == F.lower(s)) & (F.length(s) < 4))
        & ~((o == F.lower(o)) & (F.length(o) < 4))
        & (s != o)
    )
    cleaned = kept.select(
        *[c for c in triples.columns if c not in (subj, pred, obj)],
        _drop_words(_strip_edges(s, _EDGE_SO)).alias(subj),
        _strip_edges(p, _EDGE_P).alias(pred),
        _drop_words(_strip_edges(o, _EDGE_SO)).alias(obj),
    )
    return cleaned.where(
        (F.col(subj) != "") & (F.col(pred) != "") & (F.col(obj) != "")
    )
