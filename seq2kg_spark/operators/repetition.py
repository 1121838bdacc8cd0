"""Within-document repetition signals (Gopher-style curation gates).

Cross-document dedup lives in :mod:`seq2kg_spark.operators.dedup`; this is
the complementary *within*-document family used by LLM training-data
pipelines (Rae et al. 2021 "Scaling Language Models" §A1.1 quality
filters): documents dominated by repeated lines or by one n-gram are
boilerplate/spam and get gated out before tokenization.

Signals per document, all integer-exact so the DuckDB oracle can compare
hashes (fractions are left to the caller as numerator/denominator):

* ``n_segments`` / ``n_dup_segments`` — sentence-ish segments (split on
  ``.␣``) that repeat an earlier identical segment.  Gopher uses lines;
  the corpus here is single-line documents, so segments are the
  equivalent unit (documented deviation).
* ``n_words`` — whitespace tokens of the lowercased text.
* ``top_bigram`` / ``top_bigram_n`` — the most frequent word bigram
  (ties: lexicographically smallest) and its count.

Plan shape (the 100 TB question): segments and bigrams explode to one row
per unit, then aggregate per (doc, unit) — both aggregations are
map-side-combinable hash aggs keyed by doc_id, so the shuffle carries one
row per *distinct* unit per doc, not per token.  The top-bigram pick is a
``max_by`` over the per-doc bigram counts — no window, no second shuffle
beyond the agg's own exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Spelled-out ASCII whitespace class, NOT bare \s: Java \s includes \x0B
# but RE2 (DuckDB) \s does not — the explicit class is identical in both
# engines (same constraint html_text.py documents for its patterns).
WS_CLASS = "[ \\t\\r\\n\\x0B\\f]"
SEGMENT_SPLIT = "\\." + WS_CLASS + "+"
WORD_SPLIT = WS_CLASS + "+"


def segment_repetition(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, n_segments, n_dup_segments): duplicated sentence-ish segments."""
    segs = docs.select(
        id_col,
        F.explode(F.split(F.col(text_col), SEGMENT_SPLIT)).alias("seg"),
    ).where(F.col("seg") != "")
    per_seg = segs.groupBy(id_col, "seg").agg(F.count("*").alias("n"))
    return per_seg.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_segments"),
        (F.sum("n") - F.count("*")).cast("long").alias("n_dup_segments"),
    )


def top_bigram(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, n_words, top_bigram, top_bigram_n) over lowercased ws-tokens."""
    w = docs.select(
        id_col,
        F.filter(F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                 lambda x: x != "").alias("ws"),
    )
    # bigram array built only when ≥2 words (element_at past the end is an
    # ERROR under ANSI mode, not a null); <2-word docs keep a null bigram
    # row via explode_outer so they stay joinable
    bigrams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.concat_ws(" ", F.element_at(F.col("ws"), i + 1),
                                  F.element_at(F.col("ws"), i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = w.select(
        id_col,
        F.size("ws").cast("long").alias("n_words"),
        F.explode_outer(bigrams).alias("bigram"),
    )
    per_bg = bg.groupBy(id_col, "n_words", "bigram").agg(
        F.count("*").alias("n"))
    # deterministic argmax: max count, ties to the lexicographically
    # smallest bigram — min over the (-count, bigram) order
    return per_bg.groupBy(id_col, "n_words").agg(
        F.expr("min_by(bigram, struct(-n, bigram)) "
               "FILTER (WHERE bigram IS NOT NULL)").alias("top_bigram"),
        F.max(F.when(F.col("bigram").isNotNull(), F.col("n")))
        .cast("long").alias("top_bigram_n"),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Join of both signal families; one row per input document.

    ``top_bigram`` is total on docs (the null-bigram explode_outer row
    keeps <2-word docs), but ``segment_repetition`` drops docs whose text
    yields no non-empty segment — the left join + coalesce keeps those
    with zero counts so the "one row per input document" contract holds
    for empty-text documents too.
    """
    a = segment_repetition(docs, id_col, text_col)
    b = top_bigram(docs, id_col, text_col)
    return b.join(a, id_col, "left").select(
        id_col,
        F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce("n_dup_segments", F.lit(0)).cast("long")
        .alias("n_dup_segments"),
        "n_words", "top_bigram", "top_bigram_n",
    )
