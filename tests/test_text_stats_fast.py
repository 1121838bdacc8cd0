"""regexp_count reformulations of the text-stats builders == spec forms.

The curation gate evaluates quality_label over the full input twice per
curate (keeper table + pending slice); the array-building split/filter
forms were the dominant cost.  These tests pin the single-pass
regexp_count forms byte-equal to the spec forms over the corpus plus the
adversarial edge set ('$ matches before a trailing newline' is the trap
the \\z patterns exist for).
"""

from pyspark.sql import functions as F

from seq2kg_spark.functions.text_stats import (
    EN_MARKERS,
    _marker_hits,
    _marker_hits_spec,
    token_count_ws,
    token_count_ws_spec,
)

EDGE_TEXTS = [
    "",
    " ",
    "the",
    "the ",
    " the",
    "the\n",          # token is "the\n" — must NOT count as a marker hit
    "the\nand the",   # "the\nand" is ONE token; final "the" hits
    "THE The tHe",
    "a  b   the",     # runs of spaces → empty tokens dropped
    "x the, the. the",  # punctuation glued to the token — no hit
    "it is in of to a for that and the",
    "für die straße und das",  # de markers shouldn't hit EN set
    "tab\tthe end",   # tab inside a token
    "emoji 😀 the 🚗x",
]


def _docs(spark, pages):
    corpus = [r.text for r in pages.select("text").collect()]
    return spark.createDataFrame(
        [(t,) for t in corpus + EDGE_TEXTS], "text string")


def test_token_count_fast_equals_spec(spark, pages):
    df = _docs(spark, pages)
    bad = df.select(
        token_count_ws(F.col("text")).alias("fast"),
        token_count_ws_spec(F.col("text")).alias("spec"),
    ).where(F.col("fast") != F.col("spec"))
    assert bad.count() == 0


def test_punct_ratio_translate_equals_regex(spark, pages):
    from seq2kg_spark.functions.text_stats import punct_ratio

    df = _docs(spark, pages)
    ref = (F.when(
        F.length("text") > 0,
        F.floor(F.regexp_count(F.col("text"), F.lit("[^A-Za-z0-9 ]"))
                .cast("long") * 10000 / F.length("text")))
        .otherwise(F.lit(0).cast("long")))
    bad = df.select(
        punct_ratio(F.col("text")).alias("fast"), ref.alias("spec")
    ).where(F.col("fast") != F.col("spec"))
    assert bad.count() == 0


def test_marker_hits_fast_equals_spec(spark, pages):
    df = _docs(spark, pages)
    bad = df.select(
        "text",
        _marker_hits(F.col("text"), EN_MARKERS).alias("fast"),
        _marker_hits_spec(F.col("text"), EN_MARKERS).alias("spec"),
    ).where(F.col("fast") != F.col("spec"))
    rows = bad.collect()
    assert rows == [], [(r.text[:40], r.fast, r.spec) for r in rows[:5]]
