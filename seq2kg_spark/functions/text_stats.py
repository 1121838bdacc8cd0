"""Text-analysis Column builders for the training-data pipeline.

All pure Catalyst expressions (whole-stage codegen, no Python): language ID
(stopword-hit heuristic), quality scoring, token counting, and an integer
document fingerprint.  Each has an exact DuckDB-SQL twin in
``__spark_entry__.oracle_sql`` — the arithmetic is integer/exact so the
cross-engine value-hash comparison is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny frozen stopword profiles for the n-gram/stopword language heuristic.
EN_MARKERS = ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it")
DE_MARKERS = ("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
              "zu", "den")

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"  # BPE-ish: words|numbers|punct

_FP_MOD = 1_000_000_007
_FP_A = 2_654_435_761
_FP_B = 97


def words(col: Column) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(col, " "), lambda w: w != F.lit(""))


def token_count_ws(col: Column) -> Column:
    """Count of split-on-' ' non-empty tokens == count of [^ ]+ runs.

    regexp_count is a single pass over the string; the former
    size(filter(split(...))) materialized a string array per row — on the
    500k-page curation gate that allocation was the dominant cost (the
    gate runs twice per curate: keeper table + pending slice).
    ``tests/test_text_stats_fast.py`` pins equality vs the spec form.
    """
    return F.regexp_count(col, F.lit("[^ ]+")).cast("long")


def token_count_ws_spec(col: Column) -> Column:
    """Spec form of :func:`token_count_ws` (array-building; test anchor)."""
    return F.size(words(col)).cast("long")


def token_count_regex(col: Column) -> Column:
    """BPE-ish token count via regexp scan (stays JVM-side)."""
    return F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_REGEX}', 0)")).cast(
        "long"
    )


def _marker_hits(col: Column, markers: tuple[str, ...]) -> Column:
    """Count of split-on-' ' tokens whose lowercase equals a marker.

    Single regexp_count pass: a token is a maximal [^ ]+ run, so a marker
    hit is the marker string delimited by start/space on the left and
    space/end on the right.  ``\\z`` (not ``$``): Java ``$`` also matches
    BEFORE a trailing newline, which would count a final "the\\n" token
    the spec form rejects (its token is "the\\n", not "the").  ``(?i)``
    is ASCII case folding, same outcome as the spec's lower() compare for
    these all-ASCII markers.
    """
    pat = "(?i)(?:\\A|(?<= ))(?:" + "|".join(markers) + ")(?= |\\z)"
    return F.regexp_count(col, F.lit(pat))


def _marker_hits_spec(col: Column, markers: tuple[str, ...]) -> Column:
    """Spec form of :func:`_marker_hits` (array-building; test anchor)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words(col), lambda w: F.array_contains(arr, F.lower(w))))


def lang_id(col: Column) -> Column:
    """'en' / 'de' / 'unknown' by stopword-marker majority."""
    en = _marker_hits(col, EN_MARKERS)
    de = _marker_hits(col, DE_MARKERS)
    return (
        F.when((en > de) & (en > 0), F.lit("en"))
        .when((de > en) & (de > 0), F.lit("de"))
        .otherwise(F.lit("unknown"))
    )


def stopword_ratio(col: Column) -> Column:
    """English stopword hits / word count, in 1/10000 integer units
    (integer arithmetic → exact cross-engine comparison)."""
    n = token_count_ws(col)
    hits = _marker_hits(col, EN_MARKERS).cast("long")
    return F.when(n > 0, F.floor(hits * 10000 / n)).otherwise(F.lit(0).cast("long"))


# every char the punct counter KEEPS OUT of the count, for translate()
_ALNUM_SPACE = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 ")


def punct_ratio(col: Column) -> Column:
    """Non-alphanumeric-non-space chars / chars, in 1/10000 units.

    translate() deletes the 63 kept chars and length() counts what's left
    — a plain char-map pass, measured 23× faster than the regex form on
    the 500k-page gate (34.1 s → 1.5 s for the raw count) with identical
    sums; both count code points, so astral chars agree too.
    """
    total = F.length(col)
    punct = F.length(F.translate(col, _ALNUM_SPACE, "")).cast("long")
    return F.when(
        total > 0, F.floor(punct * 10000 / total)
    ).otherwise(F.lit(0).cast("long"))


def quality_label(col: Column) -> Column:
    """Coarse quality bucket used to gate training data."""
    n = token_count_ws(col)
    sw = stopword_ratio(col)
    return (
        F.when(n < 5, F.lit("too_short"))
        .when(punct_ratio(col) > 3000, F.lit("too_punct"))
        .when(sw == 0, F.lit("no_stopwords"))
        .otherwise(F.lit("ok"))
    )


def fingerprint(col: Column) -> Column:
    """Order-sensitive integer document fingerprint (rolling-hash style).

    fp = sum_i ((i * A + len(w_i) * B + ascii(w_i)) mod M) mod M over
    whitespace tokens — pure int64 arithmetic, exact in any engine.
    """
    ws = words(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws), F.lit(1)))
    terms = F.zip_with(
        idx,
        ws,
        lambda i, w: (
            i.cast("long") * F.lit(_FP_A)
            + F.length(w).cast("long") * F.lit(_FP_B)
            + F.ascii(w).cast("long")
        )
        % F.lit(_FP_MOD),
    )
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(F.size(ws) > 0, total % F.lit(_FP_MOD)).otherwise(F.lit(0))
