"""T1 — document text normalization (the byte-identical row invariant).

The reference normalizes every document before any NLP step
(``candidate_extraction/triples_from_text.py:78-101``).  Its exact output is
our per-url row-level invariant: ``clean_text_py`` is the executable spec (a
faithful re-expression of the reference semantics, quirks included), and
``clean_text_expr`` is the production path — a chain of pure Catalyst
``regexp_replace`` expressions that stays inside whole-stage codegen, so at
100 TB the normalization costs one projection over the scan with no Python in
the loop.  ``tests/test_text_clean.py`` asserts the two agree byte-for-byte
over the whole fixture corpus.

Quirks preserved deliberately (they are part of the invariant):

* The reference calls ``str.strip("[(),- :'\"\\n]\\s*")`` — a *character set*
  strip, so the literal characters ``[ ( ) , - space : ' " newline ] \\ s *``
  are stripped from both ends (including real ``s`` and ``*``!).
* Two of its regexes spell character classes as ``[[A-Z]{1}`` (a class
  containing ``[`` plus A-Z).  We rewrite them unambiguously as ``[\\[A-Z]``
  — same semantics in both Python ``re`` and Java ``Pattern``.
* ``\\w``/``\\s`` run under ``re.UNICODE``; the Java patterns carry ``(?U)``
  so Catalyst matches the same character sets.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters stripped from both ends before anything else (see module doc).
_STRIP_CHARS = "[(),- :'\"\n]\\s*"

# (python_pattern, java_pattern, replacement) triples, applied in order.
# Python and Java replacement syntax differ (\g<1> vs $1) so both are kept.
_RESPACE_STEPS: list[tuple[str, str, str, str]] = [
    # word.Word -> word. Word (incl. closing-paren left context)
    (r"([A-Za-z0-9\)]{2,}\.)([A-Z]+[a-z]*)", r"([A-Za-z0-9)]{2,}\.)([A-Z]+[a-z]*)",
     r"\g<1> \g<2>", r"$1 $2"),
    # word."Quote -> word. "Quote
    (r"([A-Za-z0-9]{2,}\.)(\"\w+)", r"(?U)([A-Za-z0-9]{2,}\.)(\"\w+)",
     r"\g<1> \g<2>", r"$1 $2"),
    # word./path -> word./ path
    (r"([A-Za-z0-9]{2,}\.\/)(\w+)", r"(?U)([A-Za-z0-9]{2,}\./)(\w+)",
     r"\g<1> \g<2>", r"$1 $2"),
    # U.S. Wor -> U.S. . Wor   (abbrev guard; class written as [[A-Z] in ref)
    (r"([\[A-Z][\[.][\[A-Z][\[.]) ([\[A-Z][a-z]{1,2} )",
     r"([\[A-Z][\[.][\[A-Z][\[.]) ([\[A-Z][a-z]{1,2} )",
     r"\g<1> . \g<2>", r"$1 . $2"),
    # word.Word (3+ left) variant
    (r"([A-Za-z]{3,}\.)([A-Z]+[a-z]+)", r"([A-Za-z]{3,}\.)([A-Z]+[a-z]+)",
     r"\g<1> \g<2>", r"$1 $2"),
    # abbrev guard is applied twice in the reference
    (r"([\[A-Z][\[.][\[A-Z][\[.]) ([\[A-Z][a-z]{1,2} )",
     r"([\[A-Z][\[.][\[A-Z][\[.]) ([\[A-Z][a-z]{1,2} )",
     r"\g<1> . \g<2>", r"$1 . $2"),
    # catch-all word.word
    (r"([A-Za-z0-9]{2,}\.)([A-Za-z]+)", r"([A-Za-z0-9]{2,}\.)([A-Za-z]+)",
     r"\g<1> \g<2>", r"$1 $2"),
]

# Literal substitutions applied after the respace steps, in order.
_LITERAL_STEPS: list[tuple[str, str, str]] = [
    ("’", "'", "'"),
    ("‘", "'", "'"),
    ("“", ' "', ' "'),
    ("”", ' "', ' "'),
]


def clean_text_py(text: str) -> str:
    """Executable spec for T1 (mirrors triples_from_text.py:78-101)."""
    text = text.strip(_STRIP_CHARS)
    text = text.replace("—", " - ")
    for py_pat, _java, py_rep, _jrep in _RESPACE_STEPS:
        text = re.sub(py_pat, py_rep, text, flags=re.UNICODE)
    for lit, py_rep, _jrep in _LITERAL_STEPS:
        text = re.sub(lit, py_rep, text, flags=re.UNICODE)
    text = re.sub(r"\|", ", ", text, flags=re.UNICODE)
    text = text.replace("\t", " ")
    text = re.sub("…", ".", text, flags=re.UNICODE)
    text = re.sub("â€¦", ".", text, flags=re.UNICODE)
    text = re.sub("â€“", "-", text)
    text = re.sub(r"\s+", " ", text, flags=re.UNICODE).strip()
    text = re.sub(" – ", " . ", text, flags=re.UNICODE).strip()
    return text


# Java char class for the str.strip() character set above:
# chars: [ ( ) , - space : ' " \n ] \ s *
_JAVA_STRIP_CLASS = "[\\[(),\\- :'\"\\n\\]\\\\s*]"


def clean_text_expr(col: Column) -> Column:
    """T1 as a pure Catalyst expression chain (whole-stage-codegen friendly).

    Order of operations matches :func:`clean_text_py` exactly.
    """
    # str.strip(charset) == drop runs of set members at both ends
    c = F.regexp_replace(col, f"^{_JAVA_STRIP_CLASS}+|{_JAVA_STRIP_CLASS}+$", "")
    c = F.regexp_replace(c, "—", " - ")
    for _py, java_pat, _pyrep, java_rep in _RESPACE_STEPS:
        c = F.regexp_replace(c, java_pat, java_rep)
    for lit, _pyrep, java_rep in _LITERAL_STEPS:
        c = F.regexp_replace(c, lit, java_rep)
    c = F.regexp_replace(c, "\\|", ", ")
    c = F.regexp_replace(c, "\t", " ")
    c = F.regexp_replace(c, "…", ".")
    c = F.regexp_replace(c, "â€¦", ".")
    c = F.regexp_replace(c, "â€“", "-")
    # \s+ -> ' ' then strip()  (python strip() == unicode-whitespace trim)
    c = F.regexp_replace(c, "(?U)\\s+", " ")
    c = F.regexp_replace(c, "(?U)^\\s+|\\s+$", "")
    c = F.regexp_replace(c, " – ", " . ")
    c = F.regexp_replace(c, "(?U)^\\s+|\\s+$", "")
    return c


# --------------------------------------------------------------------------
# T4 — lead/trail non-alphanumeric trim (joint_model/evaluate.py:486-498;
# duplicated at candidate_filtering/evaluate.py:428-439): keep the span
# from the first to the last alphanumeric character.
# --------------------------------------------------------------------------

def clean_edges_py(s: str) -> str:
    start = -1
    end = -1
    for i, c in enumerate(s):
        if c.isalpha() or c.isnumeric():
            start = i
            break
    for i, c in enumerate(s[::-1]):
        if c.isalpha() or c.isnumeric():
            end = len(s) - i
            break
    return s[start:end]


def clean_edges_expr(col: Column) -> Column:
    """T4 as one Catalyst regexp_extract (unicode letter/number classes
    match Python's str.isalpha/isnumeric closely for our corpora)."""
    return F.coalesce(
        F.regexp_extract(
            col, "(?Us)([\\p{L}\\p{N}].*[\\p{L}\\p{N}]|[\\p{L}\\p{N}])", 1
        ),
        F.lit(""),
    )
