"""T1 invariant: the Catalyst clean chain is byte-identical to the spec."""

from pyspark.sql import functions as F

from seq2kg_spark.functions.text_clean import clean_text_expr, clean_text_py


def test_clean_python_spec_cases():
    # re-spacing of missing sentence boundaries
    assert clean_text_py("end.Begin") == "end. Begin"
    # em-dash / curly quote normalization
    assert clean_text_py("a—b") == "a - b"
    assert clean_text_py("it’s “x”") == 'it\'s "x "'
    # pipe and tab
    assert clean_text_py("a|b\tc") == "a, b c"
    # character-set strip includes literal 's' and '*'
    assert clean_text_py("**hello world s") == "hello world"
    # whitespace collapse + long-hyphen sentence break
    assert clean_text_py("a  b – c") == "a b . c"


def test_clean_spark_matches_python_bytes(spark, pages):
    rows = (
        pages.select("url", "text", clean_text_expr(F.col("text")).alias("c"))
        .collect()
    )
    assert len(rows) == 300
    mismatches = [r.url for r in rows if clean_text_py(r.text) != r.c]
    assert mismatches == []


def test_clean_is_whole_stage_codegen(spark, pages):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pages.select(clean_text_expr(F.col("text")).alias("c")).explain("formatted")
    plan = buf.getvalue()
    assert "codegen id" in plan  # stays inside whole-stage codegen
    assert "EvalPython" not in plan  # no Python in the hot path
