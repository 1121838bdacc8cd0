"""T4, N7, C6, W3/W4, F3/F4, S7 — the remaining parity operators."""

from pyspark.sql import functions as F

from seq2kg_spark.functions.labels import (
    frozen_hierarchy,
    mention_bitmap,
    multi_hot,
    token_label_matrix,
)
from seq2kg_spark.functions.text_clean import clean_edges_expr, clean_edges_py
from seq2kg_spark.nlp.coref import coref_resolve_text, substitute_corefs
from seq2kg_spark.operators.candidates import label_candidates
from seq2kg_spark.operators.wrangle import (
    w3_align_tokens,
    w4_renumber_sentence_triples,
)


def test_t4_clean_edges_spark_matches_python(spark):
    cases = ["  **Acme Corp!! ", "---", "a", "(hello)", "", "..x..", "é—ü"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r.c for r in df.select(clean_edges_expr(F.col("s")).alias("c"))
           .collect()]
    exp = [clean_edges_py(c) for c in cases]
    assert got == exp


def test_n7_coref_substitution_offsets():
    tokens = "Jamie opened Fifteen . He hired staff .".split()
    # 'He' (idx 4) → main ['Jamie', 'Oliver'] (2 tokens, offset grows)
    out = substitute_corefs(tokens, [(4, 5, ["Jamie", "Oliver"])])
    assert out == "Jamie opened Fifteen . Jamie Oliver hired staff .".split()
    # long mains (>3 tokens) are skipped
    out2 = substitute_corefs(tokens, [(4, 5, ["a", "b", "c", "d"])])
    assert out2 == tokens


def test_n7_end_to_end_resolution():
    out = coref_resolve_text(
        "Jamie Oliver opened Fifteen. The company hired staff."
    )
    assert "Jamie" in out  # resolution ran and kept the antecedent around


def test_c6_label_candidates_exact_join(spark):
    cand = spark.createDataFrame(
        [(1, "Acme", "bought", "Globex"), (1, "Acme", "is", "big")],
        "doc_id long, s string, r string, o string",
    )
    gt = spark.createDataFrame(
        [(1, "Acme", "bought", "Globex"), (2, "X", "r", "Y")],
        "doc_id long, s string, r string, o string",
    )
    out = {(r.doc_id, r.s, r.r, r.o): r.label
           for r in label_candidates(cand, gt).collect()}
    assert out[(1, "Acme", "bought", "Globex")] == 1
    assert out[(1, "Acme", "is", "big")] == 0
    assert out[(2, "X", "r", "Y")] == 1  # gt appended as positive


def test_w3_alignment_prefix_walk():
    orig = ["don't", "stop"]
    retok = ["don", "'t", "stop"]
    m = w3_align_tokens(orig, retok)
    assert m[0] == 0 and m[1] == 2


def test_w4_renumber():
    mentions = [
        {"start": 0, "end": 1, "labels": ["head/3"]},
        {"start": 1, "end": 2, "labels": ["rel/3"]},
        {"start": 2, "end": 3, "labels": ["tail/3", "head/7"]},
    ]
    out = w4_renumber_sentence_triples(mentions)
    # slot 3 complete → renumbered to 1; slot 7 incomplete → dropped
    assert out[0]["labels"] == ["head", "head/1"]
    assert out[2]["labels"] == ["tail", "tail/1"]


def test_f3_f4_label_matrix_and_bitmap(spark):
    from seq2kg_spark.sources.annotated import ANNOTATED_SCHEMA

    rows = [(
        "d1", ["Acme", "bought", "Globex"],
        [(0, 1, ["head", "head/1"]), (1, 2, ["rel", "rel/1"])],
        [],
    )]
    df = spark.createDataFrame(rows, ANNOTATED_SCHEMA)
    hierarchy = frozen_hierarchy(df)
    assert hierarchy == ["head", "head/1", "rel", "rel/1"]
    out = df.select(
        token_label_matrix(
            F.col("tokens"), F.col("mentions_triples"), hierarchy
        ).alias("m")
    ).collect()[0].m
    assert out[0] == [1, 1, 0, 0]
    assert out[1] == [0, 0, 1, 1]
    assert out[2] == [0, 0, 0, 0]
    bm = df.select(
        mention_bitmap(
            token_label_matrix(F.col("tokens"), F.col("mentions_triples"),
                               hierarchy)
        ).alias("b")
    ).collect()[0].b
    assert bm == [1, 1, 0]


def test_s7_csv_sink_reference_format(spark, tmp_path):
    from seq2kg_spark.sources.sinks import write_triples_csv

    t = spark.createDataFrame(
        [(0, "Acme", "bought", "Globex", ["/ORG"], [])],
        "doc_idx int, subj string, pred string, obj string, "
        "subj_types array<string>, obj_types array<string>",
    )
    out = str(tmp_path / "csv")
    write_triples_csv(t, out, typed=True)
    got = spark.read.option("header", "true").csv(out)
    assert got.columns == ["index", "s1", "r", "s2", "t1", "t2", "ct1", "ct2"]
    row = got.collect()[0]
    assert row.s1 == "Acme" and row.t1 == "/ORG"
