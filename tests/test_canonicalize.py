"""Connected components + canonicalization."""

from pyspark.sql import functions as F

from seq2kg_spark.operators.canonicalize import (
    canonicalize,
    connected_components,
    similarity_edges,
    mentions_from_triples,
)


def _cc(spark, pairs):
    e = spark.createDataFrame(pairs, "a string, b string")
    return {
        (r.node, r.component)
        for r in connected_components(e).collect()
    }


def test_cc_chain_and_islands(spark):
    got = _cc(spark, [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")])
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
                   ("x", "x"), ("y", "x")}


def test_cc_two_triangles_bridge(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("p", "q"), ("q", "r"), ("p", "r"), ("c", "p")]
    got = _cc(spark, pairs)
    assert {c for _n, c in got} == {"a"}
    assert {n for n, _c in got} == {"a", "b", "c", "p", "q", "r"}


def test_canonicalize_merges_possessive_and_case(spark):
    triples = spark.createDataFrame(
        [
            ("u1", "BYD", "debuted", "E-SEED GT"),
            ("u2", "BYD's", "launched", "Song Pro"),
            ("u3", "byd", "showcased", "Dynasty series"),
            ("u4", "Jamie Oliver", "opened", "Fifteen"),
        ],
        "url string, subj string, pred string, obj string",
    )
    nodes, edges = canonicalize(triples, threshold=0.5)
    nrows = {r.canonical: r for r in nodes.collect()}
    # all three BYD surface forms share one canonical node
    byd = [r for c, r in nrows.items() if "byd" in c.lower()]
    assert len(byd) == 1
    assert set(byd[0].members) >= {"BYD", "BYD's", "byd"}
    assert byd[0].n_mentions == 3
    e = edges.collect()
    assert all(r.weight >= 1 for r in e)
    # every edge endpoint resolves to a node id
    ids = {r.canon_id for r in nodes.collect()}
    assert all(r.src in ids and r.dst in ids for r in e)


def test_similarity_edges_blocking_not_quadratic(spark):
    # distinct unrelated mentions should produce no candidate pairs
    triples = spark.createDataFrame(
        [("u", f"Entity{i:03d} Unrelated{i:03d}", "p", f"Other{i:03d}")
         for i in range(50)],
        "url string, subj string, pred string, obj string",
    )
    m = mentions_from_triples(triples)
    sim = similarity_edges(m, threshold=0.9)
    assert sim.count() == 0


def test_similarity_edges_hot_bucket_guard(spark):
    """The max_bucket skew guard bounds the LSH self-join: with the cap at
    1, every candidate-producing bucket (≥2 members) is dropped, so no
    pairs survive; with the default cap the near-identical mentions pair
    up as before."""
    triples = spark.createDataFrame(
        [("u", f"Globex Corporation {i}", "p", "x") for i in range(8)],
        "url string, subj string, pred string, obj string",
    )
    m = mentions_from_triples(triples)
    assert similarity_edges(m, threshold=0.5).count() > 0
    assert similarity_edges(m, threshold=0.5, max_bucket=1).count() == 0
