"""Graph analytics over the materialized KG tables (operators/graph.py)."""


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_degree_topk_counts_and_tiebreak(spark):
    from seq2kg_spark.operators.graph import degree_topk

    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")])
    got = [(r.node, r.degree) for r in degree_topk(e, k=10).collect()]
    # a: 3 (2 out + 1 in), b: 2, c: 2, d: 1; tie b/c broken lexically
    assert got == [("a", 3), ("b", 2), ("c", 2), ("d", 1)]


def test_pagerank_star_center_wins_and_deterministic(spark):
    from seq2kg_spark.operators.graph import PR_SCALE, pagerank_int

    star = [(f"leaf{i}", "center") for i in range(10)]
    e = _edges(spark, star)
    r1 = {r.node: r.rank for r in pagerank_int(e, n_iter=5).collect()}
    r2 = {r.node: r.rank for r in pagerank_int(e, n_iter=5).collect()}
    assert r1 == r2                            # bit-deterministic
    assert max(r1, key=r1.get) == "center"
    # leaves are dangling after round 1: they settle at the base rank
    assert r1["leaf0"] == PR_SCALE * 15 // 100
    # center accumulates damped leaf mass, stays above base
    assert r1["center"] > PR_SCALE


def test_pagerank_two_node_cycle_conserves(spark):
    """In a 2-cycle every node keeps feeding the other; hand-compute one
    round: rank' = 150000 + floor(0.85 * floor(10^6 / 1))."""
    from seq2kg_spark.operators.graph import pagerank_int

    e = _edges(spark, [("x", "y"), ("y", "x")])
    r = {n.node: n.rank for n in pagerank_int(e, n_iter=1).collect()}
    assert r == {"x": 1_000_000, "y": 1_000_000}
