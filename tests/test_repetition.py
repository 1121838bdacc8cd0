"""Within-document repetition signals (Gopher-style curation gates)."""

from seq2kg_spark.operators.repetition import repetition_stats


def test_repetition_stats_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat. the cat sat. a dog ran."),
         (2, "one two one two one two"),
         (3, "word"),
         (5, "Unique sentence here. Another one follows. Third bit.")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}

    # doc 1: segment "the cat sat" repeats; trailing period stays attached
    # to the final segment (the split consumes '. ' only mid-document)
    assert (out[1].n_segments, out[1].n_dup_segments) == (3, 1)
    assert (out[1].top_bigram, out[1].top_bigram_n) == ("cat sat.", 2)
    # doc 2: no '. ' → one segment; dominant bigram counted across overlaps
    assert (out[2].n_segments, out[2].n_dup_segments) == (1, 0)
    assert (out[2].top_bigram, out[2].top_bigram_n) == ("one two", 3)
    # doc 3: single word → no bigram, but the row survives
    assert out[3].n_words == 1
    assert out[3].top_bigram is None and out[3].top_bigram_n is None
    # doc 5: all unique; ties broken to the lexicographically smallest
    assert out[5].n_dup_segments == 0
    assert out[5].top_bigram_n == 1


def test_repetition_stats_tie_break_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "b b a a")],  # bigrams: "b b", "b a", "a a" — all count 1
        "doc_id long, text string")
    row = repetition_stats(docs).collect()[0]
    assert row.top_bigram == "a a"
