"""Candidate generation (N1–N4) + filtering (C1–C5)."""

from seq2kg_spark.nlp.chunker import (
    candidates_from_doc,
    chunk_phrases,
    get_permutations,
    pos_tag_sentence,
    sent_tokenize,
)


def test_sentence_split():
    s = sent_tokenize("Acme bought Globex. The deal closed Monday! Done?")
    assert len(s) == 3 and s[0] == "Acme bought Globex."


def test_chunking_np_rp():
    tagged = pos_tag_sentence("Jamie Oliver opened Fifteen in London.")
    phrases = chunk_phrases(tagged)
    types = [t for _p, t in phrases]
    assert ("Jamie Oliver", "NP") in phrases
    assert "RP" in types


def test_permutations_np_rp_np():
    phrases = [("Acme", "NP"), ("bought", "RP"), ("Globex", "NP"),
               ("in", "RP"), ("London", "NP")]
    out = get_permutations(phrases)
    assert ["Acme", "bought", "Globex"] in out
    assert ["Acme", "bought", "London"] in out
    # re-entry with the same head picks the SECOND rel too
    assert ["Acme", "in", "London"] in out
    assert ["Globex", "in", "London"] in out


def test_permutations_last_phrase_only_np_quirk():
    # head at the very end is never used (get_next_head_idx returns -1
    # before inspecting the final phrase — reference off-by-one preserved)
    phrases = [("ran", "RP"), ("Acme", "NP")]
    assert get_permutations(phrases) == []


def test_candidates_from_doc_end_to_end():
    out = candidates_from_doc(
        "Jamie Oliver opened Fifteen in London. KPMG oversees the process."
    )
    assert len(out) > 0
    assert all(len(t) == 3 for t in out)


def test_filtering_pipeline_spark(spark, pages):
    from pyspark.sql import functions as F

    from seq2kg_spark.operators.candidates import (
        candidate_filtering_pipeline,
        generate_candidates,
        score_candidates,
    )

    docs = (
        pages.limit(15)
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
    )
    cand = generate_candidates(docs)
    n_cand = cand.count()
    assert n_cand > 0
    scored = score_candidates(cand)
    assert scored.columns == ["doc_id", "s", "r", "o", "confidence"]
    assert scored.count() == cand.dropna(subset=["s", "r", "o"]).count()
    out = candidate_filtering_pipeline(docs)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 10 for r in per_doc)
    confs = [r.confidence for r in out.collect()]
    assert all(c > 0.33 for c in confs)


def test_ann_variants_agree_roughly(spark):
    from seq2kg_spark.operators.ann import (
        brute_force_topk,
        ivf_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(5))
    bf = {(r.query_id, r.neighbor_id)
          for r in brute_force_topk(emb, query_ids=qids, k=5).collect()}
    iv = {(r.query_id, r.neighbor_id)
          for r in ivf_topk(emb, query_ids=qids, k=5).collect()}
    ls = {(r.query_id, r.neighbor_id)
          for r in lsh_bucketed_topk(emb, query_ids=qids, k=5).collect()}
    assert len(bf) == 25
    assert len(bf & iv) / len(bf) >= 0.5   # IVF recall
    assert len(ls) > 0                     # LSH returns in-bucket matches
