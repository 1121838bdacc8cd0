"""Unit tests for the chunk-merge rules and the filter battery quirks."""

from seq2kg_spark.nlp.assemble import (
    create_triples,
    extract_triples_from_clean_text,
    filter_battery,
)
from seq2kg_spark.nlp.rules import apply_chunk_merges, filter_spans, token_table
from seq2kg_spark.nlp.tagger import analyze


def test_filter_spans_longest_first_non_overlapping():
    # (0,3) wins over (1,2); (4,6) independent
    assert filter_spans([(1, 2), (0, 3), (4, 6)]) == [(0, 3), (4, 6)]
    # equal length → LATER start wins (reference tie-break), then the
    # greedy claim drops overlaps
    assert filter_spans([(2, 4), (0, 2), (3, 5)]) == [(3, 5), (0, 2)]


def test_entity_merge_and_token_table():
    a = analyze("Jamie Oliver opened Fifteen in London.")
    toks = apply_chunk_merges(a)
    texts = [t.text for t in toks]
    assert "Jamie Oliver" in texts
    assert "London" in texts
    rows = token_table(toks)
    # sentence counter increments only on '.'
    assert rows[-1][2] == "." and rows[-1][0] == 0
    merged = [r for r in rows if r[2] == "Jamie Oliver"]
    assert merged and merged[0][3] == "ENTITY"


def test_verb_adp_merge_makes_phrasal_predicate():
    a = analyze("The company opened in London.")
    toks = apply_chunk_merges(a)
    assert any(t.text == "opened in" and t.pos == "VERB" for t in toks)


def test_create_triples_single_predicate_fanout():
    a = analyze("BYD debuted E-SEED and Song Pro SUV.")
    toks = apply_chunk_merges(a)
    triples = create_triples(token_table(toks), a.corefs)
    assert ["BYD", "debuted", "E-SEED"] in triples or any(
        t[0] == "BYD" and t[1] == "debuted" for t in triples
    )


def test_filter_battery_quirks():
    # stopword subject dropped
    assert filter_battery([["the", "is", "Company"]]) == []
    # all-digit object dropped
    assert filter_battery([["Acme", "raised", "500"]]) == []
    # percent dropped
    assert filter_battery([["Acme", "grew", "5%"]]) == []
    # s == o dropped
    assert filter_battery([["Acme", "bought", "Acme"]]) == []
    # determiner dropped from subject, triple survives
    out = filter_battery([["the Acme Corp", "bought", "Globex Inc"]])
    assert out == [["Acme Corp", "bought", "Globex Inc"]]
    # dedup compares RAW triple vs CLEANED entries (reference quirk):
    # a raw triple equal to an earlier cleaned entry is dropped...
    out = filter_battery(
        [["the Acme Corp", "bought", "Globex"], ["Acme Corp", "bought", "Globex"]]
    )
    assert out == [["Acme Corp", "bought", "Globex"]]
    # ...while two raw-distinct triples that clean to the same thing BOTH
    # survive (post-cleanup duplicates are not deduped)
    out = filter_battery(
        [["the Acme Corp", "bought", "Globex"], ["an Acme Corp", "bought", "Globex"]]
    )
    assert out == [["Acme Corp", "bought", "Globex"],
                   ["Acme Corp", "bought", "Globex"]]


def test_extraction_deterministic():
    text = (
        "Celebrity chef Jamie Oliver's British restaurant chain has become "
        "insolvent, putting 1,300 jobs at risk. The company operates 23 "
        "Jamie's Italian restaurants in the U.K."
    )
    a = extract_triples_from_clean_text(text)
    b = extract_triples_from_clean_text(text)
    assert a == b and len(a) > 0
