"""Property-based tests (hypothesis) for the pure kernels, plus N6/A11."""

from hypothesis import given, settings
from hypothesis import strategies as st

from seq2kg_spark.functions.text_clean import clean_text_py
from seq2kg_spark.nlp.assemble import filter_battery, rank_by_degree
from seq2kg_spark.nlp.chunker import get_all_permutations, get_permutations
from seq2kg_spark.nlp.rules import filter_spans

spans_st = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 8)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    max_size=12,
)


@given(spans_st)
def test_filter_spans_never_overlap(spans):
    out = filter_spans(spans)
    claimed = set()
    for s, e in out:
        assert not (set(range(s, e)) & claimed)
        claimed.update(range(s, e))
    # greedy-longest: every input span either kept or conflicts with a kept one
    for s, e in spans:
        assert (s, e) in out or (s in claimed or (e - 1) in claimed)


@given(st.text(max_size=200))
@settings(max_examples=300)
def test_clean_text_total_and_idempotent_on_output_shape(text):
    out = clean_text_py(text)
    assert "\t" not in out and "  " not in out
    assert out == out.strip()
    # cleaning is deterministic
    assert clean_text_py(text) == out


@given(st.lists(
    st.tuples(st.text(alphabet="abcXYZ ", min_size=1, max_size=8),
              st.sampled_from(["NP", "RP"])), max_size=10))
def test_get_permutations_terminates_and_shape(phrases):
    out = get_permutations(phrases)
    assert all(len(t) == 3 for t in out)
    np_texts = {p for p, ty in phrases if ty == "NP"}
    rp_texts = {p for p, ty in phrases if ty == "RP"}
    for h, r, t in out:
        assert h in np_texts and r in rp_texts and t in np_texts


@given(st.lists(
    st.tuples(st.text(alphabet="ABCabc", min_size=2, max_size=6),
              st.text(alphabet="rs", min_size=1, max_size=3),
              st.text(alphabet="XYZxyz", min_size=2, max_size=6)),
    max_size=8))
def test_filter_battery_output_always_clean(triples):
    out = filter_battery([list(t) for t in triples])
    for s, p, o in out:
        assert s and p and o
        assert s != o


def test_n6_exhaustive_permutations_shape():
    out = get_all_permutations(
        "Jamie Oliver opened Fifteen in London".split(), doc_idx=7
    )
    assert out and all(row[0] == 7 and len(row) == 4 for row in out)
    assert [7, "Jamie", "opened", "Fifteen"] in out


def test_a11_rank_by_degree_preserves_edges():
    triples = [["a", "r1", "b"], ["b", "r2", "c"], ["a", "r3", "c"]]
    ranked = rank_by_degree(triples)
    assert sorted(map(tuple, ranked)) == sorted(map(tuple, triples))
