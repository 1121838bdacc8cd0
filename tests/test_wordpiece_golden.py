"""Golden wordpiece parity: our tokenizer vs the reference BERT tokenizer.

Imports the reference's own tokenization module (end_to_end_model/bert/
tokenization.py) at test time and checks that, given the same basic-token
stream, ``WordPieceTokenizer`` (default vocab = the shipped public
bert-base-cased vocab.txt, resolved via ``resolve_vocab_path``) produces a
byte-identical wordpiece stream on real reference eval sentences.  Skipped
when the reference checkout is absent.
"""

import importlib.util
import os

import pytest

from seq2kg_spark.nlp.wordpiece import WordPieceTokenizer, resolve_vocab_path

_REF_TOK = "/root/reference/sourcecode/end_to_end_model/bert/tokenization.py"
_REF_DOCS = (
    "/root/reference/sourcecode/redcoat_parser/output/"
    "cateringServices/filtering_model/documents_test.txt"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF_TOK) or resolve_vocab_path() is None,
    reason="reference checkout / vocab.txt not available",
)


def _ref_module():
    spec = importlib.util.spec_from_file_location("ref_tokenization", _REF_TOK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sample_texts(n=40):
    texts = []
    if os.path.exists(_REF_DOCS):
        with open(_REF_DOCS, encoding="utf-8", errors="replace") as f:
            for line in f:
                if line.strip():
                    texts.append(line[:2000])
                if len(texts) >= n:
                    break
    texts += [
        "BYD debuted its E-SEED GT concept car at the Shanghai exhibition.",
        "unaffable snozzberries, naïve café — 北京 2019!",
        "",
        "   ",
        "a" * 250,  # > max_input_chars_per_word → [UNK] both sides
    ]
    return texts


def test_wordpiece_stream_matches_reference_tokenizer():
    m = _ref_module()
    vocab_path = resolve_vocab_path()
    full = m.FullTokenizer(vocab_path, do_lower_case=False)
    basic = m.BasicTokenizer(do_lower_case=False)
    ours = WordPieceTokenizer()  # default = same vocab file

    n_tokens = 0
    for text in _sample_texts():
        ref_stream = full.tokenize(text)
        our_stream = [p for t in basic.tokenize(text)
                      for p in ours.wordpieces_of(t)]
        assert our_stream == ref_stream, text[:120]
        n_tokens += len(ref_stream)
    assert n_tokens > 500  # the corpus sample actually exercised the vocab


def test_vocab_ids_match_reference_load_vocab():
    m = _ref_module()
    vocab_path = resolve_vocab_path()
    ref_vocab = m.load_vocab(vocab_path)
    ours = WordPieceTokenizer()
    assert dict(ref_vocab) == ours.vocab
