"""F1 — WordPiece tokenization (greedy longest-match-first).

Faithful re-expression of the reference's WordPiece algorithm
(end_to_end_model/bert/tokenization.py:300-358): greedy longest-match over
a cased vocab, ``##`` continuation prefix, ``[UNK]`` for unmatchable
tokens, ``[CLS]…[SEP]`` wrapping, and the token→wordpiece index map
(joint_model/data_utils.py:50-59).

The released BERT vocab is not shipped in this environment, so the default
vocab is a deterministic stand-in: all printable single characters plus the
engine's closed-class lexicons and common suffixes.  The algorithm (and
everything downstream) is vocab-agnostic — point ``WordPieceTokenizer`` at
a real ``vocab.txt`` on a production cluster and the stand-in disappears.
"""

from __future__ import annotations

import string

from seq2kg_spark.nlp.tagger import (
    ADJECTIVES_EXTRA,
    ADPOSITIONS,
    ADVERBS_EXTRA,
    AUXILIARIES,
    CONJUNCTIONS,
    DETERMINERS,
    PRONOUNS,
    VERB_STEMS,
)

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"

_COMMON_SUFFIXES = ["ing", "ed", "er", "est", "ly", "tion", "sion", "ment",
                    "ness", "ity", "es", "s", "al", "ic", "ous", "ive"]


def default_vocab() -> dict[str, int]:
    words: list[str] = [PAD, UNK, CLS, SEP]
    words += sorted(set(string.printable.strip()) | set(string.ascii_letters))
    words += ["##" + c for c in string.ascii_letters + string.digits]
    lex = sorted(
        set().union(DETERMINERS, ADPOSITIONS, PRONOUNS, CONJUNCTIONS,
                    AUXILIARIES, VERB_STEMS, ADVERBS_EXTRA, ADJECTIVES_EXTRA)
    )
    words += lex
    words += [w.capitalize() for w in lex]
    words += ["##" + s for s in _COMMON_SUFFIXES]
    vocab: dict[str, int] = {}
    for w in words:
        if w not in vocab:
            vocab[w] = len(vocab)
    return vocab


class WordPieceTokenizer:
    def __init__(self, vocab: dict[str, int] | None = None,
                 max_chars_per_word: int = 100):
        self.vocab = vocab if vocab is not None else default_vocab()
        self.max_chars_per_word = max_chars_per_word

    @classmethod
    def from_vocab_file(cls, path: str) -> "WordPieceTokenizer":
        vocab: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                tok = line.rstrip("\n")
                if tok and tok not in vocab:
                    vocab[tok] = len(vocab)
        return cls(vocab)

    def wordpieces_of(self, token: str) -> list[str]:
        """Greedy longest-match-first split of one token."""
        if len(token) > self.max_chars_per_word:
            return [UNK]
        pieces: list[str] = []
        start = 0
        while start < len(token):
            end = len(token)
            cur = None
            while start < end:
                sub = token[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def encode_sentence(
        self, tokens: list[str]
    ) -> tuple[list[str], list[int]]:
        """[CLS] wp* [SEP] plus token→first-wordpiece index map
        (joint_model/data_utils.py:50-59 contract)."""
        wps: list[str] = [CLS]
        tok_to_wp: list[int] = []
        for tok in tokens:
            tok_to_wp.append(len(wps))
            wps.extend(self.wordpieces_of(tok))
        wps.append(SEP)
        return wps, tok_to_wp

    def expand_map(self, tok_to_wp: list[int], n_wps: int) -> list[list[int]]:
        """[1,3,4] → [[1,2],[3],[4,…]] (data_utils.py:235-251)."""
        out: list[list[int]] = []
        for i, start in enumerate(tok_to_wp):
            end = tok_to_wp[i + 1] if i + 1 < len(tok_to_wp) else n_wps - 1
            out.append(list(range(start, end)))
        return out
