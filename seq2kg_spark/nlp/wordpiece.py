"""F1 — WordPiece tokenization (greedy longest-match-first).

Faithful re-expression of the reference's WordPiece algorithm
(end_to_end_model/bert/tokenization.py:300-358): greedy longest-match over
a cased vocab, ``##`` continuation prefix, ``[UNK]`` for unmatchable
tokens, ``[CLS]…[SEP]`` wrapping, and the token→wordpiece index map
(joint_model/data_utils.py:50-59).

Default vocab resolution (``resolve_vocab_path``): the ``SEQ2KG_BERT_VOCAB``
env var first (on a cluster: ship the file via ``spark-submit --files
vocab.txt`` and point the var at it), then the reference checkout's shipped
public bert-base-cased ``vocab.txt`` (28,996 entries) when present locally.
Only when neither exists does a deterministic stand-in vocab (printable
chars + closed-class lexicons + common suffixes) kick in, so wordpiece
streams are byte-identical to the reference tokenizer wherever the real
vocab is reachable.  ``from_vocab_file`` mirrors the reference
``load_vocab`` exactly (tokenization.py:122-134): one index per line,
``strip()``-ed, duplicates keep the LATER index.
"""

from __future__ import annotations

import os
import string
import warnings
from functools import lru_cache

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


_REFERENCE_VOCAB_PATHS = (
    "/root/reference/sourcecode/end_to_end_model/bert/vocab.txt",
    "/root/reference/sourcecode/joint_model/bert/vocab.txt",
)


def resolve_vocab_path() -> str | None:
    """SEQ2KG_BERT_VOCAB env var, else the reference checkout's public
    bert-base-cased vocab when present, else None (stand-in vocab).

    An explicitly-configured path that doesn't exist is an ERROR, not a
    silent fallback: on a cluster, an executor missing the shipped file
    would otherwise tokenize with a different vocab than the driver and
    produce divergent wordpiece streams within one job.
    """
    env = os.environ.get("SEQ2KG_BERT_VOCAB")
    if env:
        if not os.path.exists(env):
            raise FileNotFoundError(
                f"SEQ2KG_BERT_VOCAB points at a missing file: {env!r} "
                "(ship it with spark-submit --files and set the var to the "
                "executor-local path)"
            )
        return env
    for p in _REFERENCE_VOCAB_PATHS:
        if os.path.exists(p):
            return p
    return None


@lru_cache(maxsize=4)
def load_vocab_file(path: str) -> "tuple[tuple[str, int], ...]":
    """Reference load_vocab semantics (tokenization.py:122-134): every line
    consumes an index; the token is whitespace-stripped; a duplicate token
    keeps the later index.  Cached (the tokenizer is built inside Arrow-batch
    UDFs — one parse per executor process, not per batch)."""
    vocab: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for index, line in enumerate(f):
            vocab[line.strip()] = index
    return tuple(vocab.items())


@lru_cache(maxsize=1)
def _resolved_default_vocab() -> "tuple[tuple[str, int], ...]":
    path = resolve_vocab_path()
    # One-time (per process) note of which vocab source won, so driver vs
    # executor divergence is detectable in the logs.
    if path is not None:
        warnings.warn(f"seq2kg wordpiece vocab: {path}", stacklevel=2)
        return load_vocab_file(path)
    warnings.warn(
        "seq2kg wordpiece vocab: built-in stand-in (no SEQ2KG_BERT_VOCAB, "
        "no reference checkout)", stacklevel=2,
    )
    return tuple(default_vocab().items())


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
    # max_input_chars_per_word=200 matches the reference WordpieceTokenizer
    # default (tokenization.py:304)
    def __init__(self, vocab: dict[str, int] | None = None,
                 max_chars_per_word: int = 200):
        self.vocab = (vocab if vocab is not None
                      else dict(_resolved_default_vocab()))
        self.max_chars_per_word = max_chars_per_word

    @classmethod
    def from_vocab_file(cls, path: str) -> "WordPieceTokenizer":
        return cls(dict(load_vocab_file(path)))

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
