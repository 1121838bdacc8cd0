"""N7 — coreference substitution by token surgery (michael variant).

Port of the running-offset mention replacement that appears four times in
the reference (build_triples.py:87-110, joint_model/evaluate.py:410-429,
candidate_filtering/evaluate.py:350-371, redcoat_parser/
redcoat_to_sents.py:76-98): for each coref cluster mention, splice the
cluster main's tokens over the mention span, maintaining a running offset;
mains longer than 3 tokens are skipped.

The cluster source is the tagger's deterministic coref stand-in
(neuralcoref seam — see seq2kg_spark.nlp.tagger).
"""

from __future__ import annotations

from seq2kg_spark.nlp.tagger import Analysis, analyze


def substitute_corefs(
    tokens: list[str],
    mentions: list[tuple[int, int, list[str]]],
) -> list[str]:
    """mentions: (start, end, main_tokens) in token coordinates, in
    document order.  Exact port of the offset-splice loop."""
    out = list(tokens)
    offset = 0
    for start, end, main in mentions:
        orig_len = end - start
        if len(main) > 3:  # ignore long coreference mains (reference rule)
            continue
        new_len = len(main)
        out = out[: start + offset] + list(main) + out[end + offset:]
        offset += new_len - orig_len
    return out


def coref_mentions_from_analysis(a: Analysis) -> list[tuple[int, int, list[str]]]:
    """Token-coordinate mention spans for the stand-in tagger's clusters:
    pronouns and 'the <nominal>' mentions mapped to their main's tokens."""
    mentions: list[tuple[int, int, list[str]]] = []
    token_texts = [t.text for t in a.tokens]
    for mention, main in a.corefs:
        m_toks = mention.split()
        # locate the mention's token span (first occurrence scan is enough
        # for the deterministic stand-in's clusters)
        for i in range(len(token_texts) - len(m_toks) + 1):
            if token_texts[i:i + len(m_toks)] == m_toks:
                mentions.append((i, i + len(m_toks), main.split()))
                break
    mentions.sort(key=lambda m: m[0])
    return mentions


def coref_resolve_text(text: str) -> list[str]:
    """Analyze → substitute; returns the coref-resolved token list."""
    a = analyze(text)
    mentions = coref_mentions_from_analysis(a)
    return substitute_corefs([t.text for t in a.tokens], mentions)
