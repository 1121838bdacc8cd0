"""Chunk-merge rules R3–R11 — the rule-based extractor's tagging passes.

Re-expresses the span-merge pipeline of reference
``candidate_extraction/triples_from_text.py:47-220`` over the plain ``Tok``
lists produced by :mod:`seq2kg_spark.nlp.tagger` (the reference mutates a
spaCy ``Doc`` via ``retokenize()``; we rebuild an immutable token list per
pass — same effect, no spaCy dependency).  Pure Python, executed inside
Arrow batches only.

Pass order (must match the reference exactly — later passes see the merged
tokens of earlier ones):

1. R4  NER entities + noun chunks → single ENTITY tokens
2. R5  ENTITY-of-ENTITY → ENTITY (skip when left token dep == 'attr')
3. R6  VERB VERB → VERB
4. R7  VERB + ADP/PART → VERB
5. R8  ADP/PART + VERB → VERB
6. R6' VERB VERB again
7. R9  bracketed spans → ENTITY
8. R10 ENTITY ENTITY → ENTITY
9. R11 token-table emit with the ROOT/prev-dep and '.'-sentence quirks
"""

from __future__ import annotations

from seq2kg_spark.nlp.tagger import Analysis, Tok

_DEP_PRIORITY = ("ROOT", "nsubj", "nsubjpass", "attr", "dobj", "pobj")


def filter_spans(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """R3 — greedy longest-first non-overlapping span filter.

    Mirrors reference triples_from_text.py:47-57: sort by
    ``(length, start)`` REVERSED — so equal-length overlaps prefer the
    LATER span (the reference's exact tie-break) — keep a span iff neither
    its first nor its last token was already claimed, then claim the range.
    """
    sorted_spans = sorted(spans, key=lambda s: (s[1] - s[0], s[0]), reverse=True)
    result: list[tuple[int, int]] = []
    seen: set[int] = set()
    for start, end in sorted_spans:
        if start not in seen and (end - 1) not in seen:
            result.append((start, end))
            seen.update(range(start, end))
    return result


def _span_root(toks: list[Tok], start: int, end: int) -> Tok:
    """Pick the span token whose dep/pos the merged token inherits
    (approximates spaCy's span.root)."""
    for dep in _DEP_PRIORITY:
        for t in toks[start:end]:
            if t.dep == dep:
                return t
    return toks[end - 1]


def merge_spans(
    toks: list[Tok], spans: list[tuple[int, int]], ent_type: str, text: str
) -> list[Tok]:
    """Merge each span into a single token (reference tag_chunks_spans).

    Merged token text is the exact character slice of the document, so
    internal spacing/punctuation is preserved verbatim.
    """
    spans = filter_spans(spans)
    if not spans:
        return toks
    spans = sorted(spans)
    out: list[Tok] = []
    i = 0
    span_ix = 0
    n = len(toks)
    while i < n:
        if span_ix < len(spans) and spans[span_ix][0] == i:
            start, end = spans[span_ix]
            root = _span_root(toks, start, end)
            merged = Tok(
                text=text[toks[start].idx:toks[end - 1].end],
                idx=toks[start].idx,
                pos=ent_type if ent_type == "VERB" else root.pos,
                tag=root.tag,
                ent_type=ent_type,
                dep=root.dep,
                lemma=root.lemma,
            )
            out.append(merged)
            i = end
            span_ix += 1
        else:
            out.append(toks[i])
            i += 1
    for k, t in enumerate(out):
        t.i = k
    return out


def apply_chunk_merges(analysis: Analysis) -> list[Tok]:
    """Run merge passes R4–R10 in reference order."""
    text = analysis.text
    toks = analysis.tokens

    # R4: NER entities + noun chunks (entities listed first, as in the ref)
    toks = merge_spans(toks, analysis.ent_spans + analysis.chunk_spans,
                       "ENTITY", text)

    # R5: ENTITY of ENTITY (left token dep == 'attr' skips; our stand-in
    # never emits 'attr', preserved for the seam)
    spans = []
    for i in range(2, len(toks)):
        left, mid, right = toks[i - 2], toks[i - 1], toks[i]
        if left.dep == "attr":
            continue
        if left.ent_type == "ENTITY" and right.ent_type == "ENTITY" \
                and mid.text == "of":
            spans.append((left.i, right.i + 1))
    toks = merge_spans(toks, spans, "ENTITY", text)

    def _adjacent(pred) -> list[tuple[int, int]]:
        return [(toks[i - 1].i, toks[i].i + 1)
                for i in range(1, len(toks)) if pred(toks[i - 1], toks[i])]

    # R6: VERB VERB
    toks = merge_spans(
        toks, _adjacent(lambda a, b: a.pos == "VERB" and b.pos == "VERB"),
        "VERB", text)
    # R7: VERB + ADP|PART
    toks = merge_spans(
        toks, _adjacent(lambda a, b: a.pos == "VERB" and b.pos in ("ADP", "PART")),
        "VERB", text)
    # R8: ADP|PART + VERB — except an UNATTACHED infinitival 'to': the
    # reference outputs contain zero 'to X' predicates corpus-wide (96 bare
    # 'to' preds, 117 'to X' preds were OUR artifact), while V+to+V chains
    # ('hopes to save') DO occur — those build via R7 + the R6 re-run, so
    # only the bare PART-'to' left side is excluded here.
    toks = merge_spans(
        toks,
        _adjacent(lambda a, b: b.pos == "VERB" and (
            a.pos == "ADP"
            or (a.pos == "PART" and a.text.lower() != "to"))),
        "VERB", text)
    # R6 again
    toks = merge_spans(
        toks, _adjacent(lambda a, b: a.pos == "VERB" and b.pos == "VERB"),
        "VERB", text)

    # R9: bracketed spans → ENTITY (reference :174-193 incl. the start==0 quirk)
    start = end = 0
    spans = []
    for i in range(len(toks)):
        if toks[i].tag == "-LRB-" or "(" in toks[i].text:
            start = toks[i].i
            continue
        if toks[i].tag == "-RRB-" or ")" in toks[i].text:
            end = toks[i].i + 1
        if end > start and start != 0:
            spans.append((start, end))
            start = end = 0
    toks = merge_spans(toks, spans, "ENTITY", text)

    # R10: ENTITY ENTITY
    toks = merge_spans(
        toks,
        _adjacent(lambda a, b: a.ent_type == "ENTITY" and b.ent_type == "ENTITY"),
        "ENTITY", text)
    return toks


def token_table(toks: list[Tok]) -> list[tuple]:
    """R11 — emit one row per token, preserving the reference quirks:

    * a non-verb ROOT token inherits the *previous* token's dep
      (triples_from_text.py:207-218);
    * the sentence counter increments only on a token whose text is
      exactly '.' — abbreviations merge sentences.

    Row: (sent, word_id, word, ent_type, lemma, pos, tag, dep)
    """
    rows = []
    count_sentences = 0
    prev_dep = "nsubj"
    for t in toks:
        dep = t.dep
        if t.dep == "ROOT" and t.pos != "VERB":
            dep = prev_dep
        rows.append((count_sentences, t.i, t.text, t.ent_type, t.lemma,
                     t.pos, t.tag, dep))
        if t.text == ".":
            count_sentences += 1
        prev_dep = t.dep
    return rows
