"""N1–N4 — NLTK-style candidate triple generation (model 2 front-end).

Re-expression of reference redcoat_parser/build_triples.py:17-170 without
the NLTK dependency (not installable here):

* N1 sentence split — deterministic regex splitter standing in for Punkt.
* N2 tokenize + PTB tags — our tagger's tokenizer/fine tags.
* N3 regex chunking — grammar ``NP: {<CD>*<NN.*>+<NN.*|POS>*}``,
  ``RP: {<VB.*|IN>+}`` implemented as a direct scan over the tag sequence;
  phrases kept only if they contain an alphanumeric token
  (build_triples.py:166-169).
* N4 ``get_permutations`` — ported loop-for-loop, preserving the
  ``get_next_head_idx`` return-None-at-end quirk (build_triples.py:37-42:
  falls off the loop returning None when the tail of the list has no NP —
  Python's implicit None, which the while-loop treats like -1 via the
  ``start_idx == -1`` check never matching → we normalize both sentinels).
"""

from __future__ import annotations

import re

from seq2kg_spark.nlp.tagger import _TOKEN_RE, Tok, _assign_pos

_SENT_SPLIT_RE = re.compile(
    r"(?<=[.!?])\s+(?=[A-Z\"'(])"  # boundary: terminal punct + space + capital
)

_NP_HEAD = {"NN", "NNS", "NNP", "NNPS"}
_RP_TAGS = {"VB", "VBD", "VBG", "VBN", "VBP", "IN"}


def sent_tokenize(doc: str) -> list[str]:
    """N1 — deterministic sentence splitter (Punkt stand-in)."""
    parts = [p.strip() for p in _SENT_SPLIT_RE.split(doc)]
    return [p for p in parts if p]


def pos_tag_sentence(sent: str) -> list[tuple[str, str]]:
    """N2 — (word, PTB tag) pairs via the deterministic tagger."""
    toks = [Tok(text=m.group(0), idx=m.start())
            for m in _TOKEN_RE.finditer(sent)]
    for i, t in enumerate(toks):
        t.i = i
    _assign_pos(toks)
    return [(t.text, t.tag) for t in toks]


def chunk_phrases(tagged: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """N3 — (phrase, 'NP'|'RP') list in sentence order.

    NP: CD* (NN|NNS|NNP|NNPS)+ (NN...|POS)*;  RP: (VB|VBD|VBG|VBN|VBP|IN)+
    Both longest-match, scanned left to right (RegexpParser semantics for
    this grammar).  Phrases need ≥1 alnum token to be kept.
    """
    phrases: list[tuple[str, str]] = []
    n = len(tagged)
    i = 0
    while i < n:
        w, tag = tagged[i]
        # try NP: optional CDs then at least one noun
        j = i
        while j < n and tagged[j][1] == "CD":
            j += 1
        if j < n and tagged[j][1] in _NP_HEAD:
            k = j
            while k < n and tagged[k][1] in _NP_HEAD:
                k += 1
            while k < n and (tagged[k][1] in _NP_HEAD or tagged[k][1] == "POS"):
                k += 1
            words = [tagged[x][0] for x in range(i, k)]
            if any(c.isalnum() for word in words for c in word):
                phrases.append((" ".join(words), "NP"))
            i = k
            continue
        if tag in _RP_TAGS:
            k = i
            while k < n and tagged[k][1] in _RP_TAGS:
                k += 1
            words = [tagged[x][0] for x in range(i, k)]
            if any(c.isalnum() for word in words for c in word):
                phrases.append((" ".join(words), "RP"))
            i = k
            continue
        i += 1
    return phrases


def get_permutations(
    phrases: list[tuple[str, str]], max_dist: int = 15, max_rp_dist: int = -1
) -> list[list[str]]:
    """N4 — NP→RP→NP scan (build_triples.py:31-84, quirks preserved)."""
    triples: list[list[str]] = []
    if len(phrases) == 0:
        return []

    def get_next_head_idx(start_idx: int) -> int:
        rest = phrases[start_idx:]
        for i, (_p, ptype) in enumerate(rest):
            if i == len(rest) - 1:
                return -1  # the reference's early return, incl. when the
                # last phrase is the only remaining NP
            if ptype == "NP":
                return start_idx + i
        return -1  # reference falls off the loop → None; normalize to -1

    start_idx = get_next_head_idx(0)
    seen_rels: list[set] = [set() for _ in phrases]
    seen_tails: list[set] = [set() for _ in phrases]

    # Structurally identical to the reference while/for: a pass that picks
    # a rel but reaches the window end re-enters with the SAME head and the
    # rel in seen_rels (so the next unseen RP is tried), and only advances
    # when a pass ends with current_rel still None.  seen_rels guarantees
    # termination (each non-advancing pass consumes one unseen RP).
    while True:
        if start_idx == -1 or start_idx is None:
            return triples
        current_head = phrases[start_idx][0]
        current_rel = None
        end_idx = min(len(phrases), start_idx + max_dist)
        window = phrases[start_idx + 1:end_idx]
        if not window:
            return triples
        for idx, (phrase_2, phrase_type_2) in enumerate(window):
            if phrase_type_2 == "NP" and current_rel is not None:
                triples.append([current_head, current_rel, phrase_2])
                seen_tails[start_idx].add(phrase_2)
                if max_rp_dist > 0 and len(seen_tails[start_idx]) >= max_rp_dist:
                    start_idx = get_next_head_idx(start_idx + 1)
                    break
            elif (phrase_type_2 == "RP" and current_rel is None
                  and phrase_2 not in seen_rels[start_idx]):
                current_rel = phrase_2
                seen_rels[start_idx].add(phrase_2)
            if idx == len(window) - 1 and current_rel is None:
                start_idx = get_next_head_idx(start_idx + 1)
                break
    return triples


def candidates_from_doc(doc: str, max_dist: int = 15) -> list[list[str]]:
    """N1–N4 for one document: list of [sent_idx-free] (s, r, o)."""
    out: list[list[str]] = []
    for sent in sent_tokenize(doc):
        tagged = pos_tag_sentence(sent)
        phrases = chunk_phrases(tagged)
        out.extend(get_permutations(phrases, max_dist=max_dist))
    return out


# --------------------------------------------------------------------------
# N6 — exhaustive span permutations (redcoat_parser/get_all_permutations.py:
# 20-61; off the main path but part of the operator inventory).
# --------------------------------------------------------------------------

def _phrase_type(tagged: list[tuple[str, str]]) -> str:
    """Universal-tagset phrase typing used by N6: NP = ADJ* NOUN+ (must
    start the phrase), RP = (VERB|ADP)+ (grammar at
    get_all_permutations.py:3-10; only the FIRST chunk's type is read)."""
    if not tagged:
        return ""
    pos = []
    for _w, tag in tagged:
        if tag in ("NNP", "NNPS"):
            pos.append("NOUN")
        elif tag.startswith("NN") or tag == "CD":
            pos.append("NOUN")
        elif tag.startswith("VB") or tag == "IN" or tag == "TO":
            pos.append("RPX")
        elif tag.startswith("JJ"):
            pos.append("ADJ")
        else:
            pos.append("OTHER")
    # NP: {<NOUN>+} or {<ADJ>+<NOUN>+} anchored at phrase start
    i = 0
    while i < len(pos) and pos[i] == "ADJ":
        i += 1
    if i < len(pos) and pos[i] == "NOUN" and all(
        p == "NOUN" for p in pos[i:]
    ) and (i == 0 or pos[0] == "ADJ"):
        return "NP"
    if all(p == "RPX" for p in pos):
        return "RP"
    return ""


def get_all_permutations(
    tokens: list[str], doc_idx: int, max_size: int = 3, max_dist: int = 7
) -> list[list]:
    """N6 — every NP/RP/NP span combination within distance bounds."""
    triples: list[list] = []
    n = len(tokens)
    for h in range(1, max_size + 1):
        for r in range(1, max_size + 1):
            for t in range(1, max_size + 1):
                for head_idx in range(0, n - r - t):
                    head = tokens[head_idx:head_idx + h]
                    if _phrase_type(pos_tag_tokens(head)) != "NP":
                        continue
                    for rel_idx in range(head_idx + h,
                                         min(head_idx + h + max_dist, n - r)):
                        rel = tokens[rel_idx:rel_idx + r]
                        if _phrase_type(pos_tag_tokens(rel)) != "RP":
                            continue
                        for tail_idx in range(
                            head_idx + h + r,
                            min(head_idx + h + r + max_dist, n),
                        ):
                            if tail_idx + t > n:
                                continue
                            tail = tokens[tail_idx:tail_idx + t]
                            if _phrase_type(pos_tag_tokens(tail)) == "NP":
                                triples.append([
                                    doc_idx,
                                    " ".join(head),
                                    " ".join(rel),
                                    " ".join(tail),
                                ])
    return triples


def pos_tag_tokens(tokens: list[str]) -> list[tuple[str, str]]:
    """PTB tags for an already-tokenized span (N6 helper)."""
    toks = [Tok(text=w, idx=0) for w in tokens]
    for i, t in enumerate(toks):
        t.i = i
    _assign_pos(toks)
    return [(t.text, t.tag) for t in toks]
