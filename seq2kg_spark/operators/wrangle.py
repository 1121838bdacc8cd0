"""W1–W6 — dataset wrangling (redcoat_parser re-expression).

All label surgery is pure Catalyst (higher-order array functions); only the
span→mention builder (W5) is per-row Python (stateful scan), run inside
Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def w1_reformat_labels(labels: Column) -> Column:
    """W1 — raw Redcoat labels → {type, type/idx} set
    (create_datasets.py:85-99: keep labels containing '/', take segment 1,
    split on '_', emit both the bare type and type/idx; set semantics).
    Output sorted for determinism (the reference materializes a set).
    """
    with_slash = F.filter(labels, lambda l: l.contains("/"))
    seg = F.transform(with_slash, lambda l: F.split_part(l, F.lit("/"), F.lit(2)))
    pairs = F.transform(
        seg,
        lambda s: F.array(
            F.split_part(s, F.lit("_"), F.lit(1)),
            F.concat_ws(
                "/", F.split_part(s, F.lit("_"), F.lit(1)),
                F.split_part(s, F.lit("_"), F.lit(2)),
            ),
        ),
    )
    return F.array_sort(F.array_distinct(F.flatten(pairs)))


def w2_train_dev_split(
    df: DataFrame, key_col: str = "doc_id", dev_fraction: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """W2 — deterministic train/dev split.

    The reference shuffles with seed 127 and slices 90/10
    (create_datasets.py:13-17) — order-dependent, which breaks under
    distributed reads; at scale the idiom is a stable hash-mod on the key
    (resume-safe, partition-independent).
    """
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(100))
    dev_cut = int(dev_fraction * 100)
    dev = df.where(bucket < dev_cut)
    train = df.where(bucket >= dev_cut)
    return train, dev


def w5_spans_to_mentions(tagged: list[tuple[str, list[str]]]) -> list[dict]:
    """W5 — consecutive same-label-set tokens → {start, end, labels}.

    Exact port of tagged_sents_to_mentions (redcoat_to_sents.py:161-199)
    including the ``labels_seen`` suppression quirk: once a label's mention
    closes, later tokens carrying it are stripped of that label before
    comparison.
    """
    mentions: list[dict] = []
    current_labels: list[str] = []
    current_start = -1
    labels_seen: set[str] = set()
    n = len(tagged)
    for i, (_word, labels) in enumerate(tagged):
        labels = [l for l in labels if l not in labels_seen]
        if len(current_labels) == 0:
            if len(labels) > 0:
                current_labels = labels
                current_start = i
        elif set(labels) != set(current_labels):
            mentions.append(
                {"start": current_start, "end": i, "labels": current_labels}
            )
            for l in current_labels:
                labels_seen.add(l)
            current_labels = labels
            current_start = i
        if i == n - 1 and len(current_labels) > 0:
            mentions.append(
                {"start": current_start, "end": i + 1,
                 "labels": current_labels}
            )
            break
    return mentions


def w6_gt_triples(annotated: DataFrame) -> DataFrame:
    """W6 — ground-truth triples from mention annotations.

    Port of get_redcoat_triples (sents_to_triples.py:45-66): 10 slots keyed
    by the ``/N`` label suffix; part text = mention tokens joined and
    ``rstrip('.')``; later mentions overwrite earlier ones (last-write
    wins); keep slots with all three parts.  Spark: posexplode mentions →
    explode labels → max_by(text, mention position) per (doc, slot, part)
    → conditional agg → filter complete.
    """
    m = annotated.select(
        "doc_id", "tokens",
        F.posexplode("mentions_triples").alias("mpos", "m"),
    )
    lab = m.select(
        "doc_id", "mpos",
        F.array_join(
            F.slice(F.col("tokens"), F.col("m.start") + 1,
                    F.greatest(F.col("m.end") - F.col("m.start"), F.lit(0))),
            " ",
        ).alias("text_raw"),
        F.explode("m.labels").alias("label"),
    ).where(F.col("label").contains("/"))
    lab = lab.select(
        "doc_id", "mpos",
        F.regexp_replace("text_raw", "\\.+$", "").alias("text"),
        F.split_part("label", F.lit("/"), F.lit(1)).alias("part"),
        F.split_part("label", F.lit("/"), F.lit(2)).cast("int").alias("slot"),
    ).where(F.col("part").isin("head", "rel", "tail") & F.col("slot").isNotNull())
    per_part = lab.groupBy("doc_id", "slot", "part").agg(
        F.max_by("text", "mpos").alias("text")
    )
    slots = per_part.groupBy("doc_id", "slot").agg(
        F.max(F.when(F.col("part") == "head", F.col("text"))).alias("s1"),
        F.max(F.when(F.col("part") == "rel", F.col("text"))).alias("r"),
        F.max(F.when(F.col("part") == "tail", F.col("text"))).alias("s2"),
    )
    return slots.where(
        F.col("s1").isNotNull() & F.col("r").isNotNull()
        & F.col("s2").isNotNull()
    ).select("doc_id", "slot", "s1", "r", "s2")


def w3_align_tokens(orig_tokens: list[str], retok: list[str]) -> dict[int, int]:
    """W3 — original↔retokenized alignment (redcoat_to_sents.py:35-51).

    Prefix-match walk with running offset: position i of ``orig_tokens``
    maps to the first ``retok`` index whose token is a prefix of
    orig_tokens[i].  Port preserves the final extra mapping entry
    (``orig_to_spacy[i+1]``).
    """
    mapping: dict[int, int] = {}
    offset = 0
    i = -1
    for i in range(len(orig_tokens)):
        orig_token = orig_tokens[i]
        if not orig_token.startswith(retok[i + offset]):
            while not orig_token.startswith(retok[i + offset]):
                offset += 1
        mapping[i] = i + offset
    mapping[i + 1] = i + 1 + offset
    return mapping


def w4_renumber_sentence_triples(
    sent_mentions: list[dict],
) -> list[dict]:
    """W4 — keep per-sentence triples whose head+rel+tail all survive the
    doc→sentence cut; renumber slots to 1..k (redcoat_to_sents.py:113-147).

    ``sent_mentions``: [{'start','end','labels': [...]}] for ONE sentence.
    Returns the mentions with labels rewritten to the renumbered slots,
    dropping labels of incomplete triples.
    """
    present: dict[str, set[str]] = {}
    for m in sent_mentions:
        for l in m["labels"]:
            if "/" in l:
                t, n = l.split("/")
                present.setdefault(n, set()).add(t)
    complete = sorted(
        (n for n, parts in present.items()
         if {"head", "rel", "tail"} <= parts),
        key=int,
    )
    renumber = {n: str(i + 1) for i, n in enumerate(complete)}
    out = []
    for m in sent_mentions:
        new_labels = []
        for l in m["labels"]:
            if "/" not in l:
                continue
            t, n = l.split("/")
            if n in renumber:
                new_labels.append(t)
                new_labels.append(f"{t}/{renumber[n]}")
        if new_labels:
            out.append({"start": m["start"], "end": m["end"],
                        "labels": sorted(set(new_labels))})
    return out
