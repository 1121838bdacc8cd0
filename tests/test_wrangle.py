"""W1–W6 wrangling vs pure-python ports on real reference JSONL."""

import json
import os

import pytest
from pyspark.sql import functions as F

from seq2kg_spark.operators.wrangle import (
    w1_reformat_labels,
    w2_train_dev_split,
    w5_spans_to_mentions,
    w6_gt_triples,
)
from seq2kg_spark.sources.annotated import load_reference_annotated

_REF = "/root/reference/datasets/cateringServices/train.json"


def _gt_triples_py(doc: dict) -> list[list[str]]:
    """Pure-python spec: port of get_redcoat_triples
    (sents_to_triples.py:45-66)."""
    mentions = doc["mentions"]
    if isinstance(mentions, dict):
        mentions = mentions.get("triples", [])
    triples = [[None, None, None] for _ in range(10)]
    ordering = {"head": 0, "rel": 1, "tail": 2}
    for m in mentions:
        tokens = doc["tokens"][m["start"]:m["end"]]
        for l in m["labels"]:
            if "/" not in l:
                continue
            t, n = l.split("/")
            if t not in ordering:
                continue
            triples[int(n) - 1][ordering[t]] = " ".join(tokens).rstrip(".")
    return [t for t in triples if None not in t]


def test_w1_label_reformat(spark):
    df = spark.createDataFrame(
        [(["t1/head_1", "t2/rel_2", "noslash"],)], "labels array<string>"
    )
    out = df.select(w1_reformat_labels(F.col("labels")).alias("x")).collect()
    assert out[0].x == ["head", "head/1", "rel", "rel/2"]


def test_w2_split_deterministic_and_disjoint(spark, pages):
    df = pages.select(F.col("url").alias("doc_id"))
    tr1, dev1 = w2_train_dev_split(df)
    tr2, dev2 = w2_train_dev_split(df)
    assert tr1.count() + dev1.count() == df.count()
    assert tr1.join(dev1, "doc_id").count() == 0
    assert sorted(r.doc_id for r in dev1.collect()) == sorted(
        r.doc_id for r in dev2.collect()
    )
    assert 0 < dev1.count() < df.count()


def test_w5_mention_builder_quirks():
    tagged = [
        ("Acme", ["head/1"]),
        ("Corp", ["head/1"]),
        ("bought", ["rel/1"]),
        ("it", []),
        ("Acme", ["head/1"]),  # label reappears → stripped by labels_seen
        ("done", []),
    ]
    out = w5_spans_to_mentions(tagged)
    assert out[0] == {"start": 0, "end": 2, "labels": ["head/1"]}
    assert out[1] == {"start": 2, "end": 3, "labels": ["rel/1"]}
    assert len(out) == 2  # the reappearance produced no new mention


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference data absent")
def test_w6_matches_python_spec_on_reference_data(spark):
    ann = load_reference_annotated(
        spark, datasets=("cateringServices", "bbn"), splits=("train",),
        limit_per_file=60,
    )
    got = {}
    for r in w6_gt_triples(ann).collect():
        got.setdefault(r.doc_id, set()).add((r.s1, r.r, r.s2))

    checked = 0
    for ds, path in (("cateringServices", _REF),
                     ("bbn", "/root/reference/datasets/bbn/train.json")):
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i >= 60:
                    break
                doc = json.loads(line)
                expected = {tuple(t) for t in _gt_triples_py(doc)}
                doc_id = f"{ds}/train/{i}"
                assert got.get(doc_id, set()) == expected, doc_id
                checked += 1
    assert checked == 120
