"""S1/S5 Spark scans over the actual reference data files."""

import os

import pytest

from seq2kg_spark.sources.reference_csv import (
    read_document_csv,
    read_ground_truth_csv,
    triples_per_doc,
    validate_index_contiguity,
)

_TEST = "/root/reference/datasets/cateringServices/test.csv"
_GT = "/root/reference/datasets/cateringServices/ground_truth_triples_test.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_TEST), reason="reference data absent"
)


def test_s1_document_scan(spark):
    docs = read_document_csv(spark, _TEST)
    rows = docs.collect()
    assert len(rows) == 21
    assert rows[0]["index"] == 0 and "text messages" in rows[0].content
    assert validate_index_contiguity(
        docs.fillna({"industry": "catering"})).count() == 0


def test_s5_ground_truth_group(spark):
    gt = read_ground_truth_csv(spark, _GT)
    per_doc = triples_per_doc(gt)
    n_triples = gt.count()
    rows = {r["index"]: r.triples for r in per_doc.collect()}
    assert sum(len(v) for v in rows.values()) == n_triples
    assert any(t.s1 == "Jonathan Anozie" for t in rows[0])
