"""S3 — annotated-document scan (Redcoat JSONL → nested DataFrame).

Reference format (joint_model/build_data.py:222-238; datasets/<ds>/
{train,dev}.json): one JSON object per line with ``tokens`` and
``mentions``; the bbn variant nests ``mentions`` as a dict with
``triples`` and ``entity_types`` lists.  Both normalize to FIXTURES.md §F2:

    (doc_id string, tokens array<string>,
     mentions_triples array<struct<start int, end int, labels array<string>>>,
     mentions_entity_types array<struct<...same...>>)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MENTION = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("labels", T.ArrayType(T.StringType())),
        ]
    )
)

ANNOTATED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("mentions_triples", _MENTION),
        T.StructField("mentions_entity_types", _MENTION),
    ]
)

_REF_ROOT = "/root/reference/datasets"


def _normalize(obj: dict, doc_id: str) -> tuple:
    mentions = obj.get("mentions", [])
    if isinstance(mentions, dict):  # bbn variant
        triples = mentions.get("triples", [])
        etypes = mentions.get("entity_types", [])
    else:
        triples = mentions
        etypes = []

    def conv(ms):
        return [
            (int(m["start"]), int(m["end"]), [str(l) for l in m["labels"]])
            for m in ms
        ]

    return (doc_id, [str(t) for t in obj.get("tokens", [])],
            conv(triples), conv(etypes))


def load_reference_annotated(
    spark: SparkSession,
    datasets: tuple[str, ...] = ("bbn", "cateringServices",
                                 "automotiveEngineering"),
    splits: tuple[str, ...] = ("train", "dev"),
    limit_per_file: int | None = 100,
) -> DataFrame:
    """Reference JSONL → normalized DataFrame (F2 fixture)."""
    rows: list[tuple] = []
    for ds in datasets:
        for split in splits:
            path = os.path.join(_REF_ROOT, ds, f"{split}.json")
            if not os.path.exists(path):
                continue
            with open(path, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    if limit_per_file is not None and i >= limit_per_file:
                        break
                    line = line.strip()
                    if not line:
                        continue
                    rows.append(_normalize(json.loads(line),
                                           f"{ds}/{split}/{i}"))
    return spark.createDataFrame(rows, ANNOTATED_SCHEMA)
