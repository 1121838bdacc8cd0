"""The ``pages`` table — primary input (BASELINE.json input_hint shape).

Schema: ``(url string, warc_ts timestamp, html binary, text string,
lang string)`` — a Common-Crawl-style web-page table.  In production this is
an Iceberg table partitioned by ``days(warc_ts)`` and bucketed by ``url``;
in this sandbox (no Iceberg jars) we read/write parquet through the same
seam so the calling code never changes: swap ``format("iceberg")`` in one
place.

``build_pages_corpus`` synthesizes the deterministic test corpus of
FIXTURES.md §F1: the first rows carry the reference eval-set documents
verbatim (/root/reference/datasets/{bbn,automotiveEngineering,
cateringServices}/test.csv column 2 — our parity anchor), the rest are
seeded synthetic sentences with a log-normal length skew and ~2% non-English
rows so the lang predicate and the size-bucketed repartition have something
to do.
"""

from __future__ import annotations

import csv
import hashlib
import os
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_REFERENCE_DATASETS = ("bbn", "automotiveEngineering", "cateringServices")
_REF_ROOT = "/root/reference/datasets"

_EPOCH = datetime(2019, 7, 1, tzinfo=timezone.utc)

# word pool for synthetic filler documents (seeded, deterministic)
_SYNTH_NOUNS = (
    "company market engine pipeline graph model dataset cluster index"
    " vehicle restaurant chef analyst investor product platform sensor"
).split()
_SYNTH_PROPER = (
    "Acme Globex Initech Hooli Vandelay Wonka Stark Wayne Umbrella Cyberdyne"
).split()
_SYNTH_VERBS = (
    "acquired launched announced developed unveiled reported sued opened"
    " exhibited showcased".split()
)
_SYNTH_PLACES = "London Beijing Shanghai Perth Austin Toronto Berlin".split()


def load_reference_eval_docs() -> list[tuple[str, int, str]]:
    """(dataset, doc_idx, text) for every reference eval document.

    Reads the released test.csv files (no header, columns index,content —
    see reference candidate_extraction/triples_from_test_data.py:16-22).
    """
    docs: list[tuple[str, int, str]] = []
    for ds in _REFERENCE_DATASETS:
        path = os.path.join(_REF_ROOT, ds, "test.csv")
        if not os.path.exists(path):
            continue
        with open(path, newline="", encoding="utf-8") as f:
            for row in csv.reader(f):
                if len(row) >= 2:
                    docs.append((ds, int(row[0]), row[1]))
    return docs


def _synth_doc(rng: random.Random) -> str:
    n_sents = max(1, int(rng.lognormvariate(1.2, 0.8)))
    # a few 10x outliers to exercise skew handling
    if rng.random() < 0.02:
        n_sents *= 10
    sents = []
    for _ in range(n_sents):
        s = (
            f"{rng.choice(_SYNTH_PROPER)} {rng.choice(_SYNTH_VERBS)} "
            f"its {rng.choice(_SYNTH_NOUNS)} {rng.choice(_SYNTH_NOUNS)} "
            f"at the {rng.choice(_SYNTH_PROPER)} "
            f"{rng.choice(_SYNTH_NOUNS).capitalize()} Exhibition "
            f"in {rng.choice(_SYNTH_PLACES)}."
        )
        sents.append(s)
    return " ".join(sents)


def _html_wrap(text: str) -> bytes:
    # Full synthetic page (comment/doctype/head/nav/script/footer chrome,
    # entity-escaped body) so html_to_text's round-trip invariant exercises
    # every family of the extraction spec, not just tag stripping.
    from seq2kg_spark.functions.html_text import wrap_page_html

    return wrap_page_html(text).encode("utf-8")


def build_pages_rows(n_rows: int = 300, seed: int = 42) -> list[tuple]:
    """Deterministic pages rows (FIXTURES.md §F1). First rows = reference docs."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    domain_short = {"bbn": "bbn", "automotiveEngineering": "auto",
                    "cateringServices": "catering"}
    for ds, idx, text in load_reference_eval_docs():
        doc_id = len(rows)
        url = f"https://synth.example/{domain_short[ds]}/{idx:08d}"
        rows.append(
            (url, _EPOCH + timedelta(seconds=doc_id), _html_wrap(text), text, "en")
        )
        if len(rows) >= n_rows:
            break
    while len(rows) < n_rows:
        doc_id = len(rows)
        text = _synth_doc(rng)
        lang = "de" if rng.random() < 0.02 else "en"
        url = f"https://synth.example/web/{doc_id:08d}"
        rows.append(
            (url, _EPOCH + timedelta(seconds=doc_id), _html_wrap(text), text, lang)
        )
    return rows


def build_pages_corpus(
    spark: SparkSession, n_rows: int = 300, seed: int = 42
) -> DataFrame:
    return spark.createDataFrame(build_pages_rows(n_rows, seed), PAGES_SCHEMA)


def build_pages_corpus_distributed(
    spark: SparkSession, n_rows: int, seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Scale-path corpus builder: synthesizes rows ON THE EXECUTORS.

    ``build_pages_corpus`` materializes every row in driver memory before
    ``createDataFrame`` — fine for the ≤100k parity/test corpus, a driver
    bottleneck at web scale.  This variant unions the (small, driver-built)
    reference eval docs with a ``spark.range`` → ``mapInPandas`` synthetic
    tail whose per-row rng is seeded by ``(seed, doc_id)``, so the output
    is deterministic regardless of partitioning and the build parallelizes
    across the cluster.  Content differs from the sequential-rng legacy
    builder at the same ``n_rows`` — the two corpora are distinct fixtures.
    """
    import pandas as pd

    ref_docs = load_reference_eval_docs()
    n_ref = min(len(ref_docs), n_rows)
    head = build_pages_corpus(spark, n_ref, seed)
    if n_rows <= n_ref:
        return head
    partitions = partitions or max(
        32, spark.sparkContext.defaultParallelism * 2)

    def synth(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for doc_id in ids:
                rng = random.Random(f"{seed}:{doc_id}")
                text = _synth_doc(rng)
                lang = "de" if rng.random() < 0.02 else "en"
                urls.append(f"https://synth.example/web/{doc_id:08d}")
                tss.append(_EPOCH + timedelta(seconds=int(doc_id)))
                htmls.append(_html_wrap(text))
                texts.append(text)
                langs.append(lang)
            yield pd.DataFrame({
                "url": urls, "warc_ts": tss, "html": htmls,
                "text": texts, "lang": langs,
            })

    tail = (
        spark.range(n_ref, n_rows, numPartitions=partitions)
        .mapInPandas(synth, PAGES_SCHEMA)
    )
    return head.unionByName(tail)


def ensure_pages_parquet_distributed(
    spark: SparkSession, n_rows: int, seed: int = 42, path: str | None = None
) -> str:
    """Materialize the distributed-builder corpus once (cache key is
    namespaced ``pages_dist`` — content differs from the legacy builder)."""
    if path is None:
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".cache")
        key = hashlib.sha1(
            f"pages-dist-{n_rows}-{seed}".encode()).hexdigest()[:12]
        path = os.path.join(root, f"pages_dist_{n_rows}_{key}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        build_pages_corpus_distributed(spark, n_rows, seed).write.mode(
            "overwrite").parquet(path)
    return path


def corpus_cache_path(n_rows: int, seed: int = 42, root: str | None = None) -> str:
    root = root or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache")
    key = hashlib.sha1(f"pages-{n_rows}-{seed}".encode()).hexdigest()[:12]
    return os.path.join(root, f"pages_{n_rows}_{key}.parquet")


def ensure_pages_parquet(
    spark: SparkSession, n_rows: int = 300, seed: int = 42, path: str | None = None
) -> str:
    """Materialize the corpus once; reuse across tests/bench runs."""
    path = path or corpus_cache_path(n_rows, seed)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        build_pages_corpus(spark, n_rows, seed).repartition(8).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """The Iceberg seam: in production ``spark.read.table('pages')``."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)
