"""Zipf-entity synthetic mention corpus (round-7 recall study, ask #5).

The word-salad pages corpus is maximally LSH-hot (every norm is a uniform
word combination — shingle document frequencies are flat and high), which
is the shape that justified SIM_MAX_BUCKET_DEFAULT=1k.  Real web-entity
corpora look different: a shared REAL-WORD vocabulary (hot shingles come
from common name words like "international" / "systems"), power-law
mention frequencies (head entities accumulate many surface variants, the
tail one or two), and same-entity variants that are near-duplicates by
construction (typos, dropped words, suffixes, hyphenation).  This module
generates that shape deterministically and distributed (per-entity seeded
rng inside mapInPandas — same scale pattern as
sources.pages.build_pages_corpus_distributed; a driver loop would be the
scale bug at 10^8 entities).

Ground truth: every mention row carries its ``entity_id``, so the study
can measure which same-entity (and exact-Jaccard) norm pairs the LSH
blocking recovers under each (max_bucket, band_rows) setting.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

# Shared real-word vocabulary: common English name/content words.  Small
# on purpose — with |V| words and ~3-word names over N entities each word
# lands in ~3N/|V| entity names, so char-3 shingles crossing these words
# are corpus-hot (the effect under study).
VOCAB = """
international systems group global advanced united national general
digital dynamic pacific atlantic northern southern eastern western
central metro urban rural first premier prime alpha beta delta omega
summit vertex apex crown royal grand noble bright clear pure true
solid stable rapid swift quick smart wise bold brave strong power
energy solar lunar stellar cosmic quantum micro macro mega ultra
tech data info net web cloud core edge node link grid wave spark
forge works labs studio media press print paper stone steel iron
copper silver gold amber crystal pearl coral cedar maple willow
river lake ocean harbor bay coast ridge valley meadow field garden
spring summer autumn winter dawn dusk noon star moon sun sky storm
wind rain snow frost ember flame torch beacon light shadow echo
health care life family home house build craft trade market shop
store bank trust fund capital asset venture partners holdings
consulting logistics transport freight cargo express delivery
foods farms fresh organic natural green earth terra vista mesa
motors auto drive gear wheel engine turbo velocity racing sports
fitness wellness clinic dental vision optic audio sound music
records pictures films theater gallery museum academy institute
college school learning knowledge research science discovery
security defense shield guard safe secure protect alliance union
council forum assembly congress league guild society club lodge
""".split()


def _entity_pdf(ids, n_entities: int, zipf_s: float, max_variants: int,
                seed: int):
    import numpy as np
    import pandas as pd

    out_e, out_m, out_f = [], [], []
    for eid in ids:
        # per-entity seeded rng: deterministic, order- and partition-free
        h = hashlib.md5(f"{seed}:{eid}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        rank = int(eid) + 1
        # power-law mention frequency; head entities get more variants
        freq = int(n_entities / rank ** zipf_s) + 1
        n_var = min(max_variants, 1 + int(np.log2(freq + 1)))
        n_words = int(rng.integers(2, 5))
        words = [VOCAB[int(i)]
                 for i in rng.integers(0, len(VOCAB), n_words)]
        base = " ".join(words)
        variants = {base}
        attempts = 0
        while len(variants) < n_var and attempts < 6 * n_var:
            attempts += 1
            op = int(rng.integers(0, 6))
            w = list(words)
            if op == 0 and len(w) > 2:        # drop the last word
                s = " ".join(w[:-1])
            elif op == 1:                      # corporate suffix
                s = base + " " + ["inc", "corp", "ltd", "co"][
                    int(rng.integers(0, 4))]
            elif op == 2:                      # hyphenate two words
                j = int(rng.integers(0, len(w) - 1))
                s = " ".join(w[:j] + [w[j] + "-" + w[j + 1]] + w[j + 2:])
            elif op == 3:                      # adjacent-char typo
                j = int(rng.integers(0, len(w)))
                t = w[j]
                if len(t) >= 4:
                    k = int(rng.integers(1, len(t) - 1))
                    w[j] = t[:k] + t[k + 1] + t[k] + t[k + 2:]
                s = " ".join(w)
            elif op == 4:                      # title case (norm-identical
                s = base.title()               # — the exact-collision path)
            else:                              # possessive (norm-identical)
                s = base + "'s"
            variants.add(s)
        share = max(1, freq // len(variants))
        for v in sorted(variants):
            out_e.append(int(eid))
            out_m.append(v)
            out_f.append(share)
    return pd.DataFrame(
        {"entity_id": out_e, "mention": out_m, "freq": out_f})


def build_zipf_mentions(
    spark: SparkSession,
    n_entities: int = 20_000,
    zipf_s: float = 1.07,
    max_variants: int = 12,
    seed: int = 7,
    num_partitions: int | None = None,
) -> DataFrame:
    """(entity_id, mention, freq) — deterministic zipf-entity corpus."""
    from seq2kg_spark.packaging import ship_package

    ship_package(spark)
    parts = num_partitions or max(
        8, spark.sparkContext.defaultParallelism)
    base = spark.range(n_entities).repartition(parts)

    def gen(batches):
        for pdf in batches:
            yield _entity_pdf(pdf["id"].tolist(), n_entities, zipf_s,
                              max_variants, seed)

    return base.mapInPandas(
        gen, schema="entity_id long, mention string, freq long")


def build_salad_norms(
    spark: SparkSession,
    n_norms: int = 20_000,
    seed: int = 13,
    num_partitions: int | None = None,
) -> DataFrame:
    """(norm) — uniform word-salad mention strings over the same vocab:
    the degenerate, maximally LSH-hot corpus shape (no entity structure,
    flat shingle document frequencies)."""
    from seq2kg_spark.packaging import ship_package

    ship_package(spark)
    parts = num_partitions or max(
        8, spark.sparkContext.defaultParallelism)
    base = spark.range(n_norms).repartition(parts)

    def gen(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                h = hashlib.md5(f"{seed}:{i}".encode()).digest()
                rng = np.random.default_rng(
                    int.from_bytes(h[:8], "little"))
                n_words = int(rng.integers(2, 5))
                rows.append(" ".join(
                    VOCAB[int(j)]
                    for j in rng.integers(0, len(VOCAB), n_words)))
            yield pd.DataFrame({"norm": rows})

    return base.mapInPandas(gen, schema="norm string")
