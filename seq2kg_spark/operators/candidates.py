"""Model 2 — candidate generation + neural filtering, Spark-side.

Pipeline (reference candidate_filtering/*, SURVEY.md §2.5/§2.8):

    docs → mapInPandas(N1–N4 chunker) → candidates(doc_id, s, r, o)
         → distinct-phrase embedding (C1: dedup *before* the expensive
           encoder — classic build-side dedup — then three broadcast joins
           back, one per role)
         → MLP score (C2, numpy, weights broadcast) → σ > 0.33 (C3)
         → top-10 per doc by confidence (C4, the reference's one true
           window function) → dropna guard (C5).

The phrase embedding join is the scale-critical design point: embedding
cost is O(distinct phrases), not O(candidates); the joins are broadcast
(phrase dictionary ≪ candidate table).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CANDIDATES_SCHEMA = "doc_id long, s string, r string, o string"

TOP_N_TRIPLES = 10
KEEP_THRESHOLD = 0.33  # candidate_filtering/model.py:39-43


def _gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from seq2kg_spark.nlp.chunker import candidates_from_doc

    for pdf in batches:
        rows = {"doc_id": [], "s": [], "r": [], "o": []}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if not text:
                continue
            for s, r, o in candidates_from_doc(text):
                rows["doc_id"].append(doc_id)
                rows["s"].append(s)
                rows["r"].append(r)
                rows["o"].append(o)
        yield pd.DataFrame(rows)


def generate_candidates(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """N1–N4 over an Arrow stream → candidate triples."""
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(text_col).alias("text"))
    return src.mapInPandas(_gen_batches, schema=CANDIDATES_SCHEMA)


def init_mlp_weights(dim: int = 64, hidden: int = 64, seed: int = 125) -> dict:
    """C2 weights: tanh(W1·[h;r;t]) → tanh(W2·) → w3 logit
    (candidate_filtering/model.py:12-29; dropout is inference-inert)."""
    rng = np.random.RandomState(seed)

    def mat(*shape):
        return (rng.randn(*shape) / np.sqrt(shape[-1])).astype(np.float32)

    return {
        "W1": mat(hidden, dim * 3), "b1": np.zeros(hidden, dtype=np.float32),
        "W2": mat(hidden, hidden), "b2": np.zeros(hidden, dtype=np.float32),
        "w3": mat(1, hidden), "b3": np.zeros(1, dtype=np.float32),
        "dim": dim,
    }


def _embed_phrases(dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from seq2kg_spark.nlp.encoder import HashEncoder
        from seq2kg_spark.nlp.wordpiece import WordPieceTokenizer

        enc = HashEncoder(dim=dim, context=False)
        tk = WordPieceTokenizer()
        for pdf in batches:
            vecs = []
            for phrase in pdf["phrase"]:
                wps, _m = tk.encode_sentence(str(phrase).split())
                x = enc.encode([wps], max_len=min(len(wps), 32))
                # mean-pooled phrase embedding (the filter bert server ran
                # with pooling on — candidate_filtering/build_data.py:37-43)
                vecs.append(x[0, : len(wps)].mean(axis=0).tolist())
            yield pd.DataFrame({"phrase": pdf["phrase"],
                                "emb": pd.Series(vecs, dtype=object)})

    return fn


def score_candidates(
    candidates: DataFrame,
    weights: dict | None = None,
    dim: int = 64,
) -> DataFrame:
    """C1 embedding join + C2 MLP + confidence column."""
    spark = candidates.sparkSession
    w = weights if weights is not None else init_mlp_weights(dim=dim)
    w_bc = spark.sparkContext.broadcast(w)

    cand = candidates.dropna(subset=["s", "r", "o"])  # C5 guard
    phrases = (
        cand.select(F.col("s").alias("phrase"))
        .unionAll(cand.select(F.col("r").alias("phrase")))
        .unionAll(cand.select(F.col("o").alias("phrase")))
        .distinct()
    )
    # cache: each F.broadcast() below re-executes the plan it wraps, so an
    # uncached emb would run the chunker+encoder THREE times per job
    emb = phrases.mapInPandas(
        _embed_phrases(dim), schema="phrase string, emb array<float>"
    ).cache()
    scored_input = (
        cand.join(F.broadcast(emb.withColumnRenamed("emb", "h")),
                  cand["s"] == emb["phrase"]).drop("phrase")
        .join(F.broadcast(emb.withColumnRenamed("emb", "rv")),
              F.col("r") == emb["phrase"]).drop("phrase")
        .join(F.broadcast(emb.withColumnRenamed("emb", "t")),
              F.col("o") == emb["phrase"]).drop("phrase")
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ww = w_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(confidence=pd.Series([], dtype="float64")) \
                    .drop(columns=["h", "rv", "t"])
                continue
            H = np.array(pdf["h"].tolist(), dtype=np.float32)
            R = np.array(pdf["rv"].tolist(), dtype=np.float32)
            T = np.array(pdf["t"].tolist(), dtype=np.float32)
            X = np.concatenate([H, R, T], axis=1)
            h1 = np.tanh(X @ ww["W1"].T + ww["b1"])
            h2 = np.tanh(h1 @ ww["W2"].T + ww["b2"])
            logit = (h2 @ ww["w3"].T + ww["b3"]).reshape(-1)
            conf = 1.0 / (1.0 + np.exp(-logit))
            out = pdf.drop(columns=["h", "rv", "t"]).copy()
            out["confidence"] = conf.astype("float64")
            yield out

    return scored_input.mapInPandas(
        _score, schema="doc_id long, s string, r string, o string, "
                       "confidence double"
    )


def filter_top_candidates(
    scored: DataFrame,
    threshold: float = KEEP_THRESHOLD,
    top_n: int = TOP_N_TRIPLES,
) -> DataFrame:
    """C3 threshold + C4 top-N-per-doc window."""
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("confidence"), F.asc("s"), F.asc("r"), F.asc("o")
    )
    return (
        scored.where(F.col("confidence") > threshold)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_n)
        .drop("rnk")
    )


def candidate_filtering_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    cand = generate_candidates(docs, id_col, text_col)
    scored = score_candidates(cand, dim=dim)
    return filter_top_candidates(scored)


def label_candidates(
    candidates: DataFrame,
    gt_triples: DataFrame,
    *,
    cosine_threshold: float | None = None,
    dim: int = 64,
) -> DataFrame:
    """C6 — training-data labelling: candidate == ground truth.

    Default: exact broadcast join on (doc_id, s, r, o) — the reference's
    '\\u2063'-joined string equality (sents_to_triples.py:141,203-206) is an
    equi-join in disguise.  ``cosine_threshold`` enables the documented
    all-three-parts-cosine variant (:175-201): parts embed independently,
    a pair labels positive when every part's cosine distance < threshold —
    expressed as the blocked join on doc_id + in-batch numpy, never a full
    cross product.  Ground-truth triples are appended as positives (:223).
    """
    gt = gt_triples.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("s"), F.col("r"), F.col("o"),
    )
    if cosine_threshold is None:
        hits = candidates.join(
            F.broadcast(gt.withColumn("label", F.lit(1))),
            ["doc_id", "s", "r", "o"], "left",
        ).na.fill({"label": 0})
    else:
        spark = candidates.sparkSession

        def _cos_label(batches):
            import numpy as np

            from seq2kg_spark.nlp.encoder import HashEncoder
            from seq2kg_spark.nlp.wordpiece import WordPieceTokenizer

            enc = HashEncoder(dim=dim, context=False)
            tk = WordPieceTokenizer()
            memo: dict[str, np.ndarray] = {}  # each distinct phrase embeds ONCE

            def emb_rows(col) -> np.ndarray:
                out = np.zeros((len(col), dim), dtype=np.float32)
                for i, phrase in enumerate(col):
                    if not isinstance(phrase, str) or phrase == "":
                        continue  # null/NaN/empty ⇒ zero vector ⇒ distance 1.0
                    key = str(phrase)
                    v = memo.get(key)
                    if v is None:
                        wps, _m = tk.encode_sentence(key.split())
                        x = enc.encode([wps], max_len=min(len(wps), 32))
                        v = x[0, : len(wps)].mean(axis=0)
                        memo[key] = v
                    out[i] = v
                return out

            for pdf in batches:
                out = pdf[["doc_id", "s", "r", "o"]].copy()
                if len(pdf) == 0:
                    out["label"] = pd.Series([], dtype="int32")
                    yield out
                    continue
                # A row can only label positive when EVERY golden part is
                # present — masking up front (not just gs) keeps nulls on
                # the deterministic zero-vector/distance-1.0 path.
                ok = (pdf["gs"].notna() & pdf["gr"].notna()
                      & pdf["go"].notna()).to_numpy()
                for a, b in (("s", "gs"), ("r", "gr"), ("o", "go")):
                    A = emb_rows(pdf[a].tolist())
                    B = emb_rows(pdf[b].tolist())
                    na = np.linalg.norm(A, axis=1)
                    nb = np.linalg.norm(B, axis=1)
                    dot = (A * B).sum(axis=1)
                    denom = na * nb
                    # zero-norm ⇒ distance 1.0 (matches the scalar original)
                    cosd = np.where(
                        denom > 0, 1.0 - dot / np.where(denom > 0, denom, 1.0),
                        1.0,
                    )
                    ok = ok & (cosd < cosine_threshold)
                out["label"] = ok.astype("int32")
                yield out

        paired = candidates.join(
            F.broadcast(gt.select(
                "doc_id", F.col("s").alias("gs"), F.col("r").alias("gr"),
                F.col("o").alias("go"))),
            "doc_id", "left",
        )
        hits = paired.mapInPandas(
            _cos_label,
            schema="doc_id long, s string, r string, o string, label int",
        ).groupBy("doc_id", "s", "r", "o").agg(
            F.max("label").alias("label")
        )
    positives = gt.withColumn("label", F.lit(1))
    return hits.select("doc_id", "s", "r", "o", "label").unionByName(
        positives
    ).dropDuplicates(["doc_id", "s", "r", "o", "label"])
