"""E2–E5 — graph-similarity scoring of predicted vs golden triples.

Re-expression of reference evaluation/evaluator.py + nfgec_evaluate.py:

* E4 ``sim_matrix_score``: embed each triple as a sentence, greedy
  max-assignment over the gt×pred cosine matrix (zero out row+col per
  pick), mean of picked cosines × max(1.0, #gt/#pred) — the ≥1 "precision"
  factor quirk preserved (evaluator.py:142-183).
* E2/E3 ``walk_cosine_score``: N random walks over each doc graph
  (all-pairs shortest paths, random source/target, node/edge labels
  interleaved), paired pred/gt walk cosines averaged, nan→0
  (evaluator.py:58-117).  Deviation (documented): the reference uses ONE
  module-global RNG seeded 124, so walk randomness depends on document
  processing order — impossible to reproduce under distributed execution.
  We seed per (doc, walk-index) instead: deterministic, order- and
  partition-independent.
* E5 ``nfgec_metrics``: strict / loose-macro / loose-micro typing P/R/F1
  (nfgec_evaluate.py:12-54) as pure Catalyst aggregations.
* Corpus scores (E6) = plain ``avg`` over the per-doc frame.

Spark shape: per-doc scoring runs as a **cogrouped applyInPandas** —
pred and gt triples co-partitioned by doc key, each group small (≤ dozens
of triples), embeddings computed in-UDF with the shared hash encoder.
"""

from __future__ import annotations

import random

import networkx as nx
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_N_RANDOM_WALKS = 10


def _encode_sentences(texts: list[str], dim: int = 64) -> np.ndarray:
    from seq2kg_spark.nlp.encoder import HashEncoder
    from seq2kg_spark.nlp.wordpiece import WordPieceTokenizer

    enc = HashEncoder(dim=dim, context=False)
    tk = WordPieceTokenizer()
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        wps, _ = tk.encode_sentence(str(t).split())
        x = enc.encode([wps], max_len=min(len(wps), 64))
        out[i] = x[0, : len(wps)].mean(axis=0)
    return out


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return float("nan")
    return float(np.dot(a, b) / (na * nb))


def sim_matrix_score_py(
    pred: list[tuple[str, str, str]],
    gt: list[tuple[str, str, str]],
    dim: int = 64,
) -> float:
    """E4 exact port (greedy assignment + ≥1 factor quirk)."""
    if len(gt) == 0:
        # reference returns the unbound local -> implicit 0-equivalent;
        # we normalize to 0.0
        return 0.0
    if len(pred) == 0:
        return 0.0
    embs_p = _encode_sentences([" ".join(p) for p in pred], dim)
    embs_g = _encode_sentences([" ".join(g) for g in gt], dim)
    sim = np.zeros((len(embs_g), len(embs_p)))
    for gi in range(len(embs_g)):
        for pi in range(len(embs_p)):
            sim[gi, pi] = _cosine(embs_p[pi], embs_g[gi])
    scores = []
    for _ in range(len(embs_g)):
        scores.append(float(np.amax(sim)))
        row, col = np.unravel_index(np.argmax(sim, axis=None), sim.shape)
        sim[row, :] = 0.0
        sim[:, col] = 0.0
    cosine_score = sum(scores) / len(scores)
    precision = max(1.0, len(embs_g) / len(embs_p))
    return precision * cosine_score


def _random_walk(graph: nx.DiGraph, edge_labels: dict, rng: random.Random):
    """Port of evaluator.py random_walk (per-call RNG, see module doc)."""
    all_paths = dict(nx.all_pairs_shortest_path(graph))
    if len(edge_labels) == 0:
        return None
    r: list = []
    n = 0
    source = None
    while len(r) == 0:
        source = rng.choice(sorted(all_paths.keys()))
        r = [item for item in all_paths[source] if item != source]
        n += 1
        if n > 20:
            return None
    target = rng.choice(sorted(r))
    path = all_paths[source][target]
    final = []
    for i in range(len(path)):
        final.append(path[i])
        if i == len(path) - 1:
            continue
        final.append(edge_labels[path[i] + "|||" + path[i + 1]])
    return final


def walk_cosine_score_py(
    pred: list[tuple[str, str, str]],
    gt: list[tuple[str, str, str]],
    seed: int,
    n_walks: int = _N_RANDOM_WALKS,
    dim: int = 64,
) -> float:
    """E2+E3: paired pred/gt random-walk embedding cosines, nan→0."""
    def graph_of(triples):
        g = nx.DiGraph()
        g.add_edges_from([(t[0], t[2]) for t in triples])
        labels = {t[0] + "|||" + t[2]: t[1] for t in triples}
        return g, labels

    g_pred, lab_pred = graph_of(pred)
    g_gt, lab_gt = graph_of(gt)
    if len(g_pred) == 0:
        return 0.0

    def embs(graph, labels, salt):
        out = []
        for k in range(n_walks):
            rng = random.Random((seed * 1_000_003 + salt * 101 + k))
            p = _random_walk(graph, labels, rng)
            if p is None:
                out.append(np.zeros(dim, dtype=np.float32))
            else:
                out.append(_encode_sentences([" ".join(p)], dim)[0])
        return out

    embs_p = embs(g_pred, lab_pred, 1)
    embs_g = embs(g_gt, lab_gt, 2)
    scores = []
    for p, g in zip(embs_p, embs_g):
        c = _cosine(p, g)
        scores.append(0.0 if np.isnan(c) else c)
    return sum(scores) / len(scores)


def per_doc_scores(
    pred: DataFrame,
    gt: DataFrame,
    doc_col: str = "doc",
    dim: int = 64,
) -> DataFrame:
    """Cogrouped per-doc E4 + E2/E3 scores: (doc, sim_matrix_score,
    walk_cosine_score, n_pred, n_gold)."""
    cols = (doc_col, "subj", "pred", "obj")

    def score(key, pdf_pred: pd.DataFrame, pdf_gt: pd.DataFrame) -> pd.DataFrame:
        p = list(zip(pdf_pred["subj"], pdf_pred["pred"], pdf_pred["obj"]))
        g = list(zip(pdf_gt["subj"], pdf_gt["pred"], pdf_gt["obj"]))
        doc = key[0]
        seed = hash(str(doc)) & 0x7FFFFFFF
        return pd.DataFrame(
            {
                "doc": [str(doc)],
                "sim_matrix_score": [sim_matrix_score_py(p, g, dim)],
                "walk_cosine_score": [walk_cosine_score_py(p, g, seed,
                                                           dim=dim)],
                "n_pred": [len(p)],
                "n_gold": [len(g)],
            }
        )

    return (
        pred.select(*cols).groupBy(doc_col)
        .cogroup(gt.select(*cols).groupBy(doc_col))
        .applyInPandas(
            score,
            schema="doc string, sim_matrix_score double, "
                   "walk_cosine_score double, n_pred long, n_gold long",
        )
    )


def corpus_scores(per_doc: DataFrame) -> DataFrame:
    """E6 — corpus means."""
    return per_doc.agg(
        F.avg("sim_matrix_score").alias("triple_score"),
        F.avg("walk_cosine_score").alias("walk_score"),
        F.count("*").alias("n_docs"),
    )


def nfgec_metrics(
    typed: DataFrame, gold_col: str = "gold", pred_col: str = "pred"
) -> DataFrame:
    """E5 — strict / loose-macro / loose-micro over array<string> columns.

    Empty sets are replaced by ['MISC'] (evaluator.py:240-249).  Pure
    Catalyst: set ops + global sums; one aggregation, no UDF.
    """
    misc = F.array(F.lit("MISC"))
    g = F.when(F.size(F.col(gold_col)) > 0, F.array_distinct(F.col(gold_col))
               ).otherwise(misc)
    p = F.when(F.size(F.col(pred_col)) > 0, F.array_distinct(F.col(pred_col))
               ).otherwise(misc)
    base = typed.select(
        F.size(g).alias("n_g"),
        F.size(p).alias("n_p"),
        F.size(F.array_intersect(g, p)).alias("n_i"),
    )
    agg = base.agg(
        F.count("*").alias("n"),
        F.sum(F.when((F.col("n_g") == F.col("n_i"))
                     & (F.col("n_p") == F.col("n_i")), 1).otherwise(0)
              ).alias("n_exact"),
        F.sum(F.col("n_i") / F.col("n_p")).alias("macro_p_sum"),
        F.sum(F.col("n_i") / F.col("n_g")).alias("macro_r_sum"),
        F.sum("n_i").alias("micro_i"),
        F.sum("n_p").alias("micro_p_den"),
        F.sum("n_g").alias("micro_r_den"),
    )
    strict = F.col("n_exact") / F.col("n")
    macro_p = F.col("macro_p_sum") / F.col("n")
    macro_r = F.col("macro_r_sum") / F.col("n")
    micro_p = F.col("micro_i") / F.col("micro_p_den")
    micro_r = F.col("micro_i") / F.col("micro_r_den")

    def f1(pc, rc):
        return F.when(rc == 0, F.lit(0.0)).otherwise(2 * pc * rc / (pc + rc))

    return agg.select(
        strict.alias("strict_f1"),
        macro_p.alias("macro_p"), macro_r.alias("macro_r"),
        f1(macro_p, macro_r).alias("macro_f1"),
        micro_p.alias("micro_p"), micro_r.alias("micro_r"),
        f1(micro_p, micro_r).alias("micro_f1"),
    )
