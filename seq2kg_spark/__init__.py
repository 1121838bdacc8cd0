"""seq2kg_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the Seq2KG reference dataflow (text -> (subj, pred, obj)
triples + entity types -> canonicalized graph) as idiomatic PySpark:
DataFrame/Column expressions for everything relational, Arrow-batched
pandas UDFs (``mapInPandas``) for the NLP kernels, explicit
partitioning/skew handling, and checkpoint/lineage for resume.

Subpackages
-----------
functions   Column-expression scalar functions (text clean, stats, similarity).
nlp         Pure-Python deterministic NLP kernels used inside Arrow batches.
operators   DataFrame -> DataFrame pipeline stages (extract, dedup, ann, ...).
sources     Readers/writers for the ``pages`` table and triple sinks.
plans       End-to-end pipeline assemblies.
streaming   Structured Streaming ingestion of page batches.
eval        Parity / scoring operators (P/R joins, typing metrics).
"""

__version__ = "0.1.0"
