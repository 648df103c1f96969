"""PySpark-native incremental GraphRAG knowledge-graph construction engine.

A brand-new, Spark-first implementation of the capabilities of
``Cygnus2505/GraphRAG-IncrementalKnowledgeGraphPipeline-for-LLMs``
(reference surveyed in /root/repo/SURVEY.md).  The reference is a
Flink/Akka/Neo4j stack; this engine re-expresses the same data model,
operators, and query semantics as declarative PySpark DataFrame plans
with vectorized pandas/Arrow UDFs for the text stages and a
MERGE-upsert graph store (parquet locally, Iceberg-shaped API).

Layout
------
functions/   scalar & table function library (concept extraction,
             HTML->text, text quality, lemma normalization)
operators/   relational/graph operators (co-occurrence, PMI, scoring,
             graph merge, connected components, dedup, similarity)
sources/     table IO + the storage catalog (parquet / Iceberg seam)
plans/       end-to-end pipeline + the query API (Q1-Q5)
streaming/   incremental snapshot-driven microbatch runner
"""

__version__ = "0.1.0"
