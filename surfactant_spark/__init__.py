"""surfactant_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimagination of the extract -> link -> canonicalize ->
materialize dataflow of LLNL Surfactant (reference at /root/reference,
cited by file:line throughout) as idiomatic Spark DataFrame stages:

- stage 1 (extract):   vectorized pandas/Arrow UDFs over a ``pages`` table
                       (url, warc_ts, html, text, lang) performing
                       classification, boilerplate-stripped text extraction
                       and mention detection (candidate triples).
- stage 2 (link):      content-hash dedup (groupBy sha256) and entity
                       linking via exploded-probe-key equi joins and
                       salted broadcast joins against alias dictionaries.
- stage 3 (canonical): UUID reconciliation, connected components
                       (iterative DataFrame self-join with checkpointing),
                       root finding, system-node attachment.
- stage 4 (material):  partitioned nodes/edges/lineage parquet outputs.

Everything is DataFrame-first; Python only runs Arrow-batched
(pandas_udf / mapInPandas) — never per-row.
"""

__version__ = "0.1.0"
