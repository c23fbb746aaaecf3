"""DataFrame operators — the engine's operator inventory (SURVEY.md §2).

Every operator is a pure function ``DataFrame -> DataFrame`` built from
Spark built-ins; Python runs only Arrow-batched (pandas_udf /
mapInPandas), never per-row.
"""
