"""Pure deterministic function library.

Shared between the Spark pandas UDFs and the pandas/DuckDB oracles so
that per-row invariants (byte-identical extracted text per url) hold by
construction. No Spark imports allowed in this package.
"""
