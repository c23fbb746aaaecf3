"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only; incremental ingest is our extension —
stage 1 is stateless/map-only, so it streams unchanged.
"""
