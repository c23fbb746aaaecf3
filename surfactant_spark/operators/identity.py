"""Stage 2a — content-hash dedup + deterministic canonical identity.

The analogue of the reference's sha256-indexed dedup-merge
(`surfactant/sbomtypes/_sbom.py:75-122`, `_software.py:107-155`): all
sightings of the same content collapse into one node, first-sighting
wins for time-like fields, array fields union. Expressed as ONE
hash aggregation on sha256 (map-side partial agg + single shuffle) —
the set-at-a-time form of the reference's per-entry index lookup.

Canonical UUIDs are uuid5(namespace, sha256)
(`functions/hashing.canon_uuid`) — deterministic, so retries/resume are
idempotent; see hashing.py docstring for why this diverges from the
reference's uuid4.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.hashing import canon_uuid, entity_uuid


@F.pandas_udf(T.StringType())
def canon_uuid_udf(sha256: pd.Series) -> pd.Series:
    return sha256.map(canon_uuid)


@F.pandas_udf(T.StringType())
def entity_uuid_udf(name: pd.Series) -> pd.Series:
    return name.map(entity_uuid)


def dedup_nodes(extracted: DataFrame) -> DataFrame:
    """extracted -> nodes: one row per distinct content (sha256).

    - canon_uuid: uuid5 of sha256 (order-free, deterministic);
    - names: distinct non-empty titles (array_sort for determinism);
    - aliases: every url the content was seen under (the reference
      keeps all fileName/installPath sightings, `_software.py:121-153`);
    - first_seen: min warc_ts (first-sighting-wins,
      `_software.py:112-113`);
    - n_sources: distinct urls.
    """
    return (
        extracted.groupBy("content_sha256")
        .agg(
            F.array_sort(F.filter(F.collect_set("title"), lambda x: x != F.lit(""))).alias(
                "names"
            ),
            F.array_sort(F.collect_set("url")).alias("aliases"),
            F.min("warc_ts").alias("first_seen"),
            F.countDistinct("url").alias("n_sources"),
        )
        .select(
            canon_uuid_udf(F.col("content_sha256")).alias("canon_uuid"),
            F.col("content_sha256").alias("sha256"),
            "names",
            "aliases",
            "first_seen",
            "n_sources",
        )
    )


def url_to_canon(extracted: DataFrame) -> DataFrame:
    """(url, canon_uuid) mapping — the rewrite map applied to mention
    endpoints (the analogue of uuid_updates, `_sbom.py:173-231`)."""
    return extracted.select(
        "url", canon_uuid_udf(F.col("content_sha256")).alias("canon_uuid")
    )


def hash_collision_audit(nodes_raw: DataFrame) -> DataFrame:
    """A5 — flag same-sha256 rows whose other identity fields disagree
    (`_software.py:157-174`). Input: any table with sha256 + size/md5.
    Output: (sha256, n_variants) for groups with >1 distinct identity."""
    other_cols = [c for c in ("size", "md5", "sha1") if c in nodes_raw.columns]
    if not other_cols:
        raise ValueError("audit needs at least one of size/md5/sha1")
    return (
        nodes_raw.groupBy("sha256")
        .agg(F.countDistinct(*other_cols).alias("n_variants"))
        .where(F.col("n_variants") > 1)
    )
