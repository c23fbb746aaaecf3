"""Specimen-config source (S3) — config-driven corpus scan.

The reference turns a specimen argument (bare path, or a JSON config
file) into a list of work items `{extractPaths, installPrefix,
archive?}` that seed the generate pipeline
(`surfactant/cmd/internal/generate_utils.py:62-120`). In the engine the
corpus is a table, so a work item becomes a *scan specification*: a set
of url-prefix predicates (pushed into the parquet/Iceberg scan) plus an
install-prefix to stamp on every matched page (the F9 rewrite input).

Heuristics mirrored from the reference:
- a bare value ending in ``/`` is a DIR: installPrefix = the value;
- a bare value ending in ``.json`` is a CONFIG file to load;
- any other bare value is a FILE: installPrefix = its parent;
- config entries must carry ``extractPaths`` (fail otherwise).
Validation failures raise ValueError (the click ``fail`` analogue).
"""

from __future__ import annotations

import json
import os
from typing import List, Union

from pyspark.sql import DataFrame, functions as F


def parse_specimen_config(value: Union[str, list]) -> List[dict]:
    """Specimen argument -> list of work items (SURVEY S3)."""
    if isinstance(value, list):
        entries = value
    elif isinstance(value, str) and value.lstrip().startswith("["):
        try:
            entries = json.loads(value)
        except json.JSONDecodeError as err:
            raise ValueError(f"specimen config contains invalid JSON: {err}") from err
    elif isinstance(value, str) and value.lower().endswith(".json"):
        if not os.path.exists(value):
            raise ValueError(f"{value!r} does not exist")
        with open(value, encoding="utf-8") as f:
            try:
                entries = json.load(f)
            except json.JSONDecodeError as err:
                raise ValueError(
                    f"{value!r} config file contains invalid JSON"
                ) from err
    elif isinstance(value, str):
        if value.endswith("/"):
            prefix = value.rstrip("/")
        else:
            prefix = value.rsplit("/", 1)[0] if "/" in value else ""
        entries = [{"extractPaths": [value], "installPrefix": prefix}]
    else:
        raise ValueError(f"{value!r} is not a valid specimen config")
    for entry in entries:
        if "extractPaths" not in entry:
            raise ValueError(f"missing extractPaths in config file entry: {entry}")
        if not isinstance(entry["extractPaths"], list):
            raise ValueError(f"extractPaths must be a list: {entry}")
    return entries


def scan_from_config(pages: DataFrame, entries: List[dict]) -> DataFrame:
    """Work items -> the pages they select, stamped with the entry's
    installPrefix (and archive url when present). One union branch per
    entry — each branch's prefix predicates push into the scan, the
    reference's one-work-item-per-entry queue set-at-a-time."""
    out = None
    for entry in entries:
        cond = None
        for p in entry["extractPaths"]:
            c = F.col("url").startswith(p)
            cond = c if cond is None else (cond | c)
        part = pages.where(cond).withColumn(
            "install_prefix", F.lit(entry.get("installPrefix", ""))
        ).withColumn("archive_url", F.lit(entry.get("archive")).cast("string"))
        out = part if out is None else out.unionByName(part)
    if out is None:
        return (
            pages.withColumn("install_prefix", F.lit(""))
            .withColumn("archive_url", F.lit(None).cast("string"))
            .limit(0)
        )
    return out
