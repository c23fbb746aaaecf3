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
    """Work items -> the pages they select, stamped with the matched
    extract root, the entry's installPrefix and archive url. One union
    branch per (entry, extract path) — each branch's prefix predicate
    pushes into the scan; the reference walks each extract path as its
    own work item the same way (`cmd/generate.py:384-411`)."""
    out = None
    for entry in entries:
        for p in entry["extractPaths"]:
            part = (
                pages.where(F.col("url").startswith(p))
                .withColumn("extract_root", F.lit(p))
                .withColumn("install_prefix", F.lit(entry.get("installPrefix", "")))
                .withColumn("archive_url", F.lit(entry.get("archive")).cast("string"))
            )
            out = part if out is None else out.unionByName(part)
    if out is None:
        return (
            pages.withColumn("extract_root", F.lit(""))
            .withColumn("install_prefix", F.lit(""))
            .withColumn("archive_url", F.lit(None).cast("string"))
            .limit(0)
        )
    return out


def install_paths_from_scan(scanned: DataFrame, skip: bool = False) -> DataFrame:
    """F9 — rebase each scanned url from its extract root onto the
    entry's install prefix (`cmd/generate.py:24-28,48-59`): the part of
    the url under the extract root is re-rooted at installPrefix; with
    no prefix the install path is the scan location itself (the
    reference's no-prefix golden behavior, `tests/cmd/test_generate.py:
    31-37`); ``skip`` (the --skip_install_path flag) yields NULL, which
    downstream turns into empty installPath arrays -> no path-probe
    edges (`test_generate.py:88-113`)."""
    if skip:
        return scanned.withColumn("install_path", F.lit(None).cast("string"))
    rel = F.regexp_replace(
        F.expr("substring(url, length(extract_root) + 1)"), "^/+", ""
    )
    has_prefix = F.col("install_prefix").isNotNull() & (F.col("install_prefix") != "")
    return scanned.withColumn(
        "install_path",
        F.when(
            has_prefix,
            F.concat(
                F.regexp_replace("install_prefix", "/+$", ""), F.lit("/"), rel
            ),
        ).otherwise(F.col("url")),
    )
