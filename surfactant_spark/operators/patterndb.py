"""Pattern-database mention detection (E4/E5 + S11).

The reference detects library mentions by running a versioned regex
database against file content — RetireJS for JavaScript
(`surfactant/infoextractors/js_file.py:89-126`) and EMBA patterns for
native libraries (`native_lib_file.py:100-158`) — with the database
downloaded, hash-versioned and cached by
`database_manager/database_utils.py:25-288`.

Spark-first re-expression: the pattern DB is a small **versioned
dimension table** (library, regex, pattern_version) broadcast against
the corpus; matching is a broadcast nested-loop join with an RLIKE
condition (non-foldable regex patterns are supported by the JVM RLike
expression — no Python in the hot path), and the DB version is stamped
on every emitted mention for lineage, like the reference records the
database hash/version it matched against.

Scale: |patterns| is dimension-sized (dozens-thousands), so the join is
|corpus| x |patterns| regex evaluations fanned across executors — the
same work the reference does single-threaded. ``pattern_mentions``
additionally prefilters (on by default) with ONE rlike of the union of
the patterns' literal prefixes, so non-matching documents pay a single
regex scan instead of |patterns| of them.

The regex dialect is kept in the Java-regex/RE2 common subset
(literal words, alternation, single capture group) so the DuckDB
`regexp_matches`/`regexp_extract` oracle replays matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# deterministic built-in DB over the synthetic corpus vocabulary; the
# analogue of a pinned RetireJS snapshot. Alternatives are disjoint at
# any match position (distinct words) so Java regex (leftmost-first)
# and RE2 (leftmost-longest) agree.
PATTERN_DB = [
    ("spark-engine", "spark (window|stream|data)", "1.2.0"),
    ("hash-ops", "hash (join|value|table)", "0.9.1"),
    ("vector-ops", "vector (table|scan|value)", "2.0.0"),
    ("fast-path", "fast (scan|key|merge)", "3.1.4"),
    ("agg-kernel", "agg (row|join|window)", "0.4.2"),
]

PATTERN_DB_VERSION = "2026.08.0"


def pattern_dim(spark: SparkSession, db=None) -> DataFrame:
    """The versioned pattern dimension table (S11's broadcast shape)."""
    return spark.createDataFrame(
        db or PATTERN_DB, "library string, regex string, pattern_version string"
    )


def save_pattern_db(path: str, entries=None) -> str:
    """Persist a pattern DB as JSON and return its version pin (sha256
    prefix of the bytes) — the analogue of the reference caching a
    downloaded database with hash metadata
    (`database_manager/database_utils.py:25-288`)."""
    import hashlib
    import json

    rows = [
        {"library": lib, "regex": rx, "version": ver}
        for (lib, rx, ver) in (entries or PATTERN_DB)
    ]
    data = json.dumps(rows, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(data)
    return hashlib.sha256(data).hexdigest()[:16]


def load_pattern_db(spark: SparkSession, path: str):
    """-> (pattern_dim_df, db_version). The version is derived from the
    file bytes, so every mention row's ``db_version`` lineage stamp
    identifies exactly which DB snapshot matched it (the reference
    records the database version the same way)."""
    import hashlib
    import json

    with open(path, "rb") as f:
        data = f.read()
    db_version = hashlib.sha256(data).hexdigest()[:16]
    entries = json.loads(data)
    rows = [(e["library"], e["regex"], e.get("version", "")) for e in entries]
    return pattern_dim(spark, rows), db_version


# Databases that implement the update_db hook (the reference's RetireJS
# js_file.py:89-126 and EMBA native_lib_file.py:100-158 both refresh a
# downloaded pattern snapshot through `plugin update-db`). Here the
# provider returns the current entry list; update_db() re-stages it as
# a hash-pinned JSON snapshot — a deployment overriding the provider
# (or passing ``entries``) models a refreshed upstream download.
UPDATABLE_DBS = {"pattern_db": lambda: PATTERN_DB}


def staged_db_path(name: str, config_manager=None) -> str:
    """Where database ``name``'s staged snapshot lives — the analogue
    of the reference's cached database dir
    (`database_manager/database_utils.py:25-288`)."""
    import os

    if config_manager is None:
        from ..config import ConfigManager

        config_manager = ConfigManager()
    d = os.path.join(config_manager.data_dir_path(), "databases")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{name}.json")


def update_db(name: str = "pattern_db", config_manager=None, entries=None) -> dict:
    """Refresh database ``name``: re-stage its JSON snapshot, recompute
    the content-hash version pin, and persist the pin under
    ``database.{name}_version`` in the engine config so subsequent
    mention runs stamp their lineage with the refreshed version
    (`load_pattern_db` of the staged path yields the same pin). Returns
    the old/new pins — ``changed`` is False when the upstream content
    is identical (the reference's 'No update operation performed')."""
    if config_manager is None:
        from ..config import ConfigManager

        config_manager = ConfigManager()
    if name not in UPDATABLE_DBS:
        raise KeyError(name)
    path = staged_db_path(name, config_manager)
    old = config_manager.get("database", f"{name}_version", None)
    new = save_pattern_db(path, entries if entries is not None else UPDATABLE_DBS[name]())
    config_manager.set("database", f"{name}_version", new)
    return {
        "name": name,
        "path": path,
        "old_version": old,
        "new_version": new,
        "changed": old != new,
    }


_REGEX_META = set("\\.[]{}()*+?^$|")


def _literal_prefix(regex: str) -> str:
    """Longest leading literal run of a regex (stops at the first
    metacharacter). Sound prefilter key: any string matching the full
    pattern must contain this prefix."""
    out = []
    for ch in regex:
        if ch in _REGEX_META:
            break
        out.append(ch)
    return "".join(out)


def pattern_mentions(
    docs: DataFrame,
    patterns: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    db_version: str = PATTERN_DB_VERSION,
    prefilter: bool = True,
) -> DataFrame:
    """(doc, library, pattern_version, match_token, db_version) for
    every document matching a pattern — one row per (doc, pattern) hit,
    like the reference's per-file `jsLibraries` entries.

    ``prefilter`` short-circuits the |corpus| x |patterns| regex join
    with ONE cheap pass first: a single rlike of the union of the
    patterns' literal prefixes drops every document that cannot match
    any pattern, so the per-pattern regex evaluations run only on
    candidate docs. Sound by construction (a full-pattern match implies
    the literal prefix occurs); automatically disabled when any pattern
    starts with a metacharacter (no usable prefix -> the filter would be
    unsound). The pattern table is dimension-sized by contract (it is
    broadcast), so collecting the regex column to build the prefilter
    literal is a bounded driver action."""
    import re as _re

    filtered = docs
    if prefilter:
        prefixes = sorted(
            {_literal_prefix(r.regex) for r in patterns.select("regex").collect()}
        )
        if prefixes and all(prefixes):
            union_rx = "(" + "|".join(_re.escape(p) for p in prefixes) + ")"
            filtered = docs.where(F.col(text_col).rlike(union_rx))
    joined = filtered.join(
        F.broadcast(patterns), F.expr(f"regexp_like({text_col}, regex)")
    )
    return joined.select(
        F.col(id_col),
        "library",
        "pattern_version",
        F.expr(f"regexp_extract({text_col}, regex, 1)").alias("match_token"),
        F.lit(db_version).alias("db_version"),
    )
