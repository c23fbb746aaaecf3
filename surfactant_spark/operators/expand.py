"""Recursive corpus expansion + page-level filters + field-hint
resolution + node search — the remaining scan/filter operators of
SURVEY §2 (S4/S5, F4-F8, F6/A2, J8).

Archive expansion is the reference's recursive work queue
(`surfactant/cmd/generate.py:293-314`, decompression enqueue at
`infoextractors/file_decompression.py:39-177`): an archive page
explodes into member pages which are fed through the same pipeline,
repeated until no archives remain. Here each round is ONE Arrow pass +
a union; the driver loop iterates to a fixpoint with a depth bound
(a malicious archive bomb terminates the loop, not the job).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import tarfile
import zipfile
from typing import Iterator, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F


# ---------------------------------------------------------------------------
# archive expansion (S4/S5)
# ---------------------------------------------------------------------------
def _expand_one(url: str, payload: bytes) -> List[Tuple[str, bytes]]:
    """Pure: archive bytes -> [(member_url, member_bytes)]. Supports the
    reference's formats (TAR/GZIP/ZIP/BZIP2/XZ,
    `file_decompression.py:39-177`); non-archives return []."""
    out: List[Tuple[str, bytes]] = []
    try:
        if payload[:4] == b"PK\x03\x04":
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                for name in zf.namelist():
                    if not name.endswith("/"):
                        out.append((f"{url}!/{name}", zf.read(name)))
        elif payload[:2] == b"\x1f\x8b":
            inner = gzip.decompress(payload)
            if _is_tar(inner):  # ustar magic lives at offset 257
                out.extend(_tar_members(url, inner))
            else:
                out.append((f"{url}!/gunzipped", inner))
        elif payload[:3] == b"BZh":
            out.append((f"{url}!/bunzipped", bz2.decompress(payload)))
        elif payload[:6] == b"\xfd7zXZ\x00":
            out.append((f"{url}!/unxz", lzma.decompress(payload)))
        elif _is_tar(payload):
            out.extend(_tar_members(url, payload))
    except Exception:
        return []  # corrupt archives are skipped, like the reference
    return out


def _is_tar(data: bytes) -> bool:
    return len(data) > 262 and data[257:262] == b"ustar"


def _tar_members(url: str, data: bytes) -> List[Tuple[str, bytes]]:
    out = []
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        for m in tf.getmembers():
            if m.isfile():
                f = tf.extractfile(m)
                if f is not None:
                    out.append((f"{url}!/{m.name}", f.read()))
    return out


_ARCHIVE_MAGIC = (b"PK\x03\x04", b"\x1f\x8b", b"BZh", b"\xfd7zXZ\x00")


def _archive_filter_col():
    p = F.substring(F.col("html"), 1, 262)
    cond = None
    for m in _ARCHIVE_MAGIC:
        c = F.substring(p, 1, len(m)) == F.lit(m)
        cond = c if cond is None else (cond | c)
    return cond | (F.substring(F.col("html"), 258, 5) == F.lit(b"ustar"))


def _expand_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, tss, htmls, parents = [], [], [], []
        for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
            for member_url, member_bytes in _expand_one(url, bytes(html or b"")):
                urls.append(member_url)
                tss.append(ts)
                htmls.append(member_bytes)
                parents.append(url)
        yield pd.DataFrame(
            {"url": urls, "warc_ts": tss, "html": htmls, "parent_url": parents}
        )


EXPAND_SCHEMA = "url string, warc_ts timestamp, html binary, parent_url string"


def expand_archives(
    pages: DataFrame, max_depth: int = 3
) -> Tuple[DataFrame, DataFrame]:
    """pages -> (all_pages, contains_edges).

    Iterates expansion until no archives remain (or max_depth): the
    set-at-a-time form of the reference's work queue. The magic-byte
    pre-filter runs JVM-side so only actual archives reach Python.
    Returns the union of original + member pages (members get
    text=NULL, lang=NULL) and (parent_url, 'Contains', member_url)
    edges (`cmd/generate.py:113-121`).
    """
    all_pages = pages
    frontier = pages
    edges = None
    for _ in range(max_depth):
        candidates = frontier.where(_archive_filter_col())
        members = candidates.select("url", "warc_ts", "html").mapInPandas(
            _expand_batches, schema=EXPAND_SCHEMA
        )
        members = members.localCheckpoint(eager=True)  # cut lineage per round
        if members.limit(1).count() == 0:
            break
        e = members.select(
            F.col("parent_url").alias("subj"),
            F.lit("Contains").alias("pred"),
            F.col("url").alias("obj"),
        )
        edges = e if edges is None else edges.unionByName(e)
        new_pages = members.select(
            "url", "warc_ts", "html", F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
        all_pages = all_pages.unionByName(new_pages)
        frontier = new_pages
    if edges is None:
        edges = pages.sparkSession.createDataFrame(
            [], "subj string, pred string, obj string"
        )
    return all_pages, edges.dropDuplicates()


# ---------------------------------------------------------------------------
# include/exclude filter (F4, `cmd/generate.py:486-500`)
# ---------------------------------------------------------------------------
def filter_pages(
    pages: DataFrame,
    include_suffixes: Optional[Sequence[str]] = None,
    exclude_suffixes: Optional[Sequence[str]] = None,
    langs: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keep a page iff (no include list OR suffix included) AND suffix
    not excluded AND (no lang list OR lang in list). Pure column
    predicates -> pushed into the parquet scan."""
    cond = F.lit(True)
    if include_suffixes:
        inc = None
        for s in include_suffixes:
            c = F.col("url").endswith(s)
            inc = c if inc is None else (inc | c)
        cond = cond & inc
    for s in exclude_suffixes or []:
        cond = cond & ~F.col("url").endswith(s)
    if langs:
        cond = cond & F.col("lang").isin(list(langs))
    return pages.where(cond)


# ---------------------------------------------------------------------------
# field-hint precedence (F6/A2, `cmd/generate.py:92-122`)
# ---------------------------------------------------------------------------
def resolve_field_hints(hints: DataFrame) -> DataFrame:
    """(url, field, value, conf) -> one value per (url, field): max
    confidence wins, ties broken by value for determinism; the 'vendor'
    field accumulates all values instead (reference behavior)."""
    scalar = (
        hints.where(F.col("field") != "vendor")
        .groupBy("url", "field")
        .agg(F.max_by("value", F.struct(F.col("conf"), F.col("value"))).alias("value"))
    )
    vendor = (
        hints.where(F.col("field") == "vendor")
        .groupBy("url", "field")
        .agg(F.array_join(F.array_sort(F.collect_set("value")), ";").alias("value"))
    )
    return scalar.unionByName(vendor)


# ---------------------------------------------------------------------------
# node search (F7/F8, `cmd/cli.py:263-312`)
# ---------------------------------------------------------------------------
def find_nodes(
    nodes: DataFrame,
    sha256: Optional[str] = None,
    name_contains: Optional[str] = None,
    alias_prefix: Optional[str] = None,
    min_sources: Optional[int] = None,
) -> DataFrame:
    """Conjunctive predicate over the node table: hash equality,
    array-contains-substring, path-prefix (`cli find` semantics)."""
    cond = F.lit(True)
    if sha256 is not None:
        cond = cond & (F.col("sha256") == sha256)
    if name_contains is not None:
        cond = cond & F.exists("names", lambda n: n.contains(name_contains))
    if alias_prefix is not None:
        cond = cond & F.exists("aliases", lambda a: a.startswith(alias_prefix))
    if min_sources is not None:
        cond = cond & (F.col("n_sources") >= min_sources)
    return nodes.where(cond)


# ---------------------------------------------------------------------------
# URL alias resolution (F5/J8 web analogue: redirects ≙ symlinks)
# ---------------------------------------------------------------------------
def resolve_redirects(pages: DataFrame, redirects: DataFrame, max_hops: int = 5) -> DataFrame:
    """Resolve redirect chains (src_url -> dst_url) to their final
    target with loop protection — the web analogue of symlink chain
    resolution (`cmd/generate.py:593-629`). Returns
    (url, final_url); urls without redirects map to themselves.
    Chains longer than max_hops (or loops) keep the last resolved hop,
    like the reference giving up on symlink loops.

    Scale shape: the hop iterations run over the REDIRECT MAP only
    (map-sized shuffles; redirects are a small fraction of the web),
    and the full corpus pays exactly one left join at the end —
    formerly every hop re-shuffled the whole pages table. Results are
    identical: a page's chain origin is the map entry's src, so the
    per-hop loop guard sees the same origin either way."""
    m = redirects.select(
        F.col("src_url").alias("url"), F.col("dst_url").alias("final_url")
    )
    res = m
    for _ in range(max_hops - 1):
        nxt = m.select(
            F.col("url").alias("final_url"), F.col("final_url").alias("_next")
        )
        res = (
            res.join(nxt, "final_url", "left")
            .select(
                "url",
                F.when(
                    F.col("_next").isNotNull() & (F.col("_next") != F.col("url")),
                    F.col("_next"),
                ).otherwise(F.col("final_url")).alias("final_url"),
            )
        )
    return pages.select("url").dropDuplicates().join(res, "url", "left").select(
        "url", F.coalesce("final_url", "url").alias("final_url")
    )


def attach_url_aliases(nodes: DataFrame, resolved: DataFrame, url_map: DataFrame) -> DataFrame:
    """J8 — union redirect source urls into the aliases of the node
    their target resolves to (symlink alias attachment,
    `cmd/generate.py:524-579`)."""
    alias_rows = (
        resolved.where(F.col("url") != F.col("final_url"))
        .join(url_map.withColumnRenamed("url", "final_url"), "final_url")
        .groupBy("canon_uuid")
        .agg(F.array_sort(F.collect_set("url")).alias("_extra"))
    )
    return (
        nodes.join(alias_rows, "canon_uuid", "left")
        .withColumn(
            "aliases",
            F.when(F.col("_extra").isNull(), F.col("aliases")).otherwise(
                F.array_sort(F.array_union("aliases", "_extra"))
            ),
        )
        .drop("_extra")
    )


# ---------------------------------------------------------------------------
# `cli add` analogues (`cmd/cli.py:164-215`)
# ---------------------------------------------------------------------------
def add_relationship(edges: DataFrame, subj: str, pred: str, obj: str) -> DataFrame:
    """Append one edge with set semantics (`cli.py:200-201` +
    `_sbom.py:44-50` duplicate suppression)."""
    new = edges.sparkSession.createDataFrame(
        [(subj, pred, obj)], "subj_uuid string, pred string, obj_uuid string"
    )
    return (
        edges.select("subj_uuid", "pred", "obj_uuid")
        .unionByName(new)
        .dropDuplicates(["subj_uuid", "pred", "obj_uuid"])
    )


def add_entry(nodes: DataFrame, entry: dict) -> DataFrame:
    """Append one node row from a dict (`cli.py:206-207`); missing
    fields null, extra fields rejected by the schema."""
    spark = nodes.sparkSession
    row = tuple(entry.get(f.name) for f in nodes.schema.fields)
    return nodes.unionByName(spark.createDataFrame([row], nodes.schema))


def edit_nodes(
    nodes: DataFrame,
    set_fields: dict,
    append_fields: Optional[dict] = None,
    **match,
) -> DataFrame:
    """`cli edit` analogue (`cmd/cli.py:126-130` is an empty stub in the
    reference — this implements the documented intent: edit specific
    entries of a supplied SBOM). Rows matched by the find_nodes
    predicate get scalar fields replaced via ``set_fields`` and array
    fields appended-with-dedup via ``append_fields``; all other rows
    pass through unchanged. Pure conditional projection — no shuffle."""
    cond = F.lit(True)
    if "sha256" in match and match["sha256"] is not None:
        cond = cond & (F.col("sha256") == match["sha256"])
    if match.get("uuid") is not None:
        id_col = "canon_uuid" if "canon_uuid" in nodes.columns else "uuid"
        cond = cond & (F.col(id_col) == match["uuid"])
    if match.get("name_contains") is not None:
        cond = cond & F.exists("names", lambda n: n.contains(match["name_contains"]))
    out = nodes
    for field, value in (set_fields or {}).items():
        out = out.withColumn(field, F.when(cond, F.lit(value)).otherwise(F.col(field)))
    for field, value in (append_fields or {}).items():
        vals = value if isinstance(value, (list, tuple)) else [value]
        out = out.withColumn(
            field,
            F.when(
                cond,
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col(field), F.array().cast("array<string>")),
                        F.array(*[F.lit(v) for v in vals]),
                    )
                ),
            ).otherwise(F.col(field)),
        )
    return out


def add_installpath(
    nodes: DataFrame,
    container_prefix: str,
    install_prefix: str,
    container_col: str = "containerPath",
    install_col: str = "installPath",
) -> DataFrame:
    """For every containerPath containing the prefix, append the
    rewritten installPath (`cli.py:209-215`): substring containment,
    prefix replace, trailing slashes stripped."""
    cp = container_prefix.rstrip("/")
    ip = install_prefix.rstrip("/")
    additions = F.transform(
        F.filter(F.col(container_col), lambda p: p.contains(cp)),
        lambda p: F.replace(p, F.lit(cp), F.lit(ip)),
    )
    return nodes.withColumn(
        install_col,
        F.when(F.col(container_col).isNull(), F.col(install_col)).otherwise(
            F.concat(F.coalesce(F.col(install_col), F.array()), additions)
        ),
    )
