"""Stage 1 — classify + extract + mention detection (vectorized).

The analogue of the reference's scan -> identify_file_type ->
extract_file_info fan-out (`surfactant/cmd/generate.py:411-522`,
`surfactant/filetypeid/id_magic.py:51-214`,
`surfactant/infoextractors/*.py`), re-expressed as:

- a JVM-side ``CASE WHEN`` chain over a 265-byte binary prefix for
  doctype classification (whole-stage codegen; only the prefix is
  shipped, mirroring the reference's prefix-only read), and
- ONE ``mapInPandas`` pass computing sha256, extracted text, title,
  detected lang and the mention array per page (Arrow-batched; the
  heavy work happens once per page and is materialized/checkpointed).

At 100 TB the stage is embarrassingly parallel (narrow, no shuffle);
partition count is inherited from the parquet/Iceberg scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.hashing import sha256_hex
from ..functions.textlib import (
    classify_doctype,
    detect_lang,
    detect_mentions,
    extract_text,
    extract_title,
)

MENTION_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("pred", T.StringType()),
            T.StructField("alias", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("conf", T.DoubleType()),
        ]
    )
)

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("text_extracted", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("lang_detected", T.StringType()),
        T.StructField("n_mentions", T.IntegerType()),
        T.StructField("mentions", MENTION_STRUCT),
    ]
)


def classify_doctype_col(prefix_col) -> "F.Column":
    """JVM-side doctype classifier over a binary prefix column —
    firstresult ``CASE WHEN`` chain like the reference's ordered magic
    checks (`filetypeid/id_magic.py:51-214`). Kept in sync with the pure
    ``classify_doctype`` by tests."""
    p = prefix_col
    txt = F.lower(F.substring(p.cast("string"), 1, 64))

    def starts(b: bytes):
        return F.substring(p, 1, len(b)) == F.lit(b)

    return (
        F.when(starts(b"\x7fELF"), "elf")
        .when(starts(b"MZ"), "pe")
        .when(starts(b"%PDF"), "pdf")
        .when(starts(b"<?xml"), "xml")
        .when(starts(b"\x1f\x8b"), "gzip")
        .when(starts(b"PK\x03\x04"), "zip")
        .when(
            F.ltrim(txt).startswith("<!doctype html") | txt.contains("<html"), "html"
        )
        .when(starts(b"{") | starts(b"["), "json")
        .otherwise("text")
    )


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        htmls = pdf["html"]
        texts, titles, langs, shas, mentions, n_mentions = [], [], [], [], [], []
        for h in htmls:
            hb = bytes(h) if h is not None else b""
            text = extract_text(hb)
            ms = detect_mentions(hb)
            texts.append(text)
            titles.append(extract_title(hb))
            langs.append(detect_lang(text))
            shas.append(sha256_hex(hb))
            mentions.append(
                [
                    {"pred": p, "alias": a, "start": s, "end": e, "conf": 1.0}
                    for (p, a, s, e) in ms
                ]
            )
            n_mentions.append(len(ms))
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "content_sha256": shas,
                "text_extracted": texts,
                "title": titles,
                "lang_detected": langs,
                "n_mentions": n_mentions,
                "mentions": mentions,
            }
        )


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages -> extracted (with embedded mention array). One Arrow pass."""
    return pages.select("url", "warc_ts", "html").mapInPandas(
        _extract_batches, schema=EXTRACT_SCHEMA
    )


def classify_pages(pages: DataFrame) -> DataFrame:
    """pages -> (url, doctype) via the JVM-side prefix classifier. The
    select ships only a 265-byte prefix into the CASE chain."""
    return pages.select(
        "url", classify_doctype_col(F.substring(F.col("html"), 1, 265)).alias("doctype")
    )


def mentions_table(extracted: DataFrame) -> DataFrame:
    """extracted -> exploded mentions table (url, pred, alias, span, conf)."""
    m = extracted.select("url", F.explode("mentions").alias("m"))
    return m.select(
        "url",
        F.col("m.pred").alias("pred"),
        F.col("m.alias").alias("alias"),
        F.struct(F.col("m.start").alias("start"), F.col("m.end").alias("end")).alias("span"),
        F.col("m.conf").alias("conf"),
    )
