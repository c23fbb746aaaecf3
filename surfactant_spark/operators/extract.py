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


def classify_magic_col(url_col, html_col) -> "F.Column":
    """JVM twin of functions/magic.classify — the reference's full
    ~30-type ordered magic dispatch (`filetypeid/id_magic.py:56-214`)
    plus the Intel-HEX/SREC line sampler (`id_hex.py:71-96`), as one
    whole-stage-codegen CASE chain over the binary column. Byte values
    are read via hex(substring(...)) -> conv; PE's COFF-pointer
    indirection uses a dynamic substr. Identity with the pure twin is
    pinned by tests/test_magic.py over every fixture family."""
    from ..functions.magic import A_OUT_MAGIC, COFF_MACHINE, HEX_FILE_EXTENSIONS

    h = html_col
    n = F.length(h)
    u = F.lower(url_col)

    def byte(i0: int) -> "F.Column":
        return F.conv(F.hex(F.substring(h, i0 + 1, 1)), 16, 10).cast("int")

    def be(i0: int, width: int) -> "F.Column":
        return F.conv(F.hex(F.substring(h, i0 + 1, width)), 16, 10).cast("long")

    def starts(b: bytes) -> "F.Column":
        return F.substring(h, 1, len(b)) == F.lit(b)

    def at(i0: int, b: bytes) -> "F.Column":
        return F.substring(h, i0 + 1, len(b)) == F.lit(b)

    coff_addr = byte(0x3C) + byte(0x3D) * 256
    pe_sig = F.substr(h, (coff_addr + 1).cast("int"), F.lit(4)) == F.lit(b"PE\x00\x00")
    le16_0 = byte(0) + byte(1) * 256
    aout_be = byte(2) * 256 + byte(3)
    cmf, flg = byte(0), byte(1)

    hexable = None
    for s in sorted(HEX_FILE_EXTENSIONS):
        c = u.endswith(s)
        hexable = c if hexable is None else (hexable | c)
    lines = F.slice(F.split(h.cast("string"), "\n", 101), 1, 100)
    n_moto = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[Ss][0-9A-Fa-f]*\s*$")))
    n_intel = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*:[0-9A-Fa-f]*\s*$")))

    pk = starts(b"PK\x03\x04") | starts(b"PK\x05\x06") | starts(b"PK\x07\x08")
    zip_suffixes = [
        (".zip", "ZIP"), (".zipx", "ZIP"), (".jar", "JAR"), (".war", "WAR"),
        (".ear", "EAR"), (".apk", "APK"), (".ipa", "IPA"), (".msix", "MSIX"),
    ]

    c = F.when(starts(b"\x7fELF"), "ELF")
    c = c.when(
        starts(b"MZ"),
        F.when((coff_addr + 4 > n) | coff_addr.isNull(), "Malformed PE")
        .when(~pe_sig, "DOS")
        .when(at(0x202, b"HdrS"), "Linux Kernel Image")
        .otherwise("PE"),
    )
    c = c.when(starts(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"), "OLE")
    c = c.when(starts(b"MSCF"), "MSCAB")
    c = c.when(starts(b"ISc("), "ISCAB")
    c = c.when(starts(b"\x1f\x8b"), "GZIP")
    c = c.when(starts(b"BZh"), "BZIP2")
    c = c.when(starts(b"\xfd\x37\x7a\x58\x5a\x00"), "XZ")
    c = c.when(at(257, b"ustar\x0000") | at(257, b"ustar  \x00"), "TAR")
    for s, t in zip_suffixes:
        c = c.when(pk & u.endswith(s), t)
    c = c.when(starts(b"\xca\xfe\xba\xbe"), F.when(be(4, 4) <= 30, "MACHOFAT").otherwise("JAVACLASS"))
    c = c.when(starts(b"\xbe\xba\xfe\xca"), "MACHOFAT")
    c = c.when(starts(b"\xca\xfe\xba\xbf") | starts(b"\xbf\xba\xfe\xca"), "MACHOFAT64")
    c = c.when(starts(b"\x0e\xf1\xfa\xb9"), "EFIFAT")
    c = c.when(starts(b"\xfe\xed\xfa\xce") | starts(b"\xce\xfa\xed\xfe"), "MACHO32")
    c = c.when(starts(b"\xfe\xed\xfa\xcf") | starts(b"\xcf\xfa\xed\xfe"), "MACHO64")
    c = c.when(starts(b"\xde\xc0\x17\x0b"), "LLVM_BITCODE")
    c = c.when(starts(b"BC\xc0\xde"), "LLVM_IR")
    c = c.when((n >= 4) & aout_be.isin(list(A_OUT_MAGIC)), "A.OUT big")
    c = c.when((n >= 4) & le16_0.isin(list(A_OUT_MAGIC)), "A.OUT little")
    c = c.when((n >= 2) & le16_0.isin(list(COFF_MACHINE)), "COFF")
    c = c.when(starts(b"\x1d\x00"), "XCOFF32")
    c = c.when(starts(b"\xf7\x01"), "XCOFF64")
    c = c.when(starts(b"\x83\x01") | starts(b"\x88\x01") | starts(b"\x8f\x01"), "ECOFF")
    c = c.when(starts(b"!<arch>\n"), "AR_LIB")
    c = c.when((n >= 4) & (be(0, 4).bitwiseAND(F.lit(0xFF0F80FF)) == 0xF00D0000), "OMF_LIB")
    c = c.when(starts(b"\x27\x05\x19\x56"), "UIMAGE")
    c = c.when(
        (n >= 2) & (cmf.bitwiseAND(F.lit(0x0F)) == 8) & ((cmf * 256 + flg) % 31 == 0),
        "ZLIB",
    )
    c = c.when(hexable & (n_intel > n_moto), "INTEL_HEX")
    c = c.when(hexable & (n_moto > n_intel), "MOTOROLA_SREC")

    # extension/shebang family (`id_extension.py:14-59`)
    from ..functions.magic import EXTENSION_TYPES, INTERPRETER_TYPES

    c = c.when(starts(b"<!DOCTYPE html>"), "HTML")
    head = F.substring(h.cast("string"), 1, 256)
    first_line = F.substring_index(head, "\n", 1)
    is_shebang = starts(b"#!") & head.contains("\n")
    sheb = None
    for pattern, filetype in INTERPRETER_TYPES:
        cond = first_line.contains(pattern.decode())
        sheb = F.when(cond, filetype) if sheb is None else sheb.when(cond, filetype)
    c = c.when(is_shebang, sheb.otherwise("SHEBANG"))
    for suffix, filetype in EXTENSION_TYPES.items():
        c = c.when(u.endswith(suffix), filetype)
    return c


def classify_magic_pages(pages: DataFrame) -> DataFrame:
    """pages -> (url, filetype) via the JVM full-breadth classifier."""
    return pages.select(
        "url", classify_magic_col(F.col("url"), F.col("html")).alias("filetype")
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
