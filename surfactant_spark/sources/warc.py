"""WARC source — Common-Crawl-style page ingest (S1/S6 extension).

The north star's corpus is Common-Crawl-shaped; its native container is
WARC (ISO 28500): concatenated records of ``WARC/1.0`` header blocks +
payload, each terminated by CRLF CRLF. This reader turns a directory of
WARC files into the engine's contracted ``pages`` shape
(url, warc_ts, html, text, lang) without external libraries:

- ``spark.read.format("binaryFile")`` distributes whole files (WARC
  members are not splittable mid-record without an index; Common Crawl
  ships ~1 GB gzipped members, one task per member — the same unit
  cc-pyspark processes);
- an Arrow ``mapInPandas`` pass parses records, keeps
  ``WARC-Type: response`` entries, strips the HTTP response header from
  the payload and emits the html bytes;
- gzipped members (.warc.gz) are decompressed in the pass.

Only the fields the pipeline needs are parsed (Target-URI, Date,
payload); everything else in the record header is ignored.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def parse_warc_bytes(data: bytes) -> List[Tuple[str, Optional[str], bytes]]:
    """Pure: WARC member bytes -> [(url, iso_date, html_bytes)] for
    response records. Deterministic, shared with tests."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out: List[Tuple[str, Optional[str], bytes]] = []
    buf = io.BytesIO(data)
    while True:
        line = buf.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue
        headers = {}
        while True:
            h = buf.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        payload = buf.read(length)
        buf.readline()  # record-terminating CRLFs
        buf.readline()
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        date = headers.get(b"warc-date")
        # strip the HTTP response header block from the payload
        sep = payload.find(b"\r\n\r\n")
        html = payload[sep + 4 :] if sep >= 0 else payload
        out.append((url, date.decode("ascii", "replace") if date else None, html))
    return out


def _warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, tss, htmls = [], [], []
        for content in pdf["content"]:
            for url, date, html in parse_warc_bytes(bytes(content)):
                urls.append(url)
                tss.append(pd.Timestamp(date).tz_localize(None) if date else None)
                htmls.append(html)
        yield pd.DataFrame(
            {
                "url": urls,
                "warc_ts": pd.Series(tss, dtype="datetime64[ns]"),
                "html": htmls,
                "text": pd.Series([None] * len(urls), dtype="object"),
                "lang": pd.Series([None] * len(urls), dtype="object"),
            }
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` -> pages DataFrame (text/lang NULL —
    stage 1 extraction fills them)."""
    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_warc_batches, schema=PAGES_SCHEMA)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines pages with the declared schema (never inferred)."""
    return (
        spark.read.schema(
            "url string, warc_ts timestamp, html_b64 string, text string, lang string"
        )
        .json(path)
        .select(
            "url",
            "warc_ts",
            F.unbase64("html_b64").alias("html"),
            "text",
            "lang",
        )
    )


def read_pages_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV pages (html carried base64; CSV cannot hold raw binary)."""
    return (
        spark.read.schema(
            "url string, warc_ts timestamp, html_b64 string, text string, lang string"
        )
        .option("header", "true")
        .csv(path)
        .select(
            "url",
            "warc_ts",
            F.unbase64("html_b64").alias("html"),
            "text",
            "lang",
        )
    )


def build_warc_member(
    rows: List[Tuple[str, int, bytes]], gzip_member: bool = True
) -> bytes:
    """Pure: [(url, epoch_s, html)] -> one WARC member's bytes
    (response records with a minimal HTTP/1.1 200 header, the shape
    ``parse_warc_bytes`` reads back losslessly). Shared by the writer
    tasks and the round-trip tests."""
    import datetime

    parts = []
    for url, epoch, html in rows:
        iso = datetime.datetime.fromtimestamp(
            int(epoch), datetime.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        http = b"HTTP/1.1 200 OK\r\nContent-Length: %d\r\n\r\n" % len(html)
        payload = http + bytes(html)
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        parts.append(hdr + payload + b"\r\n\r\n")
    member = b"".join(parts)
    if not gzip_member:
        return member
    # mtime=0: gzip headers embed a timestamp by default, which would
    # make byte-identical content hash to different member names on
    # every run — deterministic compression is what makes the
    # content-addressed names retry-idempotent
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as gz:
        gz.write(member)
    return buf.getvalue()


def write_warc(
    pages: DataFrame, out_dir: str, gzip_members: bool = True
) -> DataFrame:
    """WARC sink: write the pages table as a directory of WARC members
    (one per Arrow batch, Common Crawl's export unit) and return the
    (member, n_records) manifest. The crawl-format twin of
    ``read_warc`` — an engine that ingests WARC should also emit it
    (re-sharding, corpus hand-off to WARC-native tools).

    Each executor task serializes its batch with the pure builder and
    writes ONE member named by its content hash — deterministic,
    retry-idempotent (a re-run of the same batch overwrites the same
    bytes), and collision-free, the same marker-free idempotence the
    parquet snapshot store uses. At cluster scale ``out_dir`` is an
    object-store prefix; no driver-side collection anywhere."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                epoch = (
                    int(ts.timestamp())
                    if isinstance(ts, pd.Timestamp)
                    else int(ts)
                )
                rows.append((url, epoch, bytes(html)))
            member = build_warc_member(rows, gzip_member=gzip_members)
            name = hashlib.sha256(member).hexdigest()[:16] + ext
            path = os.path.join(out_dir, name)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(member)
            os.replace(tmp, path)
            yield pd.DataFrame({"member": [name], "n_records": [len(rows)]})

    return pages.select("url", "warc_ts", "html").mapInPandas(
        _write, "member string, n_records long"
    )
