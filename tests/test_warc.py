"""WARC / JSONL / CSV page sources: record parsing, HTTP-header
stripping, gzip members, and end-to-end pages -> extraction."""

import base64
import gzip


def _warc_record(rtype: bytes, url: bytes, date: bytes, payload: bytes) -> bytes:
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        b"WARC-Target-URI: " + url + b"\r\n"
        b"WARC-Date: " + date + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _member() -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    html1 = b"<html><title>pageone</title>body one</html>"
    html2 = b"<html><title>pagetwo</title>body two</html>"
    return (
        _warc_record(b"warcinfo", b"", b"2024-01-01T00:00:00Z", b"software: test\r\n")
        + _warc_record(b"response", b"https://a.example/1", b"2024-01-01T00:00:01Z", http + html1)
        + _warc_record(b"request", b"https://a.example/1", b"2024-01-01T00:00:01Z", b"GET / HTTP/1.1\r\n")
        + _warc_record(b"response", b"https://b.example/2", b"2024-01-02T03:04:05Z", http + html2)
    )


def test_parse_warc_bytes_plain_and_gzip():
    from surfactant_spark.sources.warc import parse_warc_bytes

    for raw in (_member(), gzip.compress(_member(), mtime=0)):
        recs = parse_warc_bytes(raw)
        assert [r[0] for r in recs] == ["https://a.example/1", "https://b.example/2"]
        # HTTP response headers are stripped; payload is the html alone
        assert recs[0][2].startswith(b"<html><title>pageone")
        assert recs[1][1] == "2024-01-02T03:04:05Z"


def test_read_warc_to_pages_and_extract(spark, tmp_path):
    from surfactant_spark.operators.extract import extract_pages
    from surfactant_spark.sources.warc import read_warc

    (tmp_path / "part1.warc").write_bytes(_member())
    (tmp_path / "part2.warc.gz").write_bytes(gzip.compress(_member(), mtime=0))
    pages = read_warc(spark, str(tmp_path))
    rows = {r.url for r in pages.collect()}
    assert rows == {"https://a.example/1", "https://b.example/2"}
    assert pages.count() == 4  # two members x two responses

    ext = extract_pages(pages)
    got = {r.url: r.title for r in ext.collect()}
    assert got["https://a.example/1"] == "pageone"
    assert got["https://b.example/2"] == "pagetwo"
    ts = {r.url: r.warc_ts for r in pages.collect()}
    assert ts["https://b.example/2"].day == 2


def test_jsonl_and_csv_pages_round_trip(spark, tmp_path):
    import json

    from surfactant_spark.sources.warc import read_pages_csv, read_pages_jsonl

    html = b"<html><title>t</title>x</html>"
    row = {
        "url": "u/1",
        "warc_ts": "2024-01-01T00:00:00",
        "html_b64": base64.b64encode(html).decode(),
        "text": "x",
        "lang": "en",
    }
    (tmp_path / "pages.jsonl").write_text(json.dumps(row) + "\n")
    got = read_pages_jsonl(spark, str(tmp_path / "pages.jsonl")).collect()[0]
    assert got.url == "u/1" and bytes(got.html) == html and got.lang == "en"

    (tmp_path / "pages.csv").write_text(
        "url,warc_ts,html_b64,text,lang\n"
        f"u/2,2024-01-01T00:00:00,{row['html_b64']},x,de\n"
    )
    got = read_pages_csv(spark, str(tmp_path / "pages.csv")).collect()[0]
    assert got.url == "u/2" and bytes(got.html) == html and got.lang == "de"


def test_build_warc_member_round_trips_pure():
    from surfactant_spark.sources.warc import build_warc_member, parse_warc_bytes

    rows = [
        ("https://a.com/1", 1700000000, b"<html>one</html>"),
        ("https://b.org/2", 1700000060, b"<html>two \xe2\x9c\x93</html>"),
    ]
    for gz in (True, False):
        member = build_warc_member(rows, gzip_member=gz)
        got = parse_warc_bytes(member)
        assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in rows]
        assert got[0][1] == "2023-11-14T22:13:20Z"


def test_write_warc_read_warc_distributed(spark, tmp_path):
    import pandas as pd

    from surfactant_spark.sources.warc import read_warc, write_warc

    pages = spark.createDataFrame(
        [
            ("https://a.com/1", 1700000000, b"<html>a</html>"),
            ("https://a.com/2", 1700000001, b"<html>b</html>"),
            ("https://b.org/3", 1700000002, b"<html>c</html>"),
        ],
        "url string, warc_ts long, html binary",
    )
    out = str(tmp_path / "warc")
    manifest = write_warc(pages, out).collect()
    assert sum(r.n_records for r in manifest) == 3
    # content-addressed names: re-running writes the SAME members
    again = write_warc(pages, out).collect()
    assert sorted(r.member for r in again) == sorted(r.member for r in manifest)
    back = read_warc(spark, out).select("url", "warc_ts", "html").collect()
    got = sorted((r.url, int(pd.Timestamp(r.warc_ts).timestamp()), bytes(r.html)) for r in back)
    assert got == [
        ("https://a.com/1", 1700000000, b"<html>a</html>"),
        ("https://a.com/2", 1700000001, b"<html>b</html>"),
        ("https://b.org/3", 1700000002, b"<html>c</html>"),
    ]
