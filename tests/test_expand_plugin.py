"""Archive expansion (recursive work queue S4/S5), page filters (F4),
field-hint precedence (F6/A2), node search (F7/F8), redirect aliasing
(F5/J8), and the hook registry (§2.11 plugin analogue)."""

import gzip
import io
import tarfile
import zipfile

from pyspark.sql import functions as F


def _pages_df(spark, rows):
    return spark.createDataFrame(
        [(u, None, bytearray(h), t, lang) for (u, h, t, lang) in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def _zip_bytes(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _targz_bytes(members):
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return gzip.compress(tbuf.getvalue())


def test_expand_archives_recursive(spark):
    from surfactant_spark.operators.expand import expand_archives

    inner_zip = _zip_bytes({"deep.txt": b"deep content"})
    outer = _targz_bytes({"a.txt": b"hello", "nested.zip": inner_zip})
    pages = _pages_df(
        spark,
        [
            ("https://x/archive.tgz", outer, None, None),
            ("https://x/plain.html", b"<html><body>hi</body></html>", "hi", "en"),
        ],
    )
    all_pages, edges = expand_archives(pages)
    urls = {r.url for r in all_pages.select("url").collect()}
    assert "https://x/archive.tgz!/a.txt" in urls
    assert "https://x/archive.tgz!/nested.zip" in urls
    # second round expands the nested zip (recursive queue)
    assert "https://x/archive.tgz!/nested.zip!/deep.txt" in urls
    e = {(r.subj, r.pred, r.obj) for r in edges.collect()}
    assert ("https://x/archive.tgz", "Contains", "https://x/archive.tgz!/a.txt") in e
    assert (
        "https://x/archive.tgz!/nested.zip",
        "Contains",
        "https://x/archive.tgz!/nested.zip!/deep.txt",
    ) in e
    # member content round-trips
    deep = all_pages.where(
        F.col("url") == "https://x/archive.tgz!/nested.zip!/deep.txt"
    ).collect()[0]
    assert bytes(deep.html) == b"deep content"


def test_filter_pages_pushdown_predicates(spark):
    from surfactant_spark.operators.expand import filter_pages

    pages = _pages_df(
        spark,
        [
            ("https://a/x.html", b"x", "x", "en"),
            ("https://a/y.js", b"y", "y", "en"),
            ("https://a/z.html", b"z", "z", "de"),
        ],
    )
    got = {
        r.url
        for r in filter_pages(
            pages, include_suffixes=[".html"], exclude_suffixes=[".js"], langs=["en"]
        ).collect()
    }
    assert got == {"https://a/x.html"}


def test_resolve_field_hints_precedence(spark):
    from surfactant_spark.operators.expand import resolve_field_hints

    hints = spark.createDataFrame(
        [
            ("u1", "name", "low-conf", 10.0),
            ("u1", "name", "high-conf", 80.0),
            ("u1", "vendor", "acme", 50.0),
            ("u1", "vendor", "zeta", 80.0),
        ],
        "url string, field string, value string, conf double",
    )
    got = {(r.url, r.field): r.value for r in resolve_field_hints(hints).collect()}
    assert got[("u1", "name")] == "high-conf"  # max confidence wins
    assert got[("u1", "vendor")] == "acme;zeta"  # vendor accumulates


def test_find_nodes_predicates(spark):
    from surfactant_spark.operators.expand import find_nodes

    nodes = spark.createDataFrame(
        [
            ("c1", "s1", ["libfoo"], ["https://a/1", "https://b/1"], 2),
            ("c2", "s2", ["other"], ["https://c/2"], 1),
        ],
        "canon_uuid string, sha256 string, names array<string>, "
        "aliases array<string>, n_sources long",
    )
    assert find_nodes(nodes, sha256="s1").count() == 1
    assert find_nodes(nodes, name_contains="foo").count() == 1
    assert find_nodes(nodes, alias_prefix="https://c/").count() == 1
    assert find_nodes(nodes, min_sources=2).count() == 1
    assert find_nodes(nodes, sha256="s1", name_contains="other").count() == 0


def test_resolve_redirects_chain_and_loop(spark):
    from surfactant_spark.operators.expand import resolve_redirects

    pages = _pages_df(
        spark, [(u, b"x", None, None) for u in ("a", "b", "c", "d", "loop1", "loop2")]
    )
    redirects = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("loop1", "loop2"), ("loop2", "loop1")],
        "src_url string, dst_url string",
    )
    got = {r.url: r.final_url for r in resolve_redirects(pages, redirects).collect()}
    assert got["a"] == "c" and got["b"] == "c" and got["c"] == "c" and got["d"] == "d"
    # loops terminate (either endpoint acceptable, must not hang)
    assert got["loop1"] in ("loop1", "loop2")


def test_builtin_header_extract_hooks(spark):
    """E6-E8: uImage / Mach-O / OLE header decoders flow through the
    multicast extract dispatch as typed metadata."""
    import json
    import struct

    from surfactant_spark.plugin import default_registry
    from tests.test_magic import _cfb

    uimg = struct.pack(
        ">IIIIIIIBBBB", 0x27051956, 1, 2, 4096, 0x8000, 0x8040, 3, 5, 2, 2, 1
    ) + b"krn".ljust(32, b"\x00") + b"\x00" * 64
    macho = struct.pack("<IiiII", 0xFEEDFACF, 0x01000007, 3, 6, 14) + b"\x00" * 16
    msi = _cfb("000c1084-0000-0000-c000-000000000046")
    pages = _pages_df(
        spark, [("img", uimg, None, None), ("dyl", macho, None, None), ("msi", msi, None, None)]
    )
    reg = default_registry()
    ext = {r.url: json.loads(r.metadata_json) for r in reg.run_extract(pages).collect()}
    assert ext["img"]["uimage"]["name"] == "krn" and ext["img"]["uimage"]["data_size"] == 4096
    assert ext["img"]["uimage"]["os"] == "LINUX"  # enum names, not ids
    # macho hook now carries the full fat-aware decode (E6 walk)
    mach = ext["dyl"]["macho"]
    assert mach["OS"] == "MacOS" and mach["numBinaries"] == 1
    hdr = mach["binaries"][0]["header"]
    assert hdr["cputype"] == "x86_64" and hdr["filetype"] == "dylib"
    assert mach["binaries"][0]["dependencies"] == []
    assert ext["msi"]["ole"]["clsid_type"] == "MSI"


def test_hook_registry_classify_extract_link(spark):
    from surfactant_spark.plugin import default_registry

    reg = default_registry()
    # classify: firstresult order with tryfirst magic classifier
    assert reg.classify_value(b"\x7fELF") == "elf"
    assert reg.classify_value(b"plain words") == "text"

    pages = _pages_df(
        spark,
        [
            ("u1", b"<html><title>lib-a</title><a href='lib://dep-b'>d</a></html>", None, "en"),
            ("u2", b"\x7fELF\x02\x01", None, None),
        ],
    )
    cls = {r.url: r.doctype for r in reg.run_classify(pages).collect()}
    assert cls == {"u1": "html", "u2": "elf"}

    ext = {r.url: r for r in reg.run_extract(pages).collect()}
    import json

    md = json.loads(ext["u1"].metadata_json)
    assert md["title"] == "lib-a"
    assert md["mentions"][0][:2] == ["Uses", "dep-b"]
    assert json.loads(ext["u2"].metadata_json) == {}

    # link: the four reference families through one dispatch
    nodes = spark.createDataFrame(
        [
            ("s", ["s"], ["s"], '{"javaClasses": {"c": {"javaExports": ["f()"], "javaImports": []}}}'),
            ("c", ["c"], ["c"], '{"javaClasses": {"c": {"javaExports": [], "javaImports": ["f()"]}}}'),
        ],
        "uuid string, fileName array<string>, installPath array<string>, metadata_json string",
    )
    got = {(r.subj, r.pred, r.obj) for r in reg.run_link(nodes).collect()}
    assert got == {("c", "Uses", "s")}

    # custom hook extension (the plugin seam)
    @reg.linker("self-test")
    def fake_linker(nodes_df):
        return nodes_df.limit(1).select(
            F.lit("x").alias("subj"), F.lit("TestRel").alias("pred"), F.lit("y").alias("obj")
        )

    got2 = {(r.subj, r.pred, r.obj) for r in reg.run_link(nodes).collect()}
    assert ("x", "TestRel", "y") in got2 and ("c", "Uses", "s") in got2


def test_cli_add_operations(spark):
    """`cli add` analogues (`/root/reference/surfactant/cmd/cli.py:164-215`,
    contract `tests/cmd/test_cli.py:126-184`)."""
    from surfactant_spark.operators.expand import (
        add_entry,
        add_installpath,
        add_relationship,
    )

    edges = spark.createDataFrame(
        [("a", "Uses", "b")], "subj_uuid string, pred string, obj_uuid string"
    )
    e2 = add_relationship(edges, "x", "Contains", "y")
    assert e2.count() == 2
    # set semantics: re-adding an existing edge is a no-op
    assert add_relationship(e2, "a", "Uses", "b").count() == 2

    nodes = spark.createDataFrame(
        [("u1", ["f1"], ["/i/f1"], ["u1/c/f1", "other/x"])],
        "uuid string, fileName array<string>, installPath array<string>, "
        "containerPath array<string>",
    )
    n2 = add_entry(nodes, {"uuid": "u2", "fileName": ["f2"]})
    assert {r.uuid for r in n2.collect()} == {"u1", "u2"}

    n3 = add_installpath(nodes, "u1/c", "/opt/app")
    row = n3.collect()[0]
    assert row.installPath == ["/i/f1", "/opt/app/f1"]
