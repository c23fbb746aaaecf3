"""Full-breadth magic classification: pure twin vs expected labels,
JVM chain vs pure twin identity (fixtures + fuzz), zlib across
levels/window sizes (reference `tests/file_types/test_file_magic.py`
intent), hex sampler semantics, machine-type decodes."""

import random
import sys
import zlib

import pytest

from surfactant_spark.fixtures import synth_magic_pages
from surfactant_spark.functions.magic import (
    aout_machine_type,
    classify,
    classify_hex,
    coff_machine_type,
    uimage_header,
)

PAGES = synth_magic_pages()


@pytest.mark.parametrize("url,data,expected", PAGES, ids=[p[0] for p in PAGES])
def test_pure_classifier_matches_expected(url, data, expected):
    assert classify(url, data) == expected


def test_zlib_all_levels_and_windows(tmp_path):
    for level in range(10):
        assert classify("x.zlib", zlib.compress(b"hello", level=level)) == "ZLIB"
    if sys.version_info >= (3, 11):
        for level in range(10):
            for wbits in range(9, 16):
                data = zlib.compress(b"hello", level=level, wbits=wbits)
                assert classify("x.zlib", data) == "ZLIB"


def test_hex_sampler_semantics():
    # majority vote over first 100 lines; extension-gated
    intel = b":1000\n:00FF\nS113AB\n"
    assert classify_hex("fw.hex", intel) == "INTEL_HEX"
    moto = b"S113AB\ns00f\n:1000\n"
    assert classify_hex("fw.srec", moto) == "MOTOROLA_SREC"
    assert classify_hex("fw.txt", intel) is None  # not a hex extension
    assert classify_hex("fw.hex", b"S1\n:0\n") is None  # tie
    # whitespace is stripped per line; inner whitespace disqualifies
    assert classify_hex("fw.hex", b"  :AB12  \n") == "INTEL_HEX"
    assert classify_hex("fw.hex", b":AB 12\n") is None


def _cfb(clsid_hex: str) -> bytes:
    """Minimal compound-file bytes: 512-byte header + one directory
    sector whose first entry is a root storage with the given CLSID."""
    hdr = bytearray(512)
    hdr[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    hdr[26:28] = (3).to_bytes(2, "little")    # major version
    hdr[28:30] = b"\xfe\xff"                   # little-endian marker
    hdr[30:32] = (9).to_bytes(2, "little")    # 512-byte sectors
    hdr[48:52] = (0).to_bytes(4, "little")    # first directory sector
    entry = bytearray(128)
    entry[0:22] = "Root Entry".encode("utf-16-le")
    entry[64:66] = (22).to_bytes(2, "little")
    entry[66] = 5                              # root storage object
    # store the GUID in its on-disk layout (fields 1-3 little-endian)
    d1, d2, d3, rest = clsid_hex.split("-", 3)
    tail = rest.replace("-", "")
    entry[80:84] = int(d1, 16).to_bytes(4, "little")
    entry[84:86] = int(d2, 16).to_bytes(2, "little")
    entry[86:88] = int(d3, 16).to_bytes(2, "little")
    entry[88:96] = bytes.fromhex(tail)
    sector = bytes(entry) + b"\x00" * (512 - 128)
    return bytes(hdr) + sector


def test_ole_header_decode():
    from surfactant_spark.functions.magic import ole_header

    msi = _cfb("000c1084-0000-0000-c000-000000000046")
    info = ole_header(msi)
    assert info["clsid"] == "000c1084-0000-0000-c000-000000000046"
    assert info["clsid_type"] == "MSI"
    assert info["sector_size"] == 512 and info["major_version"] == 3
    msp = _cfb("000c1086-0000-0000-c000-000000000046")
    assert ole_header(msp)["clsid_type"] == "MSP"
    other = _cfb("12345678-0000-0000-c000-000000000046")
    assert "clsid_type" not in ole_header(other)
    assert ole_header(b"\x00" * 600) is None
    # the classifier agrees these are OLE
    assert classify("x.msi", msi) == "OLE"


def test_extension_shebang_semantics():
    from surfactant_spark.functions.magic import classify_extension

    # DOCTYPE beats everything; shebang beats suffix; suffix is fallback
    assert classify_extension("x.py", b"<!DOCTYPE html>...") == "HTML"
    assert classify_extension("x.py", b"#!/bin/sh\n...") == "SHELL"
    # 'sh' substring quirk (`id_extension.py:32-40` re.search order)
    assert classify_extension("x", b"#!/bin/bash\n") == "SHELL"
    assert classify_extension("x", b"#!/usr/bin/env python\n") == "PYTHON"
    assert classify_extension("x", b"#!/weird\n") == "SHEBANG"
    # shebang without a newline in the head is NOT sniffed
    assert classify_extension("x.py", b"#!no newline") == "PYTHON"
    assert classify_extension("a.unknown", b"data") is None


def test_macho_header_decode():
    import struct

    from surfactant_spark.functions.magic import macho_header

    # 64-bit little-endian x86_64 dylib
    hdr = struct.pack("<IiiII", 0xFEEDFACF, 0x01000007, 3, 6, 14)
    info = macho_header(hdr + b"\x00" * 16)
    assert info == {
        "is64": True, "endianness": "little", "cputype": "x86_64",
        "filetype": "dylib", "ncmds": 14,
    }
    # 32-bit big-endian arm executable
    hdr = struct.pack(">IiiII", 0xFEEDFACE, 12, 9, 2, 20)
    info = macho_header(hdr + b"\x00" * 16)
    assert info["is64"] is False and info["cputype"] == "arm"
    assert info["filetype"] == "execute" and info["endianness"] == "big"
    assert macho_header(b"\x7fELF") is None


def test_machine_type_decodes():
    assert aout_machine_type("A.OUT big", b"\x00\x02\x01\x07") == "M68020"
    assert aout_machine_type("A.OUT little", b"\x0b\x01\x64\x00") == "386"
    assert aout_machine_type("ELF", b"\x00\x02\x01\x07") is None
    assert coff_machine_type(b"\x4c\x01") == "Intel 80386"
    assert coff_machine_type(b"\x64\x86") == "Intel amd64"
    hdr = next(d for (u, d, e) in PAGES if e == "UIMAGE")
    info = uimage_header(hdr)
    assert info["name"] == "test-kernel"
    assert info["data_size"] == 4096 and info["os"] == 5 and info["arch"] == 2
    assert uimage_header(b"\x00" * 64) is None


def _fuzz_rows(n=120):
    rng = random.Random(42)
    rows = []
    for i in range(n):
        size = rng.choice([0, 1, 2, 3, 4, 8, 64, 300])
        rows.append((f"fuzz/{i}.bin", bytes(rng.randrange(256) for _ in range(size))))
        rows.append((f"fuzz/{i}.hex", bytes(rng.randrange(256) for _ in range(size))))
    return rows


def test_jvm_chain_identical_to_pure(spark):
    from pyspark.sql import functions as F

    from surfactant_spark.operators.extract import classify_magic_col

    rows = [(u, d) for (u, d, _e) in PAGES] + _fuzz_rows()
    # drop rows whose bytes aren't valid utf-8 under a hex extension:
    # the pure twin refuses to decode (None) while cast-to-string
    # replaces — a documented divergence that regular corpora never hit
    keep = []
    for u, d in rows:
        if u.endswith(".hex") or u.endswith(".s19"):
            try:
                d.decode("utf-8")
            except UnicodeDecodeError:
                continue
        keep.append((u, bytearray(d)))
    df = spark.createDataFrame(keep, "url string, html binary")
    got = {
        r.url: r.filetype
        for r in df.select(
            "url", classify_magic_col(F.col("url"), F.col("html")).alias("filetype")
        ).collect()
    }
    for u, d in keep:
        assert got[u] == classify(u, bytes(d)), u
