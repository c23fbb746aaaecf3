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
    # enum NAMES + descriptions, the reference's output shape
    # (`uimage_file.py:204-218`), not raw ids
    assert info["data_size"] == 4096
    assert info["os"] == "LINUX" and info["os_description"] == "Linux"
    assert info["arch"] == "ARM" and info["arch_description"] == "ARM"
    assert info["image_type"] == "KERNEL"
    assert info["compression_type"] in ("None", "gzip", "bzip2", "lzma", "lzo", "lz4", "zstd")
    assert info["load_addr"].startswith("0x")
    # unknown ids fall back to the stringified id
    import struct

    weird = struct.pack(">IIIIIIIBBBB", 0x27051956, 0, 0, 1, 0, 0, 0, 200, 201, 202, 203)
    weird += b"x" * 32
    w = uimage_header(weird)
    assert w["os"] == "200" and w["os_description"] == "Unknown OS"
    assert w["compression_type"] == "203"
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


def _macho64(cmds: list) -> bytes:
    """Synthetic little-endian 64-bit Mach-O: header + given commands."""
    import struct

    body = b"".join(cmds)
    return struct.pack(
        "<IIIIIIII", 0xFEEDFACF, 0x01000007, 3, 6, len(cmds), len(body), 0, 0
    ) + body


def _dylib_cmd(cmd_id, name, cur=(1, 2, 3), compat=(1, 0, 0)):
    import struct

    nb = name.encode() + b"\x00"
    pad = (-(24 + len(nb))) % 8
    return struct.pack(
        "<IIIIII", cmd_id, 24 + len(nb) + pad, 24, 0,
        (cur[0] << 16) | (cur[1] << 8) | cur[2],
        (compat[0] << 16) | (compat[1] << 8) | compat[2],
    ) + nb + b"\x00" * pad


def _str_cmd(cmd_id, s):
    import struct

    nb = s.encode() + b"\x00"
    pad = (-(12 + len(nb))) % 8
    return struct.pack("<III", cmd_id, 12 + len(nb) + pad, 12) + nb + b"\x00" * pad


def test_macho_load_command_walk():
    """E6 completion: LC_LOAD_DYLIB/LC_RPATH/LC_LOAD_DYLINKER/
    LC_BUILD_VERSION decoded from the raw bytes, the fields the
    reference reads off lief (`mach_o_file.py:74-172`)."""
    import struct

    from surfactant_spark.functions.magic import macho_info, macho_load_commands

    build = struct.pack(
        "<IIIIII", 0x32, 32, 1, (12 << 16) | (4 << 8), (13 << 16), 1
    ) + struct.pack("<II", 3, (900 << 16) | (5 << 8))
    blob = _macho64([
        _dylib_cmd(0xC, "/usr/lib/libSystem.B.dylib", cur=(1319, 0, 0)),
        _dylib_cmd(0x8000001F, "@rpath/libshared.dylib"),
        _dylib_cmd(0xD, "@rpath/libself.dylib"),
        _str_cmd(0x8000001C, "@loader_path/../lib"),
        _str_cmd(0xE, "/usr/lib/dyld"),
        build,
    ])
    info = macho_load_commands(blob)
    assert [d["name"] for d in info["dependencies"]] == [
        "/usr/lib/libSystem.B.dylib", "@rpath/libshared.dylib"
    ]
    assert info["dependencies"][0]["currentVersion"] == "1319.0.0"
    assert info["dependencies"][1]["compatibilityVersion"] == "1.0.0"
    assert info["id_dylib"]["name"] == "@rpath/libself.dylib"
    assert info["rpaths"] == ["@loader_path/../lib"]
    assert info["dyld"]["linker"] == "/usr/lib/dyld"
    assert info["build"]["platform"] == "MACOS"
    assert info["build"]["minOSVersion"] == "12.4.0"
    assert info["build"]["sdkVersion"] == "13.0.0"
    assert info["build"]["tools"] == [{"tool": "LD", "version": "900.5.0"}]

    full = macho_info(blob)
    assert full["OS"] == "MacOS" and full["numBinaries"] == 1
    assert full["binaries"][0]["header"]["cputype"] == "x86_64"

    # truncated/hostile input never walks out of bounds
    assert macho_load_commands(blob[:40])["dependencies"] == []
    assert macho_info(b"\x00" * 64) is None


def test_macho_fat_binary_and_javaclass_guard():
    import struct

    from surfactant_spark.functions.magic import macho_fat_slices, macho_info

    s1 = _macho64([_dylib_cmd(0xC, "/usr/lib/libc.dylib")])
    s2 = _macho64([_str_cmd(0x8000001C, "@rpath")])
    off1, off2 = 8 + 2 * 20, 8 + 2 * 20 + len(s1)
    fat = struct.pack(">II", 0xCAFEBABE, 2)
    fat += struct.pack(">IIIII", 0x01000007, 3, off1, len(s1), 12)
    fat += struct.pack(">IIIII", 12, 9, off2, len(s2), 12)
    fat += s1 + s2
    assert len(macho_fat_slices(fat)) == 2
    info = macho_info(fat)
    assert info["numBinaries"] == 2
    assert info["binaries"][0]["dependencies"][0]["name"] == "/usr/lib/libc.dylib"
    assert info["binaries"][1]["rpaths"] == ["@rpath"]

    # Java class file: same magic, class-format version where nfat sits
    javacls = struct.pack(">II", 0xCAFEBABE, 52) + b"\x00" * 64
    assert macho_fat_slices(javacls) is None
    assert macho_info(javacls) is None


def _oleps_summary(props):
    """Minimal MS-OLEPS SummaryInformation property set with VT_LPSTR
    values; props = {pid: str}."""
    import struct

    head = struct.pack("<HHI", 0xFFFE, 0, 0x00020005) + b"\x00" * 16 + struct.pack("<I", 1)
    fmtid = bytes.fromhex("e0859ff2f94f1068ab9108002b27b3d9")
    sec_off = len(head) + 20  # fmtid(16) + offset(4)
    entries, values, voff = [], [], 8 + 8 * len(props)
    for pid, s in props.items():
        entries.append(struct.pack("<II", pid, voff))
        sb = s.encode() + b"\x00"
        values.append(struct.pack("<II", 30, len(sb)) + sb + b"\x00" * ((-len(sb)) % 4))
        voff += 8 + len(sb) + ((-len(sb)) % 4)
    body = b"".join(entries) + b"".join(values)
    section = struct.pack("<II", 8 + len(body), len(props)) + body
    return head + fmtid + struct.pack("<I", sec_off) + section


def _cfb_dir_entry(name, etype, start, size, clsid=b"\x00" * 16):
    nm = name.encode("utf-16-le")
    e = bytearray(128)
    e[: len(nm)] = nm
    e[64:66] = (len(nm) + 2).to_bytes(2, "little")
    e[66] = etype
    e[67] = 1
    e[80:96] = clsid
    e[116:120] = start.to_bytes(4, "little", signed=False) if start >= 0 else b"\xfe\xff\xff\xff"
    e[120:128] = size.to_bytes(8, "little")
    return bytes(e)


def _cfb_header(n_fat, first_dir, mini_cutoff, first_minifat, n_minifat):
    import struct

    h = bytearray(512)
    h[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    h[24:26] = (0x3E).to_bytes(2, "little")
    h[26:28] = (3).to_bytes(2, "little")
    h[28:30] = b"\xfe\xff"
    h[30:32] = (9).to_bytes(2, "little")
    h[32:34] = (6).to_bytes(2, "little")
    h[44:48] = n_fat.to_bytes(4, "little")
    h[48:52] = first_dir.to_bytes(4, "little")
    h[56:60] = mini_cutoff.to_bytes(4, "little")
    h[60:64] = struct.pack("<I", first_minifat)
    h[64:68] = n_minifat.to_bytes(4, "little")
    h[68:72] = struct.pack("<I", 0xFFFFFFFE)
    for i in range(109):
        h[76 + 4 * i : 80 + 4 * i] = struct.pack("<I", 0xFFFFFFFF)
    h[76:80] = (0).to_bytes(4, "little")  # FAT lives in sector 0
    return h


def _sector(entries):
    import struct

    s = bytearray(b"".join(struct.pack("<I", e) for e in entries))
    s += struct.pack("<I", 0xFFFFFFFF) * ((512 - len(s)) // 4)
    return bytes(s)


_MSI_CLSID = bytes.fromhex("8410 0c00 0000 0000 c000 0000 0000 0046".replace(" ", ""))


def test_ole_summary_info_fat_stream():
    """E7: SummaryInformation decoded from a CFB where the stream lives
    in regular FAT sectors (mini cutoff 0)."""
    from surfactant_spark.functions.magic import ole_field_hints, ole_summary_info

    ps = _oleps_summary({2: "My Title", 4: "ACME Corp", 9: "3.1.4", 3: "Installer X"})
    assert len(ps) <= 512
    header = _cfb_header(n_fat=1, first_dir=1, mini_cutoff=0,
                         first_minifat=0xFFFFFFFE, n_minifat=0)
    fat = _sector([0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE])
    root = _cfb_dir_entry("Root Entry", 5, -1, 0, clsid=_MSI_CLSID)
    summ = _cfb_dir_entry("\x05SummaryInformation", 2, 2, len(ps))
    dirsec = (root + summ).ljust(512, b"\x00")
    blob = bytes(header) + fat + dirsec + ps.ljust(512, b"\x00")

    info = ole_summary_info(blob)
    assert info == {
        "title": "My Title", "author": "ACME Corp",
        "revision_number": "3.1.4", "subject": "Installer X",
    }
    hints = ole_field_hints(info)
    assert ("name", "Installer X", 80) in hints
    assert ("version", "3.1.4", 80) in hints
    assert ("vendor", "ACME Corp", 80) in hints

    # the clsid path still works on the same file
    from surfactant_spark.functions.magic import ole_header

    assert ole_header(blob)["clsid_type"] == "MSI"
    assert ole_summary_info(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 600) is None


def test_ole_summary_info_ministream():
    """E7: the common real-world layout — summary stream under the mini
    cutoff, stored in 64-byte minisectors of the root's ministream."""
    from surfactant_spark.functions.magic import ole_summary_info

    ps = _oleps_summary({4: "MiniVendor", 6: "a comment"})
    n_mini = (len(ps) + 63) // 64
    header = _cfb_header(n_fat=1, first_dir=1, mini_cutoff=4096,
                         first_minifat=3, n_minifat=1)
    fat = _sector([0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE, 0xFFFFFFFE])
    root = _cfb_dir_entry("Root Entry", 5, 2, n_mini * 64)
    summ = _cfb_dir_entry("\x05SummaryInformation", 2, 0, len(ps))
    dirsec = (root + summ).ljust(512, b"\x00")
    minifat = _sector(list(range(1, n_mini)) + [0xFFFFFFFE])
    blob = bytes(header) + fat + dirsec + ps.ljust(512, b"\x00") + minifat

    info = ole_summary_info(blob)
    assert info == {"author": "MiniVendor", "comments": "a comment"}
