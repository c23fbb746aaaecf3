"""Full-breadth magic-byte classification + firmware header decode.

Pure twin of the engine's JVM classifier chain
(operators/extract.classify_magic_col); semantics re-expressed from the
reference's ordered, firstresult magic dispatch
(`surfactant/filetypeid/id_magic.py:51-214`), its Intel-HEX/SREC line
sampler (`filetypeid/id_hex.py:12-96`), and the a.out/COFF/uImage
machine decoders (`infoextractors/a_out_file.py:24-96`,
`coff_file.py:20-45`, `uimage_file.py:168-220`).

Deliberate divergences from the reference, all documented:

- DOCKER_GZIP/DOCKER_TAR are not distinguished (the docker check lists
  tar members and the E9 docker extractor shells out — declared
  permanently out of scope in COVERAGE.md); those classify as
  GZIP/TAR.
- The reference's EFI-fat magic literal (`id_magic.py:146`) contains a
  typo'd escape (5 bytes vs a 4-byte compare — dead code); ours uses
  the intended 4-byte 0x0EF1FAB9.
- The reference's XCOFF/ECOFF checks compare bytes against *str*
  literals (`id_magic.py:178-188`) so they can never match; ours uses
  the same byte patterns as actual bytes, so they are live.
"""

from __future__ import annotations

import string
from typing import Optional

HEX_FILE_EXTENSIONS = frozenset(
    [
        ".hex", ".mcs", ".h86", ".hxl", ".hxh", ".obl", ".obh", ".ihex",
        ".ihe", ".ihx", ".a43", ".a90", ".s-record", ".srecord", ".s-rec",
        ".srec", ".s19", ".s28", ".s37", ".s", ".s1", ".s2", ".s3", ".sx",
        ".exo", ".mot", ".mxt",
    ]
)

_ZIP_SUFFIX_TYPE = {
    ".zip": "ZIP", ".zipx": "ZIP", ".jar": "JAR", ".war": "WAR",
    ".ear": "EAR", ".apk": "APK", ".ipa": "IPA", ".msix": "MSIX",
}

A_OUT_MAGIC = frozenset([0x111, 0x108, 0x107, 0x0CC, 0x10B])

COFF_MACHINE = {
    0x014C: "Intel 80386",
    0x0500: "Hitachi SH big-endian",
    0x0550: "Hitachi SH little-endian",
    0x0200: "Intel ia64",
    0x8664: "Intel amd64",
    0xAA64: "Aarch64",
    0x01C0: "ARM",
    0xA641: "ARM64EC",
    0x01C2: "ARM Thumb",
    0x01C4: "ARMv7 Thumb",
}

A_OUT_MACHINE = {
    0x00: "Unknown", 0x01: "M68010", 0x02: "M68020", 0x03: "SPARC",
    0x04: "R3000", 0x40: "NS32032", 0x45: "NS32532", 0x64: "386",
    0x65: "AMD 29K", 0x66: "386 DYNIX", 0x67: "ARM",
    0x68: "IBM RT (ROMP AOS)", 0x83: "Sparclet", 0x86: "NetBSD/i386",
    0x87: "NetBSD/m68k", 0x88: "NetBSD/m68k4k", 0x89: "NetBSD/ns32532",
    0x8A: "NetBSD/SPARC", 0x8B: "NetBSD/pmax", 0x8C: "NetBSD/vax 1k",
    0x8D: "NetBSD/alpha", 0x8E: "NetBSD/mips", 0x8F: "NetBSD/arm32",
    0x91: "SH3", 0x94: "PowerPC 64", 0x95: "NetBSD/powerpc",
    0x96: "NetBSD/vax 4k", 0x97: "MIPS R2000/R3000",
    0x98: "MIPS R4000/R6000", 0x99: "OpenBSD/m88k", 0x9A: "OpenBSD/HPPA",
    0x9B: "SuperH 64-bit", 0x9C: "NetBSD/sparc64", 0x9D: "NetBSD/amd64",
    0x9E: "SuperH 32-bit", 0x9F: "Itanium", 0xB7: "ARM AARCH64",
    0xB8: "OpenRISC 1000", 0xB9: "RISC-V", 0xFF: "Axis ETRAX CRIS",
}


def _suffix(name: str) -> str:
    base = name.rsplit("/", 1)[-1]
    i = base.rfind(".")
    return base[i:].lower() if i > 0 else ""


def classify_magic(name: str, data: bytes) -> Optional[str]:
    """Ordered magic classification (`id_magic.py:56-214` semantics).

    ``name`` contributes only the suffix (ZIP-family disambiguation);
    ``data`` is the file/page bytes (only a prefix is inspected; PE
    indirection may look deeper, which the caller's bytes cover).
    """
    # pylint-style many-returns is inherent to a firstresult chain
    if data is None:
        return None
    p = data[:265]
    if p[:4] == b"\x7fELF":
        return "ELF"
    if p[:2] == b"MZ":
        coff_addr = int.from_bytes(data[0x3C:0x40], "little") & 0xFFFF
        if coff_addr + 4 > len(data):
            return "Malformed PE"
        if data[coff_addr : coff_addr + 4] != b"PE\x00\x00":
            return "DOS"
        if data[0x202:0x206] == b"HdrS":
            return "Linux Kernel Image"
        return "PE"
    if p[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        return "OLE"
    if p[:4] == b"MSCF":
        return "MSCAB"
    if p[:4] == b"ISc(":
        return "ISCAB"
    if p[:2] == b"\x1f\x8b":
        return "GZIP"  # docker-archive sniff out of scope (E9)
    if p[:3] == b"BZh":
        return "BZIP2"
    if p[:6] == b"\xfd\x37\x7a\x58\x5a\x00":
        return "XZ"
    if data[257:265] in (b"ustar\x0000", b"ustar  \x00"):
        return "TAR"
    if p[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        t = _ZIP_SUFFIX_TYPE.get(_suffix(name))
        if t:
            return t
        # fall through like the reference (unrecognized PK suffix)
    if p[:4] == b"\xca\xfe\xba\xbe":
        if int.from_bytes(p[4:8], "big") <= 30:
            return "MACHOFAT"
        return "JAVACLASS"
    if p[:4] == b"\xbe\xba\xfe\xca":
        return "MACHOFAT"
    if p[:4] in (b"\xca\xfe\xba\xbf", b"\xbf\xba\xfe\xca"):
        return "MACHOFAT64"
    if p[:4] == b"\x0e\xf1\xfa\xb9":
        return "EFIFAT"
    if p[:4] in (b"\xfe\xed\xfa\xce", b"\xce\xfa\xed\xfe"):
        return "MACHO32"
    if p[:4] in (b"\xfe\xed\xfa\xcf", b"\xcf\xfa\xed\xfe"):
        return "MACHO64"
    if p[:4] == b"\xde\xc0\x17\x0b":
        return "LLVM_BITCODE"
    if p[:4] == b"BC\xc0\xde":
        return "LLVM_IR"
    if len(p) >= 4 and (int.from_bytes(p[:4], "big") & 0xFFFF) in A_OUT_MAGIC:
        return "A.OUT big"
    if len(p) >= 4 and (int.from_bytes(p[:4], "little") & 0xFFFF) in A_OUT_MAGIC:
        return "A.OUT little"
    if len(p) >= 2 and int.from_bytes(p[:2], "little") in COFF_MACHINE:
        return "COFF"
    if p[:2] == b"\x1d\x00":
        return "XCOFF32"
    if p[:2] == b"\xf7\x01":
        return "XCOFF64"
    if p[:2] in (b"\x83\x01", b"\x88\x01", b"\x8f\x01"):
        return "ECOFF"
    if p[:8] == b"!<arch>\n":
        return "AR_LIB"
    if len(p) >= 4 and (int.from_bytes(p[:4], "big") & 0xFF0F80FF) == 0xF00D0000:
        return "OMF_LIB"
    if p[:4] == b"\x27\x05\x19\x56":
        return "UIMAGE"
    if len(p) >= 2:
        cmf, flg = p[0], p[1]
        if (cmf & 0x0F) == 8 and (cmf * 256 + flg) % 31 == 0:
            return "ZLIB"
    return None


def _check_motorola(line: str) -> bool:
    line = line.strip()
    if len(line) < 1 or line[0] not in ("S", "s"):
        return False
    return all(c in string.hexdigits for c in line[1:])


def _check_intel(line: str) -> bool:
    line = line.strip()
    if len(line) < 1 or line[0] != ":":
        return False
    return all(c in string.hexdigits for c in line[1:])


def classify_hex(name: str, data: bytes) -> Optional[str]:
    """Intel-HEX vs Motorola-SREC by sampling the first 100 lines,
    gated on the extension (`id_hex.py:71-96`)."""
    if _suffix(name) not in HEX_FILE_EXTENSIONS:
        return None
    try:
        text = (data or b"").decode("utf-8")
    except UnicodeDecodeError:
        return None
    n_intel = n_moto = 0
    for line in text.split("\n")[:100]:
        if _check_motorola(line):
            n_moto += 1
        elif _check_intel(line):
            n_intel += 1
    if n_intel > n_moto:
        return "INTEL_HEX"
    if n_moto > n_intel:
        return "MOTOROLA_SREC"
    return None


EXTENSION_TYPES = {
    ".sh": "SHELL", ".bash": "BASH", ".zsh": "ZSH", ".py": "PYTHON",
    ".pyc": "PYTHON_COMPILED", ".js": "JAVASCRIPT", ".css": "CSS",
    ".html": "HTML", ".htm": "HTML", ".php": "PHP", ".bat": "BATCH",
    ".pl": "PERL_OR_PROLOG", ".pm": "PERL_MODULE",
}

# ordered: re.search order of `id_extension.py:32-40` — 'sh' is tried
# first and matches any interpreter containing it (zsh/bash shebangs
# classify as SHELL via the substring; a reference quirk preserved)
INTERPRETER_TYPES = [
    (b"sh", "SHELL"), (b"bash", "BASH"), (b"zsh", "ZSH"), (b"php", "PHP"),
    (b"python", "PYTHON"), (b"python3", "PYTHON"), (b"perl", "PERL"),
]


def classify_extension(name: str, data: bytes) -> Optional[str]:
    """Extension map + shebang interpreter sniff (`id_extension.py:14-59`)."""
    head = (data or b"")[:256]
    if head.startswith(b"<!DOCTYPE html>"):
        return "HTML"
    if head.startswith(b"#!") and b"\n" in head:
        line = head[: head.index(b"\n")]
        for pattern, filetype in INTERPRETER_TYPES:
            if pattern in line:  # re.search of a literal == substring
                return filetype
        return "SHEBANG"
    return EXTENSION_TYPES.get(_suffix(name))


def classify(name: str, data: bytes) -> Optional[str]:
    """Full dispatch: magic chain first (tryfirst ordering,
    `id_magic.py:51`), then the hex sampler, then extension/shebang."""
    t = classify_magic(name, data)
    if t is not None:
        return t
    t = classify_hex(name, data)
    if t is not None:
        return t
    return classify_extension(name, data)


# ---------------------------------------------------------------------------
# E8 — machine-type / firmware-header decode
# ---------------------------------------------------------------------------
def aout_machine_type(filetype: str, data: bytes) -> Optional[str]:
    """`a_out_file.py:72-96`: machine id is byte 2 of the magic word."""
    if len(data or b"") < 4:
        return None
    if filetype == "A.OUT big":
        mid = (int.from_bytes(data[:4], "big") >> 16) & 0xFF
    elif filetype == "A.OUT little":
        mid = (int.from_bytes(data[:4], "little") >> 16) & 0xFF
    else:
        return None
    return A_OUT_MACHINE.get(mid)


def coff_machine_type(data: bytes) -> Optional[str]:
    """`coff_file.py:37-45`: little-endian magic word -> target name."""
    if len(data or b"") < 2:
        return None
    return COFF_MACHINE.get(int.from_bytes(data[:4][:2], "little"))


_OLE_CLSID_TYPE = {
    "000c1082-0000-0000-c000-000000000046": "MST",
    "000c1084-0000-0000-c000-000000000046": "MSI",
    "000c1086-0000-0000-c000-000000000046": "MSP",
}


def _guid_str(b: bytes) -> str:
    """CLSID bytes -> canonical GUID string (fields 1-3 little-endian)."""
    d1 = int.from_bytes(b[0:4], "little")
    d2 = int.from_bytes(b[4:6], "little")
    d3 = int.from_bytes(b[6:8], "little")
    return (
        f"{d1:08x}-{d2:04x}-{d3:04x}-" + b[8:10].hex() + "-" + b[10:16].hex()
    )


def ole_header(data: bytes) -> Optional[dict]:
    """Minimal OLE/CFB decode (E7 analogue of
    `infoextractors/ole_file.py:40-61`): header fields plus the root
    storage entry's CLSID, which identifies MSI/MSP/MST installers
    (`ole_file.py:48-61`). The root entry is the first 128-byte record
    of the first directory sector — reachable without walking the FAT,
    so the decode is bounded. Summary-info properties (the reference's
    olefile metadata pass, `ole_file.py:63-69`) are decoded by
    :func:`ole_summary_info` via the bounded CFB walk below."""
    if len(data or b"") < 128 or data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        return None
    sector_shift = int.from_bytes(data[30:32], "little")
    sector_size = 1 << sector_shift
    first_dir_sect = int.from_bytes(data[48:52], "little")
    out = {
        "major_version": int.from_bytes(data[26:28], "little"),
        "sector_size": sector_size,
    }
    dir_off = (first_dir_sect + 1) * sector_size
    if 0 < dir_off and dir_off + 128 <= len(data):
        entry = data[dir_off : dir_off + 128]
        if entry[66:67] == b"\x05":  # root storage object
            clsid = _guid_str(entry[80:96])
            out["clsid"] = clsid
            if clsid in _OLE_CLSID_TYPE:
                out["clsid_type"] = _OLE_CLSID_TYPE[clsid]
    return out


# ---------------------------------------------------------------------------
# E7 — CFB stream walk + SummaryInformation property set
# ---------------------------------------------------------------------------
_CFB_FREE = 0xFFFFFFFF
_CFB_END = 0xFFFFFFFE
_CFB_FATSECT = 0xFFFFFFFD

# MS-OLEPS SummaryInformation property ids -> olefile's SUMMARY_ATTRIBS
# names (the keys the reference copies into file_details["ole"],
# `ole_file.py:63-69`)
_OLE_SUMMARY_PROPS = {
    2: "title", 3: "subject", 4: "author", 5: "keywords", 6: "comments",
    7: "template", 8: "last_saved_by", 9: "revision_number",
    10: "total_edit_time", 11: "last_printed", 12: "create_time",
    13: "last_saved_time", 14: "num_pages", 15: "num_words",
    16: "num_chars", 18: "creating_application", 19: "security",
}


def _cfb_u32(data: bytes, pos: int) -> int:
    return int.from_bytes(data[pos : pos + 4], "little")


def _cfb_chain(data: bytes, fat: list, start: int, sector_size: int,
               base: int = 1, max_sectors: int = 4096) -> bytes:
    """Concatenate a FAT (or miniFAT-over-ministream) sector chain,
    bounded by ``max_sectors`` (cycle/hostile-input guard)."""
    out, sect, seen = [], start, 0
    while sect not in (_CFB_END, _CFB_FREE) and seen < max_sectors:
        off = (sect + base) * sector_size
        if off + sector_size > len(data) or sect >= len(fat):
            break
        out.append(data[off : off + sector_size])
        sect = fat[sect]
        seen += 1
    return b"".join(out)


def _cfb_layout(data: bytes):
    """-> (sector_size, fat, dir_stream) or None. The FAT is built from
    the header DIFAT only (109 FAT sectors = ~7 MB of FAT, addressing
    ~900 MB) — installers with DIFAT overflow sectors are out of scope
    for a metadata probe and return partial chains, never garbage."""
    if len(data or b"") < 512 or data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        return None
    sector_size = 1 << int.from_bytes(data[30:32], "little")
    if sector_size not in (512, 4096):
        return None
    fat: list = []
    for i in range(109):
        s = _cfb_u32(data, 76 + 4 * i)
        if s in (_CFB_FREE, _CFB_END):
            continue
        off = (s + 1) * sector_size
        if off + sector_size > len(data):
            break
        fat.extend(
            _cfb_u32(data, off + 4 * j) for j in range(sector_size // 4)
        )
    dir_stream = _cfb_chain(data, fat, _cfb_u32(data, 48), sector_size)
    return sector_size, fat, dir_stream


def cfb_stream(data: bytes, name: str) -> Optional[bytes]:
    """Read a named stream out of a CFB file: directory walk, then the
    FAT chain (big streams) or the miniFAT chain over the root entry's
    ministream (streams under the mini cutoff). Bounded everywhere."""
    layout = _cfb_layout(data)
    if layout is None:
        return None
    sector_size, fat, dir_stream = layout
    mini_cutoff = _cfb_u32(data, 56)
    target = root = None
    for pos in range(0, len(dir_stream) - 127, 128):
        entry = dir_stream[pos : pos + 128]
        etype = entry[66]
        nlen = int.from_bytes(entry[64:66], "little")
        if etype == 0 or nlen < 2 or nlen > 64:
            continue
        ename = entry[: nlen - 2].decode("utf-16-le", errors="replace")
        if etype == 5:
            root = entry
        elif etype == 2 and ename == name:
            target = entry
    if target is None:
        return None
    start = _cfb_u32(target, 116)
    size = int.from_bytes(target[120:128], "little")
    if size > len(data):
        return None
    if size >= mini_cutoff or root is None:
        return _cfb_chain(data, fat, start, sector_size)[:size]
    # ministream path: 64-byte minisectors inside the root entry's chain
    ministream = _cfb_chain(data, fat, _cfb_u32(root, 116), sector_size)
    minifat_bytes = _cfb_chain(data, fat, _cfb_u32(data, 60), sector_size)
    minifat = [
        _cfb_u32(minifat_bytes, 4 * j) for j in range(len(minifat_bytes) // 4)
    ]
    return _cfb_chain(ministream, minifat, start, 64, base=0)[:size]


def _oleps_value(sec: bytes, off: int):
    """Decode one MS-OLEPS typed property value (the VT types summary
    streams actually use)."""
    import struct

    if off + 4 > len(sec):
        return None
    vt = _cfb_u32(sec, off)
    body = off + 4
    if vt in (2, 3, 19, 20):  # VT_I2/VT_I4/VT_UI4 (+pad)
        width = 2 if vt == 2 else 8 if vt == 20 else 4
        if body + width > len(sec):
            return None
        return int.from_bytes(sec[body : body + width], "little", signed=vt in (2, 3))
    if vt == 30:  # VT_LPSTR: cb + codepage string (null-terminated)
        cb = _cfb_u32(sec, body)
        raw = sec[body + 4 : body + 4 + cb]
        return raw.split(b"\x00", 1)[0].decode("latin-1", errors="replace")
    if vt == 31:  # VT_LPWSTR: cch + UTF-16
        cch = _cfb_u32(sec, body)
        raw = sec[body + 4 : body + 4 + 2 * cch]
        return raw.decode("utf-16-le", errors="replace").split("\x00", 1)[0]
    if vt == 64:  # VT_FILETIME -> ISO-8601 (100ns ticks since 1601)
        if body + 8 > len(sec):
            return None
        ticks = struct.unpack("<Q", sec[body : body + 8])[0]
        if ticks == 0:
            return None
        import datetime

        try:
            dt = datetime.datetime(1601, 1, 1) + datetime.timedelta(
                microseconds=ticks // 10
            )
        except OverflowError:
            return None
        return dt.isoformat()
    return None


def ole_summary_info(data: bytes) -> Optional[dict]:
    """E7 completion (`ole_file.py:63-69`): decode the
    \\x05SummaryInformation property-set stream with the same bounded
    CFB walk ole_header uses — title/subject/author/revision/... as
    strings, like the reference's str()-coerced olefile metadata. The
    reference's field-hint mapping (subject->name, revision_number->
    version, author->vendor, comments->comments at confidence 80,
    `ole_file.py:29-36`) is :func:`ole_field_hints`."""
    stream = cfb_stream(data, "\x05SummaryInformation")
    if not stream or len(stream) < 48:
        return None
    if stream[0:2] != b"\xfe\xff":  # wByteOrder stored little-endian
        return None
    n_sections = _cfb_u32(stream, 24)
    if n_sections < 1:
        return None
    sec_off = _cfb_u32(stream, 44)
    if sec_off + 8 > len(stream):
        return None
    sec = stream[sec_off:]
    n_props = _cfb_u32(sec, 4)
    out = {}
    for i in range(min(n_props, 64)):
        pos = 8 + 8 * i
        if pos + 8 > len(sec):
            break
        pid, off = _cfb_u32(sec, pos), _cfb_u32(sec, pos + 4)
        name = _OLE_SUMMARY_PROPS.get(pid)
        if name is None:
            continue
        val = _oleps_value(sec, off)
        if val is not None:
            out[name] = str(val)
    return out or None


def ole_field_hints(summary: Optional[dict]) -> list:
    """(field, value, confidence) hints from summary properties — the
    reference's `extract_file_info` mapping at confidence 80."""
    if not summary:
        return []
    hints = []
    for prop, field in (
        ("subject", "name"),
        ("revision_number", "version"),
        ("author", "vendor"),
        ("comments", "comments"),
    ):
        if prop in summary:
            hints.append((field, summary[prop], 80))
    return hints


_MACHO_CPU = {
    7: "x86", 0x01000007: "x86_64", 12: "arm", 0x0100000C: "arm64",
    18: "ppc", 0x01000012: "ppc64",
}

_MACHO_FILETYPE = {
    1: "object", 2: "execute", 6: "dylib", 8: "bundle", 10: "dsym", 11: "kext",
}


def macho_header(data: bytes) -> Optional[dict]:
    """Mach-O header decode (E6, `infoextractors/mach_o_file.py:44-66`):
    magic -> endianness/width, cputype, filetype, ncmds. The
    load-command walk (dependencies/rpaths/dyld/build/signature — the
    fields the reference gets from lief) is :func:`macho_load_commands`;
    :func:`macho_info` is the full fat-aware extractor analogue."""
    if len(data or b"") < 16:
        return None
    magic = data[:4]
    if magic in (b"\xfe\xed\xfa\xce", b"\xfe\xed\xfa\xcf"):
        order, is64 = "big", magic[3] == 0xCF
    elif magic in (b"\xce\xfa\xed\xfe", b"\xcf\xfa\xed\xfe"):
        order, is64 = "little", magic[0] == 0xCF
    else:
        return None
    cputype = int.from_bytes(data[4:8], order)
    filetype = int.from_bytes(data[12:16], order)
    return {
        "is64": is64,
        "endianness": order,
        "cputype": _MACHO_CPU.get(cputype, cputype),
        "filetype": _MACHO_FILETYPE.get(filetype, filetype),
        "ncmds": int.from_bytes(data[16:20], order) if len(data) >= 20 else None,
    }


# Mach-O load-command ids (public mach-o/loader.h values)
_LC_REQ_DYLD = 0x80000000
_LC_DYLIB_KINDS = {
    0xC: "LC_LOAD_DYLIB",
    0xD: "LC_ID_DYLIB",
    0x18 | _LC_REQ_DYLD: "LC_LOAD_WEAK_DYLIB",
    0x1F | _LC_REQ_DYLD: "LC_REEXPORT_DYLIB",
    0x20: "LC_LAZY_LOAD_DYLIB",
}
_MACHO_PLATFORM = {1: "MACOS", 2: "IOS", 3: "TVOS", 4: "WATCHOS", 5: "BRIDGEOS", 6: "MACCATALYST"}
_MACHO_TOOL = {1: "CLANG", 2: "SWIFT", 3: "LD"}


def _macho_ver(v: int) -> str:
    # packed X.Y.Z (16.8.8 bits) — the reference joins lief's
    # (major, minor, patch) tuple with '.' the same way
    return f"{v >> 16}.{(v >> 8) & 0xFF}.{v & 0xFF}"


def _lc_str(data: bytes, start: int, size: int, off: int) -> Optional[str]:
    """C string at a command-relative lc_str offset, bounded by cmdsize."""
    if off < 8 or off >= size:
        return None
    raw = data[start + off : start + size]
    return raw.split(b"\x00", 1)[0].decode("utf-8", errors="replace")


def macho_load_commands(data: bytes, max_cmds: int = 2048) -> Optional[dict]:
    """E6 load-command walk (`infoextractors/mach_o_file.py:74-172`'s
    lief-derived fields, re-derived as a bounded pure-Python struct walk
    over the public mach-o/loader.h layout): LC_LOAD_DYLIB family ->
    dependencies (name + current/compatibility versions), LC_ID_DYLIB,
    LC_RPATH -> rpaths, LC_LOAD_DYLINKER -> dyld.linker,
    LC_BUILD_VERSION -> build platform/minOS/sdk/tools,
    LC_CODE_SIGNATURE -> signature offset/size, LC_ENCRYPTION_INFO[_64]
    -> encryption. Every offset is validated against cmdsize/len(data);
    the walk is capped at ``max_cmds`` commands."""
    hdr = macho_header(data)
    if hdr is None:
        return None
    order = hdr["endianness"]
    off = 32 if hdr["is64"] else 28
    ncmds = min(int(hdr.get("ncmds") or 0), max_cmds)

    def u32(pos: int) -> int:
        return int.from_bytes(data[pos : pos + 4], order)

    out: dict = {"dependencies": [], "rpaths": [], "dyld": {}, "build": {},
                 "signature": {}, "encryption": {}}
    for _ in range(ncmds):
        if off + 8 > len(data):
            break
        cmd, size = u32(off), u32(off + 4)
        if size < 8 or off + size > len(data):
            break
        if cmd in _LC_DYLIB_KINDS and size >= 24:
            entry = {
                "name": _lc_str(data, off, size, u32(off + 8)),
                "currentVersion": _macho_ver(u32(off + 16)),
                "compatibilityVersion": _macho_ver(u32(off + 20)),
            }
            if cmd == 0xD:
                out["id_dylib"] = entry
            else:
                out["dependencies"].append(entry)
        elif cmd == (0x1C | _LC_REQ_DYLD) and size >= 12:
            p = _lc_str(data, off, size, u32(off + 8))
            if p is not None:
                out["rpaths"].append(p)
        elif cmd == 0xE and size >= 12:
            out["dyld"]["linker"] = _lc_str(data, off, size, u32(off + 8))
        elif cmd == 0x32 and size >= 24:
            plat, ntools = u32(off + 8), u32(off + 20)
            tools = []
            for t in range(min(ntools, 64)):
                tpos = off + 24 + 8 * t
                if tpos + 8 > off + size:
                    break
                tools.append(
                    {"tool": _MACHO_TOOL.get(u32(tpos), u32(tpos)),
                     "version": _macho_ver(u32(tpos + 4))}
                )
            out["build"] = {
                "platform": _MACHO_PLATFORM.get(plat, plat),
                "platformValue": plat,
                "minOSVersion": _macho_ver(u32(off + 12)),
                "sdkVersion": _macho_ver(u32(off + 16)),
                "tools": tools,
            }
        elif cmd == 0x1D and size >= 16:
            out["signature"] = {"offset": u32(off + 8), "size": u32(off + 12),
                                "type": "Default"}
        elif cmd in (0x21, 0x2C) and size >= 20:
            out["encryption"] = {"offset": u32(off + 8), "size": u32(off + 12),
                                 "system": u32(off + 16)}
        off += size
    return out


def macho_fat_slices(data: bytes, max_arches: int = 16) -> Optional[list]:
    """Universal (fat) binary slice extraction: big-endian fat header,
    20-byte (fat_arch) or 32-byte (fat_arch_64) entries. Returns the
    per-arch byte slices, or None when not a fat file. ``max_arches``
    also guards against Java class files, which share the 0xCAFEBABE
    magic but put the class-format version where nfat_arch lives."""
    if len(data or b"") < 8:
        return None
    magic = data[:4]
    if magic == b"\xca\xfe\xba\xbe":
        entry, fat64 = 20, False
    elif magic == b"\xca\xfe\xba\xbf":
        entry, fat64 = 32, True
    else:
        return None
    n = int.from_bytes(data[4:8], "big")
    if n == 0 or n > max_arches:
        return None
    slices = []
    for i in range(n):
        pos = 8 + i * entry
        if pos + entry > len(data):
            break
        if fat64:
            offset = int.from_bytes(data[pos + 8 : pos + 16], "big")
            size = int.from_bytes(data[pos + 16 : pos + 24], "big")
        else:
            offset = int.from_bytes(data[pos + 8 : pos + 12], "big")
            size = int.from_bytes(data[pos + 12 : pos + 16], "big")
        if offset + size <= len(data) and size >= 28:
            slices.append(data[offset : offset + size])
    return slices or None


def macho_info(data: bytes) -> Optional[dict]:
    """The full E6 extractor analogue of `extract_mach_o_info`
    (`mach_o_file.py:44-176`): fat dispatch + per-binary header and
    load-command walk -> {"OS": "MacOS", "numBinaries", "binaries"}."""
    slices = macho_fat_slices(data)
    if slices is None:
        if macho_header(data) is None:
            return None
        slices = [data]
    binaries = []
    for s in slices:
        hdr = macho_header(s)
        if hdr is None:
            continue
        det = {"header": hdr}
        det.update(macho_load_commands(s) or {})
        binaries.append(det)
    if not binaries:
        return None
    return {"OS": "MacOS", "numBinaries": len(binaries), "binaries": binaries}


# U-Boot legacy image header enums (public u-boot include/image.h
# IH_OS_* / IH_ARCH_* / IH_TYPE_* / IH_COMP_* values; same tables the
# reference carries in `uimage_file.py:19-167`): id -> (NAME, description)
_UIMAGE_OS = {
    0: ("INVALID", "Invalid OS"), 1: ("OPENBSD", "OpenBSD"),
    2: ("NETBSD", "NetBSD"), 3: ("FREEBSD", "FreeBSD"), 4: ("4_4BSD", "4_4BSD"),
    5: ("LINUX", "Linux"), 6: ("SVR4", "SVR4"), 7: ("ESIX", "Esix"),
    8: ("SOLARIS", "Solaris"), 9: ("IRIX", "Irix"), 10: ("SCO", "SCO"),
    11: ("DELL", "Dell"), 12: ("NCR", "NCR"), 13: ("LYNXOS", "LynxOS"),
    14: ("VXWORKS", "VxWorks"), 15: ("PSOS", "pSOS"), 16: ("QNX", "QNX"),
    17: ("U_BOOT", "U-Boot"), 18: ("RTEMS", "RTEMS"), 19: ("ARTOS", "ARTOS"),
    20: ("UNITY", "Unity OS"), 21: ("INTEGRITY", "INTEGRITY"),
    22: ("OSE", "Enea OSE"), 23: ("PLAN9", "Plan 9"),
    24: ("OPENRTOS", "OpenRTOS"),
    25: ("ARM_TRUSTED_FIRMWARE", "ARM Trusted Firmware"),
    26: ("TEE", "Trusted Execution Environment"),
    27: ("OPENSBI", "RISC-V OpenSBI"), 28: ("EFI", "EFI Firmware"),
    29: ("ELF", "ELF Image"),
}

_UIMAGE_ARCH = {
    0: ("INVALID", "Invalid ARCH"), 1: ("ALPHA", "Alpha"), 2: ("ARM", "ARM"),
    3: ("I386", "Intel x86"), 4: ("IA64", "IA64"), 5: ("MIPS", "MIPS"),
    6: ("MIPS64", "MIPS 64 Bit"), 7: ("PPC", "PowerPC"), 8: ("S390", "IBM S390"),
    9: ("SH", "SuperH"), 10: ("SPARC", "SPARC"), 11: ("SPARC64", "SPARC 64 Bit"),
    12: ("M68K", "M68K"), 13: ("NIOS", "Nios-32"), 14: ("MICROBLAZE", "MicroBlaze"),
    15: ("NIOS2", "NIOS II"), 16: ("BLACKFIN", "Blackfin"), 17: ("AVR32", "AVR32"),
    18: ("ST200", "STMicroelectronics ST200"), 19: ("SANDBOX", "Sandbox"),
    20: ("NDS32", "NDS32"), 21: ("OPENRISC", "OpenRISC 1000"),
    22: ("ARM64", "AArch64"), 23: ("ARC", "ARC"), 24: ("X86_64", "AMD x86_64"),
    25: ("XTENSA", "Xtensa"), 26: ("RISCV", "RISC-V"),
}

_UIMAGE_TYPE = {
    0: ("INVALID", "Invalid Image"), 1: ("STANDALONE", "Standalone Program"),
    2: ("KERNEL", "Kernel Image"), 3: ("RAMDISK", "RAMDisk Image"),
    4: ("MULTI", "Multi-File Image"), 5: ("FIRMWARE", "Firmware"),
    6: ("SCRIPT", "Script"), 7: ("FILESYSTEM", "Filesystem Image"),
    8: ("FLATDT", "Flat Device Tree"), 9: ("KWBIMAGE", "Kirkwood Boot Image"),
    10: ("IMXIMAGE", "Freescale i.MX Boot Image"),
    11: ("UBLIMAGE", "Davinci UBL Image"),
    12: ("OMAPIMAGE", "TI OMAP SPL with GP CH"),
    13: ("AISIMAGE", "Davinci AIS Image"),
    14: ("KERNEL_NOLOAD", "Kernel Image (no loading done)"),
    15: ("PBLIMAGE", "Freescale PBL Boot Image"),
    16: ("MXSIMAGE", "Freescale MXS Boot Image"),
    17: ("GPIMAGE", "TI Keystone SPL Image"),
    18: ("ATMELIMAGE", "ATMEL ROM-Boot Image"),
    19: ("SOCFPGAIMAGE", "Altera SOCFPGA CV/AV preloader"),
    20: ("X86_SETUP", "x86 setup.bin"),
    21: ("LPC32XXIMAGE", "LPC32XX Boot Image"),
    22: ("LOADABLE", "A list of typeless images"),
    23: ("RKIMAGE", "Rockchip Boot Image"),
    24: ("RKSD", "Rockchip SD Boot Image"),
    25: ("RKSPI", "Rockchip SPI Boot Image"),
    26: ("ZYNQIMAGE", "Xilinx Zynq Boot Image"),
    27: ("ZYNQMPIMAGE", "Xilinx ZynqMP Boot Image"),
    28: ("ZYNQMPBIF", "Xilinx ZynqMP Boot Image (bif)"),
    29: ("FPGA", "FPGA Image"), 30: ("VYBRIDIMAGE", "Vybrid Boot Image"),
    31: ("TEE", "Trusted Execution Environment Image"),
    32: ("FIRMWARE_IVT", "Firmware with HABv4 IVT"),
    33: ("PMMC", "TI Power Management Micro-Controller Firmware"),
    34: ("STM32IMAGE", "STMicroelectronics STM32 Image"),
    35: ("SOCFPGAIMAGE_V1", "Altera SOCFPGA A10 preloader"),
    36: ("MTKIMAGE", "MediaTek BootROM loadable Image"),
    37: ("IMX8MIMAGE", "NXP i.MX8M Boot Image"),
    38: ("IMX8IMAGE", "NXP i.MX8 Boot Image"),
    39: ("COPRO", "Coprocessor Image"),
    40: ("SUNXI_EGON", "Allwinner eGON Boot Image"),
    41: ("SUNXI_TOC0", "Allwinner TOC0 Boot Image"),
    42: ("FDT_LEGACY", "Legacy Image with Flat Device Tree"),
    43: ("RENESAS_SPKG", "Renesas SPKG Image"),
    44: ("STARFIVE_SPL", "StarFive SPL Image"),
    45: ("TFA_BL31", "TFA BL31 Image"),
}

_UIMAGE_COMP = {0: "None", 1: "gzip", 2: "bzip2", 3: "lzma", 4: "lzo",
                5: "lz4", 6: "zstd"}


def uimage_header(data: bytes) -> Optional[dict]:
    """Legacy U-Boot image header decode (`uimage_file.py:168-218`):
    big-endian magic/crc/timestamp/size/load/ep/crc + os/arch/type/comp
    bytes + 32-byte name. Output shape matches the reference's
    `_parse_uimage_header`: hex strings for crc/addr fields, enum NAMES
    with *_description fields (unknown ids fall back to the stringified
    id, like the reference)."""
    import struct

    if len(data or b"") < 64:
        return None
    try:
        (magic, header_crc, timestamp, data_size, load_addr, entry_point,
         data_crc, os_type, arch, image_type, compression_type) = struct.unpack(
            ">IIIIIIIBBBB", data[:32]
        )
    except struct.error:
        return None
    if magic != 0x27051956:
        return None
    return {
        "header_crc": hex(header_crc),
        "timestamp": timestamp,
        "data_size": data_size,
        "load_addr": hex(load_addr),
        "entry_point": hex(entry_point),
        "data_crc": hex(data_crc),
        "os": _UIMAGE_OS.get(os_type, (str(os_type),))[0],
        "os_description": _UIMAGE_OS.get(os_type, ("", "Unknown OS"))[1],
        "arch": _UIMAGE_ARCH.get(arch, (str(arch),))[0],
        "arch_description": _UIMAGE_ARCH.get(arch, ("", "Unknown Architecture"))[1],
        "image_type": _UIMAGE_TYPE.get(image_type, (str(image_type),))[0],
        "image_type_description": _UIMAGE_TYPE.get(image_type, ("", "Unknown Image"))[1],
        "compression_type": _UIMAGE_COMP.get(compression_type, str(compression_type)),
        "name": data[32:64].rstrip(b"\x00").decode("ascii", errors="replace"),
    }
