"""Deterministic link-family fixture corpus + oracle staging.

The reference's relationship tests run over hand-built SBOMs
(`tests/relationships/test_elf.py:9-83`, `test_pe.py`, `test_dotnet.py`,
`test_java.py`); the driver's CORRECTNESS gate needs the same families
exercised against a DuckDB oracle. This module synthesises a
deterministic SOFTWARE_NODES corpus per family (a few hundred nodes,
literal arithmetic — no randomness, no external data) and stages it as
parquet so that:

- the Spark side reads the nodes parquet and runs the REAL distributed
  linkers (operators/link.py: mapInPandas probe expansion + explode +
  equi join + dedup);
- the DuckDB side reads the same nodes parquet plus a staged probe
  table and performs the join/filter/dedup in SQL.

The probe rows are produced by the SAME pure per-row functions
(link.elf_probe_rows / pe_probe_rows / dotnet_probe_rows) that the
Spark batches call, so the oracle validates the *distributed plumbing*
(explode, join, fileName-membership, case-folded keys, self-edge drop,
set dedup) cross-engine; probe-generation semantics themselves are
pinned against the reference by tests/test_link_families.py.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, List, Tuple

FIXTURE_VERSION = "r5i"

NodeRow = Tuple[str, List[str], List[str], dict]


# ---------------------------------------------------------------------------
# deterministic corpora (pure literal arithmetic, seedless)
# ---------------------------------------------------------------------------
def synth_elf_nodes(n: int = 400) -> List[NodeRow]:
    """ELF library web: bare deps resolved via runpath/default dirs,
    absolute-path deps, $ORIGIN expansion, DF_1_NODEFLIB suppression —
    every probe family of `elf_relationship.py:41-198`."""
    rows: List[NodeRow] = []
    for i in range(n):
        uuid = f"elf-{i:04d}"
        fname = f"lib{i}.so"
        m = i % 4
        if m == 0:
            ipath = [f"/usr/lib/{fname}"]
        elif m == 1:
            ipath = [f"/lib/{fname}"]
        elif m == 2:
            ipath = [f"/opt/app{i % 8}/lib/{fname}"]
        else:
            ipath = [f"/custom/abs/{fname}"]
        deps = [f"lib{(i * 7 + 1) % n}.so"]
        if i % 3 == 0:
            deps.append(f"/custom/abs/lib{(i * 13 + 3) % n}.so")
        if i % 5 == 0:
            deps.append(f"../lib{(i * 11 + 5) % n}.so")  # relative-path dep
        md: dict = {"elfDependencies": deps, "elfRpath": [], "elfRunpath": []}
        # extractor flags for the stat-command analogue (`cmd/stat.py`)
        md["elfIsLib"] = i % 2 == 0
        md["elfIsExe"] = i % 2 == 1
        if m == 2:
            md["elfRunpath"] = ["$ORIGIN:$ORIGIN/../lib"]
        if i % 16 == 3:
            md["elfRunpath"] = ["$ORIGIN/$LIB"]
        if i % 17 == 0:
            md["elfDynamicFlags1"] = {"DF_1_NODEFLIB": True}
        rows.append((uuid, [fname], ipath, md))
    return rows


def synth_pe_nodes(n: int = 240) -> List[NodeRow]:
    """PE import web: same-dir probing with case-insensitive path
    equality (`pe_relationship.py:19-78`); mixed-case dirs and import
    names force the win_norm fold to matter."""
    rows: List[NodeRow] = []
    for i in range(n):
        uuid = f"pe-{i:03d}"
        fname = f"mod{i}.dll"
        app = i % 12
        case_dir = "Apps" if i % 2 else "APPS"
        ipath = [f"C:\\{case_dir}\\app{app}\\{fname}"]
        md: dict = {
            # (i+12) keeps the same app dir modulo 12 -> guaranteed hit;
            # the second import usually lands in another app dir -> miss
            "peImport": [f"MOD{(i + 12) % n}.DLL", f"mod{(i * 5 + 2) % n}.dll"],
            # extractor flags for the stat-command analogue
            "peIsExe": i % 3 == 0,
            "peIsDll": i % 3 != 0,
            "peIsClr": i % 5 == 0,
        }
        if i % 4 == 0:
            md["peDelayImport"] = [f"mod{(i * 7 + 24) % n}.dll"]
        rows.append((uuid, [fname], ipath, md))
    return rows


def synth_dotnet_nodes(n_libs: int = 60, n_apps: int = 60) -> List[NodeRow]:
    """.NET probing corpus: same-dir / subdir / culture-dir libs,
    assemblyRef with and without Culture, ImplMap native-name
    combinations, appConfig privatePath probing
    (`dotnet_relationship.py:20-243`)."""
    rows: List[NodeRow] = []
    for i in range(n_libs):
        name = f"dnlib{i}"
        variant = i % 4
        app = i % 6
        if variant == 0:
            ipath = f"C:\\dn\\app{app}\\{name}.dll"
        elif variant == 1:
            ipath = f"C:\\dn\\app{app}\\{name}\\{name}.dll"
        elif variant == 2:
            ipath = f"C:\\dn\\app{app}\\cult{i % 2}\\{name}.dll"
        else:
            ipath = f"C:\\dn\\app{app}\\plugins\\{name}.dll"
        rows.append((f"dnl-{i:03d}", [f"{name}.dll"], [ipath], {}))
    for k in range(12):  # native libs for the ImplMap combinations
        rows.append(
            (f"dnn-{k:02d}", [f"natlib{k}.dll"], [f"C:\\dn\\app{k % 6}\\natlib{k}.dll"], {})
        )
    for i in range(n_apps):
        app = i % 6
        # offset by a multiple of 6 so app and lib share an app dir —
        # whether the probe then HITS depends on the lib's variant
        # (same-dir/subdir/culture/plugins) vs the ref shape
        j = (i + 6 * ((i % 7) + 1)) % n_libs
        ref: dict = {"Name": f"dnlib{j}"}
        if j % 4 == 2:
            ref["Culture"] = f"cult{j % 2}"
        md: dict = {"dotnetAssemblyRef": [ref]}
        if i % 4 == 0:
            md["dotnetImplMap"] = [{"Name": f"natlib{(i * 5 + 2) % 12}"}]
        binding: dict = {}
        if i % 5 == 0:
            binding["probing"] = {"privatePath": "plugins;ext"}
        if i % 9 == 0:
            binding["dependentAssembly"] = [
                {"codeBase": {"href": f"dnlib{j}\\dnlib{j}.dll"}},
                {"codeBase": {"href": "https://example.invalid/skip.dll"}},
            ]
        if binding:
            md["appConfigFile"] = {"runtime": {"assemblyBinding": binding}}
        rows.append(
            (f"dna-{i:03d}", [f"dnapp{i}.exe"], [f"C:\\dn\\app{app}\\dnapp{i}.exe"], md)
        )
    return rows


def synth_java_nodes(n: int = 150) -> List[NodeRow]:
    """Java import/export web incl. multi-exporter symbols (the
    min-uuid supplier rule) and self-edge suppression
    (`java_relationship.py:11-51`)."""
    rows: List[NodeRow] = []
    for i in range(n):
        exports = [f"sym{i}():void"]
        if i % 7 == 0:
            exports.append(f"shared{i % 10}():void")
        imports = [f"sym{(i * 3 + 1) % n}():void", f"sym{(i + 17) % n}():void"]
        if i % 11 == 0:
            imports.append(f"shared{i % 10}():void")
        md = {"javaClasses": {f"Cls{i}": {"javaExports": exports, "javaImports": imports}}}
        rows.append((f"jv-{i:03d}", [f"jv{i}.class"], [f"/java/jv{i}.class"], md))
    return rows


def synth_merge_tables() -> Tuple[List[tuple], List[tuple], List[tuple], List[tuple]]:
    """(base, incoming, edges_raw, audit_rows) for the multi-hash merge
    cascade (J6, `_sbom.py:280-319`), edge-endpoint rewrite (U2,
    `_sbom.py:203-217`) and hash-collision audit (A5,
    `_software.py:157-174`) oracle queries. Match variety: sha256-only,
    md5-only, sha1-only, hashless-by-uuid, and unmatched rows."""
    base = []
    for i in range(40):
        base.append(
            (
                f"b-{i:02d}",
                f"sha{i}" if i % 4 != 1 else None,
                f"md5{i}" if i % 4 != 2 else None,
                f"sha1{i}" if i % 4 != 3 else None,
            )
        )
    incoming = []
    for i in range(40):
        m = i % 5
        if m == 0:  # sha256 match
            incoming.append((f"i-{i:02d}", f"sha{i}", None, None))
        elif m == 1:  # md5 match (base row i%4==1 has md5, no sha)
            incoming.append((f"i-{i:02d}", None, f"md5{i}", None))
        elif m == 2:  # sha1 match
            incoming.append((f"i-{i:02d}", None, None, f"sha1{i}"))
        elif m == 3:  # hashless -> match by uuid (same uuid as base)
            incoming.append((f"b-{i:02d}", None, None, None))
        else:  # unmatched new content
            incoming.append((f"i-{i:02d}", f"newsha{i}", None, None))
    edges_raw = []
    for i in range(40):
        edges_raw.append((f"i-{i:02d}", "Uses", f"i-{(i * 7 + 3) % 40:02d}"))
        if i % 3 == 0:
            edges_raw.append((f"i-{i:02d}", "Contains", f"b-{(i + 5) % 40:02d}"))
    audit = []
    for i in range(30):
        # i%5==0: same sha twice with DIFFERENT sizes -> flagged
        audit.append((f"h{i % 10}", 100 + (i if i % 5 == 0 else i % 10), f"m{i % 10}"))
    return base, incoming, edges_raw, audit


def uuid36(i: int) -> str:
    """Deterministic 36-char pseudo-UUID (8-4-4-4-12 layout) — the
    containerPath rewrite keys on a fixed 36-char prefix
    (`_sbom.py:219-230`), so fixture uuids must be real-width."""
    return f"{i:08d}-0000-4000-8000-{i:012d}"


def synth_cp_tables() -> Tuple[List[tuple], List[tuple], List[tuple]]:
    """(software, map, edges) for the F9 containerPath-rewrite and S9
    SPDX files-table oracle queries. Variety by construction:

    - containerPath: single-path rows, two-path rows, a bare-uuid path
      (no '/', dropped by the SPDX file split), empty arrays and NULL
      arrays (the no-containerPath fileName branch);
    - NULL name/version/sha1 to exercise the id sanitize/coalesce path;
    - rewrite map covers a strict subset of container uuids so both
      rewritten and untouched prefixes appear.
    """
    software: List[tuple] = []
    for i in range(60):
        name = f"pkg{i}" if i % 3 else None
        version = f"1.{i}" if i % 4 else None
        sha256 = f"cafe{i:04d}" + "0" * 56
        sha1 = None if i % 5 == 0 else f"beef{i:04d}" + "0" * 32
        md5 = f"feed{i:04d}" + "0" * 24
        file_names = [f"file{i}.so"] + ([f"alt{i}.so"] if i % 7 == 0 else [])
        if i % 5 == 4:
            cpaths = None if i % 10 == 9 else []
        elif i % 6 == 0:
            cpaths = [
                uuid36((i * 7) % 60) + f"/usr/lib/file{i}.so",
                uuid36((i * 11) % 60) + f"/opt/file{i}.so",
            ]
        else:
            cpaths = [uuid36((i * 7) % 60) + f"/usr/lib/file{i}.so"]
        if cpaths is not None and i % 13 == 1:
            cpaths = cpaths + [uuid36(i)]  # bare uuid, no '/'
        software.append((uuid36(i), name, version, sha1, sha256, md5, file_names, cpaths))
    cp_map = [(uuid36(j), uuid36(1000 + j)) for j in range(0, 60, 4)]
    edges: List[tuple] = []
    for i in range(0, 60, 6):
        edges.append((uuid36(i), "Contains", uuid36((i + 1) % 60)))
    for i in range(0, 60, 9):
        edges.append((uuid36(i), "Uses", uuid36((i + 2) % 60)))
    return software, cp_map, edges


def synth_kg_nodes() -> Dict[str, list]:
    """Deterministic node-table fixture in the pipeline's dedup_nodes
    schema, for the S8 CSV-export oracle (one output row per alias —
    `output/csv_writer.py:55-74`). Variety by construction: empty
    names (NULL name after element_at), empty aliases (row dropped by
    the explode), multi-alias rows (fan-out)."""
    import datetime

    n = 40
    t0 = datetime.datetime(2024, 1, 1)
    names, aliases = [], []
    for i in range(n):
        nm = [] if i % 9 == 0 else sorted(
            [f"Title {i}"] + ([f"Alt {i}"] if i % 4 == 0 else [])
        )
        al = [] if i % 11 == 3 else sorted(
            [f"http://h{i % 5}.example/p{i}"]
            + ([f"http://mirror.example/p{i}"] if i % 3 == 0 else [])
        )
        names.append(nm)
        aliases.append(al)
    return {
        "canon_uuid": [uuid36(2000 + i) for i in range(n)],
        "sha256": [f"dead{i:04d}" + "0" * 56 for i in range(n)],
        "names": names,
        "aliases": aliases,
        "n_sources": [1 + i % 4 for i in range(n)],
        "first_seen": [t0 + datetime.timedelta(hours=i) for i in range(n)],
    }


def synth_norm_paths() -> Dict[str, list]:
    """(path, win) rows for the F10 normalization oracle: every path of
    the reference's posix contract (`tests/relationships/
    test_posix_utils.py:11-33`, all 17) plus generated root x segment
    combinations that exercise nested `..` cancellation; `win` rows are
    windows-style paths in mixed case and mixed separators (no
    redundant/trailing separators, where PureWindowsPath equality
    reduces to lower(replace('\\','/')) — the SQL-replayable subset)."""
    posix = [
        "", "..", "../", "../..",
        "ab/../xy", "/a/b//..///c",
        "//..", "//../", "//../a", "//./", "//./a", "//./a/../b",
        "///", "///a", "///a/../b", "///a/../",
        "////a/../b",
    ]
    segs = ["a", "b", "..", ".", "xy", "lib64"]
    for i in range(31):
        root = ["", "/", "//", "///"][i % 4]
        body = "/".join(segs[(i + j) % len(segs)] for j in range(2 + i % 4))
        posix.append(root + body)
    win = []
    for i in range(len(posix)):
        drive = ["C:", "d:", ""][i % 3]
        sep = "\\" if i % 2 else "/"
        parts = [p for p in (f"Dir{i % 4}", "SubDir", f"lib{i}.DLL") if p]
        win.append((drive + sep if drive else "") + sep.join(parts))
    return {"path": posix, "win": win}


def synth_web_pages(n: int = 250) -> Dict[str, list]:
    """The synthetic Common-Crawl-style corpus (synth.make_corpus,
    seed=42) staged as a parquet fixture so the web-graph query family
    (host link graph, anchor-text mining, co-mention statistics) and
    its DuckDB oracles read byte-identical pages. html stays raw bytes
    (the input_hint binary column); both engines decode utf-8 at query
    time."""
    from .synth import make_corpus

    pages, _ = make_corpus(n, seed=42)
    return {
        "url": list(pages["url"]),
        "warc_ts": [int(t.timestamp()) for t in pages["warc_ts"]],
        "html": list(pages["html"]),
        "text": list(pages["text"]),
        "lang": list(pages["lang"]),
    }


def stage_web_pages(n: int) -> str:
    """Stage the web-pages corpus at an explicit size (idempotent,
    per-size file) and return its path. The default 250-page staging
    keeps the driver-gate fixture stable; this per-size variant lets
    the correctness rows and the scaling bench exercise the SAME corpus
    family at sf-proportional sizes (`SPARK_GRAFT_WEB_N` in queries.py)
    instead of correctness living on a fixed small fixture while scale
    evidence runs a different synthetic corpus."""
    final = os.path.join(fixture_dir(), f"web_pages_n{n}.parquet")
    if os.path.exists(final):
        return final
    os.makedirs(fixture_dir(), exist_ok=True)
    tmp = f"{final}.tmp-{os.getpid()}"
    _write_parquet(tmp, synth_web_pages(n))
    os.rename(tmp, final)  # losers overwrite with identical bytes
    return final


def synth_boiler_pages() -> Dict[str, list]:
    """Per-host templated pages for the boilerplate-shingle miner
    (`textops.host_boilerplate`): every host stamps a constant header
    and footer sentence on all of its pages (true boilerplate, 100 %),
    a 'subscribe' block appears on only some pages — exactly 60 % on
    bsite1 (the inclusive threshold boundary), ~33-50 % elsewhere
    (below it) — and the middle sentence varies per page through
    coprime integer arithmetic so no 5-token window of it repeats
    within a host. tiny.example.net has just 2 pages: its header IS
    universal but the host sits below min_pages. Deterministic literal
    arithmetic — no rng."""
    urls: List[str] = []
    texts: List[str] = []
    for h in range(6):
        host = f"bsite{h}.example.net"
        n_pages = 4 + h % 4
        for i in range(n_pages):
            header = f"copyright bsite{h} example net all rights reserved"
            footer = f"navigation home about contact bsite{h} sitemap terms"
            middle = (
                f"article a{h}x{i} discusses topic t{(i * 7 + h) % 13}"
                f" and item m{(i * 11 + h) % 17}"
            )
            block2 = f"subscribe to the bsite{h} newsletter for weekly updates today"
            parts = [header, middle]
            if (h == 1 and i < 3) or (h != 1 and i % 3 == 0):
                parts.append(block2)
            parts.append(footer)
            urls.append(f"https://{host}/a/{i}.html")
            texts.append(" ".join(parts))
    for i in range(2):
        urls.append(f"https://tiny.example.net/a/{i}.html")
        texts.append(
            "copyright tiny example net all rights reserved"
            f" article q{i} is short"
        )
    return {"url": urls, "text": texts}


def synth_line_pages() -> Dict[str, list]:
    """Multi-line pages for the C4/RefinedWeb-style line-level dedup
    (`dedup.line_dedup`): every site stamps a constant header and
    footer line on all of its pages, one 'subscribe' line is shared
    ACROSS sites (global boilerplate), the article/detail lines vary
    per page through coprime integer arithmetic (never duplicated),
    one page per site repeats its own header intra-document, article
    lines carry surrounding whitespace (the trim-normalization case),
    and blank lines punctuate every page (dropped before keying). A
    final all-duplicate page whose url sorts LAST owns no first
    occurrence — every line excised (n_kept=0, text_clean '').
    Deterministic literal arithmetic — no rng."""
    urls: List[str] = []
    texts: List[str] = []
    shared = "subscribe to our newsletter for weekly updates"
    for s in range(3):
        header = f"welcome to site{s} the best site on the web"
        footer = f"copyright site{s} all rights reserved"
        for i in range(4):
            lines = [
                header,
                f"  article s{s}d{i} covers topic t{(i * 5 + s) % 7}  ",
                shared,
                "",
                f"unique detail u{(i * 11 + s * 3) % 29} for page s{s}d{i}",
                footer,
            ]
            if i == 1:
                lines.insert(3, header)
            urls.append(f"https://site{s}.example.com/d/{i}")
            texts.append("\n".join(lines))
    urls.append("https://zz-dup.example.com/all-dup")
    texts.append(
        "\n".join(
            [
                "welcome to site0 the best site on the web",
                shared,
                "copyright site2 all rights reserved",
            ]
        )
    )
    return {"url": urls, "text": texts}


def synth_pii_pages() -> Dict[str, list]:
    """Pages salted with deterministic synthetic PII for the redaction
    operator (`textops.redact_pii`): emails (with dots and +tags in
    the local part), IPv4 addresses (including a 5-octet run where
    only the leading 4 octets match), international-format phone
    numbers, near-misses that must NOT match (a bare '@', a phone
    without country code), and PII-free pages. All identifiers are
    synthetic (example.com / RFC 5737-style shapes) — nothing real.
    Deterministic literal arithmetic — no rng."""
    urls: List[str] = []
    texts: List[str] = []
    for i in range(24):
        parts = [f"contact page {i} of example corp"]
        if i % 2 == 0:
            parts.append(
                f"mail us at user{i}.name+tag@mail{i % 5}.example.com today"
            )
        if i % 3 == 0:
            parts.append(
                f"server at 10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256} responded"
            )
        if i % 4 == 0:
            parts.append(f"call +{1 + i % 89} 555 01{i % 10:02d} now")
        if i % 5 == 0:
            parts.append(f"edge 192.168.{i}.1.{i} and addr{i}@x{i % 3}.io end")
        if i % 6 == 0:
            parts.append("almost phone 555 0100 and bare at sign @ not pii")
        urls.append(f"https://pii.example.org/p/{i}")
        texts.append(" ".join(parts))
    return {"url": urls, "text": texts}


def synth_robots() -> Dict[str, list]:
    """Per-host robots.txt bodies for the rule engine
    (`operators/robots.py`): hosts match the web-pages corpus so
    robots_check exercises real page urls. Bodies cover the parse
    edges: comments, blank lines, stacked User-agent lines, mixed-case
    directives, named-agent vs '*' group selection, Allow/Disallow
    precedence at equal and different specificity, trailing-* and $
    rules, the skipped interior-wildcard subset, empty Disallow
    (allow-all idiom), Crawl-delay, and a group for an unrelated agent
    that must NOT leak into ccbot's scope."""
    bodies = {
        # '*' group only: prefix disallow + more-specific allow + delay
        "site0.example.org": (
            "# robots for site0\n"
            "User-agent: *\n"
            "Disallow: /p/1\n"
            "Allow: /p/10\n"
            "Crawl-delay: 2\n"
        ),
        # named ccbot group wins over '*'; '*' rules must not apply
        "site1.example.org": (
            "User-agent: CCBot\n"
            "Disallow: /p/2\n"
            "\n"
            "User-agent: *\n"
            "Disallow: /\n"
        ),
        # stacked agents share one group; trailing-* and anchored rules
        "site2.example.org": (
            "User-agent: ccbot\n"
            "User-agent: otherbot\n"
            "Disallow: /p/3*\n"
            "Allow: /p/33$\n"
            "Disallow: /x*y\n"  # interior wildcard: skipped subset
        ),
        # unrelated agent only -> no applicable group -> default allow
        "site3.example.org": (
            "User-agent: googlebot\n"
            "Disallow: /\n"
        ),
        # allow-all idiom: empty Disallow carries no restriction,
        # but the group's crawl delay must survive via the sentinel
        "hot.example.com": (
            "USER-AGENT: *\n"
            "DISALLOW:\n"
            "CRAWL-DELAY: 1\n"
        ),
    }
    hosts = sorted(bodies)
    return {"host": hosts, "robots_txt": [bodies[h] for h in hosts]}


def synth_ip_blocks(n: int = 300) -> Dict[str, list]:
    """Non-overlapping CIDR-style address blocks for the bucketed
    range-lookup join (`operators/rangejoin.py`): spans of 40k-400k
    addresses (1-7 /16 buckets each) separated by deterministic gaps,
    so the fact side exercises both matched and unmatched keys; label
    + country are the enrichment payload."""
    lo, hi, label, country = [], [], [], []
    cursor = 0
    for i in range(n):
        gap = (i % 5) * 9973
        span = 40_000 + (i % 13) * 30_000
        a = cursor + gap
        b = a + span
        cursor = b + 1
        lo.append(a)
        hi.append(b)
        label.append(f"net{i}")
        country.append(f"C{i % 23}")
    return {"lo": lo, "hi": hi, "label": label, "country": country}


def synth_canonical_pages(n: int = 120) -> Dict[str, list]:
    """Pages with <link rel="canonical"> elements for the canonical-
    cluster resolver: ~
    - i % 3 == 0: canonical points at the clean variant of a tracked
      url (query-string duplicates collapse onto one canonical),
    - i % 3 == 1: self-canonical (possibly with fragment/default-port
      noise the canonicalizer must strip),
    - i % 3 == 2: no canonical element at all.
    Attribute order varies (href before rel on some pages) and one
    page carries a relative canonical (the documented skipped
    subset)."""
    urls, htmls = [], []
    for i in range(n):
        host = f"site{i % 4}.example.org"
        if i % 3 == 0:
            url = f"https://{host}/item/{i}?utm=x{i}"
            canon = f"https://{host}/item/{i}"
            link = f'<link rel="canonical" href="{canon}">'
        elif i % 3 == 1:
            url = f"https://{host}/page/{i}"
            canon = f"https://{host}:443/page/{i}#top"
            if i % 2:
                link = f'<link href="{canon}" rel="canonical">'
            else:
                link = f'<link rel="canonical" href="{canon}">'
        else:
            url = f"https://{host}/plain/{i}"
            link = ""
        if i == 7:
            link = '<link rel="canonical" href="/relative/skipped">'
        htmls.append(f"<html><head>{link}</head><body>p{i}</body></html>".encode())
        urls.append(url)
    return {"url": urls, "html": htmls}


def synth_sitemaps() -> Dict[str, list]:
    """Per-host sitemap XML for the staleness resolver: <url> entries
    (one per line) whose <loc> urls overlap the web-pages corpus —
    some with lastmod after the crawl (stale), some before (fresh),
    some never captured, one without a lastmod (unknown). The crawl
    fixture's warc_ts values sit at 2024-01-01 (epoch ~1704067200)."""
    hosts = ["site0.example.org", "site1.example.org", "hot.example.com"]
    xmls = []
    for h in hosts:
        rows = []
        for i in range(40):
            loc = f"https://{h}/p/{i}.html"
            if i % 4 == 0:
                lm = "2024-03-15"  # after the crawl: stale
            elif i % 4 == 1:
                lm = "2023-11-02"  # before the crawl: fresh
            elif i % 4 == 2:
                lm = "2024-03-16"
                loc = f"https://{h}/new/{i}.html"  # never captured
            else:
                rows.append(f"<url><loc>{loc}</loc></url>")
                continue
            rows.append(f"<url><loc>{loc}</loc><lastmod>{lm}</lastmod></url>")
        xmls.append(
            '<?xml version="1.0"?>\n<urlset>\n' + "\n".join(rows) + "\n</urlset>"
        )
    return {"host": hosts, "sitemap_xml": xmls}


def synth_trusted_hosts() -> Dict[str, list]:
    """The curated TrustRank seed list (Gyongyi et al. 2004 start from
    a hand-audited trusted set): two hosts of the web corpus."""
    return {"host": ["site0.example.org", "hot.example.com"]}


def synth_media_blobs(n_bases: int = 30, n_bytes: int = 256) -> Dict[str, list]:
    """Opaque binary payloads for the byte-signature near-dup family:
    ``n_bases`` deterministic base patterns; every third base gets a
    near-duplicate variant (3 bytes perturbed — same blockwise
    structure, tiny hamming distance on the signature) and every
    fifth an exact duplicate. Patterns vary block structure (ramps,
    steps, stripes) so signatures are well-spread."""
    ids, kinds, blobs = [], [], []
    mid = 0

    def emit(b: bytes, kind: str = "image"):
        nonlocal mid
        ids.append(mid)
        kinds.append(kind)
        blobs.append(b)
        mid += 1

    import hashlib

    for i in range(n_bases):
        # md5-keystream bytes: well-spread blockwise sums, so base
        # signatures differ and hamming-0 collisions stay rare
        stream = b"".join(
            hashlib.md5(f"blob:{i}:{c}".encode()).digest()
            for c in range(n_bytes // 16)
        )
        base = stream[:n_bytes]
        emit(base)
        if i % 3 == 0:
            # near-dup: perturb one 16-byte block hard enough to flip
            # a signature bit or two, never more than max_hamming
            v = bytearray(base)
            blk = (i * 7) % (n_bytes // 16)
            for k in range(16):
                v[blk * 16 + k] = 255 if k % 2 == 0 else 0
            emit(bytes(v))
        if i % 5 == 0:
            emit(base)  # exact duplicate: hamming 0
    return {"media_id": ids, "kind": kinds, "payload": blobs}


def synth_anchor_pages() -> Dict[str, list]:
    """Referrer pages whose <a> anchors are entity SURFACE FORMS for
    the alias-promotion oracle: the spark target gets a 4-of-6
    consensus ("apache spark" — promoted at the 60 % bar exactly via
    integer compare 400 >= 360), the flink target a 2/2/1 split vote
    (top share 40 % — rejected), the duck target only 2 anchors
    (under the min_anchors=3 evidence bar — rejected), the kafka
    target a unanimous 4 ("kafka" — promoted). Empty anchors and
    non-http hrefs are salted in to exercise the filters.
    Deterministic literal arithmetic — no rng."""
    t_spark = "https://proj.example.org/spark"
    t_flink = "https://proj.example.org/flink"
    t_duck = "https://proj.example.org/duck"
    t_kafka = "https://proj.example.org/kafka"
    votes = (
        [(t_spark, "apache spark")] * 4
        + [(t_spark, "spark engine")] * 2
        + [(t_flink, "apache flink")] * 2
        + [(t_flink, "flink")] * 2
        + [(t_flink, "stream engine")]
        + [(t_duck, "duckdb")] * 2
        + [(t_kafka, "kafka")] * 4
    )
    urls: List[str] = []
    htmls: List[bytes] = []
    n_ref = 6
    for r in range(n_ref):
        elems = [
            f'<a href="{tgt}">{txt}</a>'
            for i, (tgt, txt) in enumerate(votes)
            if i % n_ref == r
        ]
        elems.append(f'<a href="{t_spark}"></a>')  # empty anchor: dropped
        elems.append('<a href="mailto:x@example.org">contact</a>')  # non-http
        urls.append(f"https://ref{r}.example.net/a.html")
        htmls.append(("<html><body>" + "".join(elems) + "</body></html>").encode())
    return {"url": urls, "html": htmls}


def synth_community_edges() -> Dict[str, list]:
    """Planted-partition graph for the label-propagation oracle: three
    cliques (8/10/12 nodes) joined by single bridge edges — the shape
    where synchronized LPA provably converges to one community per
    clique within two rounds (round 1: every member adopts the clique
    minimum except the minimum itself; round 2: majority pulls the
    minimum back), while the bridges' single cross votes never beat a
    clique majority. Deterministic literal arithmetic — no rng."""
    src_l: List[str] = []
    dst_l: List[str] = []
    sizes = [8, 10, 12]
    for k, n in enumerate(sizes):
        names = [f"c{k}n{i:02d}" for i in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                src_l.append(names[i])
                dst_l.append(names[j])
    src_l += ["c0n00", "c1n00"]
    dst_l += ["c1n00", "c2n00"]
    return {"src": src_l, "dst": dst_l}


def synth_raw_urls(n: int = 72) -> Dict[str, list]:
    """Messy URL variants for the canonicalization oracle: every base
    url appears in several surface forms (uppercased scheme/host,
    explicit default port, fragment, bare-host) that RFC 3986 §6
    normalization folds to one canonical spelling. Deterministic
    literal arithmetic — no rng."""
    raw: List[str] = []
    for i in range(n):
        host = f"site{i % 7}.example.org"
        path = f"/p/{i}.html"
        base = f"https://{host}{path}"
        raw.append(base)
        raw.append(f"HTTPS://{host.upper()}{path}")
        if i % 2 == 0:
            raw.append(f"https://{host}:443{path}")
        if i % 3 == 0:
            raw.append(f"{base}#sec-{i}")
        if i % 4 == 0:
            raw.append(f"http://{host.title()}:80{path}")
        if i % 5 == 0:
            raw.append(f"https://{host.upper()}")  # bare host -> '/'
            raw.append(f"https://{host}/")
    return {"raw_url": raw}


# ---------------------------------------------------------------------------
# E6 — synthetic Mach-O corpus with spec-derived expected decode fields.
# Builders assemble bytes from the public mach-o/loader.h layout; the
# expected_* columns come from the SAME parameters the builder was given
# (ground truth at synth time, independent of the decoder under test —
# the classify_magic oracle pattern).
# ---------------------------------------------------------------------------
def _mo_dylib(cmd_id: int, name: str, cur=(1, 2, 3), compat=(1, 0, 0)) -> bytes:
    import struct

    nb = name.encode() + b"\x00"
    pad = (-(24 + len(nb))) % 8
    return struct.pack(
        "<IIIIII", cmd_id, 24 + len(nb) + pad, 24, 0,
        (cur[0] << 16) | (cur[1] << 8) | cur[2],
        (compat[0] << 16) | (compat[1] << 8) | compat[2],
    ) + nb + b"\x00" * pad


def _mo_str(cmd_id: int, s: str) -> bytes:
    import struct

    nb = s.encode() + b"\x00"
    pad = (-(12 + len(nb))) % 8
    return struct.pack("<III", cmd_id, 12 + len(nb) + pad, 12) + nb + b"\x00" * pad


def _mo_build(platform: int, min_os, sdk, tools) -> bytes:
    import struct

    def ver(t):
        return (t[0] << 16) | (t[1] << 8) | t[2]

    body = b"".join(struct.pack("<II", tid, ver(tv)) for tid, tv in tools)
    return struct.pack(
        "<IIIIII", 0x32, 24 + len(body), platform, ver(min_os), ver(sdk), len(tools)
    ) + body


def _mo_thin(cmds: list, cputype: int = 0x01000007, filetype: int = 6) -> bytes:
    import struct

    body = b"".join(cmds)
    return struct.pack(
        "<IIIIIIII", 0xFEEDFACF, cputype, 3, filetype, len(cmds), len(body), 0, 0
    ) + body


def _mo_fat(slices: list) -> bytes:
    import struct

    n = len(slices)
    hdr = struct.pack(">II", 0xCAFEBABE, n)
    off = 8 + 20 * n
    entries, blob = [], b""
    for s in slices:
        entries.append(struct.pack(">IIIII", 0, 0, off, len(s), 0))
        blob += s
        off += len(s)
    return hdr + b"".join(entries) + blob


def synth_macho_pages() -> Dict[str, list]:
    _REQ = 0x80000000
    kinds = [0xC, 0x18 | _REQ, 0x1F | _REQ, 0x20]  # load/weak/reexport/lazy
    plats = [(1, "MACOS"), (2, "IOS"), (6, "MACCATALYST")]
    tools = [(1, "CLANG"), (2, "SWIFT"), (3, "LD")]
    cpus = [(0x01000007, "x86_64"), (0x0100000C, "arm64")]
    ftypes = [(2, "execute"), (6, "dylib"), (8, "bundle")]
    cols = {k: [] for k in (
        "url", "html", "e_n_binaries", "e_cputype", "e_filetype", "e_deps",
        "e_id_name", "e_rpaths", "e_linker", "e_platform", "e_min_os",
        "e_sdk", "e_tools",
    )}
    for i in range(20):
        cpu_v, cpu_n = cpus[i % 2]
        ft_v, ft_n = ftypes[i % 3]
        n_deps = i % 4
        deps, cmds = [], []
        for d in range(n_deps):
            nm = f"/usr/lib/libdep{i}_{d}.dylib" if d % 2 else f"@rpath/libr{i}_{d}.dylib"
            cur, compat = (100 + i, d, 1), (1, d, 0)
            cmds.append(_mo_dylib(kinds[d % len(kinds)], nm, cur, compat))
            deps.append(f"{nm}@{cur[0]}.{cur[1]}.{cur[2]}@{compat[0]}.{compat[1]}.{compat[2]}")
        id_name = None
        if i % 3 == 0:
            id_name = f"@rpath/libself{i}.dylib"
            cmds.append(_mo_dylib(0xD, id_name, (i, 0, 0), (1, 0, 0)))
        rpaths = [f"@loader_path/../lib{r}" for r in range(i % 3)]
        cmds.extend(_mo_str(0x1C | _REQ, p) for p in rpaths)
        linker = "/usr/lib/dyld" if i % 2 == 0 else None
        if linker:
            cmds.append(_mo_str(0xE, linker))
        platform = min_os = sdk = tools_csv = None
        if i % 4 != 3:
            p_v, p_n = plats[i % 3]
            t_id, t_n = tools[i % 3]
            cmds.append(_mo_build(p_v, (12, i % 7, 0), (13, 0, i % 5), [(t_id, (900, i, 0))]))
            platform, min_os, sdk = p_n, f"12.{i % 7}.0", f"13.0.{i % 5}"
            tools_csv = f"{t_n}@900.{i}.0"
        thin = _mo_thin(cmds, cpu_v, ft_v)
        n_bin = 1
        if i % 5 == 4:  # fat: this slice + a minimal second arch
            thin = _mo_fat([thin, _mo_thin([_mo_str(0xE, "/usr/lib/dyld")], cpus[(i + 1) % 2][0], 2)])
            n_bin = 2
        cols["url"].append(f"macho://bin{i}")
        cols["html"].append(thin)
        cols["e_n_binaries"].append(n_bin)
        cols["e_cputype"].append(cpu_n)
        cols["e_filetype"].append(ft_n)
        cols["e_deps"].append("|".join(deps))
        cols["e_id_name"].append(id_name)
        cols["e_rpaths"].append("|".join(rpaths))
        cols["e_linker"].append(linker)
        cols["e_platform"].append(platform)
        cols["e_min_os"].append(min_os)
        cols["e_sdk"].append(sdk)
        cols["e_tools"].append(tools_csv)
    return cols


# ---------------------------------------------------------------------------
# E7 — synthetic OLE/CFB corpus (FAT-stream and ministream layouts) with
# spec-derived expected SummaryInformation fields.
# ---------------------------------------------------------------------------
def _oleps_ps(props: Dict[int, object]) -> bytes:
    import struct

    head = struct.pack("<HHI", 0xFFFE, 0, 0x00020005) + b"\x00" * 16 + struct.pack("<I", 1)
    fmtid = bytes.fromhex("e0859ff2f94f1068ab9108002b27b3d9")
    sec_off = len(head) + 20
    entries, values, voff = [], [], 8 + 8 * len(props)
    for pid, v in props.items():
        entries.append(struct.pack("<II", pid, voff))
        if isinstance(v, int):
            values.append(struct.pack("<Ii", 3, v))  # VT_I4
            voff += 8
        else:
            sb = v.encode() + b"\x00"
            pad = (-len(sb)) % 4
            values.append(struct.pack("<II", 30, len(sb)) + sb + b"\x00" * pad)
            voff += 8 + len(sb) + pad
    body = b"".join(entries) + b"".join(values)
    section = struct.pack("<II", 8 + len(body), len(props)) + body
    return head + fmtid + struct.pack("<I", sec_off) + section


def _cfb_entry(name: str, etype: int, start: int, size: int, clsid: bytes = b"\x00" * 16) -> bytes:
    nm = name.encode("utf-16-le")
    e = bytearray(128)
    e[: len(nm)] = nm
    e[64:66] = (len(nm) + 2).to_bytes(2, "little")
    e[66] = etype
    e[67] = 1
    e[80:96] = clsid
    e[116:120] = start.to_bytes(4, "little") if start >= 0 else b"\xfe\xff\xff\xff"
    e[120:128] = size.to_bytes(8, "little")
    return bytes(e)


def _cfb_hdr(first_dir: int, mini_cutoff: int, first_minifat: int) -> bytearray:
    import struct

    h = bytearray(512)
    h[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    h[24:26] = (0x3E).to_bytes(2, "little")
    h[26:28] = (3).to_bytes(2, "little")
    h[28:30] = b"\xfe\xff"
    h[30:32] = (9).to_bytes(2, "little")
    h[32:34] = (6).to_bytes(2, "little")
    h[44:48] = (1).to_bytes(4, "little")
    h[48:52] = first_dir.to_bytes(4, "little")
    h[56:60] = mini_cutoff.to_bytes(4, "little")
    h[60:64] = struct.pack("<I", first_minifat & 0xFFFFFFFF)
    h[64:68] = (0 if first_minifat == -2 else 1).to_bytes(4, "little")
    h[68:72] = struct.pack("<I", 0xFFFFFFFE)
    for i in range(109):
        h[76 + 4 * i : 80 + 4 * i] = struct.pack("<I", 0xFFFFFFFF)
    h[76:80] = (0).to_bytes(4, "little")
    return h


def _cfb_fatsec(entries: list) -> bytes:
    import struct

    s = bytearray(b"".join(struct.pack("<I", e & 0xFFFFFFFF) for e in entries))
    s += struct.pack("<I", 0xFFFFFFFF) * ((512 - len(s)) // 4)
    return bytes(s)


_CFB_CLSIDS = {
    "MSI": "000c1084-0000-0000-c000-000000000046",
    "MSP": "000c1086-0000-0000-c000-000000000046",
    None: "12345678-0000-0000-c000-000000000046",
}


def _clsid_bytes(clsid_hex: str) -> bytes:
    d1, d2, d3, rest = clsid_hex.split("-", 3)
    return (
        int(d1, 16).to_bytes(4, "little")
        + int(d2, 16).to_bytes(2, "little")
        + int(d3, 16).to_bytes(2, "little")
        + bytes.fromhex(rest.replace("-", ""))
    )


def _cfb_with_summary(props: Dict[int, object], clsid_hex: str, mini: bool) -> bytes:
    ps = _oleps_ps(props)
    assert len(ps) <= 512
    clsid = _clsid_bytes(clsid_hex)
    if not mini:
        header = _cfb_hdr(first_dir=1, mini_cutoff=0, first_minifat=-2)
        fat = _cfb_fatsec([-3, -2, -2])
        root = _cfb_entry("Root Entry", 5, -1, 0, clsid=clsid)
        summ = _cfb_entry("\x05SummaryInformation", 2, 2, len(ps))
        return bytes(header) + fat + (root + summ).ljust(512, b"\x00") + ps.ljust(512, b"\x00")
    n_mini = (len(ps) + 63) // 64
    header = _cfb_hdr(first_dir=1, mini_cutoff=4096, first_minifat=3)
    fat = _cfb_fatsec([-3, -2, -2, -2])
    root = _cfb_entry("Root Entry", 5, 2, n_mini * 64, clsid=clsid)
    summ = _cfb_entry("\x05SummaryInformation", 2, 0, len(ps))
    minifat = _cfb_fatsec(list(range(1, n_mini)) + [-2])
    return (
        bytes(header) + fat + (root + summ).ljust(512, b"\x00")
        + ps.ljust(512, b"\x00") + minifat
    )


def synth_ole_pages() -> Dict[str, list]:
    prop_ids = {"title": 2, "subject": 3, "author": 4, "revision_number": 9,
                "comments": 6}
    cols = {k: [] for k in (
        "url", "html", "e_clsid_type", "e_title", "e_subject", "e_author",
        "e_revision", "e_comments", "e_num_words",
    )}
    clsid_cycle = ["MSI", "MSP", None]
    for i in range(12):
        props: Dict[int, object] = {}
        expected = {}
        for j, (name, pid) in enumerate(sorted(prop_ids.items())):
            if (i + j) % 3 != 0:
                props[pid] = f"{name}-{i}"
                expected[name] = f"{name}-{i}"
        num_words = None
        if i % 4 == 0:
            props[15] = 1000 + i  # VT_I4 num_words — str()-coerced
            num_words = str(1000 + i)
        ctype = clsid_cycle[i % 3]
        blob = _cfb_with_summary(props, _CFB_CLSIDS[ctype], mini=i % 2 == 1)
        cols["url"].append(f"ole://doc{i}")
        cols["html"].append(blob)
        cols["e_clsid_type"].append(ctype)
        cols["e_title"].append(expected.get("title"))
        cols["e_subject"].append(expected.get("subject"))
        cols["e_author"].append(expected.get("author"))
        cols["e_revision"].append(expected.get("revision_number"))
        cols["e_comments"].append(expected.get("comments"))
        cols["e_num_words"].append(num_words)
    return cols


def synth_magic_pages() -> List[Tuple[str, bytes, str]]:
    """(url, bytes, expected_type) covering every branch of the magic
    classifier (`id_magic.py:56-214`, `id_hex.py:71-96`) with real
    codec output where a codec exists and hand-built headers otherwise.
    Expected labels are derived from the format specs at synth time —
    they are the oracle's ground truth, independent of the classifier."""
    import bz2 as _bz2
    import gzip as _gzip
    import io as _io
    import lzma as _lzma
    import tarfile as _tarfile
    import zipfile as _zipfile
    import zlib as _zlib

    def pad(b: bytes, k: int = 300) -> bytes:
        return b + b"\x00" * max(0, k - len(b))

    def mz(coff_addr: int, sig: bytes = b"PE\x00\x00", hdrs: bool = False) -> bytes:
        b = bytearray(pad(b"MZ", 0x400))
        b[0x3C:0x40] = coff_addr.to_bytes(4, "little")
        b[coff_addr : coff_addr + 4] = sig
        if hdrs:
            b[0x202:0x206] = b"HdrS"
        return bytes(b)

    def zipb() -> bytes:
        buf = _io.BytesIO()
        with _zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("a.txt", "hello")
        return buf.getvalue()

    def tarb() -> bytes:
        buf = _io.BytesIO()
        with _tarfile.open(fileobj=buf, mode="w") as tf:
            data = b"hello"
            info = _tarfile.TarInfo("a.txt")
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
        return buf.getvalue()

    def uimage() -> bytes:
        import struct

        hdr = struct.pack(
            ">IIIIIIIBBBB", 0x27051956, 0xDEAD, 1700000000, 4096, 0x8000, 0x8040,
            0xBEEF, 5, 2, 2, 1,
        ) + b"test-kernel".ljust(32, b"\x00")
        return pad(hdr, 128)

    z = zipb()
    pages = [
        ("f/elf.bin", pad(b"\x7fELF\x02\x01\x01"), "ELF"),
        ("f/prog.exe", mz(0x80), "PE"),
        ("f/old.exe", mz(0x80, sig=b"XX\x00\x00"), "DOS"),
        ("f/short.exe", b"MZ" + b"\x00" * 58 + (0x500).to_bytes(4, "little"), "Malformed PE"),
        ("f/vmlinuz", mz(0x80, hdrs=True), "Linux Kernel Image"),
        ("f/doc.msi", pad(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"), "OLE"),
        ("f/setup.cab", pad(b"MSCF\x00\x00"), "MSCAB"),
        ("f/inst.cab", pad(b"ISc(\x00"), "ISCAB"),
        ("f/data.gz", _gzip.compress(b"hello", mtime=0), "GZIP"),
        ("f/data.bz2", _bz2.compress(b"hello"), "BZIP2"),
        ("f/data.xz", _lzma.compress(b"hello"), "XZ"),
        ("f/data.tar", tarb(), "TAR"),
        ("f/arch.zip", z, "ZIP"),
        ("f/arch.zipx", z, "ZIP"),
        ("f/app.jar", z, "JAR"),
        ("f/app.war", z, "WAR"),
        ("f/app.ear", z, "EAR"),
        ("f/app.apk", z, "APK"),
        ("f/app.ipa", z, "IPA"),
        ("f/app.msix", z, "MSIX"),
        ("f/Hello.class", pad(b"\xca\xfe\xba\xbe\x00\x00\x00\x34"), "JAVACLASS"),
        ("f/fat.bin", pad(b"\xca\xfe\xba\xbe\x00\x00\x00\x02"), "MACHOFAT"),
        ("f/fat2.bin", pad(b"\xbe\xba\xfe\xca"), "MACHOFAT"),
        ("f/fat64.bin", pad(b"\xca\xfe\xba\xbf"), "MACHOFAT64"),
        ("f/fat64r.bin", pad(b"\xbf\xba\xfe\xca"), "MACHOFAT64"),
        ("f/efi.fat", pad(b"\x0e\xf1\xfa\xb9"), "EFIFAT"),
        ("f/m32.bin", pad(b"\xfe\xed\xfa\xce"), "MACHO32"),
        ("f/m32r.bin", pad(b"\xce\xfa\xed\xfe"), "MACHO32"),
        ("f/m64.bin", pad(b"\xfe\xed\xfa\xcf"), "MACHO64"),
        ("f/m64r.bin", pad(b"\xcf\xfa\xed\xfe"), "MACHO64"),
        ("f/mod.bc", pad(b"\xde\xc0\x17\x0b"), "LLVM_BITCODE"),
        ("f/mod.ll.bc", pad(b"BC\xc0\xde"), "LLVM_IR"),
        ("f/big.aout", pad(b"\x00\x02\x01\x07"), "A.OUT big"),
        ("f/little.aout", pad(b"\x0b\x01\x64\x00"), "A.OUT little"),
        ("f/obj.o", pad(b"\x4c\x01\x00\x00"), "COFF"),
        ("f/obj32.xcoff", pad(b"\x1d\x00"), "XCOFF32"),
        ("f/obj64.xcoff", pad(b"\xf7\x01"), "XCOFF64"),
        ("f/obj.ecoff", pad(b"\x83\x01"), "ECOFF"),
        ("f/lib.a", pad(b"!<arch>\n"), "AR_LIB"),
        ("f/lib.omf", pad(b"\xf0\x0d\x00\x00"), "OMF_LIB"),
        ("f/kernel.uimg", uimage(), "UIMAGE"),
        ("f/data.zlib", _zlib.compress(b"hello"), "ZLIB"),
        (
            "f/fw.hex",
            b":100000000C9434000C943E000C943E000C943E0082\n:00000001FF\n",
            "INTEL_HEX",
        ),
        (
            "f/fw.s19",
            b"S00F000068656C6C6F20776F726C6443\nS111000048656C6C6F20776F726C642E0A9D\nS5030002FA\n",
            "MOTOROLA_SREC",
        ),
        ("f/tie.hex", b"not hex at all\njust text\n", None),
        ("f/plain.txt", b"hello world, plain text", None),
        # extension/shebang family (`id_extension.py:14-59`)
        ("f/run.sh", b"echo hi", "SHELL"),
        ("f/mod.py", b"print(1)", "PYTHON"),
        ("f/app.js", b"var x = 1;", "JAVASCRIPT"),
        ("f/style.css", b"body {}", "CSS"),
        ("f/idx.html", b"plain words here", "HTML"),
        ("f/page.bin", b"<!DOCTYPE html><html></html>", "HTML"),
        ("f/tool", b"#!/usr/bin/env python3\nprint(1)", "PYTHON"),
        # reference quirk: 'sh' substring matches bash/zsh shebangs first
        ("f/tool2", b"#!/bin/zsh\necho hi", "SHELL"),
        ("f/tool3", b"#!/usr/bin/ruby\nputs 1", "SHEBANG"),
        ("f/legacy.pl", b"print 1;", "PERL_OR_PROLOG"),
    ]
    return pages
def fixture_dir() -> str:
    return os.path.join(
        tempfile.gettempdir(), f"surfactant_spark_fixtures_{FIXTURE_VERSION}"
    )


def _write_parquet(path: str, columns: Dict[str, list]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table(columns), path)


def _nodes_columns(rows: List[NodeRow]) -> Dict[str, list]:
    from .functions.paths import win_norm

    return {
        "uuid": [r[0] for r in rows],
        "fileName": [r[1] for r in rows],
        "installPath": [r[2] for r in rows],
        # pre-folded keys for the Windows-family oracle join (the Spark
        # side folds with win_norm_paths_udf at runtime)
        "installPath_norm": [[win_norm(p) for p in r[2]] for r in rows],
        "metadata_json": [json.dumps(r[3]) for r in rows],
    }


def _probe_columns(rows: List[tuple]) -> Dict[str, list]:
    return {
        "uuid": [r[0] for r in rows],
        "fname": [r[1] for r in rows],
        "probe_path": [r[2] for r in rows],
    }


def stage_link_fixtures() -> Dict[str, str]:
    """Write the fixture parquets once (idempotent, marker-guarded);
    returns {name: path}. Called by both the Spark queries and
    oracle_sql() so either side can run first."""
    final = fixture_dir()
    names = [
        "elf_nodes", "elf_probes", "pe_nodes", "pe_probes",
        "dotnet_nodes", "dotnet_probes", "java_nodes", "java_symbols",
        "magic_pages", "merge_base", "merge_inc", "edges_raw", "uuid_map",
        "audit_rows", "cp_software", "cp_map", "cp_edges",
        "kg_nodes_fix", "norm_paths", "macho_pages", "ole_pages",
        "web_pages", "raw_urls", "boiler_pages", "line_pages",
        "pii_pages", "community_edges", "anchor_pages", "robots_pages",
        "ip_blocks", "canonical_pages", "sitemap_pages", "trusted_hosts",
        "media_blobs",
    ]
    final_paths = {n: os.path.join(final, f"{n}.parquet") for n in names}
    if os.path.exists(os.path.join(final, "_OK")):
        return final_paths
    from .operators.link import dotnet_probe_rows, elf_probe_rows, pe_probe_rows

    # stage into a private temp dir, then rename into place: a
    # concurrent stager either wins the rename or discards its copy —
    # readers never observe partially written parquet
    d = tempfile.mkdtemp(prefix=f"sfx-stage-{FIXTURE_VERSION}-")
    paths = {n: os.path.join(d, f"{n}.parquet") for n in names}
    marker = os.path.join(d, "_OK")

    def probes_of(rows: List[NodeRow], row_fn) -> List[tuple]:
        out: List[tuple] = []
        for uuid, fnames, ipaths, md in rows:
            out.extend(row_fn(uuid, ipaths, md))
        return out

    elf = synth_elf_nodes()
    pe = synth_pe_nodes()
    dn = synth_dotnet_nodes()
    jv = synth_java_nodes()
    _write_parquet(paths["elf_nodes"], _nodes_columns(elf))
    _write_parquet(paths["elf_probes"], _probe_columns(probes_of(elf, elf_probe_rows)))
    _write_parquet(paths["pe_nodes"], _nodes_columns(pe))
    _write_parquet(paths["pe_probes"], _probe_columns(probes_of(pe, pe_probe_rows)))
    _write_parquet(paths["dotnet_nodes"], _nodes_columns(dn))
    _write_parquet(
        paths["dotnet_probes"], _probe_columns(probes_of(dn, dotnet_probe_rows))
    )
    _write_parquet(paths["java_nodes"], _nodes_columns(jv))
    symbols: List[tuple] = []
    for uuid, _fn, _ip, md in jv:
        for info in (md.get("javaClasses") or {}).values():
            for s in info.get("javaExports") or []:
                symbols.append((uuid, s, "export"))
            for s in info.get("javaImports") or []:
                symbols.append((uuid, s, "import"))
    _write_parquet(
        paths["java_symbols"],
        {
            "uuid": [s[0] for s in symbols],
            "symbol": [s[1] for s in symbols],
            "kind": [s[2] for s in symbols],
        },
    )
    mb, mi, er, audit = synth_merge_tables()

    def hash_cols(rows):
        return {
            "uuid": [r[0] for r in rows],
            "sha256": [r[1] for r in rows],
            "md5": [r[2] for r in rows],
            "sha1": [r[3] for r in rows],
        }

    _write_parquet(paths["merge_base"], hash_cols(mb))
    _write_parquet(paths["merge_inc"], hash_cols(mi))
    _write_parquet(
        paths["edges_raw"],
        {
            "subj_uuid": [r[0] for r in er],
            "pred": [r[1] for r in er],
            "obj_uuid": [r[2] for r in er],
        },
    )
    # a simple deterministic rewrite map for the U2 query (independent
    # of the merge cascade, which derives its own map)
    _write_parquet(
        paths["uuid_map"],
        {
            "old_uuid": [f"i-{i:02d}" for i in range(0, 40, 5)],
            "new_uuid": [f"b-{i:02d}" for i in range(0, 40, 5)],
        },
    )
    _write_parquet(
        paths["audit_rows"],
        {
            "sha256": [r[0] for r in audit],
            "size": [r[1] for r in audit],
            "md5": [r[2] for r in audit],
        },
    )
    cps, cpm, cpe = synth_cp_tables()
    _write_parquet(
        paths["cp_software"],
        {
            "uuid": [r[0] for r in cps],
            "name": [r[1] for r in cps],
            "version": [r[2] for r in cps],
            "sha1": [r[3] for r in cps],
            "sha256": [r[4] for r in cps],
            "md5": [r[5] for r in cps],
            "fileName": [r[6] for r in cps],
            "containerPath": [r[7] for r in cps],
        },
    )
    _write_parquet(
        paths["cp_map"],
        {"old_uuid": [r[0] for r in cpm], "new_uuid": [r[1] for r in cpm]},
    )
    _write_parquet(
        paths["cp_edges"],
        {
            "subj_uuid": [r[0] for r in cpe],
            "pred": [r[1] for r in cpe],
            "obj_uuid": [r[2] for r in cpe],
        },
    )
    # CyTRICS-shaped JSON-lines export (S6 reader oracle): nodes +
    # edges dirs, one JSONL file each, derived from the cp tables
    os.makedirs(os.path.join(d, "cytrics", "nodes"))
    os.makedirs(os.path.join(d, "cytrics", "edges"))
    with open(os.path.join(d, "cytrics", "nodes", "part-0.json"), "w", encoding="utf-8") as f:
        for i in range(60):
            f.write(
                json.dumps(
                    {
                        "UUID": uuid36(i),
                        "sha256": f"cafe{i:04d}" + "0" * 56,
                        "fileName": [f"file{i}.so"],
                        "installPath": [f"/usr/lib/file{i}.so"],
                        "n_sources": 1 + i % 4,
                    },
                    sort_keys=True,
                )
                + "\n"
            )
    with open(os.path.join(d, "cytrics", "edges", "part-0.json"), "w", encoding="utf-8") as f:
        for subj, pred, obj in cpe:
            f.write(
                json.dumps(
                    {"xUUID": subj, "yUUID": obj, "relationship": pred},
                    sort_keys=True,
                )
                + "\n"
            )
    _write_parquet(paths["kg_nodes_fix"], synth_kg_nodes())
    _write_parquet(paths["norm_paths"], synth_norm_paths())
    _write_parquet(paths["macho_pages"], synth_macho_pages())
    _write_parquet(paths["ole_pages"], synth_ole_pages())
    _write_parquet(paths["web_pages"], synth_web_pages())
    _write_parquet(paths["raw_urls"], synth_raw_urls())
    _write_parquet(paths["boiler_pages"], synth_boiler_pages())
    _write_parquet(paths["line_pages"], synth_line_pages())
    _write_parquet(paths["pii_pages"], synth_pii_pages())
    _write_parquet(paths["community_edges"], synth_community_edges())
    _write_parquet(paths["anchor_pages"], synth_anchor_pages())
    _write_parquet(paths["robots_pages"], synth_robots())
    _write_parquet(paths["ip_blocks"], synth_ip_blocks())
    _write_parquet(paths["canonical_pages"], synth_canonical_pages())
    _write_parquet(paths["sitemap_pages"], synth_sitemaps())
    _write_parquet(paths["trusted_hosts"], synth_trusted_hosts())
    _write_parquet(paths["media_blobs"], synth_media_blobs())
    magic = synth_magic_pages()
    _write_parquet(
        paths["magic_pages"],
        {
            "url": [m[0] for m in magic],
            "html": [m[1] for m in magic],
            "expected": [m[2] for m in magic],
        },
    )
    with open(marker, "w", encoding="utf-8") as f:
        f.write(FIXTURE_VERSION)
    try:
        os.rename(d, final)
    except OSError:
        # another stager won the race; its (identical, deterministic)
        # copy is already in place
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    return final_paths
