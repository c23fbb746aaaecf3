"""Relationship-establishment P/R contract — the reference's
`tests/relationships/test_elf.py`, `test_pe.py`, `test_dotnet.py`,
`test_java.py` fixtures ported verbatim to DataFrame form; every
expected triple asserted exactly."""

import json

import pytest

from surfactant_spark.functions.elf import elf_probe_pairs, elf_search_dirs
from surfactant_spark.operators.link import link_dotnet, link_elf, link_java, link_pe
from surfactant_spark.schema import SOFTWARE_NODES


def _nodes(spark, rows):
    return spark.createDataFrame(
        [(u, fn, ip, json.dumps(md)) for (u, fn, ip, md) in rows], schema=SOFTWARE_NODES
    )


def _triples(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


# --- ELF (`/root/reference/tests/relationships/test_elf.py:9-115`) -----------
ELF_RUNPATH = ["$ORIGIN:$ORIGIN/../lib:/usr/lib/x86_64-linux-gnu"]
ELF_ROWS = [
    ("abc", ["helics_broker"], ["/usr/local/bin/helics_broker"],
     {"elfDependencies": ["libhelicscpp-apps.so"], "elfRpath": [], "elfRunpath": ELF_RUNPATH,
      "elfDynamicFlags1": [{"DF_1_ORIGIN": False, "DF_1_NODEFLIB": False}]}),
    ("xyz", ["libhelicscpp-apps.so"], ["/usr/local/lib/libhelicscpp-apps.so"],
     {"elfDependencies": ["libzmq.so"], "elfRpath": [], "elfRunpath": ELF_RUNPATH}),
    ("def", ["libzmq.so"], ["/lib/libzmq.so", "/customlib/abspath/libzmq.so"],
     {"elfDependencies": [], "elfRpath": [], "elfRunpath": []}),
    ("hij", ["libcomm.so"], ["/customlib/relpath/misc/libcomm.so"],
     {"elfDependencies": ["/customlib/abspath/libzmq.so"], "elfRpath": [], "elfRunpath": []}),
    ("klm", ["libcomm-cpp.so"], ["/customlib/relpath/libcomm-cpp.so"],
     {"elfDependencies": ["misc/libcomm.so"], "elfRpath": [], "elfRunpath": []}),
]


def test_elf_link_all_cases(spark):
    got = _triples(link_elf(_nodes(spark, ELF_ROWS)))
    # relative path (klm->hij), absolute path (hij->def),
    # default system path /lib (xyz->def), $ORIGIN expansion (abc->xyz)
    assert got == {
        ("klm", "Uses", "hij"),
        ("hij", "Uses", "def"),
        ("xyz", "Uses", "def"),
        ("abc", "Uses", "xyz"),
    }


def test_elf_probe_pairs_semantics():
    # absolute dep -> single probe
    assert elf_probe_pairs(["/x/bin/a"], "/lib/libz.so") == [("libz.so", "/lib/libz.so")]
    # relative dep rebased on each installPath parent + normalized
    assert elf_probe_pairs(["/a/b/app"], "misc/../lib/l.so") == [("l.so", "/a/b/lib/l.so")]
    # bare dep -> default dirs unless NODEFLIB
    pairs = elf_probe_pairs(["/a/app"], "libz.so")
    assert ("libz.so", "/lib/libz.so") in pairs and ("libz.so", "/usr/lib64/libz.so") in pairs
    assert elf_probe_pairs(["/a/app"], "libz.so", nodeflib=True) == []


def test_elf_search_dirs_dst_and_rpath_priority():
    # DT_RPATH only honored when no DT_RUNPATH (`elf_relationship.py:137-145`)
    dirs_rp = elf_search_dirs(["/opt/app/bin/x"], ["$ORIGIN/../lib"], None, True)
    assert dirs_rp == ["/opt/app/lib"]
    dirs_both = elf_search_dirs(["/opt/app/bin/x"], ["$ORIGIN/rp"], ["$ORIGIN/run"], True)
    assert dirs_both == ["/opt/app/bin/run"]
    # $LIB expands to lib and lib64; tokenless entries are discarded
    dirs_lib = elf_search_dirs(["/u/x"], None, ["$ORIGIN/$LIB:/plain/dir"], True)
    assert dirs_lib == ["/u/lib", "/u/lib64"]
    # $PLATFORM discards
    assert elf_search_dirs(["/u/x"], None, ["$PLATFORM/a"], True) == []


# --- PE (`/root/reference/tests/relationships/test_pe.py:9-34`) --------------
PE_ROWS = [
    ("application", ["application.exe"], ["C:\\application.exe"],
     {"peImport": ["library.dll"]}),
    ("library", ["library.dll"], ["C:\\library.dll"], {}),
]


def test_pe_same_directory(spark):
    assert _triples(link_pe(_nodes(spark, PE_ROWS))) == {("application", "Uses", "library")}


def test_pe_case_insensitive(spark):
    rows = [
        ("app", ["a.exe"], ["C:\\Dir\\a.exe"], {"peImport": ["LIBRARY.DLL"]}),
        ("lib", ["library.dll"], ["c:\\dir\\library.dll"], {}),
    ]
    assert _triples(link_pe(_nodes(spark, rows))) == {("app", "Uses", "lib")}


# --- .NET (`/root/reference/tests/relationships/test_dotnet.py:9-75`) --------
DOTNET_BASE = [
    ("samedirlib", ["samedirlib.dll"], ["C:\\samedirlib.dll"], {}),
    ("subdirlib", ["subdirlib.dll"], ["C:\\subdirlib\\subdirlib.dll"], {}),
    ("culturelib", ["culturelib.dll"], ["C:\\culture\\culturelib.dll"], {}),
]


@pytest.mark.parametrize(
    "meta,expected",
    [
        ({"dotnetAssemblyRef": [{"Name": "samedirlib"}]}, {("application", "Uses", "samedirlib")}),
        ({"dotnetAssemblyRef": [{"Name": "subdirlib"}]}, {("application", "Uses", "subdirlib")}),
        (
            {"dotnetAssemblyRef": [{"Name": "culturelib", "Culture": "culture"}]},
            {("application", "Uses", "culturelib")},
        ),
    ],
)
def test_dotnet_probing(spark, meta, expected):
    rows = [("application", ["application"], ["C:\\application"], meta)] + DOTNET_BASE
    assert _triples(link_dotnet(_nodes(spark, rows))) == expected


def test_dotnet_implmap_native_combinations(spark):
    rows = [
        ("app", ["app"], ["C:\\app"],
         {"dotnetAssemblyRef": [], "dotnetImplMap": [{"Name": "native"}]}),
        ("nat", ["libnative.so"], ["C:\\libnative.so"], {}),
    ]
    assert _triples(link_dotnet(_nodes(spark, rows))) == {("app", "Uses", "nat")}


# --- Java (`/root/reference/tests/relationships/test_java.py:9-43`) ----------
def test_java_import_export(spark):
    rows = [
        ("supplier", ["supplier"], ["supplier"],
         {"javaClasses": {"dummy": {"javaExports": ["someFunc():void"], "javaImports": []}}}),
        ("consumer", ["consumer"], ["consumer"],
         {"javaClasses": {"dummy": {"javaExports": [], "javaImports": ["someFunc():void"]}}}),
    ]
    assert _triples(link_java(_nodes(spark, rows))) == {("consumer", "Uses", "supplier")}


def test_java_no_self_edge(spark):
    rows = [
        ("s", ["s"], ["s"],
         {"javaClasses": {"c": {"javaExports": ["f():void"], "javaImports": ["f():void"]}}}),
    ]
    assert _triples(link_java(_nodes(spark, rows))) == set()
