"""S3 specimen-config source, A3 stat counters, cli-edit analogue."""

import json

import pytest

from surfactant_spark.operators.specimen import parse_specimen_config, scan_from_config


def test_parse_bare_dir_and_file():
    # DIR: trailing slash -> installPrefix = the dir itself
    [e] = parse_specimen_config("src0/")
    assert e == {"extractPaths": ["src0/"], "installPrefix": "src0"}
    # FILE: installPrefix = parent (`generate_utils.py:76-82`)
    [e] = parse_specimen_config("src0/doc1.bin")
    assert e == {"extractPaths": ["src0/doc1.bin"], "installPrefix": "src0"}
    # FILE with no parent -> empty prefix (`generate_utils.py:87-90`)
    [e] = parse_specimen_config("doc1.bin")
    assert e["installPrefix"] == ""


def test_parse_json_config_validation(tmp_path):
    cfg = [{"extractPaths": ["a/"], "installPrefix": "/opt"}, {"extractPaths": ["b/"]}]
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(cfg))
    assert parse_specimen_config(str(p)) == cfg
    assert parse_specimen_config(json.dumps(cfg)) == cfg
    with pytest.raises(ValueError, match="missing extractPaths"):
        parse_specimen_config(json.dumps([{"archive": "x"}]))
    bad = tmp_path / "bad.json"
    bad.write_text("{nope")
    with pytest.raises(ValueError, match="invalid JSON"):
        parse_specimen_config(str(bad))
    with pytest.raises(ValueError, match="does not exist"):
        parse_specimen_config(str(tmp_path / "missing.json"))


def test_scan_from_config_stamps_prefixes(spark):
    pages = spark.createDataFrame(
        [("a/1", "x"), ("a/2", "y"), ("b/1", "z"), ("c/1", "w")],
        "url string, text string",
    )
    entries = [
        {"extractPaths": ["a/"], "installPrefix": "/opt", "archive": "a.tgz"},
        {"extractPaths": ["b/", "c/"], "installPrefix": "/data"},
    ]
    rows = scan_from_config(pages, entries).collect()
    got = {(r.url, r.install_prefix, r.archive_url) for r in rows}
    assert got == {
        ("a/1", "/opt", "a.tgz"), ("a/2", "/opt", "a.tgz"),
        ("b/1", "/data", None), ("c/1", "/data", None),
    }
    # empty config -> empty result with the stamped schema
    empty = scan_from_config(pages, [])
    assert empty.count() == 0 and "install_prefix" in empty.columns


def test_stat_counters_match_reference_rule(spark):
    from surfactant_spark.operators.statcmd import stat_counters

    rows = [
        (json.dumps({"elfIsLib": True, "elfIsExe": False}),),
        (json.dumps({"elfIsExe": True}),),
        (json.dumps({"peIsExe": True, "peIsDll": False, "peIsClr": True}),),
        (json.dumps({"peIsExe": False, "peIsDll": True, "peIsClr": True}),),
        (json.dumps({"peIsDll": True}),),
        (json.dumps({}),),
        (None,),
    ]
    df = spark.createDataFrame(rows, "metadata_json string")
    r = stat_counters(df).collect()[0]
    assert (r.elf_is_lib, r.elf_is_exe) == (1, 1)
    assert (r.pe_is_exe, r.pe_is_dll) == (1, 2)
    # CLR split: clr+exe -> clr_exe, clr+not-exe -> clr_dll (`stat.py:31-36`)
    assert (r.clr_exe, r.clr_dll) == (1, 1)


def test_edit_nodes(spark):
    import datetime

    from surfactant_spark.operators.expand import edit_nodes

    ts = datetime.datetime(2024, 1, 1)
    nodes = spark.createDataFrame(
        [
            ("c1", "s1", ["libfoo"], ["u/1"], 2, ts),
            ("c2", "s2", ["other"], ["u/2"], 1, ts),
        ],
        "canon_uuid string, sha256 string, names array<string>, "
        "aliases array<string>, n_sources long, first_seen timestamp",
    )
    out = edit_nodes(
        nodes,
        set_fields={"sha256": "patched"},
        append_fields={"aliases": ["u/3", "u/1"]},
        uuid="c1",
    ).collect()
    by = {r.canon_uuid: r for r in out}
    assert by["c1"].sha256 == "patched"
    assert by["c1"].aliases == ["u/1", "u/3"]  # appended, deduped
    assert by["c2"].sha256 == "s2" and by["c2"].aliases == ["u/2"]  # untouched


def test_pattern_db_versioned_round_trip(spark, tmp_path):
    """S11 hash-pinning: the db_version stamped on mentions identifies
    the exact DB snapshot; same bytes -> same pin, changed DB -> new pin."""
    from surfactant_spark.operators.patterndb import (
        PATTERN_DB,
        load_pattern_db,
        pattern_mentions,
        save_pattern_db,
    )

    p = str(tmp_path / "patterns.json")
    v1 = save_pattern_db(p)
    dim, loaded_v = load_pattern_db(spark, p)
    assert loaded_v == v1
    assert dim.count() == len(PATTERN_DB)

    docs = spark.createDataFrame(
        [(1, "the spark window is fast"), (2, "no match here")],
        "doc_id long, text string",
    )
    got = pattern_mentions(docs, dim, db_version=loaded_v).collect()
    assert {(r.doc_id, r.library, r.db_version) for r in got} == {
        (1, "spark-engine", v1)
    }
    assert got[0].match_token == "window"

    # a changed DB pins differently
    v2 = save_pattern_db(p, PATTERN_DB + [("extra", "never matches x{40}", "9.9")])
    assert v2 != v1


def test_pattern_prefilter_sound_and_auto_disabled(spark):
    """The literal-prefix prefilter must never change results (sound by
    construction) and must disable itself when a pattern has no literal
    prefix (starts with a metacharacter)."""
    from surfactant_spark.operators.patterndb import (
        PATTERN_DB,
        _literal_prefix,
        pattern_dim,
        pattern_mentions,
    )

    assert _literal_prefix("spark (window|stream)") == "spark "
    assert _literal_prefix("(a|b) tail") == ""
    assert _literal_prefix("plain literal") == "plain literal"

    docs = spark.createDataFrame(
        [(1, "uses spark window ops"), (2, "nothing relevant"), (3, "hash join heavy")],
        "doc_id long, text string",
    )
    dim = pattern_dim(spark)
    on = {(r.doc_id, r.library) for r in pattern_mentions(docs, dim).collect()}
    off = {
        (r.doc_id, r.library)
        for r in pattern_mentions(docs, dim, prefilter=False).collect()
    }
    assert on == off == {(1, "spark-engine"), (3, "hash-ops")}

    # a prefix-less pattern forces the prefilter off: results identical
    dim2 = pattern_dim(spark, PATTERN_DB + [("anchored", "(spark|hash) join", "1.0")])
    got = {(r.doc_id, r.library) for r in pattern_mentions(docs, dim2).collect()}
    assert (3, "anchored") in got and (1, "spark-engine") in got
