"""The python -m surfactant_spark command surface: generate, merge,
stat, find, sessionize — each driven in-process against staged parquet."""

import json
import os

import pytest

from surfactant_spark.__main__ import main


@pytest.fixture
def staged(spark, spark_pages, spark_alias, tmp_path):
    pages = str(tmp_path / "pages")
    alias = str(tmp_path / "alias")
    spark_pages.write.parquet(pages)
    spark_alias.write.parquet(alias)
    return {"pages": pages, "alias": alias, "tmp": tmp_path}


def test_generate_and_find(staged, capsys, spark):
    out = str(staged["tmp"] / "kg")
    rc = main(
        ["--master", "local[4]", "generate", "--pages", staged["pages"],
         "--alias", staged["alias"], "--out", out]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["nodes"] > 0 and info["edges"] > 0
    assert os.path.exists(os.path.join(out, "_edges_OK"))

    rc = main(["--master", "local[4]", "find", "--nodes", os.path.join(out, "nodes"),
               "--min-sources", "1"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == info["nodes"]
    assert "canon_uuid" in lines[0]

    # resume: a second generate run resumes every stage
    rc = main(
        ["--master", "local[4]", "generate", "--pages", staged["pages"],
         "--alias", staged["alias"], "--out", out]
    )
    info2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(info2["stages_resumed"]) >= {"extract", "nodes", "edges"}
    assert info2["edges"] == info["edges"]


def test_stat_command(capsys):
    from surfactant_spark.fixtures import stage_link_fixtures

    p = stage_link_fixtures()
    rc = main(["--master", "local[4]", "stat", "--nodes", p["pe_nodes"]])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Number of PE Executables: 80 with 16 using .NET/CLR" in out
    assert "Number of DLLs: 160 with 32 using .NET/CLR" in out


def test_merge_command(spark, tmp_path, capsys):
    from surfactant_spark.fixtures import stage_link_fixtures

    p = stage_link_fixtures()
    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    spark.read.parquet(p["merge_base"]).write.parquet(os.path.join(g1, "nodes"))
    spark.read.parquet(p["edges_raw"]).limit(0).write.parquet(os.path.join(g1, "edges"))
    spark.read.parquet(p["merge_inc"]).write.parquet(os.path.join(g2, "nodes"))
    spark.read.parquet(p["edges_raw"]).write.parquet(os.path.join(g2, "edges"))
    out = str(tmp_path / "merged")
    rc = main(["--master", "local[4]", "merge", g1, g2, "--out", out, "--add-system"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["system"] is not None
    assert info["nodes"] > 0 and info["roots"] > 0
    assert os.path.exists(os.path.join(out, "roots"))


def test_sessionize_command(spark, tmp_path, capsys):
    import datetime

    ev = spark.createDataFrame(
        [
            (0, datetime.datetime(2024, 1, 1, 0, 0), 1, "e", 1.0, None),
            (1, datetime.datetime(2024, 1, 1, 2, 0), 1, "e", 2.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "events")
    ev.coalesce(1).write.parquet(src)
    out = str(tmp_path / "sess")
    rc = main(["--master", "local[4]", "sessionize", "--events", src, "--out", out])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["closed_sessions"] == 1  # the 2h gap closed session one


def test_add_and_edit_commands(spark, tmp_path, capsys):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    nodes = spark.createDataFrame(
        [("c1", "s1", ["libfoo"], ["u/1"], 2, ts)],
        "canon_uuid string, sha256 string, names array<string>, "
        "aliases array<string>, n_sources long, first_seen timestamp",
    )
    src = str(tmp_path / "nodes")
    nodes.write.parquet(src)

    edited = str(tmp_path / "edited")
    rc = main(
        ["--master", "local[4]", "edit", "--nodes", src, "--out", edited,
         "--uuid", "c1", "--set", '{"sha256": "patched"}',
         "--append", '{"aliases": ["u/9"]}']
    )
    assert rc == 0
    row = spark.read.parquet(edited).collect()[0]
    assert row.sha256 == "patched" and "u/9" in row.aliases

    edges = spark.createDataFrame(
        [("a", "Uses", "b")], "subj_uuid string, pred string, obj_uuid string"
    )
    esrc = str(tmp_path / "edges")
    edges.write.parquet(esrc)
    eout = str(tmp_path / "edges2")
    rc = main(
        ["--master", "local[4]", "add", "--edges", esrc, "--out", eout,
         "--relationship", "a", "Contains", "c"]
    )
    assert rc == 0
    got = {(r.subj_uuid, r.pred, r.obj_uuid) for r in spark.read.parquet(eout).collect()}
    assert got == {("a", "Uses", "b"), ("a", "Contains", "c")}


def test_generate_from_warc(spark, spark_alias, tmp_path, capsys):
    from tests.test_warc import _member

    (tmp_path / "crawl" ).mkdir()
    (tmp_path / "crawl" / "m.warc").write_bytes(_member())
    alias = str(tmp_path / "alias")
    spark_alias.write.parquet(alias)
    out = str(tmp_path / "kg")
    rc = main(
        ["--master", "local[4]", "generate", "--format", "warc",
         "--pages", str(tmp_path / "crawl"), "--alias", alias, "--out", out]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["nodes"] == 2  # two response records -> two content nodes


@pytest.fixture
def isolated_config(tmp_path, monkeypatch):
    """Point the default ConfigManager (and its session data dir) at a
    fresh tmp dir so config/load/save tests never share state."""
    from surfactant_spark.config import ConfigManager

    monkeypatch.setenv("SPARK_GRAFT_CONFIG_DIR", str(tmp_path / "cfg"))
    ConfigManager.delete_instance("surfactant_spark")
    yield
    ConfigManager.delete_instance("surfactant_spark")


def test_config_command_get_set_round_trip(isolated_config, capsys):
    """`config KEY VALUE` then `config KEY` (`cmd/config.py:8-51`):
    true/false conversion, list for multiple values, not-found text."""
    assert main(["config", "core.output_format", "cytrics"]) == 0
    assert "set to 'cytrics'" in capsys.readouterr().out
    assert main(["config", "core.output_format"]) == 0
    assert "core.output_format = cytrics" in capsys.readouterr().out

    main(["config", "core.recorded_institution", "LLNL", "other"])
    capsys.readouterr()
    main(["config", "core.recorded_institution"])
    assert "['LLNL', 'other']" in capsys.readouterr().out

    main(["config", "core.flag", "True"])
    capsys.readouterr()
    main(["config", "core.flag"])
    assert "core.flag = True" in capsys.readouterr().out

    assert main(["config", "core.missing"]) == 0
    assert "not found" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="section.option"):
        main(["config", "nodots", "v"])


def test_cli_load_find_save_workflow(isolated_config, spark, tmp_path, capsys):
    """load -> find (against the loaded working set) -> save: the
    reference's session workflow (`cmd/cli.py` handle_cli_load/save)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    nodes = spark.createDataFrame(
        [("c1", "s1", ["libfoo"], ["u/1"], 2, ts), ("c2", "s2", ["bar"], ["u/2"], 1, ts)],
        "canon_uuid string, sha256 string, names array<string>, "
        "aliases array<string>, n_sources long, first_seen timestamp",
    )
    edges = spark.createDataFrame(
        [("c1", "Uses", "c2")], "subj_uuid string, pred string, obj_uuid string"
    )
    g = tmp_path / "graph"
    nodes.write.parquet(str(g / "nodes"))
    edges.write.parquet(str(g / "edges"))

    assert main(["--master", "local[4]", "load", str(g)]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["loaded"]["nodes"].endswith("graph/nodes")

    # find with no --nodes searches the loaded set
    assert main(["--master", "local[4]", "find", "--sha256", "s1"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1 and "c1" in lines[0]

    out = str(tmp_path / "saved")
    assert main(["--master", "local[4]", "save", "--out", out]) == 0
    capsys.readouterr()
    assert spark.read.parquet(os.path.join(out, "nodes")).count() == 2

    # cytrics round trip: save as JSON lines, load it back materialized
    outj = str(tmp_path / "cyt")
    assert main(["--master", "local[4]", "save", "--out", outj, "--format", "cytrics"]) == 0
    capsys.readouterr()
    assert main(["--master", "local[4]", "load", outj, "--format", "cytrics"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "session_tables" in info["loaded"]["nodes"]
    assert spark.read.parquet(info["loaded"]["nodes"]).count() == 2

    # guard: saving onto the loaded path must refuse
    with pytest.raises(SystemExit, match="cannot overwrite"):
        main(["--master", "local[4]", "save", "--out", info["loaded"]["nodes"]])


def test_add_refuses_in_place_overwrite(spark, tmp_path):
    edges = spark.createDataFrame(
        [("a", "Uses", "b")], "subj_uuid string, pred string, obj_uuid string"
    )
    esrc = str(tmp_path / "edges")
    edges.write.parquet(esrc)
    with pytest.raises(SystemExit, match="cannot overwrite"):
        main(["--master", "local[4]", "add", "--edges", esrc, "--out", esrc,
              "--relationship", "a", "Contains", "c"])


def test_plugin_list_enable_disable(isolated_config, spark, capsys):
    """`plugin list/enable/disable` (`cmd/plugin.py:16-93`): the
    disabled list persists in core.disable_plugins and actually changes
    what active_registry() classifies/extracts."""
    from surfactant_spark.plugin import active_registry
    from tests.test_expand_plugin import _pages_df

    assert main(["plugin", "list"]) == 0
    out = capsys.readouterr().out
    assert "CLASSIFY HOOKS" in out and "magic" in out and "html" in out
    assert "There are no disabled plugins." in out

    assert main(["plugin", "disable", "magic", "html"]) == 0
    assert "Updated blocked plugins: ['magic', 'html']" in capsys.readouterr().out
    assert main(["plugin", "list"]) == 0
    out = capsys.readouterr().out
    enabled, disabled_sec = out.split("DISABLED PLUGINS")
    assert "magic" not in enabled and "html" not in enabled
    assert "magic" in disabled_sec and "html" in disabled_sec

    # observed behavior change: without the magic classifier an ELF
    # prefix falls through to the text fallback; without the html
    # extractor no title/mentions are emitted
    pages = _pages_df(
        spark, [("u1", b"<html><title>lib-a</title></html>", None, "en"),
                ("u2", b"\x7fELF\x02\x01", None, None)]
    )
    reg = active_registry()
    assert reg.classify_value(b"\x7fELF") == "text"
    ext = {r.url: json.loads(r.metadata_json) for r in reg.run_extract(pages).collect()}
    assert ext["u1"] == {} and ext["u2"] == {}

    # re-enable restores the defaults
    assert main(["plugin", "enable", "magic", "html"]) == 0
    capsys.readouterr()
    reg = active_registry()
    assert reg.classify_value(b"\x7fELF") == "elf"
    ext = {r.url: json.loads(r.metadata_json) for r in reg.run_extract(pages).collect()}
    assert ext["u1"]["title"] == "lib-a"

    # unknown names warn but do not fail (reference is permissive too)
    assert main(["plugin", "disable", "nosuchhook"]) == 0
    captured = capsys.readouterr()
    assert "not a registered hook" in captured.err
    main(["plugin", "enable", "nosuchhook"])
    capsys.readouterr()

    with pytest.raises(SystemExit, match="plugin name"):
        main(["plugin", "disable"])


def test_extract_command_respects_disabled_plugins(isolated_config, spark, tmp_path, capsys):
    """The registry-driven `extract` command is the product path that
    `plugin disable` governs: disabling the html extractor observably
    changes the command's output table (not just `plugin list`)."""
    from tests.test_expand_plugin import _pages_df

    pages = _pages_df(spark, [("u1", b"<html><title>lib-a</title></html>", None, "en")])
    src = str(tmp_path / "pages")
    pages.write.parquet(src)

    out1 = str(tmp_path / "x1")
    assert main(["--master", "local[4]", "extract", "--pages", src, "--out", out1]) == 0
    capsys.readouterr()
    got = {r.url: json.loads(r.metadata_json) for r in spark.read.parquet(out1).collect()}
    assert got["u1"]["title"] == "lib-a"

    assert main(["plugin", "disable", "html"]) == 0
    capsys.readouterr()
    out2 = str(tmp_path / "x2")
    assert main(["--master", "local[4]", "extract", "--pages", src, "--out", out2]) == 0
    capsys.readouterr()
    got2 = {r.url: json.loads(r.metadata_json) for r in spark.read.parquet(out2).collect()}
    assert got2["u1"] == {}

    main(["plugin", "enable", "html"])
    capsys.readouterr()


def test_create_config_roundtrip(spark, spark_pages, spark_alias, tmp_path, capsys):
    """create-config -> generate --specimen reproduces the direct-scan
    output (`cmd/createconfig.py:22-31` parity + F9 rebase)."""
    pages_p = str(tmp_path / "pages")
    alias_p = str(tmp_path / "alias")
    spark_pages.write.parquet(pages_p)
    spark_alias.write.parquet(alias_p)
    url0 = spark_pages.select("url").first()[0]
    root = url0.rsplit("/", 1)[0]

    cfg_path = str(tmp_path / "spec.json")
    rc = main(["--master", "local[4]", "create-config", root, "-o", cfg_path,
               "--install-prefix", "/opt/app", "--pages", pages_p])
    assert rc == 0
    capsys.readouterr()
    with open(cfg_path) as f:
        cfg = json.load(f)
    assert cfg == [{"extractPaths": [root], "installPrefix": "/opt/app"}]

    out = str(tmp_path / "kg")
    rc = main(["--master", "local[4]", "generate", "--pages", pages_p,
               "--alias", alias_p, "--out", out, "--specimen", cfg_path])
    assert rc == 0
    capsys.readouterr()

    # direct-scan oracle: the same work item applied straight through
    # the specimen operators must give the identical install-path map
    from surfactant_spark.operators.specimen import (
        install_paths_from_scan,
        scan_from_config,
    )

    direct = install_paths_from_scan(
        scan_from_config(spark.read.parquet(pages_p), cfg)
    )
    expect = {(r.url, r.install_path) for r in direct.select("url", "install_path").collect()}
    got = {
        (r.url, r.install_path)
        for r in spark.read.parquet(os.path.join(out, "install_paths")).collect()
    }
    assert got == expect and got

    # a prefix matching nothing is rejected (exists-validation analogue)
    with pytest.raises(SystemExit, match="no pages match"):
        main(["--master", "local[4]", "create-config", "zz://nope",
              "--pages", pages_p, "-o", str(tmp_path / "x.json")])


def test_find_limit_deterministic_and_noticed(spark, tmp_path, capsys):
    """A truncating --limit prints a DETERMINISTIC (uuid-ordered) subset
    and announces the truncation on stderr (round-3 ADVICE: a bare
    limit() printed an arbitrary run-to-run different subset silently)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    nodes = spark.createDataFrame(
        [(f"c{i}", f"s{i}", ["n"], ["a"], 1, ts) for i in range(5)],
        "canon_uuid string, sha256 string, names array<string>, "
        "aliases array<string>, n_sources long, first_seen timestamp",
    )
    src = str(tmp_path / "nodes")
    nodes.write.parquet(src)

    rc = main(["--master", "local[4]", "find", "--nodes", src,
               "--min-sources", "1", "--limit", "2"])
    assert rc == 0
    cap = capsys.readouterr()
    lines = [l for l in cap.out.splitlines() if l.strip()]
    assert len(lines) == 2
    assert [json.loads(l)["canon_uuid"] for l in lines] == ["c0", "c1"]
    assert "truncated at --limit 2" in cap.err

    # a non-truncating limit prints no notice
    rc = main(["--master", "local[4]", "find", "--nodes", src,
               "--min-sources", "1", "--limit", "50"])
    cap = capsys.readouterr()
    assert len([l for l in cap.out.splitlines() if l.strip()]) == 5
    assert "truncated" not in cap.err


def test_generate_specimen_materializes_install_paths(spark, spark_pages, spark_alias, tmp_path, capsys):
    """F9 through the CLI: a specimen config with installPrefix must
    produce a rebased (url, install_path) map under --out, not be
    silently dropped."""
    pages_p = str(tmp_path / "pages")
    alias_p = str(tmp_path / "alias")
    spark_pages.write.parquet(pages_p)
    spark_alias.write.parquet(alias_p)
    url0 = spark_pages.select("url").first()[0]
    root = url0.rsplit("/", 1)[0]
    cfg = json.dumps([{"extractPaths": [root], "installPrefix": "/opt/app"}])
    out = str(tmp_path / "kg")
    rc = main(["--master", "local[4]", "generate", "--pages", pages_p,
               "--alias", alias_p, "--out", out, "--specimen", cfg])
    assert rc == 0
    ip = spark.read.parquet(os.path.join(out, "install_paths"))
    rows = {r.url: r.install_path for r in ip.collect()}
    assert rows and all(v.startswith("/opt/app/") for v in rows.values())

    # --skip-install-path stamps NULLs
    out2 = str(tmp_path / "kg2")
    rc = main(["--master", "local[4]", "generate", "--pages", pages_p,
               "--alias", alias_p, "--out", out2, "--specimen", cfg,
               "--skip-install-path"])
    assert rc == 0
    ip2 = spark.read.parquet(os.path.join(out2, "install_paths"))
    assert all(r.install_path is None for r in ip2.collect())


def test_generate_near_dup_reports_survivors(staged, capsys):
    out = str(staged["tmp"] / "kg_nd")
    rc = main(
        ["--master", "local[4]", "generate", "--pages", staged["pages"],
         "--alias", staged["alias"], "--out", out, "--near-dup", "minhash"]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "near_dup_pairs" in info and "audit_dropped_buckets" in info
    # every corpus doc is labeled; survivors <= docs; clusters snapshot on disk
    assert 0 < info["dedup_survivors"]
    assert os.path.exists(os.path.join(out, "_clusters_OK"))


def test_kg_fold_command_resumes(spark, tmp_path, capsys):
    """kg-fold CLI: first run builds state from the staged batch, a
    rerun with a new batch folds only it, and the folded edge count
    matches the full-corpus kg_edges query."""
    from pyspark.sql import functions as F

    from surfactant_spark.queries import q_kg_edges
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(SF_DIR + "/documents.parquet").select(
        "doc_id", "source", "text"
    )
    src = str(tmp_path / "docs")
    out = str(tmp_path / "kgstate")
    docs.where(F.col("doc_id") < 250).coalesce(1).write.mode("append").parquet(src)
    assert main(["--master", "local[4]", "kg-fold", "--docs", src, "--out", out]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    docs.where(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(src)
    assert main(["--master", "local[4]", "kg-fold", "--docs", src, "--out", out]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = q_kg_edges(spark, SF_DIR).count()
    assert second["edges"] == want
    assert first["edges"] != second["edges"]


def test_version_command(capsys):
    """`version` (`__main__.py:60-63`): the engine version plus the
    PySpark runtime, one line."""
    import pyspark

    from surfactant_spark import __version__

    assert main(["version"]) == 0
    out = capsys.readouterr().out.strip()
    assert out == f"{__version__} (pyspark {pyspark.__version__})"


def test_plugin_update_db(isolated_config, spark, capsys):
    """`plugin update-db` (`cmd/plugin.py:117-169`): stages the
    versioned pattern snapshot, pins its content hash in config, and a
    second refresh of identical content reports no update; the staged
    snapshot round-trips into the mention detector with the pinned
    version as the lineage stamp."""
    from surfactant_spark.config import ConfigManager
    from surfactant_spark.operators.patterndb import load_pattern_db, pattern_mentions

    assert main(["plugin", "update-db", "--all"]) == 0
    out = capsys.readouterr().out
    assert "Updating pattern_db ..." in out and "Update result" in out
    cm = ConfigManager()
    pin = cm.get("database", "pattern_db_version")
    assert pin and len(pin) == 16

    # identical content -> same pin, 'no update performed'
    assert main(["plugin", "update-db", "pattern_db"]) == 0
    out = capsys.readouterr().out
    assert "No update operation performed for pattern_db." in out
    assert cm.get("database", "pattern_db_version") == pin

    # the staged snapshot loads back with the SAME pin and detects
    import os

    staged = os.path.join(cm.data_dir_path(), "databases", "pattern_db.json")
    dim, ver = load_pattern_db(spark, staged)
    assert ver == pin
    docs = spark.createDataFrame(
        [(1, "uses spark window functions"), (2, "nothing here")], "doc_id long, text string"
    )
    rows = pattern_mentions(docs, dim, db_version=ver).collect()
    assert {(r.doc_id, r.library, r.db_version) for r in rows} == {(1, "spark-engine", pin)}

    # reference error texts: unknown plugin, hook without a database
    assert main(["plugin", "update-db", "nosuch"]) == 1
    assert "Plugin 'nosuch' not found." in capsys.readouterr().err
    assert main(["plugin", "update-db", "elf"]) == 1
    assert "does not implement the 'update_db' hook" in capsys.readouterr().err
    assert main(["plugin", "update-db"]) == 1
    assert "specify a plugin name or use --all" in capsys.readouterr().err


def test_cli_query_list_run_and_out(tmp_path, capsys):
    """`query list` enumerates the registry; `query NAME` prints
    deterministic JSON rows with the truncation notice; --out writes
    the full parquet; unknown names exit 2 with a hint."""
    import json as _json

    from surfactant_spark.__main__ import main
    from surfactant_spark.queries import QUERIES

    assert main(["query", "list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == list(QUERIES)

    assert main(["query", "kg_degree_dist", "--limit", "5"]) == 0
    cap = capsys.readouterr()
    rows = [_json.loads(l) for l in cap.out.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert set(rows[0]) == {"degree", "n_entities"}
    assert "truncated" in cap.err

    dest = str(tmp_path / "dd.parquet")
    assert main(["query", "kg_degree_dist", "-o", dest]) == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] > 0

    assert main(["query", "nope"]) == 2
    assert "query list" in capsys.readouterr().err
