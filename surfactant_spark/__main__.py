"""Command-line entry point — the analogue of the reference's click
dispatch (`surfactant/__main__.py:39-99`), argparse-based (no click in
this sandbox), parquet-table-native:

  python -m surfactant_spark generate --pages P --alias A --out DIR
  python -m surfactant_spark merge GRAPH_DIR [GRAPH_DIR ...] --out DIR
  python -m surfactant_spark stat --nodes NODES_PARQUET
  python -m surfactant_spark find --nodes NODES_PARQUET [filters]
  python -m surfactant_spark sessionize --events E --out DIR
  python -m surfactant_spark kg-fold --docs D --out DIR
  python -m surfactant_spark query NAME --sf-dir DIR

On a cluster: ``spark-submit --py-files surfactant_spark.zip
surfactant_spark/__main__.py --master yarn generate ...`` — pass the
cluster master via ``--master`` (or SPARK_GRAFT_CPUS for local sizing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(args):
    from .session import get_spark

    return get_spark("surfactant_spark_cli", master=args.master)


def cmd_generate(args) -> int:
    """`surfactant generate` analogue: pages + alias dict -> nodes/
    edges/lineage parquet under --out (`cmd/generate.py:269-590`)."""
    from .plans.pipeline import run_pipeline

    spark = _spark(args)
    if args.format == "warc":
        from .sources.warc import read_warc

        pages = read_warc(spark, args.pages)
    elif args.format == "jsonl":
        from .sources.warc import read_pages_jsonl

        pages = read_pages_jsonl(spark, args.pages)
    elif args.format == "csv":
        from .sources.warc import read_pages_csv

        pages = read_pages_csv(spark, args.pages)
    else:
        pages = spark.read.parquet(args.pages)
    if args.specimen:
        from .operators.specimen import (
            install_paths_from_scan,
            parse_specimen_config,
            scan_from_config,
        )

        pages = scan_from_config(pages, parse_specimen_config(args.specimen))
        # F9: rebase each scan location onto its entry's installPrefix
        # and materialize the (url, install_path) map BEFORE dropping
        # the stamped columns — a config's installPrefix used to be
        # silently discarded here (--skip-install-path mirrors the
        # reference's --skip_install_path flag: NULL install paths).
        pages = install_paths_from_scan(pages, skip=args.skip_install_path)
        pages.select("url", "install_path").write.mode("overwrite").parquet(
            os.path.join(args.out, "install_paths")
        )
        pages = pages.drop(
            "extract_root", "install_prefix", "archive_url", "install_path"
        )
    alias = spark.read.parquet(args.alias)
    res = run_pipeline(
        spark, pages, alias, args.out, resume=not args.no_resume, n_salt=args.salt,
        near_dup=args.near_dup, host_graph=args.host_graph,
    )
    def _rows(name: str, df) -> int:
        # write-time observed counts (stage markers) over count() jobs;
        # the fallback only fires for pre-count markers from old runs
        n = res.stage_rows.get(name)
        return int(n) if n is not None else df.count()

    out = {
        "nodes": _rows("nodes", res.nodes),
        "edges": _rows("edges", res.edges),
        "stages_run": res.stages_run,
        "stages_resumed": res.stages_resumed,
        "out": args.out,
    }
    if res.host_edges is not None:
        out["host_edges"] = _rows("hostgraph", res.host_edges)
    if res.audit is not None:
        # the recall bound of the near-dup width cap, per run
        out["near_dup_pairs"] = _rows("near_dup", res.near_dup)
        out["audit_dropped_buckets"] = _rows("audit", res.audit)
        # per-document keep/drop decisions (clusters stage snapshot)
        from pyspark.sql import functions as F

        out["dedup_survivors"] = int(
            res.clusters.where(F.col("is_survivor")).count()
        )
    print(json.dumps(out))
    return 0


def cmd_merge(args) -> int:
    """`surfactant merge` analogue (`cmd/merge.py:56-128`): fold graph
    dirs (each with nodes/ and edges/ parquet), write the merged graph
    + roots; optional system node."""
    from .operators.canon import merge_graphs

    spark = _spark(args)
    graphs = []
    for d in args.graphs:
        graphs.append(
            (
                spark.read.parquet(os.path.join(d, "nodes")),
                spark.read.parquet(os.path.join(d, "edges")),
            )
        )
    software, edges, roots, system, _star = merge_graphs(
        graphs,
        add_system=args.add_system,
        system_uuid=args.system_uuid,
        system_relationship=args.system_relationship,
    )
    software.write.mode("overwrite").parquet(os.path.join(args.out, "nodes"))
    edges.write.mode("overwrite").parquet(os.path.join(args.out, "edges"))
    roots.write.mode("overwrite").parquet(os.path.join(args.out, "roots"))
    print(
        json.dumps(
            {
                "nodes": software.count(),
                "edges": edges.count(),
                "roots": roots.count(),
                "system": system,
            }
        )
    )
    return 0


def cmd_stat(args) -> int:
    """`surfactant stat` analogue (`cmd/stat.py:6-45`)."""
    from .operators.statcmd import stat_counters

    spark = _spark(args)
    row = stat_counters(spark.read.parquet(args.nodes)).collect()[0]
    print(f"Number of PE Executables: {row.pe_is_exe} with {row.clr_exe} using .NET/CLR")
    print(f"Number of DLLs: {row.pe_is_dll} with {row.clr_dll} using .NET/CLR")
    print(f"Number of ELF Binaries: {row.elf_is_exe}")
    print(f"Number of ELF shared libraries: {row.elf_is_lib}")
    return 0


def cmd_find(args) -> int:
    """`surfactant cli find` analogue (`cmd/cli.py:263-312`).

    The reference prints every match; a web-scale node table needs the
    default --limit so a broad pattern cannot collect the world to the
    driver. The limited subset is made deterministic (ordered by the
    unique uuid before limiting — a bare limit() returns an arbitrary,
    run-to-run different subset) and truncation is announced on stderr
    (detected by fetching limit+1 rows)."""
    from .operators.expand import find_nodes

    spark = _spark(args)
    # with no --nodes, search the `cli load`ed working set (the
    # reference's find-on-loaded-sbom flow)
    nodes = spark.read.parquet(args.nodes or _read_session()["nodes"])
    out = find_nodes(
        nodes,
        sha256=args.sha256,
        name_contains=args.name_contains,
        alias_prefix=args.alias_prefix,
        min_sources=args.min_sources,
    )
    if args.limit:
        sort_key = "uuid" if "uuid" in out.columns else out.columns[0]
        rows = out.orderBy(sort_key).limit(args.limit + 1).toJSON().collect()
        for r in rows[: args.limit]:
            print(r)
        if len(rows) > args.limit:
            print(
                f"note: output truncated at --limit {args.limit}; "
                "raise it or pass --limit 0 for all matches",
                file=sys.stderr,
            )
    else:
        for r in out.toJSON().collect():
            print(r)
    return 0


def _guard_in_place(out, *inputs) -> None:
    """Spark cannot overwrite a parquet path it is also reading (it
    either errors or truncates the input mid-read), so an in-place edit
    must go through a fresh --out directory."""
    for p in inputs:
        if p and os.path.abspath(out) == os.path.abspath(p):
            raise SystemExit(
                f"--out {out!r} equals an input path: Spark cannot overwrite "
                "a parquet path it reads from; write to a new directory "
                "and move it into place"
            )


def cmd_add(args) -> int:
    """`surfactant cli add` analogue (`cmd/cli.py:164-215`): append a
    relationship / node entry / rewritten install paths, writing the
    updated table to --out."""
    from .operators.expand import add_entry, add_installpath, add_relationship

    _guard_in_place(args.out, args.nodes, args.edges)
    spark = _spark(args)
    if args.relationship:
        subj, pred, obj = args.relationship
        edges = spark.read.parquet(args.edges)
        out = add_relationship(edges, subj, pred, obj)
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"edges": out.count(), "out": args.out}))
        return 0
    nodes = spark.read.parquet(args.nodes)
    if args.entry:
        out = add_entry(nodes, json.loads(args.entry))
    elif args.installpath:
        out = add_installpath(nodes, args.installpath[0], args.installpath[1])
    else:
        raise SystemExit("add requires --relationship, --entry or --installpath")
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"nodes": out.count(), "out": args.out}))
    return 0


def cmd_edit(args) -> int:
    """`surfactant cli edit` analogue: match by uuid/sha256, set scalar
    fields and append array values, write the edited table."""
    from .operators.expand import edit_nodes

    _guard_in_place(args.out, args.nodes)
    spark = _spark(args)
    nodes = spark.read.parquet(args.nodes)
    out = edit_nodes(
        nodes,
        set_fields=json.loads(args.set) if args.set else {},
        append_fields=json.loads(args.append) if args.append else None,
        uuid=args.uuid,
        sha256=args.sha256,
    )
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"nodes": out.count(), "out": args.out}))
    return 0



def cmd_config(args) -> int:
    """`surfactant config` analogue (`cmd/config.py:8-51`): get with
    KEY only, set with KEY VALUES...; KEY is 'section.option';
    'true'/'false' strings convert to booleans; multiple values store
    as a list."""
    from .config import ConfigManager

    cm = ConfigManager()
    try:
        section, option = args.key.split(".", 1)
    except ValueError:
        raise SystemExit("Invalid KEY given. Is it in the format 'section.option'?")
    if not args.values:
        result = cm.get(section, option)
        if result is None:
            print(f"Configuration '{args.key}' not found.")
        else:
            print(f"{args.key} = {result}")
        return 0
    converted = [
        True if v.lower() == "true" else False if v.lower() == "false" else v
        for v in args.values
    ]
    final = converted[0] if len(converted) == 1 else converted
    cm.set(section, option, final)
    print(f"Configuration '{args.key}' set to '{final}'.")
    return 0


def cmd_extract(args) -> int:
    """Registry-driven classify+extract over a pages table — the
    engine-side analogue of the reference running its plugin manager's
    extractors during generate (`plugin/manager.py`). This is the
    product path `plugin disable` governs: a disabled classify/extract
    hook observably changes this command's output table."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from .plugin import active_registry

    spark = _spark(args)
    pages = spark.read.parquet(args.pages)
    out = active_registry().run_extract(pages)
    # row count observed during the write action itself — same stance as
    # SnapshotStore.write: no second job over the output, at any scale
    obs = Observation("extract_rows")
    out.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite").parquet(
        args.out
    )
    print(json.dumps({"rows": int(obs.get["rows"]), "out": args.out}))
    return 0


def cmd_plugin(args) -> int:
    """`surfactant plugin list/enable/disable` analogue
    (`cmd/plugin.py:16-93`): inspect the hook registry and persist a
    disabled-hook list under `core.disable_plugins` (same section/key
    as the reference). `install`/`uninstall` shell out to pip in the
    reference and are declared out of scope here (COVERAGE.md) — a
    cluster engine installs plugins at deploy time, not per-driver."""
    from .config import ConfigManager
    from .plugin import active_registry, default_registry, disabled_plugins

    cm = ConfigManager()
    disabled = disabled_plugins(cm)
    if args.plugin_cmd == "update-db":
        # `plugin update-db [NAME] [--all]` (`cmd/plugin.py:117-169`):
        # refresh the named versioned database (or every database that
        # implements the hook) and pin the new content hash in config so
        # mention lineage stamps identify the refreshed snapshot.
        from .operators.patterndb import UPDATABLE_DBS, update_db

        if args.all:
            targets = sorted(UPDATABLE_DBS)
        elif args.names:
            targets = args.names
        else:
            print(
                "Please specify a plugin name or use --all to update all plugins.",
                file=sys.stderr,
            )
            return 1
        known_hooks = {
            n for fam in default_registry().hook_names().values() for n in fam
        }
        rc = 0
        for name in targets:
            if name not in UPDATABLE_DBS:
                if name in known_hooks:
                    print(
                        f"Plugin '{name}' does not implement the 'update_db' hook.",
                        file=sys.stderr,
                    )
                else:
                    print(f"Plugin '{name}' not found.", file=sys.stderr)
                rc = 1
                continue
            print(f"Updating {name} ...")
            res = update_db(name, cm)
            if res["changed"]:
                print(f"Update result for {name}: {json.dumps(res)}")
            else:
                print(f"No update operation performed for {name}.")
        return rc
    if args.plugin_cmd == "list":
        names = active_registry(cm).hook_names()
        for family in ("classify", "extract", "link"):
            print(f"{family.upper()} HOOKS")
            for n in names[family]:
                print(f"\tname: {n}")
        print("\nDISABLED PLUGINS")
        if not disabled:
            print("\tThere are no disabled plugins.")
        for d in disabled:
            print(f"\tname: {d}")
        return 0
    if not args.names:
        raise SystemExit("At least one plugin name must be specified.")
    if args.plugin_cmd == "enable":
        disabled = [d for d in disabled if d not in args.names]
    else:  # disable
        known = {
            n for fam in default_registry().hook_names().values() for n in fam
        }
        for n in args.names:
            if n not in known:
                print(f"warning: {n!r} is not a registered hook", file=sys.stderr)
            if n not in disabled:
                disabled.append(n)
    cm.set("core", "disable_plugins", disabled)
    print(f"Updated blocked plugins: {disabled}")
    return 0


def cmd_version(args) -> int:
    """`surfactant version` analogue (`__main__.py:60-63`): print the
    engine version, plus the PySpark runtime it executes on (the
    engine-relevant half of the reference's version report)."""
    import pyspark

    from . import __version__

    print(f"{__version__} (pyspark {pyspark.__version__})")
    return 0


def cmd_create_config(args) -> int:
    """`surfactant create-config` analogue (`cmd/createconfig.py:22-31`):
    emit a specimen config JSON `[{"extractPaths": [PREFIX],
    "installPrefix": ...}]` for a url prefix. The reference validates
    its directory argument exists (click.Path(exists=True)); the table
    analogue, when --pages is given, is checking the prefix matches at
    least one page (a prefix matching nothing is almost always a typo,
    and the pushed-down startswith makes the probe a pruned scan)."""
    if args.pages:
        from pyspark.sql import functions as F

        spark = _spark(args)
        pages = spark.read.parquet(args.pages)
        if pages.where(F.col("url").startswith(args.prefix)).limit(1).count() == 0:
            raise SystemExit(f"no pages match prefix {args.prefix!r}")
    config = [{"extractPaths": [args.prefix], "installPrefix": args.install_prefix}]
    out = args.output or (
        (os.path.basename(args.prefix.rstrip("/")) or "specimen") + ".json"
    )
    with open(out, "w", encoding="utf-8") as f:
        json.dump(config, f, indent=4)
    print(json.dumps({"out": out, "entries": len(config)}))
    return 0


def _session_file() -> str:
    from .config import ConfigManager

    return os.path.join(ConfigManager().data_dir_path(), "cli_session.json")


def _read_session() -> dict:
    path = _session_file()
    if not os.path.exists(path):
        raise SystemExit("no working set loaded; run `cli load` first")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def cmd_load(args) -> int:
    """`surfactant cli load` analogue (`cmd/cli.py:handle_cli_load`,
    `cli_commands/cli_load.py`): record the working set for later cli
    commands. Spark-native twist: a parquet working set is recorded as
    a POINTER (its path), not copied — at 100 TB the session must not
    duplicate the data; a CyTRICS JSON export is materialized to
    session parquet first (it needs parsing anyway)."""
    session = {"format": args.format}
    if args.format == "cytrics":
        from .config import ConfigManager
        from .sources.readers import read_cytrics_json

        spark = _spark(args)
        nodes, edges = read_cytrics_json(spark, args.path)
        base = os.path.join(ConfigManager().data_dir_path(), "session_tables")
        nodes.write.mode("overwrite").parquet(os.path.join(base, "nodes"))
        edges.write.mode("overwrite").parquet(os.path.join(base, "edges"))
        session["nodes"] = os.path.join(base, "nodes")
        session["edges"] = os.path.join(base, "edges")
    else:
        nodes_p = os.path.join(args.path, "nodes")
        if not os.path.exists(nodes_p):
            raise SystemExit(f"{nodes_p} not found: expected a graph dir with nodes/ (and edges/)")
        session["nodes"] = os.path.abspath(nodes_p)
        edges_p = os.path.join(args.path, "edges")
        session["edges"] = os.path.abspath(edges_p) if os.path.exists(edges_p) else None
    with open(_session_file(), "w", encoding="utf-8") as f:
        json.dump(session, f)
    print(json.dumps({"loaded": session}))
    return 0


def cmd_save(args) -> int:
    """`surfactant cli save` analogue (`cli_commands/cli_save.py`):
    write the loaded working set to --out in the requested format
    (parquet graph dir, CyTRICS JSON lines, or per-path CSV)."""
    session = _read_session()
    _guard_in_place(args.out, session.get("nodes"), session.get("edges"))
    spark = _spark(args)
    nodes = spark.read.parquet(session["nodes"])
    edges = spark.read.parquet(session["edges"]) if session.get("edges") else None
    if args.format == "parquet":
        nodes.write.mode("overwrite").parquet(os.path.join(args.out, "nodes"))
        if edges is not None:
            edges.write.mode("overwrite").parquet(os.path.join(args.out, "edges"))
    elif args.format == "cytrics":
        from .sources.writers import json_export

        if edges is None:
            edges = spark.createDataFrame(
                [], "subj_uuid string, pred string, obj_uuid string"
            )
        node_docs, edge_docs = json_export(nodes, edges)
        node_docs.toDF("value").write.mode("overwrite").text(os.path.join(args.out, "nodes"))
        edge_docs.toDF("value").write.mode("overwrite").text(os.path.join(args.out, "edges"))
    elif args.format == "csv":
        from .sources.writers import csv_export

        csv_export(nodes).write.mode("overwrite").option("header", True).csv(
            os.path.join(args.out, "nodes")
        )
    print(json.dumps({"out": args.out, "format": args.format, "nodes": nodes.count()}))
    return 0


def cmd_sessionize(args) -> int:
    """Incremental stateful sessionization over an events directory."""
    from .streaming.sessions import run_sessionize_stream

    spark = _spark(args)
    out = run_sessionize_stream(
        spark, args.events, os.path.join(args.out, "sessions"),
        os.path.join(args.out, "ckpt"), gap_s=args.gap_s,
    )
    print(json.dumps({"closed_sessions": out.count(), "out": args.out}))
    return 0


def cmd_kg_fold(args) -> int:
    """Checkpoint-resumable incremental KG maintenance: fold newly
    arrived documents-shaped parquet into standing state; reruns only
    process files the checkpoint hasn't seen (streaming/incremental.
    stream_kg_fold; batches must be append-only by doc_id)."""
    from .operators.incremental import edges_surface
    from .streaming.incremental import stream_kg_fold

    spark = _spark(args)
    state = stream_kg_fold(
        spark, args.docs, os.path.join(args.out, "state"),
        os.path.join(args.out, "ckpt"),
        retain=args.retain, compact_keep=args.compact_keep,
    )
    if state is None:
        print(json.dumps({"edges": 0, "out": args.out, "note": "no input batches"}))
        return 0
    from .streaming.incremental import read_fold_metrics

    m = read_fold_metrics(spark, os.path.join(args.out, "state"))
    n_batches = m.count()
    print(
        json.dumps(
            {
                "edges": edges_surface(state).count(),
                "batches_folded": n_batches,
                "out": args.out,
            }
        )
    )
    return 0


def cmd_query(args) -> int:
    """Run any registered analytic from the query surface by name —
    the whole `queries.QUERIES` registry (KG construction, dedup
    families, web-graph analytics, sketches, quantiles, packing,
    quality filtering, ...) becomes a CLI command over a table
    directory. `query list` enumerates names; results print as JSON
    lines (deterministically ordered, row-capped with a stderr notice,
    the cmd_find discipline) or write to parquet with --out."""
    from .queries import QUERIES

    if args.name == "list":
        for name in QUERIES:
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r} (see: query list)", file=sys.stderr)
        return 2
    spark = _spark(args)
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"query": args.name, "out": args.out, "rows": df.count()}))
        return 0
    rows = df.orderBy(*df.columns).limit(args.limit + 1).collect()
    truncated = len(rows) > args.limit
    for r in rows[: args.limit]:
        print(json.dumps(r.asDict(), default=str))
    if truncated:
        print(
            f"output truncated at --limit {args.limit}; use --out for the full table",
            file=sys.stderr,
        )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="surfactant_spark")
    p.add_argument("--master", default=None, help="Spark master (default: env/local)")
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generate", help="pages + alias dict -> KG tables")
    g.add_argument("--pages", required=True)
    g.add_argument("--alias", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--specimen", default=None, help="specimen config (path/JSON)")
    g.add_argument(
        "--skip-install-path",
        action="store_true",
        help="stamp NULL install paths (reference --skip_install_path)",
    )
    g.add_argument("--no-resume", action="store_true")
    g.add_argument(
        "--format", default="parquet", choices=["parquet", "warc", "jsonl", "csv"]
    )
    g.add_argument("--salt", type=int, default=0, help="salt hot dictionary keys N ways")
    g.add_argument(
        "--near-dup",
        default=None,
        choices=["simhash", "minhash"],
        help="also materialize a near-dup pair stage + its dropped-bucket "
        "recall audit as lineage-tracked stages",
    )
    g.add_argument(
        "--host-graph",
        action="store_true",
        help="also materialize the host-level hyperlink graph over the "
        "raw pages as a lineage-tracked stage",
    )
    g.set_defaults(fn=cmd_generate)

    m = sub.add_parser("merge", help="fold graph dirs into one")
    m.add_argument("graphs", nargs="+")
    m.add_argument("--out", required=True)
    m.add_argument("--add-system", action="store_true")
    m.add_argument("--system-uuid", default=None)
    m.add_argument("--system-relationship", default="Contains")
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("stat", help="metadata flag counters")
    s.add_argument("--nodes", required=True)
    s.set_defaults(fn=cmd_stat)

    f = sub.add_parser("find", help="conjunctive node search")
    f.add_argument("--nodes", default=None, help="node parquet (default: loaded working set)")
    f.add_argument("--sha256", default=None)
    f.add_argument("--name-contains", default=None)
    f.add_argument("--alias-prefix", default=None)
    f.add_argument("--min-sources", type=int, default=None)
    f.add_argument(
        "--limit",
        type=int,
        default=1000,
        help="max rows printed (0 = unlimited); keeps a broad match on a "
        "web-scale node table from collecting the world to the driver",
    )
    f.set_defaults(fn=cmd_find)

    a = sub.add_parser("add", help="append relationship/entry/installpath")
    a.add_argument("--nodes")
    a.add_argument("--edges")
    a.add_argument("--out", required=True)
    a.add_argument("--relationship", nargs=3, metavar=("SUBJ", "PRED", "OBJ"))
    a.add_argument("--entry", help="node row as JSON")
    a.add_argument("--installpath", nargs=2, metavar=("CONTAINER_PREFIX", "INSTALL_PREFIX"))
    a.set_defaults(fn=cmd_add)

    e = sub.add_parser("edit", help="edit matched node entries")
    e.add_argument("--nodes", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--uuid", default=None)
    e.add_argument("--sha256", default=None)
    e.add_argument("--set", default=None, help='{"field": value} scalar sets')
    e.add_argument("--append", default=None, help='{"field": [values]} array appends')
    e.set_defaults(fn=cmd_edit)

    kf = sub.add_parser(
        "kg-fold",
        help="fold newly arrived documents into standing KG state "
        "(checkpoint-resumable, append-only batches)",
    )
    kf.add_argument("--docs", required=True, help="documents parquet directory")
    kf.add_argument("--out", required=True, help="state + checkpoint root")
    kf.add_argument(
        "--retain", type=int, default=2,
        help="compact state versions kept after each fold",
    )
    kf.add_argument(
        "--compact-keep", type=int, default=8,
        help="mention deltas kept before compaction folds the rest "
        "into one marker-committed dir (0 disables)",
    )
    kf.set_defaults(fn=cmd_kg_fold)

    z = sub.add_parser("sessionize", help="stateful event sessionization")
    z.add_argument("--events", required=True)
    z.add_argument("--out", required=True)
    z.add_argument("--gap-s", type=int, default=1800)
    z.set_defaults(fn=cmd_sessionize)

    c = sub.add_parser("config", help="get/set engine configuration (section.option)")
    c.add_argument("key")
    c.add_argument("values", nargs="*")
    c.set_defaults(fn=cmd_config)

    lo = sub.add_parser("load", help="load a working set for cli commands")
    lo.add_argument("path", help="graph dir (nodes/, edges/) or CyTRICS export dir")
    lo.add_argument("--format", default="parquet", choices=["parquet", "cytrics"])
    lo.set_defaults(fn=cmd_load)

    sv = sub.add_parser("save", help="save the loaded working set")
    sv.add_argument("--out", required=True)
    sv.add_argument("--format", default="parquet", choices=["parquet", "cytrics", "csv"])
    sv.set_defaults(fn=cmd_save)

    x = sub.add_parser(
        "extract", help="registry-driven classify+extract over a pages table"
    )
    x.add_argument("--pages", required=True)
    x.add_argument("--out", required=True)
    x.set_defaults(fn=cmd_extract)

    pl = sub.add_parser(
        "plugin", help="inspect / enable / disable registry hooks, refresh databases"
    )
    pl.add_argument("plugin_cmd", choices=["list", "enable", "disable", "update-db"])
    pl.add_argument("names", nargs="*", help="hook names (for enable/disable/update-db)")
    pl.add_argument(
        "--all", action="store_true",
        help="update-db: refresh every database implementing the hook",
    )
    pl.set_defaults(fn=cmd_plugin)

    ver = sub.add_parser("version", help="print version information")
    ver.set_defaults(fn=cmd_version)

    cc = sub.add_parser(
        "create-config", help="emit a specimen config JSON for a url prefix"
    )
    cc.add_argument("prefix", help="url prefix to record as the extract path")
    cc.add_argument("-o", "--output", default=None, help="output JSON file")
    cc.add_argument("--install-prefix", default="/", help="installPrefix value")
    cc.add_argument(
        "--pages", default=None, help="pages parquet to validate the prefix against"
    )
    cc.set_defaults(fn=cmd_create_config)

    q = sub.add_parser(
        "query", help="run a registered analytic by name ('query list' to enumerate)"
    )
    q.add_argument("name", help="query name from the registry, or 'list'")
    q.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001",
        help="table directory holding the parquet inputs",
    )
    q.add_argument("--limit", type=int, default=100, help="max rows to print")
    q.add_argument("-o", "--out", default=None, help="write full result parquet here")
    q.set_defaults(fn=cmd_query)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
