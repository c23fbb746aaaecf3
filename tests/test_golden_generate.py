"""Golden generate analogue (`/root/reference/tests/cmd/test_generate.py:9-113`):
a two-binary corpus scanned via specimen config must yield exactly two
nodes with the expected install paths (with and without installPrefix)
and exactly one Uses edge; --skip_install_path yields zero edges."""

import json

from pyspark.sql import functions as F

from surfactant_spark.operators.link import link_pe
from surfactant_spark.operators.specimen import (
    install_paths_from_scan,
    parse_specimen_config,
    scan_from_config,
)

EXTRACT_ROOT = "corpus/Windows_dll_test_no1"


def _pages(spark):
    rows = [
        (f"{EXTRACT_ROOT}/hello_world.exe", "hello_world.exe",
         {"peImport": ["testlib.dll"]}),
        (f"{EXTRACT_ROOT}/testlib.dll", "testlib.dll", {}),
        ("elsewhere/other.exe", "other.exe", {}),  # outside the extract root
    ]
    return spark.createDataFrame(
        [(u, f, json.dumps(md)) for (u, f, md) in rows],
        "url string, file_name string, metadata_json string",
    )


def _software_nodes(scanned):
    return scanned.select(
        F.col("file_name").alias("uuid"),  # deterministic readable ids
        F.array("file_name").alias("fileName"),
        F.when(F.col("install_path").isNull(), F.array().cast("array<string>"))
        .otherwise(F.array("install_path"))
        .alias("installPath"),
        "metadata_json",
    )


def _run(spark, config, skip=False):
    scanned = scan_from_config(_pages(spark), parse_specimen_config(config))
    nodes = _software_nodes(install_paths_from_scan(scanned, skip=skip))
    return nodes, link_pe(nodes)


def test_generate_no_install_prefix(spark):
    config = json.dumps([{"extractPaths": [EXTRACT_ROOT]}])
    nodes, edges = _run(spark, config)
    rows = {r.uuid: r for r in nodes.collect()}
    assert set(rows) == {"hello_world.exe", "testlib.dll"}
    # no prefix -> install path is the scan location itself
    assert rows["hello_world.exe"].installPath == [f"{EXTRACT_ROOT}/hello_world.exe"]
    assert rows["testlib.dll"].installPath == [f"{EXTRACT_ROOT}/testlib.dll"]
    assert {(r.subj, r.pred, r.obj) for r in edges.collect()} == {
        ("hello_world.exe", "Uses", "testlib.dll")
    }


def test_generate_with_install_prefix(spark):
    config = json.dumps(
        [{"extractPaths": [EXTRACT_ROOT], "installPrefix": "test_prefix/"}]
    )
    nodes, edges = _run(spark, config)
    rows = {r.uuid: r for r in nodes.collect()}
    assert rows["hello_world.exe"].installPath == ["test_prefix/hello_world.exe"]
    assert rows["testlib.dll"].installPath == ["test_prefix/testlib.dll"]
    assert edges.count() == 1


def test_generate_with_skip_install_path(spark):
    config = json.dumps([{"extractPaths": [EXTRACT_ROOT]}])
    nodes, edges = _run(spark, config, skip=True)
    assert all(r.installPath == [] for r in nodes.collect())
    assert edges.count() == 0  # no install paths -> no path-probe edges
