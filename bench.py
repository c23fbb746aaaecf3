"""Benchmark harness.

Default mode (what the driver runs): execute the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

``--scaling`` mode: run the same fixed workload at local[8] and
local[32] on identical input and report throughput at both plus
scaling efficiency = tput_32 / (4 * tput_8) — the sandbox stand-in
for the north rule's N vs 4N executor criterion (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "kg_edges",
    "kg_nodes",
    "dedup_exact",
    "dedup_norm",
    "dedup_minhash",
    "dedup_ngram",
    "dedup_simhash",
    "text_analysis",
    "topk_bruteforce",
    "topk_ivf",
    "pricing_summary",
    "revenue_by_nation",
    "customers_no_orders",
    "latest_order_per_cust",
    "event_sessions",
    "cc_tokens",
    "media_features",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_queries(spark, sf_dir):
    from surfactant_spark.queries import QUERIES

    times = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
        _ = n
    return times


def _pipeline_throughput(spark, n_pages: int):
    """The full synthetic-pages KG pipeline (extract -> link -> edges);
    returns (docs_per_sec, triples_per_sec, wall_s)."""
    from surfactant_spark.plans.pipeline import run_pipeline
    from surfactant_spark.synth import alias_dict_to_spark, make_corpus, pages_to_spark

    pages_pdf, alias_pdf = make_corpus(n_pages, seed=42)
    pages = pages_to_spark(spark, pages_pdf).repartition(
        spark.sparkContext.defaultParallelism
    )
    alias = alias_dict_to_spark(spark, alias_pdf)
    with tempfile.TemporaryDirectory() as wd:
        t0 = time.time()
        res = run_pipeline(spark, pages, alias, wd, resume=False)
        n_triples = res.edges.count()
        wall = time.time() - t0
    return n_pages / wall, n_triples / wall, round(wall, 3), n_triples


def default_mode():
    from surfactant_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM/Arrow paths so per-query times measure the plan, not startup
    spark.range(1000).selectExpr("sum(id)").collect()

    times = _run_queries(spark, SF_DIR)
    sf = _sf_from_dir(SF_DIR)
    n_pages = {0.001: 500, 0.01: 2000, 0.1: 8000}.get(sf, 2000)
    docs_s, triples_s, pipe_wall, n_triples = _pipeline_throughput(spark, n_pages)
    times["kg_pipeline_synthetic"] = pipe_wall

    out = {
        "metric": "headline query wall time + synthetic KG pipeline throughput",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "pipeline_docs_per_sec": round(docs_s, 1),
        "pipeline_triples_per_sec": round(triples_s, 1),
        "pipeline_pages": n_pages,
        "pipeline_triples": n_triples,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    spark.stop()
    print(json.dumps(out))


def scaling_mode(n_pages: int = 20000):
    """Same job, two parallelism levels, same input."""
    from surfactant_spark.session import get_spark

    results = {}
    for cpus in (8, 32):
        spark = get_spark(f"bench-scaling-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 8))
        spark.range(1000).selectExpr("sum(id)").collect()
        docs_s, triples_s, wall, n_triples = _pipeline_throughput(spark, n_pages)
        q1 = None
        if os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")):
            from surfactant_spark.queries import q_pricing_summary

            t0 = time.time()
            q_pricing_summary(spark, SF_DIR).count()
            q1 = round(time.time() - t0, 3)
        results[cpus] = {
            "docs_per_sec": round(docs_s, 1),
            "triples_per_sec": round(triples_s, 1),
            "pipeline_wall_s": wall,
            "pricing_summary_s": q1,
        }
        spark.stop()
    eff = results[32]["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
    out = {
        "metric": "scaling efficiency local[8] -> local[32] (N vs 4N stand-in)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_pages": n_pages,
        "levels": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        n = 20000
        for a in sys.argv:
            if a.startswith("--pages="):
                n = int(a.split("=")[1])
        scaling_mode(n)
    else:
        default_mode()
