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

``--only=NAME[,NAME...]`` mode: isolated per-query reps (walls +
per-rep non-guest CPU fraction) for stall-vs-regression adjudication;
``--reps=N`` sets the rep count (default 4).
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
    "topk_lsh",
    "cc_tokens",
    "media_features",
    "pattern_mentions",
    "sessionize",
    "windowed_events",
    "dedup_clusters",
    "entity_rank",
    "dup_spans",
    "contamination",
    "doc_repetition",
    "kg_incremental",
    "token_cms",
    "token_hll",
    "length_quantiles",
    "lang_quantiles",
    "event_asof",
    "kg_khop",
    "entity_ppr",
    "event_funnel",
    "collocations",
    "corpus_pack",
    "quality_filter",
    "tfidf_terms",
    "inverted_index",
    "cohort_retention",
    "kmeans_clusters",
    "bpe_merges",
    "val_oov",
    "embedding_quant",
    "vocab_coverage",
    "kg_twohop",
    "lm_score",
    "containment",
    "host_adamic",
    "semdedup",
    "domain_mixture",
    "zipf_spectrum",
    "train_shards",
    "bpe_encode",
    "mirror_pairs",
    "edge_recency",
    "curation_verdict",
    "corpus_cube",
    "quality_calibration",
    "page_rank",
    "anchor_priors",
    "politeness_audit",
    "ann_recall",
    "mirror_networks",
    "dsir_weights",
    "cdx_index",
    "host_neighborhood",
    "robots_check",
    "ip_enrich",
    "doc_chunks",
    "canonical_links",
    "sitemap_stale",
    "host_trustrank",
    "host_bowtie",
    "typo_folding",
    "media_near_dup",
    "lm_bigram",
    "priority_sample",
    "host_harmonic",
    "crawl_plan",
    "cdc_chunks",
    "ppl_buckets",
    "winnow_pairs",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_queries(spark, sf_dir):
    """Each query timed twice: first execution includes codegen/worker
    warmup (what a cold cluster pays once); the second is steady-state
    plan execution. Both are reported."""
    from surfactant_spark.queries import QUERIES

    cold, warm = {}, {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        warm[name] = round(time.time() - t0, 3)
    return cold, warm


def _stage_pipeline_corpus(spark, n_pages: int, wd: str):
    """Synthesize + stage the pipeline corpus ONCE per bench process.
    The retry sweep used to redo this (byte-identical: fixed seed)
    inside every rep, multiplying untimed work by up to max_reps on
    exactly the throttled hosts the sweep exists to escape.

    The corpus is staged to parquet so every timed job starts from a
    parallel columnar scan (the real input path at scale), not from a
    driver-side pandas upload."""
    from surfactant_spark.synth import alias_dict_to_spark, make_corpus, pages_to_spark

    pages_pdf, alias_pdf = make_corpus(n_pages, seed=42)
    src = os.path.join(wd, "pages_src")
    pages_to_spark(spark, pages_pdf).repartition(
        spark.sparkContext.defaultParallelism * 2
    ).write.parquet(src)
    pages = spark.read.parquet(src)
    alias = alias_dict_to_spark(spark, alias_pdf)
    return pages, alias


def _pipeline_timed(spark, pages, alias, workdir: str, n_pages: int):
    """One timed steady-state pipeline run over the pre-staged corpus;
    returns (docs_per_sec, triples_per_sec, wall_s, n_triples).

    The untimed warm run stays ADJACENT to the timed one (both here,
    per rep): with the query sweep in between instead, the timed run
    re-faults state the queries evicted — measured 6.6 -> 14.8 s on a
    clean window when the warm run moved to staging time, with the gap
    showing up as pipeline-window sys time (the lazily-host-backed
    fault path, BENCH/BASELINE.md). Its workdir is kept on tmpfs until
    process exit — freeing it mid-bench hands pages back to the host."""
    from surfactant_spark.plans.pipeline import run_pipeline

    run_pipeline(spark, pages, alias, workdir + "_warm", resume=False).edges.count()
    t0 = time.time()
    res = run_pipeline(spark, pages, alias, workdir, resume=False)
    n_triples = res.edges.count()
    wall = time.time() - t0
    return n_pages / wall, n_triples / wall, round(wall, 3), n_triples


def _claim_local_dirs(base):
    """Point shuffle at a ramdisk temp dir UNLESS the caller already set
    one. Returns the created dir (for cleanup) or None if pre-set —
    plain setdefault(mkdtemp(...)) leaked an empty /dev/shm dir per
    invocation when the variable was already present (round-3 ADVICE)."""
    if "SPARK_LOCAL_DIRS" in os.environ:
        return None
    d = tempfile.mkdtemp(prefix="spark-local-", dir=base)
    os.environ["SPARK_LOCAL_DIRS"] = d
    return d


def default_mode(max_reps: int = 5, clean_thresh: float = 0.05):
    """Self-defending bench (round-3 verdict item 1): the sandbox VM
    shares a host and individual windows get externally throttled, so a
    single measurement can record the host, not the code (round 3's
    168.9 s artifact vs a clean 43.3 s on byte-identical code). Each rep
    measures the non-guest CPU fraction over its own window; the sweep
    retries (up to ``max_reps``) until a rep lands with nonguest <
    ``clean_thresh``. The artifact of record carries EVERY rep plus
    which one supplied ``value``; if no clean window was achievable it
    says so explicitly (``host_degraded: true``) instead of leaving a
    throttled number to be explained away in side documentation."""
    from surfactant_spark.session import get_spark

    # memory mitigations shared with scaling_mode (see BENCH/BASELINE.md):
    # a fixed pre-touched heap and ramdisk shuffle dirs. On a freshly
    # booted VM of this sandbox, guest pages are lazily host-backed and
    # first touch costs 1-9 s/GB; without -Xms+AlwaysPreTouch the JVM
    # re-commits heap regions across jobs and the fault cost lands in
    # the middle of the measured windows (observed: the same pipeline
    # 6.7 s steady-state vs 47-87 s when heap faults are in-window).
    # A long-lived cluster pays these once at executor start.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms24g -XX:+AlwaysPreTouch"
    )
    created_dir = _claim_local_dirs(base)
    spark = get_spark("bench")
    # warm the JVM/Arrow/scan paths so per-query times measure the
    # plan, not session startup (same rationale as scaling_mode._warm:
    # a long-lived cluster pays codegen/worker-fork once, not per query)
    _warm(spark)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.range(1000).selectExpr(
        "sum(length(regexp_extract(cast(id as string), '[0-9]+', 0)))"
    ).collect()

    sf = _sf_from_dir(SF_DIR)
    n_pages = {0.001: 500, 0.01: 2000, 0.1: 8000}.get(sf, 2000)
    # corpus synthesis + parquet staging + the untimed warm pipeline
    # run happen ONCE (fixed seed: byte-identical across reps); each
    # rep only pays its own timed steady-state run
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    pipe_tmp = tempfile.TemporaryDirectory(dir=base)
    pipe_pages, pipe_alias = _stage_pipeline_corpus(spark, n_pages, pipe_tmp.name)
    reps = []
    for rep in range(max_reps):
        # the clean/degraded criterion applies to the QUERY window; the
        # pipeline window is measured separately because its tmpfs stage
        # writes + Python-worker forks burn legitimate guest system time
        # that would otherwise masquerade as host noise
        cpu0 = _cpu_snap()
        times, warm = _run_queries(spark, SF_DIR)
        q_noise = _nonguest_parts(cpu0)
        cpu1 = _cpu_snap()
        docs_s, triples_s, pipe_wall, n_triples = _pipeline_timed(
            spark, pipe_pages, pipe_alias,
            os.path.join(pipe_tmp.name, f"work_{rep}"), n_pages,
        )
        p_noise = _nonguest_parts(cpu1)
        # web-graph family over the SAME staged corpus (host link graph
        # + co-mention lift): fixture-backed in the oracle suite, so its
        # scale evidence lives here, on the sf-sized synthetic pages
        from surfactant_spark.operators.webgraph import (
            comention_lift,
            extract_links,
            host_graph,
        )

        t0 = time.time()
        wg_links = extract_links(pipe_pages).localCheckpoint(eager=True)
        host_graph(pipe_pages, wg_links).count()
        comention_lift(pipe_pages, wg_links).count()
        wg_links.unpersist()
        wg_wall = round(time.time() - t0, 3)
        frac = q_noise["frac"]
        times["kg_pipeline_synthetic"] = pipe_wall
        times["webgraph_synthetic"] = wg_wall
        reps.append(
            {
                "rep": rep,
                "total_s": round(sum(times.values()), 3),
                # rep 0's cold column includes one-time codegen; rep>=1
                # re-executes compiled plans, so total_s is comparable
                # across reps only via total_warm_s (+ pipeline wall,
                # which is steady-state at every rep)
                "total_warm_s": round(sum(warm.values()) + pipe_wall + wg_wall, 3),
                "queries": times,
                "queries_warm": warm,
                "nonguest_cpu_frac": frac,
                # which component: steal = externally stolen; sys can be
                # either legit kernel work or the lazily-host-backed
                # memory fault path (BENCH/BASELINE.md round-3 finding)
                "nonguest_components": q_noise,
                "pipeline_nonguest_components": p_noise,
                "pipeline_docs_per_sec": round(docs_s, 1),
                "pipeline_triples_per_sec": round(triples_s, 1),
                "pipeline_triples": n_triples,
            }
        )
        if _rep_clean(reps[-1], clean_thresh):
            break
    # value = fastest CLEAN rep; if the host never gave a clean window,
    # fall back to the least-throttled rep and flag the artifact
    clean = [r for r in reps if _rep_clean(r, clean_thresh)]
    pool = clean or reps
    best = min(pool, key=lambda r: r["total_s"])

    out = {
        "metric": "headline query wall time + synthetic KG pipeline throughput",
        "value": best["total_s"],
        "unit": "sec",
        "queries": best["queries"],
        "queries_warm": best["queries_warm"],
        "sf": sf,
        "pipeline_docs_per_sec": best["pipeline_docs_per_sec"],
        "pipeline_triples_per_sec": best["pipeline_triples_per_sec"],
        "pipeline_pages": n_pages,
        "pipeline_triples": best["pipeline_triples"],
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        # host-health evidence for the SELECTED window; > ~0.05 means
        # the wall times were inflated by the host, not the plans.
        # NOTE: rep 0's `queries` includes true cold (codegen) times;
        # later reps re-execute already-compiled plans, so when value
        # comes from rep >= 1 its "cold" column is first-run-of-window,
        # not first-run-of-session (queries_warm is comparable across
        # all reps).
        "nonguest_cpu_frac": best["nonguest_cpu_frac"],
        "value_rep": best["rep"],
        "host_degraded": not clean,
        "rep_nonguest_cpu_fracs": [r["nonguest_cpu_frac"] for r in reps],
        "rep_totals_s": [r["total_s"] for r in reps],
        # codegen-free totals, comparable across reps AND across runs
        # (rep 0's total_s carries one-time codegen that later reps
        # don't — use these to compare artifacts round-over-round)
        "rep_totals_warm_s": [r["total_warm_s"] for r in reps],
        "reps": reps,
    }
    spark.stop()
    pipe_tmp.cleanup()
    if created_dir:
        import shutil

        shutil.rmtree(created_dir, ignore_errors=True)
    print(json.dumps(out))


def _rep_clean(rep: dict, clean_thresh: float) -> bool:
    """A rep is clean only when BOTH measured windows were: the query
    window on the combined non-guest fraction (sys there means the
    cold fault path), and the pipeline window on STEAL alone — its
    tmpfs stage writes + worker forks make system time legitimate
    there, but externally stolen time still inflates the recorded
    kg_pipeline_synthetic wall that feeds the headline value."""
    return (
        rep["nonguest_cpu_frac"] < clean_thresh
        and rep["pipeline_nonguest_components"]["steal"] < clean_thresh
    )


def _cpu_snap():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:9]))


def _nonguest_frac(prev):
    """Fraction of CPU time since ``prev`` that was neither user nor
    idle nor iowait — system + irq + steal; on this shared-host VM a
    large value means the measurement was externally throttled."""
    return _nonguest_parts(prev)["frac"]


def _nonguest_parts(prev):
    """Like :func:`_nonguest_frac` but with the component breakdown, so
    an artifact reader can tell externally-stolen time (steal) from
    kernel time (sys — legit tmpfs/page-cache work OR the host-backed
    first-touch fault path) without rerunning anything."""
    cur = _cpu_snap()
    d = [a - b for a, b in zip(cur, prev)]
    tot = sum(d) or 1
    return {
        "frac": round((d[2] + d[5] + d[6] + d[7]) / tot, 4),
        "sys": round(d[2] / tot, 4),
        "irq": round((d[5] + d[6]) / tot, 4),
        "steal": round(d[7] / tot, 4),
    }


def _warm(spark):
    """Warm the paths a long-lived executor would already have warm:
    JVM codegen, Python UDF workers (one fork per core), Arrow
    serialization, broadcast machinery. One-time setup cost, not
    per-job throughput — excluded from the timed window at BOTH levels."""
    import pandas as pd  # noqa: F401

    spark.range(100000).selectExpr("sum(id)").collect()

    def ident(batches):
        for b in batches:
            yield b

    parts = spark.sparkContext.defaultParallelism * 2
    spark.range(0, 100000, numPartitions=parts).mapInPandas(
        ident, schema="id long"
    ).selectExpr("count(1)").collect()
    small = spark.range(100).withColumnRenamed("id", "k")
    from pyspark.sql import functions as F

    spark.range(10000).withColumnRenamed("id", "k").join(
        F.broadcast(small), "k"
    ).count()


def only_mode(names, reps: int = 4, clean_thresh: float = 0.05):
    """Isolated per-query adjudication mode (``--only=NAME[,NAME...]``):
    run JUST the named registry queries, ``reps`` times each, reporting
    every wall plus the per-rep non-guest CPU fraction — one JSON line.

    This exists because this sandbox's invisible host-memory stalls can
    inflate a single query's window inside an otherwise-clean sweep
    (round 4's topk_ivf read 10.3 s in the artifact vs 3.1 s isolated
    on identical bytes): with isolated reps in the artifact itself, the
    stall-vs-regression question is answerable without hand-writing a
    harness. min over reps is the estimator (stalls only ever add
    time); ``cold`` is the first run's wall (codegen included)."""
    from surfactant_spark.queries import QUERIES
    from surfactant_spark.session import get_spark

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known: {sorted(QUERIES)}")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms24g -XX:+AlwaysPreTouch"
    )
    created_dir = _claim_local_dirs(base)
    spark = get_spark("bench-only")
    _warm(spark)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    per_query = {}
    for name in names:
        walls, fracs = [], []
        for _ in range(reps):
            cpu0 = _cpu_snap()
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).count()
            walls.append(round(time.time() - t0, 3))
            fracs.append(_nonguest_frac(cpu0))
        steady = walls[1:] or walls
        per_query[name] = {
            "cold": walls[0],
            "min_warm": min(steady),
            "walls": walls,
            "nonguest_cpu_fracs": fracs,
            "clean_reps": sum(1 for f in fracs if f < clean_thresh),
        }
    out = {
        "metric": "isolated per-query reps (stall adjudication)",
        "value": round(sum(q["min_warm"] for q in per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_from_dir(SF_DIR),
        "reps": reps,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    spark.stop()
    if created_dir:
        import shutil

        shutil.rmtree(created_dir, ignore_errors=True)
    print(json.dumps(out))


def scaling_mode(n_pages: int = 600000, levels=(8, 32), reps: int = 3, job: str = "pipeline"):
    """Same job, two parallelism levels, same staged input. The corpus
    is synthesized distributed (per-row deterministic) and written to
    parquet ONCE; both levels read the identical files.

    job="pipeline" times the full KG pipeline; job="webgraph" times the
    web-graph family (host_graph + comention_lift) over the same staged
    corpus — the N-vs-4N evidence for the hyperlink operators."""
    from surfactant_spark.plans.pipeline import run_pipeline
    from surfactant_spark.session import get_spark
    from surfactant_spark.synth import alias_dict_to_spark, synth_pages_distributed

    # a single shared disk serializes shuffle/snapshot I/O in a way a
    # real cluster (per-node disks) would not; back both with ramdisk
    # so the two parallelism levels compare compute, not one disk
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    created_dir = _claim_local_dirs(base)
    # fixed pre-touched heap: guest pages of this VM are lazily
    # host-backed and first touch is very slow; fault the whole heap in
    # once at JVM start (untimed) instead of mid-measurement
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms24g -XX:+AlwaysPreTouch"
    )
    shared = tempfile.mkdtemp(prefix="scalebench-", dir=base)
    src = os.path.join(shared, "pages")
    results = {}
    alias_pdf = None
    lo, hi = levels
    for cpus in levels:
        spark = get_spark(
            f"bench-scaling-{cpus}",
            master=f"local[{cpus}]",
            shuffle_partitions=max(cpus, 8),
        )
        _warm(spark)
        if not os.path.exists(src):
            pages_df, alias_pdf = synth_pages_distributed(
                spark, n_pages, seed=42, partitions=64
            )
            pages_df.write.parquet(src)
            alias_pdf.to_parquet(os.path.join(shared, "alias.parquet"))
        else:
            import pandas as pd

            alias_pdf = pd.read_parquet(os.path.join(shared, "alias.parquet"))
        pages = spark.read.parquet(src)
        alias = alias_dict_to_spark(spark, alias_pdf)
        # this sandbox VM sees intermittent heavy host steal time; run
        # each level several times and keep the best wall (steal only
        # ever slows a run down), reporting observed non-guest time
        walls, steals, n_triples, stage_walls = [], [], 0, {}
        for rep in range(reps):
            workdir = os.path.join(shared, f"work{cpus}-{rep}")
            t0 = time.time()
            cpu0 = _cpu_snap()
            if job == "webgraph":
                from surfactant_spark.operators.webgraph import (
                    comention_lift,
                    extract_links,
                    host_graph,
                )

                links = extract_links(pages).localCheckpoint(eager=True)
                n_triples = (
                    host_graph(pages, links).count()
                    + comention_lift(pages, links).count()
                )
                links.unpersist()
                walls.append(time.time() - t0)
                steals.append(_nonguest_frac(cpu0))
                continue
            res = run_pipeline(spark, pages, alias, workdir, resume=False)
            n_triples = res.edges.count()
            walls.append(time.time() - t0)
            steals.append(_nonguest_frac(cpu0))
            if walls[-1] == min(walls):
                stage_walls = {
                    r.stage: r.wall_ms
                    for r in res.lineage.select("stage", "wall_ms")
                    .dropDuplicates()
                    .collect()
                }
            # NOTE: rep workdirs are deleted only at the very end —
            # freeing tmpfs pages mid-bench hands them back to the host
            # and the next allocation pays the slow first-touch again
        wall = min(walls)
        results[cpus] = {
            "docs_per_sec": round(n_pages / wall, 1),
            "triples_per_sec": round(n_triples / wall, 1),
            "pipeline_wall_s": round(wall, 3),
            "all_walls_s": [round(w, 1) for w in walls],
            "steal_like_frac": [round(s, 3) for s in steals],
            "stage_wall_ms": stage_walls,
        }
        spark.stop()
    import shutil

    shutil.rmtree(shared, ignore_errors=True)
    if created_dir:
        shutil.rmtree(created_dir, ignore_errors=True)
    eff = results[hi]["docs_per_sec"] / ((hi // lo) * results[lo]["docs_per_sec"])
    out = {
        "metric": f"{job} scaling efficiency local[{lo}] -> local[{hi}] (N vs {hi // lo}N stand-in)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_pages": n_pages,
        "levels": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv or "--scaling-webgraph" in sys.argv:
        n, levels, reps = 600000, (8, 32), 3
        for a in sys.argv:
            if a.startswith("--pages="):
                n = int(a.split("=")[1])
            if a.startswith("--levels="):
                levels = tuple(int(x) for x in a.split("=")[1].split(","))
            if a.startswith("--reps="):
                reps = int(a.split("=")[1])
        job = "webgraph" if "--scaling-webgraph" in sys.argv else "pipeline"
        scaling_mode(n, levels, reps, job)
    elif any(a.startswith("--only=") for a in sys.argv):
        names, reps = [], 4
        for a in sys.argv:
            if a.startswith("--only="):
                names = [n for n in a.split("=", 1)[1].split(",") if n]
            if a.startswith("--reps="):
                reps = int(a.split("=")[1])
        only_mode(names, reps)
    else:
        default_mode()
