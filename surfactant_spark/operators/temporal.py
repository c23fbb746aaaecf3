"""Distributed as-of (temporal) join — the operator Spark's built-in
join family lacks.

KG-construction use: entity linking against a VERSIONED alias
dictionary — each mention must resolve against the dictionary version
in effect at its crawl timestamp (`warc_ts`), the temporal refinement
of the reference's import→export symbol resolution
(`surfactant/relationships/java_relationship.py:11-51`, which joins
against the single current dictionary). The same primitive backs
sessionized attribution (purchase → latest preceding view) and
snapshot-consistent dimension lookups.

Spark-first shape (the Flint/tempo union trick, not a range join):
tag build rows 0 and probe rows 1, union them, and take
``last(match, ignorenulls=True)`` over a window partitioned by the key
and ordered by (ts, side) with an unbounded-preceding frame. That is
ONE shuffle on the key plus a per-key sort — a θ-join
(`probe.ts >= build.ts`) would lower to BNLJ and a per-probe-row scan
of the build side, quadratic per key. The matched build row rides as a
single STRUCT so the match is row-atomic (per-column ``last`` would
mix build rows when a build column is null).

Semantics (= DuckDB `ASOF LEFT JOIN ... ON p.key = b.key AND
p.ts >= b.ts`, which the oracle runs as an independent
implementation): per probe row, the build row with the greatest
build_ts <= probe_ts for the same key, else nulls. Inclusive: a build
row AT the probe timestamp matches (build sorts before probe at equal
ts). Build rows with a null key or null ts never match (pre-filtered —
Spark windows would otherwise group null keys together while SQL join
equality never matches null). Build (key, ts) pairs must be unique —
aggregate first; among exact duplicates the survivor is
partition-order-dependent in any engine.

Scale: the shuffle is on the join key; a pathologically hot key
serializes its window in one task. The standard refinement — range-
bucket each hot key's timeline and replicate the last build row of
each bucket into the next — is documented, not implemented; AQE
handles the ordinary skew of the union's exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    value_cols=None,
    prefix: str = "last_",
) -> DataFrame:
    """Backward inclusive as-of join: every ``probe`` row, plus the
    latest ``build`` row (same ``key``, ``build_ts <= probe_ts``) as
    ``{prefix}{build_ts}`` and ``{prefix}{col}`` columns (null when no
    build row precedes). ``value_cols`` defaults to every build column
    except the key and timestamp."""
    if value_cols is None:
        value_cols = [c for c in build.columns if c not in (key, build_ts)]
    out_cols = list(probe.columns)
    b = build.where(F.col(key).isNotNull() & F.col(build_ts).isNotNull()).select(
        F.col(key).alias("_asof_key"),
        F.col(build_ts).alias("_asof_ts"),
        F.struct(
            F.col(build_ts).alias("_ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_asof_match"),
        F.lit(0).alias("_asof_side"),
    )
    p = probe.select(
        "*",
        F.col(key).alias("_asof_key"),
        F.col(probe_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    w = (
        Window.partitionBy("_asof_key")
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        p.unionByName(b, allowMissingColumns=True)
        .withColumn("_asof_m", F.last("_asof_match", ignorenulls=True).over(w))
        .where(F.col("_asof_side") == 1)
        .select(
            *out_cols,
            F.col("_asof_m._ts").alias(f"{prefix}{build_ts}"),
            *[F.col(f"_asof_m.{c}").alias(f"{prefix}{c}") for c in value_cols],
        )
    )


def funnel_stages(
    events: DataFrame,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the furthest prefix of
    ``steps`` completed IN ORDER, with the earliest completion
    timestamp of each stage (t1..tn, null once the funnel breaks).

    Stage semantics: t1 = min ts of a step-1 event; t_i = min ts of a
    step-i event AT OR AFTER t_{i-1} — the standard earliest-
    completion funnel recurrence (greedy-earliest is optimal: any
    later choice of an earlier stage only shrinks the candidate set
    for the next one). Rows exist for every user who completed stage
    1; ``stage`` counts completed stages.

    Spark-first shape: one filtered per-user min-agg plus one equi
    join per step — every shuffle keys on the user column, no window
    over the full event stream and no per-user sort (the event table
    is touched once per step with a pushed-down type filter, so a
    3-step funnel over 10^12 events is 3 filtered scans, not a
    quadratic self-join). Inclusive >= keeps same-timestamp
    cross-type chains (types differ, so no event matches twice)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    out = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .join(out.select(user_col, f"t{i - 1}"), user_col)
            .where(F.col(ts_col) >= F.col(f"t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
    stage = sum(
        F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return out.select(
        user_col,
        stage.cast("int").alias("stage"),
        *[F.col(f"t{i}") for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 86400,
) -> DataFrame:
    """Cohort retention matrix over an event stream: users are
    cohorted by the time bucket of their FIRST event, and each
    (cohort, offset) cell counts how many of that cohort were active
    ``offset`` buckets later — the product analytics view, and the
    crawl-domain analogue of 'of the hosts first seen in crawl week W,
    how many still emit pages k weeks on' (kg_diff answers what
    changed between two crawls; this tracks survival over all of
    them).

    Returns (cohort_epoch, offset_buckets, n_active, n_cohort,
    retention) with retention = round(n_active / n_cohort, 6) —
    exact-integer inputs, one IEEE divide, one round(6). Bucketing is
    pure integer arithmetic on the epoch (no timestamp casts on the
    oracle surface).

    Spark-first shape: first-event per user is ONE combinable min-agg
    keyed on the user; activity dedups to distinct (user, bucket) the
    same way; the cell count joins activity back to cohorts on the
    user key (equi join — both sides already shuffled on user), and
    cohort sizes ride in as a dimension-sized broadcast. No windows,
    no corpus-order dependence; every buffer is a count."""
    epoch = F.unix_timestamp(F.col(ts_col))
    bucket = (epoch - epoch % bucket_s).alias("bucket_epoch")
    activity = events.select(F.col(user_col).alias("user"), bucket).distinct()
    cohorts = activity.groupBy("user").agg(F.min("bucket_epoch").alias("cohort_epoch"))
    sizes = cohorts.groupBy("cohort_epoch").agg(F.count(F.lit(1)).alias("n_cohort"))
    cells = (
        activity.join(cohorts, "user")
        .groupBy(
            "cohort_epoch",
            F.expr(f"(bucket_epoch - cohort_epoch) div {bucket_s}").alias(
                "offset_buckets"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_epoch").select(
        "cohort_epoch",
        "offset_buckets",
        "n_active",
        "n_cohort",
        F.round(
            F.col("n_active").cast("double") / F.col("n_cohort").cast("double"), 6
        ).alias("retention"),
    )
