"""robots.txt rule engine — RFC 9309 subset, pure JVM column algebra.

The crawl stack's third leg (crawl_frontier prioritizes, politeness_
audit meters, THIS decides what may be fetched at all): parse each
host's robots.txt into per-agent rule groups, then join the page table
against the applicable group and apply longest-prefix-match precedence.

Parsing is the gaps-and-islands discipline (streaming/sessions.py's
batch cousin): lines are numbered per host, consecutive ``User-agent``
lines open a group (RFC 9309 §2.1's "start-group lines"), and every
rule line attaches to the most recent group via a running-sum block id
— window functions over per-host partitions, robots corpora are
host-dimension-sized (one small file per host), so nothing here
touches corpus scale. The page-side check IS corpus-scale: a host
equi-join against the rule dimension (broadcastable), a prefix filter,
and one max_by aggregation per url — no regex on the hot path.

RFC subset, documented: rule paths match as literal prefixes; a single
trailing ``*`` is dropped (same semantics); a trailing ``$`` anchors
an exact match; rules with interior wildcards are SKIPPED (they
require regex translation and are rare — a production engine would
compile them; skipping is conservative for Allow and permissive for
Disallow, so the simplification is visible, not silent). Empty
Disallow ("allow all", the RFC idiom) carries no restriction and is
dropped. Group selection: all groups naming the crawler's product
token (case-insensitive exact match) if any exist, else all ``*``
groups (RFC 9309 §2.2.1); matching groups merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_URL_HOST = r"^[a-z]+://([^/?#]+)"


def robots_rules(
    robots: DataFrame,
    agent: str = "ccbot",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Parse per-host robots.txt bodies into the rule group that
    applies to ``agent``: (host, rule_path, is_allow, anchored,
    specificity, crawl_delay). ``specificity`` is the matchable prefix
    length (the RFC's precedence key); ``crawl_delay`` is the group's
    minimum Crawl-delay, repeated on each of the host's rows (null if
    absent). Hosts whose applicable group has only a crawl delay (or
    an allow-all empty Disallow) still emit the implicit allow-all
    rule (empty path, allow, specificity 0) so the delay survives and
    every output column stays non-null except the delay itself."""
    ag = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("ln", "raw"),
    )
    clean = lines.select(
        "host", "ln", F.trim(F.regexp_replace("raw", "#.*", "")).alias("line")
    ).where(F.col("line") != "")
    kv = clean.select(
        "host",
        "ln",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]*):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]*:(.*)$", 1)).alias("val"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow", "crawl-delay"))
    w = Window.partitionBy("host").orderBy("ln")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    is_ua = F.col("key") == "user-agent"
    opens = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    blocks = kv.withColumn(
        "blk", F.sum(opens.cast("int")).over(wcum)
    ).where(F.col("blk") > 0)
    agents = (
        blocks.where(is_ua)
        .select("host", "blk", F.lower(F.col("val")).alias("ua"))
        .dropDuplicates()
    )
    # choose scope per host: the named agent's groups if any, else '*'
    scoped = agents.where(F.col("ua").isin(ag, "*")).groupBy("host", "blk").agg(
        F.max(F.col("ua") == ag).alias("blk_specific")
    )
    host_specific = scoped.groupBy("host").agg(
        F.max("blk_specific").alias("has_specific")
    )
    chosen = (
        scoped.join(host_specific, "host")
        .where(F.col("blk_specific") == F.col("has_specific"))
        .select("host", "blk")
    )
    rules = blocks.where(~is_ua).join(chosen, ["host", "blk"])
    delay = rules.where(F.col("key") == "crawl-delay").groupBy("host").agg(
        F.min(F.col("val").cast("long")).alias("crawl_delay")
    )
    path_rules = (
        rules.where(F.col("key").isin("allow", "disallow"))
        .where(F.col("val") != "")  # empty Disallow = no restriction
        .select(
            "host",
            (F.col("key") == "allow").alias("is_allow"),
            F.regexp_replace("val", r"\*$", "").alias("p0"),
        )
        .withColumn("anchored", F.col("p0").endswith("$"))
        .withColumn("rule_path", F.regexp_replace("p0", r"\$$", ""))
        # interior wildcards need regex translation — skipped subset
        .where(~F.col("rule_path").contains("*") & ~F.col("rule_path").contains("$"))
        .select(
            "host",
            "rule_path",
            "is_allow",
            "anchored",
            F.length("rule_path").cast("long").alias("specificity"),
        )
        .dropDuplicates()
    )
    hosts = chosen.select("host").dropDuplicates()
    with_sentinel = path_rules.unionByName(
        hosts.join(path_rules.select("host").dropDuplicates(), "host", "left_anti")
        .select(
            "host",
            F.lit("").alias("rule_path"),
            F.lit(True).alias("is_allow"),
            F.lit(False).alias("anchored"),
            F.lit(0).cast("long").alias("specificity"),
        )
    )
    return with_sentinel.join(delay, "host", "left").select(
        "host", "rule_path", "is_allow", "anchored", "specificity", "crawl_delay"
    )


def robots_check(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "ccbot",
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Per-page fetch permission under each host's robots.txt:
    (url, host, allowed, rule_path, specificity). Longest-prefix rule
    wins; on equal specificity Allow beats Disallow (RFC 9309 §2.2.2);
    no applicable rule (or no robots.txt for the host) = allowed, with
    a null rule. The winner is picked by one max_by over a fully
    ordered (specificity, is_allow, rule_path) struct — deterministic
    even when distinct rules tie.

    Scale shape: rules are a host dimension (broadcast equi-join);
    the prefix test is a JVM startswith inside the join's filter; ONE
    groupBy(url) max aggregation — no window over the corpus, no
    regex, no Python."""
    rules = robots_rules(robots, agent=agent, host_col=host_col, txt_col=txt_col)
    path_of = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/?#]+", "")
    base = pages.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), _URL_HOST, 1).alias("host"),
        F.when(path_of == "", "/").otherwise(path_of).alias("_path"),
    )
    cand = base.join(
        F.broadcast(rules.where(F.col("rule_path") != "")), "host"
    ).where(
        F.col("_path").startswith(F.col("rule_path"))
        & (~F.col("anchored") | (F.col("_path") == F.col("rule_path")))
    )
    winner = cand.groupBy("url").agg(
        F.max(F.struct("specificity", "is_allow", "rule_path")).alias("w")
    )
    return base.join(winner, "url", "left").select(
        "url",
        "host",
        F.coalesce(F.col("w.is_allow"), F.lit(True)).alias("allowed"),
        F.col("w.rule_path").alias("rule_path"),
        F.col("w.specificity").alias("specificity"),
    )
