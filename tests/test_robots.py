"""robots.txt rule engine unit tests: RFC 9309 group selection,
longest-prefix precedence, Allow-beats-Disallow ties, anchored and
trailing-* rules, the skipped interior-wildcard subset, crawl delay,
and plan-shape guards. (The cross-engine oracle replay runs in
test_entry.py like every other family.)"""

import pytest
from pyspark.sql import functions as F

from surfactant_spark.operators.robots import robots_check, robots_rules


def _robots(spark, body, host="h.example.org"):
    return spark.createDataFrame(
        [(host, body)], "host string, robots_txt string"
    )


def _pages(spark, paths, host="h.example.org"):
    return spark.createDataFrame(
        [(f"https://{host}{p}",) for p in paths], "url string"
    )


def test_named_group_beats_star_and_star_used_as_fallback(spark):
    body = (
        "User-agent: CCBot\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    # ccbot: only the named group applies
    rules = robots_rules(_robots(spark, body), agent="ccbot").collect()
    assert [(r.rule_path, r.is_allow) for r in rules] == [("/a", False)]
    # an agent with no named group falls back to '*'
    rules = robots_rules(_robots(spark, body), agent="otherbot").collect()
    assert [(r.rule_path, r.is_allow) for r in rules] == [("/", False)]


def test_longest_prefix_wins_and_allow_breaks_ties(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /shop\n"
        "Allow: /shop/ok\n"
        "Allow: /dup\n"
        "Disallow: /dup\n"  # equal specificity: Allow must win
    )
    got = {
        r.url: (r.allowed, r.rule_path)
        for r in robots_check(
            _pages(spark, ["/shop/x", "/shop/ok/y", "/dup/z", "/free"]),
            _robots(spark, body),
        ).collect()
    }
    h = "https://h.example.org"
    assert got[f"{h}/shop/x"] == (False, "/shop")
    assert got[f"{h}/shop/ok/y"] == (True, "/shop/ok")
    assert got[f"{h}/dup/z"] == (True, "/dup")
    assert got[f"{h}/free"] == (True, None)  # no rule -> default allow


def test_anchored_trailing_star_and_skipped_wildcards(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /exact$\n"
        "Disallow: /wild*\n"
        "Disallow: /a*b\n"  # interior wildcard: skipped, conservative
    )
    got = {
        r.url: r.allowed
        for r in robots_check(
            _pages(spark, ["/exact", "/exact/sub", "/wildcat", "/aXb"]),
            _robots(spark, body),
        ).collect()
    }
    h = "https://h.example.org"
    assert got[f"{h}/exact"] is False  # $ matches exactly
    assert got[f"{h}/exact/sub"] is True  # ...and only exactly
    assert got[f"{h}/wildcat"] is False  # trailing * == prefix
    assert got[f"{h}/aXb"] is True  # interior wildcard rule skipped


def test_rules_outside_groups_ignored_and_delay_survives(spark):
    body = (
        "Disallow: /orphan\n"  # before any User-agent: ignored
        "User-agent: *\n"
        "Disallow:\n"  # empty Disallow: allow-all idiom
        "Crawl-delay: 7\n"
    )
    rules = robots_rules(_robots(spark, body)).collect()
    # only the implicit allow-all sentinel, carrying the delay
    assert [(r.rule_path, r.is_allow, r.specificity, r.crawl_delay) for r in rules] == [
        ("", True, 0, 7)
    ]
    got = robots_check(_pages(spark, ["/orphan/x"]), _robots(spark, body)).collect()
    assert got[0].allowed is True and got[0].rule_path is None


def test_unrelated_agent_only_means_default_allow(spark):
    body = "User-agent: googlebot\nDisallow: /\n"
    assert robots_rules(_robots(spark, body), agent="ccbot").count() == 0
    got = robots_check(
        _pages(spark, ["/x"]), _robots(spark, body), agent="ccbot"
    ).collect()
    assert got[0].allowed is True


def test_stacked_agents_share_group_and_case_folds(spark):
    body = (
        "USER-AGENT: CCBot\nUser-Agent: friendbot\n"
        "DISALLOW: /Case\n"
    )
    for ag in ("ccbot", "friendbot"):
        rules = robots_rules(_robots(spark, body), agent=ag).collect()
        assert [(r.rule_path, r.is_allow) for r in rules] == [("/Case", False)]
    # rule paths stay case-sensitive (RFC: paths compare byte-wise)
    got = {
        r.url: r.allowed
        for r in robots_check(
            _pages(spark, ["/Case/x", "/case/x"]), _robots(spark, body)
        ).collect()
    }
    h = "https://h.example.org"
    assert got[f"{h}/Case/x"] is False
    assert got[f"{h}/case/x"] is True


def test_check_plan_is_broadcast_equi_join_no_python(spark):
    body = "User-agent: *\nDisallow: /p\n"
    df = robots_check(_pages(spark, ["/p/1", "/q"]), _robots(spark, body))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "CartesianProduct" not in plan


def test_crawl_plan_precedence_and_branches(spark):
    """skip_robots beats fetch beats hold beats skip_fresh; all four
    branches must appear on the gate fixture."""
    from surfactant_spark.queries import q_crawl_plan
    from tests.conftest import SF_DIR

    rows = q_crawl_plan(spark, SF_DIR).collect()
    seen = {r.decision for r in rows}
    assert seen == {"skip_robots", "fetch", "hold", "skip_fresh"}
    for r in rows:
        if not r.allowed:
            assert r.decision == "skip_robots"
        elif r.status in ("stale", "uncaptured"):
            assert r.decision == "fetch"
        elif r.status == "unknown":
            assert r.decision == "hold"
        else:
            assert r.decision == "skip_fresh"
    # the site0 group carries its crawl delay onto every decision row
    assert all(
        r.crawl_delay == 2 for r in rows if r.host == "site0.example.org"
    )
