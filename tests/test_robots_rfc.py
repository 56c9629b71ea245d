"""RFC 9309 robots semantics: Allow rules, * and $ wildcards,
longest-match-wins precedence (the reference has no robots handling —
this is the engine's own crawl-correctness surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubcrawler_spark.operators import schedule as sched
from pubcrawler_spark.operators.schedule import robots_allowed_rfc9309


def _rules(*pairs):
    return [{"pattern": p, "allow": a} for p, a in pairs]


def test_rfc_longest_match_wins():
    # RFC 9309 §2.2.2 / §5.2-style examples
    r = _rules(("/p", False), ("/page", True))
    assert robots_allowed_rfc9309("/page", r) is True  # allow is longer
    r = _rules(("/folder", True), ("/folder/", False))
    assert robots_allowed_rfc9309("/folder/page", r) is False  # disallow longer
    # equal length → allow wins
    r = _rules(("/page", True), ("/page", False))
    assert robots_allowed_rfc9309("/page", r) is True
    # no match → allowed
    assert robots_allowed_rfc9309("/else", _rules(("/page", False))) is True
    # empty rule list → allowed
    assert robots_allowed_rfc9309("/x", []) is True


def test_rfc_wildcards_and_anchor():
    r = _rules(("/*.php", False),)
    assert robots_allowed_rfc9309("/index.php", r) is False
    assert robots_allowed_rfc9309("/folder/any.php.html", r) is False  # prefix, not anchored
    assert robots_allowed_rfc9309("/index.html", r) is True
    r = _rules(("/*.php$", False),)
    assert robots_allowed_rfc9309("/index.php", r) is False
    assert robots_allowed_rfc9309("/index.php?q=1", r) is True  # anchored: query breaks it
    r = _rules(("/fish*.php", False),)
    assert robots_allowed_rfc9309("/fishheads/catfish.php?a=1", r) is False
    assert robots_allowed_rfc9309("/Fish.PHP", r) is True  # case-sensitive


def test_parse_collects_allow_and_flags_advanced(spark):
    robots = spark.createDataFrame(
        [
            ("a.org", "User-agent: *\nDisallow: /private/\n"),
            ("b.org", "User-agent: *\nDisallow: /p\nAllow: /page\nCrawl-delay: 1\n"),
            ("c.org", "User-agent: *\nDisallow: /*.php$\n"),
        ],
        "host string, robots_txt string",
    )
    rules = {r["host"]: r.asDict() for r in sched.parse_robots_rules(robots).collect()}
    assert rules["a.org"]["has_advanced"] is False
    assert rules["b.org"]["has_advanced"] is True  # Allow rule
    assert rules["c.org"]["has_advanced"] is True  # wildcard + anchor
    assert rules["b.org"]["crawl_delay_ms"] == 1000
    assert [tuple(x) for x in rules["b.org"]["rules"]] == [("/p", False), ("/page", True)]


def test_tag_robots_rfc_path(spark):
    robots = spark.createDataFrame(
        [
            ("plain.org", "User-agent: *\nDisallow: /private/\n"),
            ("adv.org", "User-agent: *\nDisallow: /p\nAllow: /page\nDisallow: /*.php$\n"),
        ],
        "host string, robots_txt string",
    )
    rules = sched.parse_robots_rules(robots)
    frontier = spark.createDataFrame(
        [
            ("https://plain.org/private/x.html", "plain.org", 1),
            ("https://plain.org/ok.html", "plain.org", 2),
            ("https://adv.org/page/deep.html", "adv.org", 3),   # allow beats /p
            ("https://adv.org/pri.html", "adv.org", 4),          # /p disallows
            ("https://adv.org/run.php", "adv.org", 5),           # anchored wildcard
            ("https://adv.org/run.php5", "adv.org", 6),          # NOT anchored match
            ("https://nobots.org/x.html", "nobots.org", 7),      # no rules → ok
        ],
        "url_canon string, host string, url_hash long",
    )
    got = {
        r["url_hash"]: r["robots_ok"]
        for r in sched.tag_robots(frontier, rules, advanced=True).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: False, 5: False, 6: True, 7: True}
    # fast path agrees wherever only plain prefixes exist
    plain_only = frontier.filter("host = 'plain.org' or host = 'nobots.org'")
    fast = {
        r["url_hash"]: r["robots_ok"]
        for r in sched.tag_robots(plain_only, rules, advanced=False).collect()
    }
    assert fast == {1: False, 2: True, 7: True}
    # distributed-fallback parity: past HOST_SIDE_BROADCAST_LIMIT hosts
    # the rules dim stops being broadcast (small_dim=False) — the
    # shuffle-join path must produce identical verdicts, and its plan
    # must carry no broadcast hint on the rules side.
    dist = {
        r["url_hash"]: r["robots_ok"]
        for r in sched.tag_robots(
            frontier, rules, advanced=True, small_dim=False
        ).collect()
    }
    assert dist == got
    def _opt_plan(small_dim):
        df = sched.tag_robots(frontier, rules, advanced=True, small_dim=small_dim)
        return df._jdf.queryExecution().optimizedPlan().toString().lower()

    assert "broadcast" not in _opt_plan(False)
    assert "broadcast" in _opt_plan(True)


def test_engine_with_advanced_robots(spark, tmp_path):
    """End-to-end: an Allow carve-out inside a Disallow'd subtree is
    scheduled; the rest of the subtree is not."""
    from pubcrawler_spark.fixtures import YEAR, generate_pages, pages_spark_df
    from pubcrawler_spark.plans.frontier import CrawlEngine

    fx = generate_pages(300)
    # every 7th host disallows /private/ in the fixture; carve out one
    # specific private page on host0 with a longer Allow rule
    private = [r["url"] for r in fx.rows if "/private/" in r["url"] and r["url"].startswith("https://host0.")]
    if not private:
        pytest.skip("fixture produced no private page on host0")
    carve = private[0]
    path = carve.replace("https://host0.example.org", "")
    robots = dict(fx.robots)
    robots["host0.example.org"] = f"User-agent: *\nDisallow: /private/\nAllow: {path}\n"
    robots_df = spark.createDataFrame(sorted(robots.items()), "host string, robots_txt string")

    eng = CrawlEngine(
        spark, pages_spark_df(spark, fx), robots_df, fx.seeds,
        checkpoint_dir=str(tmp_path / "ckr"), year=YEAR, host_budget=50,
    )
    assert eng._robots_advanced is True
    eng.run(max_iterations=4)
    sched_urls = {r["url_canon"] for r in eng.full_schedule().collect()}
    # no non-carved host0 private page was ever scheduled
    assert not (set(private[1:]) & sched_urls)
    # the engine's own cached rules admit exactly the carved page
    from pubcrawler_spark.functions.urltools import with_canonical_url

    probe = with_canonical_url(
        spark.createDataFrame([(u,) for u in private[:4]], "url string")
    )
    got = {
        r["url_canon"]: r["robots_ok"]
        for r in sched.tag_robots(probe, eng.robots_rules, advanced=True).collect()
    }
    assert got[carve] is True
    assert all(ok is False for u, ok in got.items() if u != carve)
