"""robots.txt parsing (RFC 9309) + the distributed frontier filter."""

import pytest

from medical_and_charity_document_extraction_system_spark.functions.robots import (
    parse_robots,
    pattern_to_like,
    synthesize_robots,
)


# ----------------------------------------------------------- parser
def test_exact_agent_group_suppresses_star():
    txt = (
        "User-agent: *\nDisallow: /all/\n\n"
        "User-agent: medcharity-bot\nDisallow: /mine/\n"
    )
    assert parse_robots(txt) == [("/mine/", False)]
    # an agent with no group of its own falls back to *
    assert parse_robots(txt, agent="strangerbot") == [("/all/", False)]


def test_stacked_user_agents_share_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(txt, agent="B") == [("/x", False)]
    assert parse_robots(txt, agent="a") == [("/x", False)]


def test_groups_for_same_agent_merge():
    txt = (
        "User-agent: *\nDisallow: /one\n\n"
        "User-agent: other\nDisallow: /theirs\n\n"
        "User-agent: *\nAllow: /two\n"
    )
    assert parse_robots(txt, agent="nobody") == [("/one", False), ("/two", True)]


def test_empty_disallow_comments_and_noise_lines():
    txt = (
        "# banner\n"
        "User-AGENT: medcharity-bot  # inline\n"
        "Disallow:\n"
        "Crawl-delay: 10\n"
        "Sitemap: https://x/s.xml\n"
        "DISALLOW: /p  # tail comment\n"
        "not a field line\n"
    )
    assert parse_robots(txt) == [("/p", False)]


def test_non_ua_line_ends_agent_run():
    # after a rule line, a new User-agent starts a NEW group
    txt = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert parse_robots(txt, agent="b") == [("/y", False)]
    assert parse_robots(txt, agent="a") == [("/x", False)]


def test_pattern_to_like():
    assert pattern_to_like("/doc/1") == "/doc/1%"
    assert pattern_to_like("/doc/*7$") == "/doc/%7"
    assert pattern_to_like("/a$") == "/a"
    assert pattern_to_like("/p%q_r\\s") == "/p\\%q\\_r\\\\s%"
    assert pattern_to_like("*") == "%%"  # matches everything, harmless


def test_synthesized_shapes():
    # shape 0: exact-agent group wins; * group ignored
    assert parse_robots(synthesize_robots(0)) == [
        ("/doc/12", True),
        ("/doc/1", False),
    ]
    # shape 1: wildcard + anchor via the * group
    assert parse_robots(synthesize_robots(1)) == [
        ("/doc/*7$", False),
        ("/admin/", False),
    ]
    # shape 2: empty Disallow -> no rules at all
    assert parse_robots(synthesize_robots(2)) == []
    # the badscraper group never leaks into our agent
    assert ("/", False) not in parse_robots(synthesize_robots(0))


# ------------------------------------------------- distributed filter
@pytest.fixture(scope="module")
def filtered(spark):
    from medical_and_charity_document_extraction_system_spark.operators.crawl import (
        robots_filter,
        robots_rules,
    )

    urls = spark.createDataFrame(
        [
            (0, "https://host0.example.com/doc/19999"),   # /doc/1 -> blocked
            (1, "https://host0.example.com/doc/12345"),   # /doc/12 carve-out
            (2, "https://host0.example.com/doc/555"),     # no match -> allow
            (3, "https://host1.example.com/doc/87"),      # *7$ -> blocked
            (4, "https://host1.example.com/doc/871"),     # not anchored-match
            (5, "https://host2.example.com/doc/1"),       # empty disallow
            (6, "https://host1.example.com"),             # empty path -> '/'
        ],
        "id long, url string",
    )
    robots = spark.createDataFrame(
        [(f"host{i}.example.com", synthesize_robots(i)) for i in range(3)],
        "host string, robots_txt string",
    )
    rows = robots_filter(urls, robots_rules(robots)).collect()
    return {r["id"]: r for r in rows}


def test_filter_longest_match_and_defaults(filtered):
    assert (filtered[0]["allowed"], filtered[0]["rule"]) == (False, "/doc/1")
    # longer Allow beats shorter Disallow (RFC 9309 precedence)
    assert (filtered[1]["allowed"], filtered[1]["rule"]) == (True, "/doc/12")
    assert (filtered[2]["allowed"], filtered[2]["rule"]) == (True, "(default)")


def test_filter_wildcard_anchor(filtered):
    assert (filtered[3]["allowed"], filtered[3]["rule"]) == (False, "/doc/*7$")
    assert filtered[4]["allowed"] is True


def test_filter_no_rules_host_and_bare_path(filtered):
    assert filtered[5]["allowed"] is True
    # bare host: path defaults to '/', no rule matches it here
    assert filtered[6]["allowed"] is True
    # every input row survives with its columns intact
    assert len(filtered) == 7
