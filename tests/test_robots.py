"""robots.txt kernel (RFC 9309) + declarative filter contract — the
gated web_robots_filter query pins engine parity on literal rules;
these pin the kernel semantics the fixture doesn't reach (wildcards,
ties, group selection edge cases) and the wildcard guard."""

import pytest

from jionlp_spark.kernels.robots import (
    parse_robots, robots_allowed)


BODY = """\
# comments ignored
User-agent: jionlp
Disallow: /p/

User-agent: *
Disallow: /q/
Allow: /q/open/
"""


def test_group_selection_specific_beats_star():
    rules = parse_robots(BODY, agent='jionlpbot')
    assert rules == [(False, '/p/')]
    star = parse_robots(BODY, agent='otherbot')
    assert star == [(False, '/q/'), (True, '/q/open/')]


def test_longest_specific_agent_wins():
    body = ("User-agent: jio\nDisallow: /a/\n\n"
            "User-agent: jionlp\nDisallow: /b/\n")
    assert parse_robots(body, 'jionlpbot') == [(False, '/b/')]


def test_adjacent_user_agent_lines_share_rules():
    body = ("User-agent: a\nUser-agent: b\nDisallow: /x/\n")
    assert parse_robots(body, 'a') == [(False, '/x/')]
    assert parse_robots(body, 'b') == [(False, '/x/')]


def test_same_agent_groups_merge():
    body = ("User-agent: *\nDisallow: /a/\n\n"
            "User-agent: *\nDisallow: /b/\n")
    assert parse_robots(body, 'any') == [(False, '/a/'), (False, '/b/')]


def test_empty_disallow_is_allow_all():
    assert parse_robots("User-agent: *\nDisallow:\n", 'x') == []
    assert parse_robots(None, 'x') == []
    assert parse_robots("# nothing here\n", 'x') == []


def test_longest_match_and_allow_tie():
    rules = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/open/\n",
        'x')
    assert robots_allowed('/private/secret', rules) == (False, '/private/')
    assert robots_allowed('/private/open/a', rules) == (True,
                                                        '/private/open/')
    assert robots_allowed('/public', rules) == (True, None)
    # exact length tie: allow wins (RFC 9309 §2.2.2)
    tie = [(False, '/page'), (True, '/page')]
    assert robots_allowed('/page1', tie) == (True, '/page')


def test_wildcard_and_anchor_matching():
    rules = parse_robots(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n", 'x')
    assert robots_allowed('/a/b.pdf', rules)[0] is False
    assert robots_allowed('/a/b.pdfx', rules)[0] is True     # $ anchors
    assert robots_allowed('/tmp123/x', rules)[0] is False
    # precedence by PATTERN length on wildcard rules
    mixed = parse_robots(
        "User-agent: *\nDisallow: /dir/\nAllow: /dir/*.html$\n", 'x')
    assert robots_allowed('/dir/a.html', mixed)[0] is True
    assert robots_allowed('/dir/a.txt', mixed)[0] is False


def test_declarative_filter_rejects_wildcards(spark):
    from jionlp_spark.operators.weblinks import robots_filter
    urls = spark.createDataFrame(
        [('http://h.example.com/p/1',)], 'url string')
    rules = spark.createDataFrame(
        [('h.example.com', False, '/p*')],
        'host string, allow boolean, pattern string')
    with pytest.raises(Exception, match='literal prefix'):
        robots_filter(urls, rules).collect()


def test_declarative_filter_no_rule_host_allows(spark):
    from jionlp_spark.operators.weblinks import robots_filter
    urls = spark.createDataFrame(
        [('http://a.example.com/p/1',), ('http://b.example.com/p/2',)],
        'url string')
    rules = spark.createDataFrame(
        [('a.example.com', False, '/p/')],
        'host string, allow boolean, pattern string')
    rows = {r.url: r for r in robots_filter(urls, rules).collect()}
    assert rows['http://a.example.com/p/1'].allowed is False
    assert rows['http://b.example.com/p/2'].allowed is True
    assert rows['http://b.example.com/p/2'].rule_path is None


def test_parse_robots_directives():
    """Crawl-delay group selection mirrors parse_robots; Sitemap is
    global, ordered, deduped; tolerant of junk values."""
    from jionlp_spark.kernels.robots import parse_robots_directives as p

    # sitemap lines collect globally (even inside a group), dedup,
    # file order; * group's delay applies
    r = p('Sitemap: http://a/s.xml\nUser-agent: *\nCrawl-delay: 2\n'
          'Sitemap: http://a/s2.xml\nSitemap: http://a/s.xml\n')
    assert r.sitemaps == ['http://a/s.xml', 'http://a/s2.xml']
    assert r.crawl_delay == 2.0

    # the governing group is the SPECIFIC one even when only * has a
    # delay — a site that addressed this agent withheld a delay
    r = p('User-agent: *\nCrawl-delay: 5\n'
          'User-agent: jionlp\nDisallow: /x\n', agent='jionlpbot')
    assert r.crawl_delay is None

    # non-numeric skipped, first parseable wins, later ones ignored
    r = p('User-agent: jio\nCrawl-delay: oops\nCrawl-delay: 1.5\n'
          'Crawl-delay: 9\n', agent='jionlpbot')
    assert r.crawl_delay == 1.5

    # negative ignored; empty/None-safe; shared header run shares
    assert p('User-agent: *\nCrawl-delay: -1\n').crawl_delay is None
    assert p('') == (None, []) and p(None) == (None, [])
    assert p('User-agent: a\nUser-agent: b\nCrawl-delay: 3\n',
             agent='b-bot').crawl_delay == 3.0


def test_robots_filter_full_hybrid_routing(spark):
    """robots_filter_full: a literal-only host and a wildcard host get
    identical verdict semantics; cross-kind precedence on the wildcard
    host matches robots_allowed exactly."""
    from jionlp_spark.operators.weblinks import (robots_filter_full,
                                                 robots_rules)
    robots = spark.createDataFrame(
        [('lit.com', 'User-agent: *\nDisallow: /p/\n'),
         ('wc.com', 'User-agent: *\nDisallow: /*?sess\n'
                    'Allow: /p/\nDisallow: /p\n')],
        'host string, robots_txt string')
    urls = spark.createDataFrame(
        [('http://lit.com/p/a',), ('http://lit.com/ok',),
         ('http://wc.com/p/a',), ('http://wc.com/p/a?sess=1',),
         ('http://wc.com/q',)], 'url string')
    out = {r['url']: (r['allowed'], r['rule_path'])
           for r in robots_filter_full(urls,
                                       robots_rules(robots)).collect()}
    assert out == {
        'http://lit.com/p/a': (False, '/p/'),
        'http://lit.com/ok': (True, None),
        'http://wc.com/p/a': (True, '/p/'),        # allow 3 beats /p 2
        'http://wc.com/p/a?sess=1': (False, '/*?sess'),  # 7 beats 3
        'http://wc.com/q': (True, None),
    }


def test_equal_len_allow_tie_reports_lex_smallest_pattern():
    """(len, allow) ties break to the lexicographically-smallest
    pattern — rule-set ORDER never decides the reported rule_path, so
    the kernel agrees with the declarative JVM window (length desc,
    allow desc, pattern asc) on both verdict AND pattern."""
    # two same-length wildcard disallows both matching '/xab'
    tie = [(False, '/x*b'), (False, '/x*a')]
    assert robots_allowed('/xab', tie) == (False, '/x*a')
    assert robots_allowed('/xab', list(reversed(tie))) == (False, '/x*a')
    # allow still wins the (len) tie before pattern order applies
    mixed = [(False, '/x*a'), (True, '/x*b')]
    assert robots_allowed('/xab', mixed) == (True, '/x*b')
