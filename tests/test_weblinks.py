"""Web link graph family: kernels/links.py extraction contract +
operators/weblinks aggregation semantics (the oracle-contract suite
covers the gated end-to-end queries; these pin the kernel edge cases the
deterministic corpus can't carry)."""

import pyspark.sql.functions as F
import pytest

from jionlp_spark.kernels.links import extract_links, url_host


def test_url_host_cases():
    assert url_host('http://A.Example.COM/p') == 'a.example.com'
    assert url_host('HTTPS://X.com') == 'x.com'          # scheme case
    assert url_host('http://user:pw@Host.com:8080/x') == 'host.com'
    assert url_host('//proto.Rel/x') == 'proto.rel'
    assert url_host('ftp://a.com/x') is None             # non-web scheme
    assert url_host('mailto:u@x.com') is None
    assert url_host('relative/path') is None
    assert url_host('http:opaque') is None               # no authority
    assert url_host('http://') is None                   # empty authority


def test_extract_links_drops_junk_schemes_and_fragments():
    html = ('<a href="javascript:void(0)">j</a>'
            '<a href="tel:+123">t</a><a href="data:text/plain,x">d</a>'
            '<a href="#sec">f</a><a href="">e</a>'
            '<a href="ftp://host/x">ftp</a>'
            '<a href="http://ok.com/x">ok</a>')
    out = extract_links(html, 'http://base.com/p')
    assert [d['dst_host'] for d in out] == ['ok.com']


def test_extract_links_relative_needs_base_host():
    # path-relative href against a base URL with no web authority → drop
    assert extract_links('<a href="/x">a</a>', 'not-a-url') == []
    out = extract_links('<a href="sub/page.html">a</a>',
                        'http://b.com/dir/p')
    assert [d['dst_host'] for d in out] == ['b.com']


def test_extract_links_bare_href_and_anchor_normalization():
    html = ('<A HREF=http://U.com/x rel=nofollow>  to\n <i>you</i>  </A>'
            "<a data-x='1' href='//p.com:80/y'>px</a>")
    out = extract_links(html, 'http://b.com/')
    assert [(d['dst_host'], d['anchor']) for d in out] == [
        ('u.com', 'to you'), ('p.com', 'px')]
    assert out[0]['href'] == 'http://U.com/x'


def test_extract_links_preserves_duplicates_in_order():
    html = '<a href="http://a.com/1">x</a><a href="http://a.com/2">x</a>'
    out = extract_links(html, 'http://b.com/')
    assert len(out) == 2 and {d['dst_host'] for d in out} == {'a.com'}


@pytest.fixture(scope='module')
def links_df(spark):
    from jionlp_spark.operators.weblinks import extract_links as op
    rows = [
        ('http://s1.com/a',
         b'<a href="http://s2.com/x">two</a>'
         b'<a href="/self">home</a><a href="http://s3.com/x">three</a>'),
        ('http://s1.com/b', b'<a href="http://s2.com/y">two</a>'),
        ('http://s2.com/a', b'<a href="http://s1.com/x">one</a>'
                            b'<a href="http://s1.com/y">uno</a>'),
    ]
    return op(spark.createDataFrame(rows, 'url string, html binary'))


def test_host_edges_drop_self(links_df):
    from jionlp_spark.operators.weblinks import host_edges
    kept = {(r.src_host, r.dst_host): r.n_links
            for r in host_edges(links_df).collect()}
    assert kept == {('s1.com', 's2.com'): 2, ('s1.com', 's3.com'): 1,
                    ('s2.com', 's1.com'): 2}
    with_self = {(r.src_host, r.dst_host): r.n_links
                 for r in host_edges(links_df, drop_self=False).collect()}
    assert with_self[('s1.com', 's1.com')] == 1


def test_anchor_stats_total_order_and_cut(links_df):
    from jionlp_spark.operators.weblinks import anchor_stats
    rows = sorted(anchor_stats(links_df, k=1).collect())
    got = {(r.dst_host): (r.anchor, r.n, r.rank) for r in rows}
    # s1.com has 'home' (self-link), 'one', 'uno' all n=1: tie broken
    # anchor asc → 'home'
    assert got['s1.com'] == ('home', 1, 1)
    assert got['s2.com'] == ('two', 2, 1)


def test_host_pagerank_mass_conserved(spark):
    from jionlp_spark.operators.weblinks import host_pagerank
    edges = spark.createDataFrame(
        [('a', 'b', 2), ('b', 'c', 1), ('c', 'a', 1), ('a', 'c', 1)],
        'src_host string, dst_host string, n_links long')
    prs = host_pagerank(edges, iters=3).collect()
    assert len(prs) == 3
    assert abs(sum(r.pr for r in prs) - 1.0) < 1e-9
    # 'b' receives 2/3 of a's mass, 'c' only 1/3 of a's + all of b's
    byv = {r.host: r.pr for r in prs}
    assert byv['c'] > byv['b'] > 0


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, 's string, t string')
    return df.union(df.selectExpr('t as s', 's as t')).distinct()


def test_kcore_triangle_survives_pendants_peel(spark):
    from jionlp_spark.operators.graph import k_core
    edges = _sym(spark, [('a', 'b'), ('b', 'c'), ('c', 'a'),
                         ('c', 'p0'), ('p0', 'p1'), ('p1', 'p2')])
    got = {r.v: r.deg for r in
           k_core(edges, k=2, src_col='s', dst_col='t').collect()}
    assert got == {'a': 2, 'b': 2, 'c': 2}


def test_kcore_pure_path_peels_to_empty_one_tip_per_round(spark):
    from jionlp_spark.operators.graph import k_core
    path = [(f'n{i}', f'n{i+1}') for i in range(8)]
    edges = _sym(spark, path)
    assert k_core(edges, k=2, src_col='s', dst_col='t').count() == 0
    # the peel is genuinely sequential: a 2-round budget cannot finish
    import pytest as _pt
    with _pt.raises(RuntimeError, match='did not converge'):
        k_core(edges, k=2, src_col='s', dst_col='t', max_rounds=2)


def test_kcore_k3_drops_the_ring(spark):
    from jionlp_spark.operators.graph import k_core
    # 4-clique survives k=3; the square (deg 2) does not
    clique = [('a', 'b'), ('a', 'c'), ('a', 'd'), ('b', 'c'),
              ('b', 'd'), ('c', 'd')]
    square = [('w', 'x'), ('x', 'y'), ('y', 'z'), ('z', 'w')]
    edges = _sym(spark, clique + square)
    got = {r.v: r.deg for r in
           k_core(edges, k=3, src_col='s', dst_col='t').collect()}
    assert got == {'a': 3, 'b': 3, 'c': 3, 'd': 3}


def test_recrawl_plan_buckets_and_vanished_host(spark, tmp_path):
    """Strict boundaries (churn·den ≥ n fires at equality) and the
    vanished-host rule (n_urls=0 → fast bucket)."""
    from jionlp_spark.operators.weblinks import recrawl_plan
    from jionlp_spark.sources.catalog import run_stage
    base = str(tmp_path / 't')
    rows1 = ([(f'http://a.org/p{i}', f's{i}') for i in range(4)]      # a: 4
             + [(f'http://b.org/p{i}', f's{i}') for i in range(20)]   # b: 20
             + [('http://c.org/p0', 'x')])                            # c: 1
    v1 = spark.createDataFrame(rows1, 'url string, sig string')
    run_stage(spark, base, 'crawl', lambda: v1, input_fingerprint='v1')
    # a: exactly 1 of 4 changed → 1·4 ≥ 4 (boundary) → fast
    # b: exactly 1 of 20 changed → 1·4 < 20, 1·20 ≥ 20 (boundary) → mid
    # c: vanishes entirely → n_urls 0, removed 1 → fast
    rows2 = ([('http://a.org/p0', 'CHANGED')]
             + [(f'http://a.org/p{i}', f's{i}') for i in range(1, 4)]
             + [('http://b.org/p0', 'CHANGED')]
             + [(f'http://b.org/p{i}', f's{i}') for i in range(1, 20)])
    v2 = spark.createDataFrame(rows2, 'url string, sig string')
    run_stage(spark, base, 'crawl', lambda: v2, input_fingerprint='v2')
    got = {r.host: r for r in recrawl_plan(spark, base, 1, 2).collect()}
    assert got['a.org'].interval_days == 1
    assert got['b.org'].interval_days == 7
    assert (got['c.org'].n_urls, got['c.org'].n_removed,
            got['c.org'].interval_days) == (0, 1, 1)


def test_sitemap_kernel_paths():
    """parse_sitemap: kind detection, case/attribute tolerance, CDATA
    trim, ONE-PASS entity decode, empty-loc skip, truncated tail."""
    from jionlp_spark.kernels.sitemap import parse_sitemap

    kind, es = parse_sitemap(
        '<urlset><url><loc>http://a/x?p=1&amp;q=2</loc>'
        '<lastmod>2026-01-01</lastmod><priority>0.5</priority></url>'
        '<url><loc>http://a/y</loc></url></urlset>')
    assert kind == 'urlset'
    assert [e.loc for e in es] == ['http://a/x?p=1&q=2', 'http://a/y']
    assert es[0].lastmod == '2026-01-01' and es[0].priority == '0.5'
    assert es[1].lastmod is None and es[1].changefreq is None

    # one-pass decode: &amp;lt; is the ESCAPED text '&lt;', not '<'
    _, es = parse_sitemap('<urlset><url><loc>a&amp;lt;b</loc></url>'
                          '</urlset>')
    assert es[0].loc == 'a&lt;b'

    # uppercase + attributes + CDATA (literal, trimmed) + empty loc
    kind, es = parse_sitemap(
        '<URLSET xmlns="x"><URL a="1"><LOC><![CDATA[  http://c/&amp; '
        ' ]]></LOC></URL><URL><LOC> </LOC></URL></URLSET>')
    assert kind == 'urlset' and len(es) == 1
    assert es[0].loc == 'http://c/&amp;'   # no decode inside CDATA

    # numeric character references: decimal, hex, and UPPERCASE hex
    _, es = parse_sitemap('<urlset><url><loc>http://d&#47;n&#x2F;m'
                          '&#X2F;o</loc></url></urlset>')
    assert es[0].loc == 'http://d/n/m/o'

    # sitemapindex + a truncated (unclosed) trailing block is skipped
    kind, es = parse_sitemap(
        '<sitemapindex><sitemap><loc>http://e/sm1.xml</loc></sitemap>'
        '<sitemap><loc>http://e/sm2.xml</loc>')
    assert kind == 'sitemapindex'
    assert [e.loc for e in es] == ['http://e/sm1.xml']

    # junk / None / empty → no kind, no entries
    assert parse_sitemap('no tags here') == (None, [])
    assert parse_sitemap(None) == (None, [])
    assert parse_sitemap('') == (None, [])


def test_sitemap_entries_operator(spark):
    """sitemap_entries: one mapInPandas node, hosts with junk emit
    nothing, optional fields surface as nulls."""
    from jionlp_spark.operators.weblinks import sitemap_entries
    sm = spark.createDataFrame(
        [('a.com', '<urlset><url><loc>http://a.com/1</loc>'
                   '<changefreq>daily</changefreq></url></urlset>'),
         ('b.com', 'junk')],
        'host string, sitemap_xml string')
    rows = sitemap_entries(sm).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r['host'], r['kind'], r['loc'], r['changefreq']) == \
        ('a.com', 'urlset', 'http://a.com/1', 'daily')
    assert r['lastmod'] is None and r['priority'] is None


def test_content_extract_kernel():
    """content_blocks/extract_content: length + integer-crossed link
    density verdicts, script/comment removal, entity decode, order."""
    from jionlp_spark.kernels.content_extract import (content_blocks,
                                                      extract_content)
    html = ('<html><head><script>var a="<p>fake</p>";</script></head>'
            '<body><div><a href="/">home</a> <a>about &amp; us</a></div>'
            '<p>this paragraph is long enough to be kept as content</p>'
            '<p>tiny</p>'
            '<div>more: <a>click here for many more stories now</a>'
            '</div>'
            '<!-- c --><footer>see <a>this footer link text that is '
            'long enough to pass the length rule</a>'
            '</footer></body></html>')
    bs = content_blocks(html, min_len=30)
    texts = [b.text for b in bs]
    assert texts[0] == 'home about & us'          # entities decoded
    assert not bs[0].kept                          # short AND linky
    assert bs[1].kept                              # the main block
    assert not bs[2].kept                          # tiny
    assert not bs[3].kept                          # link density > 1/2
    # footer: long enough but anchor covers most of it → density drop
    assert not bs[4].kept
    content, n_kept, n_dropped = extract_content(html, min_len=30)
    assert content == ('this paragraph is long enough to be kept '
                       'as content')
    assert (n_kept, n_dropped) == (1, 4)
    # density boundary is inclusive via integer cross-multiply:
    # link_chars·2 == n_chars·1 keeps (no float tie risk)
    half = '<p>aaaaaaaaaaaaaa<a>bbbbbbbbbbbbbbb</a></p>'
    b = content_blocks(half, min_len=10)[0]
    assert b.n_chars == 30 and b.link_chars == 15 and b.kept
    assert extract_content(None) == ('', 0, 0)
    assert extract_content('') == ('', 0, 0)


def test_content_extract_operator(spark):
    """content_extract: one mapInPandas node over (doc_id, html)."""
    from jionlp_spark.operators.weblinks import content_extract
    pages = spark.createDataFrame(
        [(1, '<body><p>the quick brown fox jumps over the lazy '
             'dog today</p><p>hi</p></body>'),
         (2, None)],
        'doc_id long, html string')
    out = {r['doc_id']: r for r in content_extract(pages).collect()}
    assert out[1]['content'].startswith('the quick brown fox')
    assert (out[1]['n_kept'], out[1]['n_dropped']) == (1, 1)
    assert (out[2]['content'], out[2]['n_kept']) == ('', 0)


def test_sitemap_discover_recursion(spark):
    """sitemap_discover: a 2-level index chain expands to pages at
    each depth; a child loc missing from the fetch store reports
    unfetched; a grandchild past max_depth reports depth_capped
    (never fetched, even though the store HAS it); an index pointing
    back at the seed (cycle) and a repeated child loc both emit
    nothing extra."""
    from jionlp_spark.operators.weblinks import sitemap_discover
    sm = 'http://x/sitemap.xml'
    seed_xml = ('<sitemapindex>'
                '<sitemap><loc>http://x/a.xml</loc></sitemap>'
                '<sitemap><loc>http://x/a.xml</loc></sitemap>'  # dup
                '<sitemap><loc>http://x/missing.xml</loc></sitemap>'
                f'<sitemap><loc>{sm}</loc></sitemap>'           # cycle
                '</sitemapindex>')
    a_xml = ('<sitemapindex>'
             '<sitemap><loc>http://x/b.xml</loc></sitemap>'
             '</sitemapindex>')
    b_xml = ('<sitemapindex>'
             '<sitemap><loc>http://x/deep.xml</loc></sitemap>'
             '</sitemapindex>'
             '')
    seeds = spark.createDataFrame([('x', sm, seed_xml)],
                                  'host string, loc string, '
                                  'sitemap_xml string')
    fetched = spark.createDataFrame(
        [('http://x/a.xml', a_xml), ('http://x/b.xml', b_xml),
         ('http://x/deep.xml',
          '<urlset><url><loc>http://x/p</loc></url></urlset>')],
        'loc string, sitemap_xml string')
    rows = sitemap_discover(seeds, fetched, max_depth=2).collect()
    got = sorted((r['url'], r['depth'], r['status']) for r in rows)
    assert got == [('http://x/deep.xml', 3, 'depth_capped'),
                   ('http://x/missing.xml', 1, 'unfetched')]

    # raising the cap lets the same tree reach the depth-3 page
    rows = sitemap_discover(seeds, fetched, max_depth=3).collect()
    got = sorted((r['url'], r['depth'], r['status']) for r in rows)
    assert got == [('http://x/missing.xml', 1, 'unfetched'),
                   ('http://x/p', 3, 'page')]


def test_extract_canonical_kernel_and_operator(spark):
    """rel=canonical: attribute order/case/quoting free, multi-token
    rel, first-wins, decoys ignored; operator resolution — absolute
    kept, '//' gets http:, '/' resolves to the page host, other
    relatives and no-declaration pages emit nothing."""
    from jionlp_spark.kernels.links import extract_canonical as ec
    from jionlp_spark.operators.weblinks import canonical_links
    assert ec('<LINK HREF="http://a/c" REL="canonical"/>') == 'http://a/c'
    assert ec("<link rel='canonical nofollow' href='/x'>") == '/x'
    assert ec('<link rel=stylesheet href=/s.css>'
              '<link rel=canonical href=/y>') == '/y'
    assert ec('<link rel="canonical" href="/1">'
              '<link rel="canonical" href="/2">') == '/1'
    assert ec('<link rel="icon" href="/i.ico">') is None
    assert ec('<link rel="canonical">') is None
    assert ec(None) is None and ec('') is None

    pages = spark.createDataFrame(
        [('http://h.com/1', '<link rel="canonical" href="/c1">'),
         ('http://h.com/2', '<link rel="canonical" href="//m.com/c2">'),
         ('http://h.com/3',
          '<link rel="canonical" href="https://x.com/c3">'),
         ('http://h.com/4', '<link rel="canonical" href="c4">'),  # drop
         ('http://h.com/5', '<p>no link</p>')],
        'url string, html string')
    got = {r['url']: r['canonical_url']
           for r in canonical_links(pages).collect()}
    assert got == {'http://h.com/1': 'http://h.com/c1',
                   'http://h.com/2': 'http://m.com/c2',
                   'http://h.com/3': 'https://x.com/c3'}


def test_sql_url_host_strips_userinfo_port_and_cuts_query(spark):
    """The SQL url_host helper mirrors kernels/links.url_host on the
    shapes that reach robots/delay joins: authority ends at the first
    of '/', '?', '#'; 'user@' and ':port' are stripped — URLs carrying
    either still match kernel-derived bare hostnames."""
    from jionlp_spark.operators.weblinks import url_host as sql_host
    urls = ['http://h.example.com/p/1',
            'http://h.example.com?x=1',          # query before any '/'
            'http://h.example.com#frag',
            'http://user@h.example.com/p',
            'http://user:pw@h.example.com:8080/p',
            'http://h.example.com:8080/p']
    df = spark.createDataFrame([(u,) for u in urls], 'url string')
    got = [r[0] for r in
           df.select(sql_host(F.col('url'))).collect()]
    assert got == ['h.example.com'] * len(urls)


def test_paragraph_dedup_sep_is_literal(spark):
    """A regex-meaningful separator ('.') splits literally — the split
    pattern is escaped, the re-join glue stays verbatim."""
    from jionlp_spark.operators.dedup import paragraph_dedup
    docs = spark.createDataFrame(
        [(i, 'boiler.keep%d' % i) for i in range(5)],
        'doc_id long, text string')
    out = {r['doc_id']: (r['clean_text'], r['n_paras'], r['n_removed'])
           for r in paragraph_dedup(docs, min_df=3, sep='.').collect()}
    assert out == {i: ('keep%d' % i, 2, 1) for i in range(5)}


def test_cdx_surt_key_query_before_slash(spark):
    """A target URI whose query starts before any path slash must not
    fold into the reversed host labels; its SURT path segment gets the
    canonical ')/'."""
    from jionlp_spark.kernels.warc import build_warc_response
    from jionlp_spark.sources.pages import (cdx_entries,
                                            read_warc_segments)
    seg = (build_warc_response('http://h.example.com?x=1', 'd1', 'a')
           + build_warc_response('http://h.example.com/p/1?x=1',
                                 'd2', 'b')
           + build_warc_response('http://h.example.com', 'd3', 'c'))
    df = spark.createDataFrame([(1, bytearray(seg))],
                               'segment_id long, warc binary')
    rows = sorted(cdx_entries(read_warc_segments(df)).collect(),
                  key=lambda r: r['offset'])
    assert [r['surt_key'] for r in rows] == [
        'com,example,h)/?x=1',
        'com,example,h)/p/1?x=1',
        'com,example,h)/']
