"""WARC kernel + adapter: record scanning, HTTP body split, byte
(not char) Content-Length, junk/truncation tolerance, offsets."""

from jionlp_spark.kernels.warc import build_warc_response, parse_warc


def test_parse_warc_records_and_tolerance():
    seg = (b'garbage preamble\r\n'
           + build_warc_response('http://a/1', '2021-09-01T00:00:00Z',
                                 '<p>one</p>')
           + b'WARC/1.0\r\nWARC-Type: warcinfo\r\n'
             b'Content-Length: 9\r\n\r\nops: test\r\n\r\n'
           + build_warc_response('http://a/2', '2021-09-01T00:01:00Z',
                                 '<p>two</p>', status=404)
           + b'junk between records'
           + build_warc_response('http://a/3', '2021-09-01T00:02:00Z',
                                 '<p>three</p>')[:40])   # truncated
    rs = parse_warc(seg)
    assert len(rs) == 3
    r0, r1, r2 = rs
    assert (r0.rec_type, r0.target_uri, r0.http_status, r0.body) == \
        ('response', 'http://a/1', 200, '<p>one</p>')
    assert r0.warc_date == '2021-09-01T00:00:00Z'
    # non-HTTP record: block verbatim, null status
    assert (r1.rec_type, r1.http_status, r1.body) == \
        ('warcinfo', None, 'ops: test')
    assert (r2.http_status, r2.body) == (404, '<p>two</p>')
    # offsets are byte coordinates of each version line
    assert r0.offset == len(b'garbage preamble\r\n')
    assert seg[r1.offset:r1.offset + 5] == b'WARC/'
    assert seg[r2.offset:r2.offset + 5] == b'WARC/'


def test_parse_warc_byte_lengths_and_edges():
    # Content-Length counts OCTETS: multi-byte body round-trips
    r = parse_warc(build_warc_response(
        'http://b/é', 'd', '<p>héllo wörld</p>'))[0]
    assert r.body == '<p>héllo wörld</p>' and r.target_uri == 'http://b/é'

    assert parse_warc(None) == []
    assert parse_warc(b'') == []
    assert parse_warc('no records here') == []           # str tolerated

    # missing Content-Length = unconsumable tail: earlier records kept
    seg = (build_warc_response('http://c/1', 'd', '<p>x</p>')
           + b'WARC/1.0\r\nWARC-Type: metadata\r\n\r\nrest')
    assert len(parse_warc(seg)) == 1

    # declared block running past the segment end = truncated: dropped
    seg = (b'WARC/1.0\r\nWARC-Type: resource\r\n'
           b'Content-Length: 999\r\n\r\nshort')
    assert parse_warc(seg) == []


def test_read_warc_segments_adapter(spark):
    from jionlp_spark.sources.pages import read_warc_segments
    seg = (build_warc_response('http://a/1', 'd1', '<p>one</p>')
           + build_warc_response('http://a/2', 'd2', '<p>two</p>', 503))
    df = spark.createDataFrame([(7, bytearray(seg))],
                               'segment_id long, warc binary')
    rows = sorted(read_warc_segments(df).collect(),
                  key=lambda r: r['offset'])
    assert [r['target_uri'] for r in rows] == ['http://a/1', 'http://a/2']
    assert [r['http_status'] for r in rows] == [200, 503]
    assert rows[0]['offset'] == 0 and rows[1]['offset'] > 0
    assert all(r['segment_id'] == 7 for r in rows)


def test_parse_warc_redirect_location():
    """3xx responses expose the HTTP Location header; 200s leave it
    None; header name matches case-insensitively."""
    seg = (b'WARC/1.0\r\nWARC-Type: response\r\n'
           b'WARC-Target-URI: http://a/old\r\n'
           b'Content-Type: application/http\r\nContent-Length: 56\r\n'
           b'\r\n'
           b'HTTP/1.1 301 Moved\r\nLOCATION: http://a/new\r\n\r\n'
           b'moved body')
    # block = 46 HTTP-header bytes + 10 body bytes
    r = parse_warc(seg)[0]
    assert r.http_status == 301
    assert r.redirect_location == 'http://a/new'
    assert r.body == 'moved body'
    r2 = parse_warc(build_warc_response('http://a/x', 'd', 'ok'))[0]
    assert r2.redirect_location is None


def test_resolve_redirects_chains_and_cycles(spark):
    """Pointer doubling: exact hop counts on a length-4 chain; a pure
    2-cycle AND a chain feeding into a cycle both flag cyclic with
    null final/hops (the latter is the case a step-limit alone would
    misreport as resolved)."""
    from jionlp_spark.operators.weblinks import resolve_redirects
    edges = spark.createDataFrame(
        [('a1', 'a2'), ('a2', 'a3'), ('a3', 'a4'), ('a4', 'a5'),
         ('x', 'y'), ('y', 'x'),
         ('lead', 'x')],
        'src string, dst string')
    got = {r['src']: (r['final_url'], r['hops'], r['cyclic'])
           for r in resolve_redirects(edges).collect()}
    assert got == {
        'a1': ('a5', 4, False), 'a2': ('a5', 3, False),
        'a3': ('a5', 2, False), 'a4': ('a5', 1, False),
        'x': (None, None, True), 'y': (None, None, True),
        'lead': (None, None, True),
    }
