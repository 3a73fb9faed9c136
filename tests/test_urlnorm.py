"""kernels/urlnorm unit coverage — the canonicalization contract the
web_url_dedup gate relies on, plus the edge cases the synthetic corpus
can't reach (clamped .., trailing-dot directories, IPv6, userinfo,
invalid ports)."""

from jionlp_spark.kernels.urlnorm import normalize_url


def test_scheme_host_case_and_default_port():
    assert normalize_url('HTTP://Example.COM:80/A/b') == \
        'http://example.com/A/b'          # path case is significant
    assert normalize_url('https://example.com:443/x') == \
        'https://example.com/x'
    assert normalize_url('https://example.com:8443/x') == \
        'https://example.com:8443/x'      # non-default port kept


def test_fragment_and_empty_path():
    assert normalize_url('http://example.com#top') == 'http://example.com/'
    assert normalize_url('http://example.com./x#a?b') == \
        'http://example.com/x'            # trailing host dot stripped


def test_dot_segments():
    assert normalize_url('http://h.com/a/../p/./5') == 'http://h.com/p/5'
    assert normalize_url('http://h.com/../../x') == 'http://h.com/x'
    assert normalize_url('http://h.com/a/b/..') == 'http://h.com/a/'
    assert normalize_url('http://h.com/a/.') == 'http://h.com/a/'


def test_tracking_params_and_sort():
    assert normalize_url(
        'http://h.com/p?utm_source=f&b=2&gclid=1&a=1&UTM_medium=x') == \
        'http://h.com/p?a=1&b=2'
    # flagless param keeps its form; equal keys order by value
    assert normalize_url('http://h.com/p?k=2&k=1&flag') == \
        'http://h.com/p?flag&k=1&k=2'
    # all-tracking query drops the '?' entirely
    assert normalize_url('http://h.com/p?utm_campaign=x') == \
        'http://h.com/p'


def test_non_fetchable_and_invalid():
    assert normalize_url('mailto:u@x.com') is None
    assert normalize_url('javascript:void(0)') is None
    assert normalize_url('') is None
    assert normalize_url(None) is None
    assert normalize_url('http://h.com:notaport/x') is None
    assert normalize_url('http:///nohost') is None


def test_userinfo_and_ipv6():
    assert normalize_url('http://u:pw@H.com/x') == 'http://u:pw@h.com/x'
    assert normalize_url('http://[2001:DB8::1]:80/x') == \
        'http://[2001:db8::1]/x'
