"""URL canonicalization — the first dedup key of a web crawl.

RFC 3986-style normalization (§6.2.2 syntax-based + §5.2.4 dot-segment
removal) plus the crawl-pragmatic steps every pipeline applies before
URL-level dedup: tracking-parameter removal and query-parameter
ordering.  Two syntactically different URLs that canonicalize equal
are fetches of the same resource; grouping on the canonical form
collapses them before any content is read.

Pure Python (no pyspark imports — kernel contract, CLAUDE.md); the
Spark side wraps it in one pandas UDF (operators/weblinks.canonical_urls).
"""

from __future__ import annotations

from urllib.parse import urlsplit

# default ports stripped per scheme (RFC 3986 §6.2.3)
_DEFAULT_PORTS = {'http': '80', 'https': '443'}

# crawl-standard tracking parameters (exact keys, plus any utm_* prefix)
TRACKING_PARAMS = frozenset({
    'gclid', 'fbclid', 'msclkid', 'dclid', 'igshid', 'mc_eid',
    'ref', 'ref_src', 'spm',
})


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4: resolve '.' and '..' segments; '..' above the
    root clamps (never escapes the authority)."""
    out: list = []
    for seg in path.split('/'):
        if seg == '.':
            continue
        if seg == '..':
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # a trailing '.' or '..' leaves the directory form (trailing slash)
    if path.endswith(('/.', '/..')) and (not out or out[-1] != ''):
        out.append('')
    norm = '/'.join(out)
    if not norm.startswith('/'):
        norm = '/' + norm
    return norm


def _is_tracking(key: str) -> bool:
    return key.lower().startswith('utm_') or key.lower() in TRACKING_PARAMS


def normalize_url(url: str) -> str | None:
    """Canonical form of an http(s) URL, or None for anything else
    (mailto:, javascript:, fragments-only, unparseable).

    Steps: lowercase scheme + host, strip a trailing host dot and the
    scheme's default port, remove the fragment, dot-segment-normalize
    the path ('' → '/'), drop tracking parameters, sort the surviving
    query parameters bytewise by (key, value) — a stable total order,
    so equal-key params keep a deterministic sequence."""
    if not url:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ('http', 'https'):
        return None
    host = (parts.hostname or '').lower().rstrip('.')
    if not host:
        return None
    try:
        port = parts.port          # raises on a non-numeric port
    except ValueError:
        return None
    netloc = f'[{host}]' if ':' in host else host  # IPv6 literal
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += ':' + parts.password
        netloc = userinfo + '@' + netloc
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc += f':{port}'
    path = _remove_dot_segments(parts.path or '')
    kept = []
    for piece in parts.query.split('&'):
        if not piece:
            continue
        key = piece.split('=', 1)[0]
        if _is_tracking(key):
            continue
        val = piece[len(key) + 1:] if '=' in piece else ''
        kept.append((key, val, '=' in piece))
    kept.sort(key=lambda t: (t[0], t[1]))
    query = '&'.join(k + ('=' + v if has_eq else '')
                     for k, v, has_eq in kept)
    out = f'{scheme}://{netloc}{path}'
    if query:
        out += '?' + query
    return out
