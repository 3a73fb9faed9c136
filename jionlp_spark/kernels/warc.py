"""WARC (ISO 28500 / WARC/1.x) record parsing — pure Python, zero Spark.

The STORAGE side of crawl control, completing the kernel trio: robots
decides whether to fetch, sitemaps declare what exists, WARC is how the
fetched bytes are stored — CommonCrawl, Heritrix, wget --warc and every
archive-grade crawler emit it.  The reference has no crawler (it
consumes already-fetched text), so this kernel is north-rule plumbing
for the web-scale input table (BASELINE.json input_hint: url/html
rows), not a reference port: ``warc_records`` turns an archive segment
into exactly those rows.

Format (ISO 28500 §4): a segment is concatenated records, each

    WARC/1.0<CRLF>
    <header-name>: <value><CRLF> ...
    <CRLF>
    <Content-Length bytes of block>
    <CRLF><CRLF>

Parsing rules (tolerant, like the robots/sitemap kernels — real
archives carry truncated tails and junk between records):

- records are located by scanning for a ``WARC/`` version line at the
  current offset; bytes before the first record or between records
  (stray padding) are skipped to the next ``\\nWARC/`` boundary;
- header names are case-insensitive; ``Content-Length`` is REQUIRED to
  consume the block (a record without a parseable length, or whose
  declared block runs past the segment end, is a truncated tail —
  dropped, parsing stops);
- for ``response`` records whose Content-Type says ``msgtype=response``
  (or the common bare ``application/http``), the block is an HTTP
  message: status is read from the status line and the BODY starts
  after the first blank line; other record types (request, warcinfo,
  metadata, resource, revisit) pass the block through verbatim with a
  null status;
- offsets are byte offsets; lengths are byte counts (the segment is
  parsed as bytes — Content-Length is defined over octets, and a
  str-based count breaks on any non-ASCII page).

All scanning is plain byte ops — no regex needed, nothing runs in
Spark SQL.
"""

from __future__ import annotations

from typing import NamedTuple

_CRLF = b'\r\n'


class WarcRecord(NamedTuple):
    rec_type: str | None      # WARC-Type (lowercased), None if absent
    target_uri: str | None    # WARC-Target-URI
    warc_date: str | None     # WARC-Date (as written, ISO 8601)
    content_type: str | None  # record Content-Type header
    http_status: int | None   # response records: HTTP status code
    body: str                 # payload (HTTP body for responses),
    #                           utf-8 decoded with replacement
    offset: int               # byte offset of the record's version line
    redirect_location: str | None = None  # response records: the HTTP
    #                           Location header (3xx redirect target)


def _parse_headers(raw: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in raw.split(_CRLF):
        if b':' not in line:
            continue
        k, _, v = line.partition(b':')
        headers[k.strip().lower()] = v.strip()
    return headers


def parse_warc(segment: bytes) -> list[WarcRecord]:
    """WARC segment bytes → records, truncated tail dropped."""
    if segment is None:
        return []
    if isinstance(segment, str):          # tolerated: ascii-ish segment
        segment = segment.encode('utf-8')
    out: list[WarcRecord] = []
    pos = 0
    n = len(segment)
    while pos < n:
        if not segment.startswith(b'WARC/', pos):
            nxt = segment.find(b'\nWARC/', pos)
            if nxt < 0:
                break                      # no further record boundary
            pos = nxt + 1
        head_end = segment.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break                          # truncated header block
        header_blob = segment[pos:head_end]
        first_crlf = header_blob.find(_CRLF)
        headers = _parse_headers(header_blob[first_crlf + 2:]
                                 if first_crlf >= 0 else b'')
        try:
            length = int(headers[b'content-length'])
        except (KeyError, ValueError):
            break                          # unconsumable: stop (tail)
        block_start = head_end + 4
        block_end = block_start + length
        if length < 0 or block_end > n:
            break                          # declared block truncated
        block = segment[block_start:block_end]

        rec_type = headers.get(b'warc-type')
        ctype = headers.get(b'content-type')
        status: int | None = None
        location: bytes | None = None
        body = block
        is_http = (ctype is not None
                   and b'application/http' in ctype.lower())
        if (rec_type is not None and rec_type.lower() == b'response'
                and is_http):
            line_end = block.find(_CRLF)
            status_line = block[:line_end if line_end >= 0 else len(block)]
            parts = status_line.split(b' ')
            if len(parts) >= 2 and parts[0].startswith(b'HTTP/'):
                try:
                    status = int(parts[1])
                except ValueError:
                    status = None
            http_end = block.find(_CRLF + _CRLF)
            body = block[http_end + 4:] if http_end >= 0 else b''
            http_headers = _parse_headers(
                block[:http_end if http_end >= 0 else len(block)])
            location = http_headers.get(b'location')

        def _s(v: bytes | None) -> str | None:
            return v.decode('utf-8', 'replace') if v is not None else None

        out.append(WarcRecord(
            rec_type=_s(rec_type).lower() if rec_type is not None
            else None,
            target_uri=_s(headers.get(b'warc-target-uri')),
            warc_date=_s(headers.get(b'warc-date')),
            content_type=_s(ctype),
            http_status=status,
            body=body.decode('utf-8', 'replace'),
            offset=pos,
            redirect_location=_s(location)))
        pos = block_end
        # the record separator is CRLF CRLF; tolerate its absence
        if segment.startswith(_CRLF + _CRLF, pos):
            pos += 4
    return out


def build_warc_response(uri: str, date: str, html: str,
                        status: int = 200) -> bytes:
    """Compose one WARC/1.0 response record (fixture/round-trip
    helper — the writer side of the format, byte-exact per ISO 28500
    so parse_warc(build(...)) is identity on the parsed fields)."""
    body = html.encode('utf-8')
    http = (f'HTTP/1.1 {status} OK\r\n'
            f'Content-Type: text/html\r\n\r\n').encode('ascii') + body
    head = (f'WARC/1.0\r\n'
            f'WARC-Type: response\r\n'
            f'WARC-Target-URI: {uri}\r\n'
            f'WARC-Date: {date}\r\n'
            f'Content-Type: application/http; msgtype=response\r\n'
            f'Content-Length: {len(http)}\r\n\r\n').encode('utf-8')
    return head + http + _CRLF + _CRLF
