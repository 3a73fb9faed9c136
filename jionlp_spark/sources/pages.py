"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema fixed by BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation is pure-functional in the row index: row i is always the same
bytes regardless of partitioning, run, or parallelism level (seeded
``random.Random(seed << 32 | i)`` per row), so digests are comparable across
local[8]/local[32] runs.  Content templates embed the surface forms the
reference golden tests exercise — phones/landlines built from the vendored
prefix lexicons, valid resident IDs (admin prefix + calendar date + proper
check digit), urls/emails/qq/wechat/plates/times/money/locations — plus a
20% hot-entity block (北京/上海) to exercise the skew path.

Scales: generated through ``spark.range(n).mapInPandas`` so a 10^12-row
corpus generates distributed; local tests call ``write_pages`` once and
reuse the parquet.
"""

from __future__ import annotations

import datetime
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from jionlp_spark import lexicons

PAGES_SCHEMA = T.StructType([
    T.StructField('url', T.StringType(), False),
    T.StructField('warc_ts', T.TimestampType(), False),
    T.StructField('html', T.BinaryType(), False),
    T.StructField('text', T.StringType(), False),
    T.StructField('lang', T.StringType(), False),
])

_EPOCH = datetime.datetime(2021, 9, 1, 0, 0, 0)

# ID-card check digit per GB 11643-1999
_ID_WEIGHTS = (7, 9, 10, 5, 8, 4, 2, 1, 6, 3, 7, 9, 10, 5, 8, 4, 2)
_ID_CHECK = '10X98765432'


def _id_check_char(first17: str) -> str:
    s = sum(int(c) * w for c, w in zip(first17, _ID_WEIGHTS))
    return _ID_CHECK[s % 11]


class _Pools:
    """Driver-built value pools (from the vendored lexicons); broadcast-sized."""

    def __init__(self, dict_dir: str | None = None) -> None:
        cell_map, area_map = lexicons.load_phone_location(dict_dir)
        self.cell_prefixes = sorted(cell_map)[::37] or ['1328856']
        self.area_codes = sorted(area_map)
        rows = lexicons.load_admin_divisions(dict_dir)
        self.county_codes = sorted(
            r['county_code'] for r in rows if r['county'] is not None)
        self.locations = sorted(
            r['province'] + r['city'] + r['county']
            for r in rows
            if r['county'] is not None and not r['city'].startswith(r['province'][:2]))
        self.filler = (
            '今天 天气 晴朗 适合 出行 数据 处理 平台 发布 新版 内容 专注 '
            '中文 文本 分析 工具 提供 高效 稳定 服务 用户 反馈 良好 记者 '
            '报道 当地 居民 表示 生活 水平 持续 提高 经济 发展 前景 广阔'
        ).split()


_TEMPLATES = [
    lambda r, p: '联系电话：' + r.choice(p.cell_prefixes)
                 + '{:0>4d}'.format(r.randrange(10000)),
    lambda r, p: '(' + r.choice(p.area_codes) + ')'
                 + '{:0>8d}'.format(r.randrange(10_000_000, 100_000_000)),
    lambda r, p: (lambda pref: 'Tel: +86 ' + pref[:3] + '-' + pref[3:7]
                  + '-' + '{:0>4d}'.format(r.randrange(10000)))(
        r.choice(p.cell_prefixes)),
    lambda r, p: 'E-mail: user{}@sub{}.example.com'.format(
        r.randrange(1000), r.randrange(9)),
    lambda r, p: (lambda f17: '身份证号' + f17 + _id_check_char(f17))(
        r.choice(p.county_codes)
        + '{}'.format(r.randrange(1950, 2010))
        + '{:0>2d}{:0>2d}'.format(r.randrange(1, 13), r.randrange(1, 29))
        + '{:0>3d}'.format(r.randrange(1000))),
    lambda r, p: '详见 https://v{}.example-site.com/a/{}/ 页面'.format(
        r.randrange(9), r.randrange(100000)),
    lambda r, p: '服务器10.{}.{}.{}端口'.format(
        r.randrange(256), r.randrange(256), r.randrange(255)),
    lambda r, p: '加QQ {}'.format(r.randrange(100000, 2_000_000_000)),
    lambda r, p: '微信号：wx{}_abc-{}'.format(
        'abcdefgh'[r.randrange(8)], r.randrange(100, 999)),
    lambda r, p: '川A·{:0>5d}{}'.format(r.randrange(100000), 'BDF'[r.randrange(3)]),
    lambda r, p: '粤B{}{:0>5d}'.format('DF'[r.randrange(2)], r.randrange(100000)),
    lambda r, p: '定于2021年{}月{}日上午{}点半开会'.format(
        r.randrange(1, 13), r.randrange(1, 29), r.randrange(6, 12)),
    lambda r, p: '预算为{:,}元'.format(r.randrange(1000, 99_999_999)),
    lambda r, p: '成交价七千三百万港元',
    lambda r, p: '家住' + r.choice(p.locations) + '幸福路{}号'.format(r.randrange(1, 300)),
    lambda r, p: '湖北省襄樊市小水街{}号'.format(r.randrange(1, 300)),
]

_HOT = ['北京市朝阳区发布新政策', '上海市嘉定区举办活动',
        '记者在北京报道', '上海交通部门表示']

_LANGS = ('zh',) * 49 + ('en',)  # 98% zh


def _make_row(i: int, seed: int, pools: _Pools) -> tuple:
    r = random.Random((seed << 32) | i)
    n_sent = r.randint(3, 8)
    sentences = []
    for _ in range(n_sent):
        if r.random() < 0.5:
            sentences.append(_TEMPLATES[r.randrange(len(_TEMPLATES))](r, pools))
        else:
            sentences.append(''.join(r.choice(pools.filler) for _ in range(6)))
    if r.random() < 0.2:  # hot-entity skew block
        sentences.append(_HOT[r.randrange(len(_HOT))])
    text = '，'.join(sentences) + '。'

    url = 'https://site{}.example.cn/a/{}'.format(i % 1000, i)
    ts = _EPOCH + datetime.timedelta(seconds=37 * i)
    lang = _LANGS[i % len(_LANGS)]

    paragraphs = ''.join('<p>{}</p>'.format(s) for s in sentences)
    html = (
        '<!DOCTYPE html><html><head>'
        '<meta name="description" content="page {i}">'
        '<script>var a={i};function f(){{return a;}}</script>'
        '<style>.main {{color: #333;}}</style>'
        '</head><body>'
        '<div class="nav"><div><a href="/x">首页</a></div><div>导航</div></div>'
        '<h2>标题 {i}</h2>'
        '{body}<br>'
        '<table><tr><td>junk</td></tr></table>'
        '<!-- comment {i} -->'
        '<div id="footer-1">版权所有 &amp; 保留 &#20013;</div>'
        '</body></html>'
    ).format(i=i, body=paragraphs)

    return url, ts, html.encode('utf-8'), text, lang


def generate_pages(spark: SparkSession, n_rows: int, seed: int = 42,
                   num_partitions: int | None = None,
                   dict_dir: str | None = None) -> DataFrame:
    pools = _Pools(dict_dir)
    seed_ = seed

    def gen(batches):
        for pdf in batches:
            rows = [_make_row(int(i), seed_, pools) for i in pdf['id']]
            yield pd.DataFrame(rows, columns=[
                'url', 'warc_ts', 'html', 'text', 'lang'])

    rng = spark.range(n_rows, numPartitions=num_partitions or
                      spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages(spark: SparkSession, path: str, n_rows: int,
                seed: int = 42, num_partitions: int | None = None) -> str:
    generate_pages(spark, n_rows, seed, num_partitions) \
        .write.mode('overwrite').parquet(path)
    return path


# ---------------------------------------------------------------------------
# source-format adapters: a crawl feed arrives as JSONL or WARC-ish text as
# often as parquet (reference reads line-oriented text/JSON via
# util/file_io.py read_file_by_line); these map each to the canonical pages
# schema so every downstream stage is format-agnostic.

def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines crawl dump → pages DataFrame.  An explicit schema skips
    Spark's sampling inference pass (one full read saved) and pins types;
    html arrives base64 in JSON (binary has no JSON representation)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField('url', T.StringType()),
        T.StructField('warc_ts', T.StringType()),
        T.StructField('html_b64', T.StringType()),
        T.StructField('text', T.StringType()),
        T.StructField('lang', T.StringType()),
    ])
    return (spark.read.schema(schema).json(path)
            .select('url',
                    F.to_timestamp('warc_ts').alias('warc_ts'),
                    F.unbase64('html_b64').alias('html'),
                    'text', 'lang'))


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    """pages DataFrame → JSONL (html base64-encoded; timestamps carry
    microseconds — parquet's own precision — so the round-trip through
    read_pages_jsonl is exact)."""
    from pyspark.sql import functions as F
    (pages.select('url',
                  F.date_format('warc_ts', "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
                  .alias('warc_ts'),
                  F.base64('html').alias('html_b64'), 'text', 'lang')
     .write.mode('overwrite').json(path))


# TSV contract shared by the paired writer/reader below (advisor r5: the
# CSV defaults were only safe for the digit-free test corpus — real crawl
# text embeds tabs/newlines/quotes and empty-vs-null matters):
#   - RFC-style quoting (quote='"', escape='"'): fields containing the
#     separator, quotes, or NEWLINES are quoted by the writer; the reader
#     needs multiLine to reassemble quoted newlines.
#   - nulls are written as the distinct token \\N (the classic
#     mysqldump/Hive convention) so an EMPTY string ('' on disk) reads
#     back as '' and a null reads back as null, not both as null.
#   - timestamps carry microseconds (parquet's precision) — no silent
#     truncation.
# emptyValue is ASYMMETRIC by design (univocity parses an unquoted empty
# field as null): the writer emits '' as the QUOTED empty string `""`,
# and the reader maps `""` back to '' — while \\N → null on both sides.
_TSV_OPTS = {'sep': '\t', 'quote': '"', 'escape': '"',
             'nullValue': '\\N'}
_TSV_WRITE_OPTS = {**_TSV_OPTS, 'emptyValue': '""'}
_TSV_READ_OPTS = {**_TSV_OPTS, 'emptyValue': '', 'multiLine': 'true'}


def write_pages_tsv(pages: DataFrame, path: str) -> None:
    """pages DataFrame → TSV manifest — the paired writer for
    read_pages_tsv (column order, timestamp format, and the quoting/null
    contract in _TSV_OPTS are ONE contract, kept side by side so they
    cannot drift).  html is dropped (the TSV form is for pre-extracted
    corpora)."""
    from pyspark.sql import functions as F
    (pages.select('url',
                  F.date_format('warc_ts', 'yyyy-MM-dd HH:mm:ss.SSSSSS')
                  .alias('warc_ts'), 'lang', 'text')
     .write.options(**_TSV_WRITE_OPTS).mode('overwrite').csv(path))


def read_pages_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Tab-separated crawl manifest (url, warc_ts, lang, text — no html
    column; html-less feeds are common for pre-extracted corpora).
    multiLine reassembles quoted embedded newlines; the cost is that a
    multiLine CSV file is NOT splittable within one file (Spark must see
    whole quoted records) — parallelism comes from the many part files a
    distributed writer emits, which is how this pairs with
    write_pages_tsv."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField('url', T.StringType()),
        T.StructField('warc_ts', T.StringType()),
        T.StructField('lang', T.StringType()),
        T.StructField('text', T.StringType()),
    ])
    return (spark.read.schema(schema)
            .options(**_TSV_READ_OPTS).csv(path)
            .select('url', F.to_timestamp('warc_ts').alias('warc_ts'),
                    F.lit(None).cast('binary').alias('html'),
                    'text', 'lang'))


def read_warc_segments(segments: DataFrame,
                       segment_col: str = 'warc',
                       id_col: str = 'segment_id') -> DataFrame:
    """WARC archive adapter (kernels/warc.parse_warc): segments(
    segment_id, warc binary) → one row per record —

        (segment_id, offset, rec_type, target_uri, warc_date,
         content_type, http_status, body)

    The storage-format entry point next to the JSONL/TSV adapters: a
    CommonCrawl-style dump lands as WARC segments, and this turns them
    into the url/html page rows every downstream operator consumes
    (``filter(rec_type = 'response')`` → url_dedup → content_extract
    is the standard chain).  ``offset`` is the record's byte offset in
    its segment — with (segment_id, offset) a row is a stable,
    re-fetchable archive coordinate (the same pair CDX indexes key
    on), so lineage survives re-parsing.

    Scale shape: ONE mapInPandas node over the segments table, zero
    shuffle; fanout = records per segment.  Segments are the
    parallelism unit (a production layout is one parquet row per
    WARC file of ~1 GB — size maxPartitionBytes accordingly);
    truncated tails are dropped per kernel contract, never raised
    mid-job."""
    from jionlp_spark.kernels.warc import parse_warc

    def kernel(batches):
        for pdf in batches:
            sids, offs, types, uris, dates, ctypes, stats, bodies, \
                locs = [], [], [], [], [], [], [], [], []
            for sid, seg in zip(pdf[id_col], pdf[segment_col]):
                for r in parse_warc(seg):
                    sids.append(sid)
                    offs.append(r.offset)
                    types.append(r.rec_type)
                    uris.append(r.target_uri)
                    dates.append(r.warc_date)
                    ctypes.append(r.content_type)
                    stats.append(r.http_status)
                    bodies.append(r.body)
                    locs.append(r.redirect_location)
            yield pd.DataFrame({
                'segment_id': pd.Series(sids, dtype='int64'),
                'offset': pd.Series(offs, dtype='int64'),
                'rec_type': pd.Series(types, dtype=object),
                'target_uri': pd.Series(uris, dtype=object),
                'warc_date': pd.Series(dates, dtype=object),
                'content_type': pd.Series(ctypes, dtype=object),
                'http_status': pd.Series(stats, dtype='object'),
                'body': pd.Series(bodies, dtype=object),
                'redirect_location': pd.Series(locs, dtype=object)})

    schema = T.StructType([
        T.StructField('segment_id', T.LongType()),
        T.StructField('offset', T.LongType()),
        T.StructField('rec_type', T.StringType()),
        T.StructField('target_uri', T.StringType()),
        T.StructField('warc_date', T.StringType()),
        T.StructField('content_type', T.StringType()),
        T.StructField('http_status', T.LongType()),
        T.StructField('body', T.StringType()),
        T.StructField('redirect_location', T.StringType())])
    return segments.select(id_col, segment_col).mapInPandas(
        kernel, schema)


def cdx_entries(records: DataFrame) -> DataFrame:
    """WARC records → CDX-style index rows, the lookup layer every
    archive pairs with its segments (pywb/OpenWayback serve from
    exactly this shape):

        (surt_key, warc_date, target_uri, http_status,
         segment_id, offset)

    ``surt_key`` is the Sort-friendly URI Reordering Transform key
    CDX files sort on — host labels reversed and comma-joined, then
    ``)/`` and the path (``http://h5.example.com/p/3`` →
    ``com,example,h5)/p/3``) — so one host's captures are CONTIGUOUS
    under a range scan and a prefix query covers a whole domain
    suffix.  Only ``response`` records index (requests/metadata are
    not fetchable artifacts); the (segment_id, offset) pair is the
    re-fetch coordinate ``read_warc_segments`` stamped.

    Everything is built-in expressions — split/reverse/concat, zero
    Python, zero shuffle: the index is a projection of the record
    table.  Production path: write sorted-within-partitions by
    surt_key and bucketed/partitioned by its first label through the
    catalog, the same layout discipline as the BM25/edge indexes —
    a range lookup then touches one file run, no exchange.
    """
    from pyspark.sql import functions as F
    uri = F.col('target_uri')
    rest = F.substring_index(uri, '://', -1)
    # the authority ends at the FIRST of '/', '?', '#' — a query that
    # begins before any path slash (http://h.com?x=1) must not fold
    # into the reversed host labels
    host = F.substring_index(
        F.substring_index(F.substring_index(rest, '/', 1), '?', 1),
        '#', 1)
    path = F.substring(rest, F.length(host) + 1, 2_000_000)
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, '\\.')), ','),
        F.lit(')'),
        F.when(F.length(path) == 0, F.lit('/'))
        .when(F.substring(path, 1, 1) != '/',
              F.concat(F.lit('/'), path))        # query/fragment-first
        .otherwise(path))
    return (records
            .filter((F.col('rec_type') == 'response')
                    & uri.isNotNull())
            .select(surt.alias('surt_key'), 'warc_date', 'target_uri',
                    'http_status', 'segment_id', 'offset'))
