"""Vectorized pandas/Arrow UDFs wrapping the pure-Python kernels.

This is the only place reference-equivalent logic executes on executors.
Patterns compile once per Python worker (module-level singletons inside the
kernels); lexicons are built once on the driver and shipped as Spark
broadcasts.  No per-row Python UDFs anywhere (input_hint mandate).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from jionlp_spark import lexicons
from jionlp_spark.kernels.cleaner import get_cleaner
from jionlp_spark.kernels.extractors import get_extractor
from jionlp_spark.kernels.html_clean import clean_html
from jionlp_spark.kernels.idcard import IdCardParser
from jionlp_spark.kernels.phone_loc import PhoneLocator
from jionlp_spark.functions.ndet import ndet as _ndet

# ---------------------------------------------------------------------------
# Worker-side broadcast cache.
#
# PySpark's Broadcast.value caches on the INSTANCE, but every task unpickles
# a fresh closure → fresh Broadcast instance → re-reads and re-unpickles the
# executor-local dump file (pyspark/broadcast.py).  For the lexicon bundles
# (tens of MB of dicts) that re-unpickle was costing ~0.5 s per task — more
# than the kernel work itself.  Cache values per PROCESS keyed by the dump
# path (stable per broadcast id on an executor); bounded so a long-lived
# worker holding many session broadcasts cannot grow without limit.

_BC_VALUE_CACHE: dict = {}


def _bc_value(bc):
    path = getattr(bc, '_path', None)
    if path is None:
        return bc.value
    v = _BC_VALUE_CACHE.get(path)
    if v is None:
        if len(_BC_VALUE_CACHE) >= 8:   # oldest-first eviction
            _BC_VALUE_CACHE.pop(next(iter(_BC_VALUE_CACHE)))
        v = _BC_VALUE_CACHE[path] = bc.value
    return v


# ---------------------------------------------------------------------------
# Schemas

MENTION_FIELDS = [
    T.StructField('text', T.StringType()),
    T.StructField('offset_start', T.IntegerType()),
    T.StructField('offset_end', T.IntegerType()),
    T.StructField('mention_type', T.StringType()),
    # canonical detail JSON when the extractor itself parses (money/time);
    # null otherwise — stage 3 fills in the rest
    T.StructField('norm', T.StringType()),
]
MENTION_TYPE = T.StructType(MENTION_FIELDS)
MENTIONS_ARRAY = T.ArrayType(MENTION_TYPE)

CLEAN_RESULT = T.StructType([
    # full reference clean_text chain: redacts urls/emails/phones/brackets —
    # the byte-identical-per-url invariant column (training text)
    T.StructField('clean', T.StringType()),
    # normalization WITHOUT redaction: what stage-2 extraction scans.
    # == reference clean_text(remove_parentheses=False, remove_url=False,
    #    remove_email=False, remove_phone_number=False)
    T.StructField('extract_text', T.StringType()),
    T.StructField('meta', T.StringType()),  # JSON meta info from <meta> tags
])

LINK_RESULT = T.StructType([
    T.StructField('obj', T.StringType()),       # canonical entity key
    T.StructField('obj_type', T.StringType()),
    T.StructField('norm', T.StringType()),      # JSON canonical detail
])


# ---------------------------------------------------------------------------
# Stage-1 cleaning

def _normalize_only(cleaner, body: str, strip_tags: bool) -> str:
    """Normalization without redaction (keeps brackets/urls/emails/phones)."""
    return cleaner.clean_text(
        body, remove_html_tag=strip_tags, remove_parentheses=False,
        remove_url=False, remove_email=False, remove_phone_number=False)


@_ndet
@pandas_udf(T.StringType())
def clean_text_udf(text: pd.Series) -> pd.Series:
    cleaner = get_cleaner()
    return text.map(lambda t: cleaner.clean_text(t) if t is not None else None)


@_ndet
@pandas_udf(CLEAN_RESULT)
def clean_html_text_udf(html: pd.Series) -> pd.DataFrame:
    """html:binary → (clean, extract_text, meta json).  Fused kernel: strip
    html boilerplate (CleanHTML) once, then derive both text variants from
    the same body, so the expensive html pass runs once per row."""
    cleaner = get_cleaner()
    cleans, extracts, metas = [], [], []
    for raw in html:
        if raw is None:
            cleans.append(None); extracts.append(None); metas.append(None)
            continue
        if isinstance(raw, (bytes, bytearray)):
            raw = raw.decode('utf-8', errors='replace')
        body, meta = clean_html(raw)
        cleans.append(cleaner.clean_text(body, remove_html_tag=False))
        extracts.append(_normalize_only(cleaner, body, strip_tags=False))
        metas.append(json.dumps(meta, ensure_ascii=False) if meta else None)
    return pd.DataFrame({'clean': cleans, 'extract_text': extracts,
                         'meta': metas})


@_ndet
@pandas_udf(T.StringType())
def extract_text_udf(text: pd.Series) -> pd.Series:
    """Normalization ONLY (no redaction chain): for stages that consume just
    extract_text.  Catalyst cannot prune fields inside a struct-returning
    UDF, so computing `clean` alongside would pay the full redaction regex
    chain even when nothing reads it."""
    cleaner = get_cleaner()
    return text.map(lambda t: _normalize_only(cleaner, t, strip_tags=True)
                    if t is not None else None)


@_ndet
@pandas_udf(CLEAN_RESULT)
def clean_plain_text_udf(text: pd.Series) -> pd.DataFrame:
    """text:string (pre-extracted body) → (clean, extract_text, meta=None)."""
    cleaner = get_cleaner()
    cleans, extracts = [], []
    for t in text:
        if t is None:
            cleans.append(None); extracts.append(None)
            continue
        cleans.append(cleaner.clean_text(t))
        extracts.append(_normalize_only(cleaner, t, strip_tags=True))
    return pd.DataFrame({'clean': cleans, 'extract_text': extracts,
                         'meta': [None] * len(cleans)})


# ---------------------------------------------------------------------------
# Stage-2 mention sweep

@_ndet
@pandas_udf(MENTIONS_ARRAY)
def rule_mentions_udf(text: pd.Series, warc_ts: pd.Series) -> pd.Series:
    """One fused pass per document: all regex extractors + the money and
    time grid-search extractors (parse results ride along as norm JSON).

    ``warc_ts`` is the per-row time base for time parsing — deterministic
    and replayable, never wall-clock (north_rule requirement).
    """
    from jionlp_spark.kernels.money_extract import get_money_extractor
    from jionlp_spark.kernels.time_extract import get_time_extractor
    ex = get_extractor()
    mex = get_money_extractor()
    tex = get_time_extractor()

    out_rows = []
    for t, ts in zip(text, warc_ts):
        if t is None:
            out_rows.append([])
            continue
        out = [(m['text'], m['offset'][0], m['offset'][1], m['type'], None)
               for m in ex.sweep(t)]
        out.extend(
            (m['text'], m['offset'][0], m['offset'][1], 'money',
             json.dumps(m['detail'], ensure_ascii=False))
            for m in mex.extract(t, with_parsing=True))
        time_base = ts.to_pydatetime() if ts is not None and not pd.isna(ts) \
            else None
        if time_base is not None:
            out.extend(
                (m['text'], m['offset'][0], m['offset'][1], m['type'],
                 json.dumps(m['detail'], ensure_ascii=False))
                for m in tex.extract(t, time_base, with_parsing=True))
        out_rows.append(out)
    return pd.Series(out_rows)


def make_lexicon_mentions_udf(trie_broadcast, merge_adjacent: bool = True):
    """FMM dictionary NER over a broadcast CharTrie → mentions array.

    ``merge_adjacent`` fuses contiguous same-type matches into one span —
    '湖北省'+'襄樊市' → '湖北省襄樊市' — so the location linker sees whole
    admin phrases.
    """
    @_ndet
    @pandas_udf(MENTIONS_ARRAY)
    def lexicon_mentions_udf(text: pd.Series) -> pd.Series:
        trie = _bc_value(trie_broadcast)

        def scan(t):
            if t is None:
                return []
            hits = trie.scan_fmm(t)
            if merge_adjacent and len(hits) > 1:
                merged = [hits[0]]
                for h in hits[1:]:
                    prev = merged[-1]
                    if h['type'] == prev['type'] and \
                            h['offset'][0] == prev['offset'][1]:
                        prev['text'] += h['text']
                        prev['offset'][1] = h['offset'][1]
                    else:
                        merged.append(h)
                hits = merged
            return [(m['text'], m['offset'][0], m['offset'][1],
                     'lexicon:' + m['type'], None)
                    for m in hits]

        return text.map(scan)
    return lexicon_mentions_udf


# ---------------------------------------------------------------------------
# Stage-3 canonicalization (broadcast lexicons)

class LexiconBundle:
    """Driver-side lexicon container; broadcast once per session."""

    def __init__(self, dict_dir: str | None = None) -> None:
        from jionlp_spark.kernels.location import LocationParser
        cell_map, area_map = lexicons.load_phone_location(dict_dir)
        op_map = lexicons.load_telecom_operator(dict_dir)
        self.phone = PhoneLocator(cell_map, area_map, op_map)
        self.idcard = IdCardParser(lexicons.admin_code_map(dict_dir))
        self.location = LocationParser(
            lexicons.load_admin_divisions(dict_dir),
            lexicons.load_location_changes(dict_dir),
            lexicons.load_town_villages(dict_dir))

    def broadcast(self, spark: SparkSession):
        return spark.sparkContext.broadcast(self)


_TRIE_BC_CACHE: dict = {}


def build_location_trie(spark: SparkSession, dict_dir: str | None = None):
    """Broadcast FMM trie over the admin-division lexicon (the
    'Aho-Corasick dictionary matching' of the north star, with the
    reference's FMM semantics preserved — lexicon_ner.py:59-76).
    Broadcast once per session (applicationId-keyed like build_bundle):
    re-broadcasting per pipeline call made every worker re-deserialize
    the trie on each run."""
    key = (spark.sparkContext.applicationId, dict_dir)
    if key not in _TRIE_BC_CACHE:
        from jionlp_spark.kernels.trie import build_trie
        trie = build_trie({'location': lexicons.location_ner_words(dict_dir)})
        _TRIE_BC_CACHE[key] = spark.sparkContext.broadcast(trie)
    return _TRIE_BC_CACHE[key]


def make_link_udf(bundle_broadcast):
    """(mention_type, text, norm_in) → (obj, obj_type, norm-json).

    Canonical keys:
      cell/landline phone → 'province city' geo + digits-only number
      id_card             → issuing region 'province/city/county'
      money               → '<num><case>' from the extraction-time parse
      email               → lowercased address; url → as-is; others → text
    """
    @_ndet
    @pandas_udf(LINK_RESULT)
    def link_udf(mention_type: pd.Series, text: pd.Series,
                 norm_in: pd.Series) -> pd.DataFrame:
        bundle = _bc_value(bundle_broadcast)
        objs, obj_types, norms = [], [], []
        for mtype, t, pre_norm in zip(mention_type, text, norm_in):
            if t is None:
                objs.append(None); obj_types.append(None); norms.append(None)
                continue
            if mtype == 'money':
                detail = json.loads(pre_norm) if pre_norm else {}
                num = detail.get('num')
                if isinstance(num, list):
                    key = '{}~{}{}'.format(num[0], num[1],
                                           detail.get('case', ''))
                else:
                    key = '{}{}'.format(num, detail.get('case', ''))
                objs.append(key)
                obj_types.append('money')
                norms.append(pre_norm)
                continue
            if mtype in ('cell_phone', 'landline_phone'):
                res = bundle.phone.locate(t)
                geo = ' '.join(x for x in (res['province'], res['city']) if x)
                objs.append(bundle.phone.canonical_number(t))
                obj_types.append('phone')
                norms.append(json.dumps(
                    {'province': res['province'], 'city': res['city'],
                     'type': res['type'],
                     'operator': res.get('operator'),
                     'geo': geo or None}, ensure_ascii=False))
            elif mtype == 'id_card':
                res = bundle.idcard.parse(t)
                # canonical id form: trailing X lowercased
                # (id_card_parser.py:91-92)
                objs.append(t[:-1] + t[-1].lower())
                obj_types.append('id_card')
                norms.append(json.dumps(res, ensure_ascii=False)
                             if res is not None else None)
            elif mtype == 'email':
                ex = get_extractor()
                objs.append(t.lower())
                obj_types.append('email')
                dom = ex.email_domain(t)
                norms.append(json.dumps({'domain_name': dom},
                                        ensure_ascii=False) if dom else None)
            elif mtype in ('time_point', 'time_span', 'time_delta',
                           'time_period'):
                detail = json.loads(pre_norm) if pre_norm else {}
                tval = detail.get('time')
                if isinstance(tval, list) and tval and \
                        all(isinstance(x, str) for x in tval):
                    key = '~'.join(tval)
                else:
                    key = json.dumps(tval, ensure_ascii=False, sort_keys=True)
                objs.append(key)
                obj_types.append('time')
                norms.append(pre_norm)
            elif mtype == 'lexicon:location':
                res = bundle.location.parse(t)
                key = '/'.join(x for x in (res['province'], res['city'],
                                           res['county']) if x)
                objs.append(key or t)
                obj_types.append('location')
                norms.append(json.dumps(
                    {'province': res['province'], 'city': res['city'],
                     'county': res['county']}, ensure_ascii=False))
            elif mtype == 'licence_plate':
                from jionlp_spark.kernels.plate import parse_licence_plate
                res = parse_licence_plate(t)
                objs.append(t)
                obj_types.append('licence_plate')
                norms.append(json.dumps(res, ensure_ascii=False)
                             if res is not None else None)
            elif mtype and mtype.startswith('lexicon:'):
                objs.append(t)
                obj_types.append(mtype.split(':', 1)[1])
                norms.append(pre_norm)
            else:
                objs.append(t)
                obj_types.append(mtype)
                norms.append(pre_norm)
        return pd.DataFrame({'obj': objs, 'obj_type': obj_types,
                             'norm': norms})
    return link_udf


LINKED_MENTION_TYPE = T.StructType(MENTION_FIELDS + [
    T.StructField('obj', T.StringType()),
    T.StructField('obj_type', T.StringType()),
])


def make_lexicon_linked_udf(trie_broadcast, bundle_broadcast,
                            normalize: bool = False):
    """Fused lexicon NER + LocationParser linking in ONE Python pass
    (no second ArrowEvalPython node, no self-join): the per-worker memo on
    parse() exploits that distinct place strings (~10⁵ at crawl scale) are
    tiny next to mention volume.  ``normalize=True`` folds the extract_text
    normalization into the same pass — chained ArrowEvalPython stages each
    pin their own Python workers, which dominates at small inputs."""
    @_ndet
    @pandas_udf(T.ArrayType(LINKED_MENTION_TYPE))
    def lexicon_linked_udf(text: pd.Series) -> pd.Series:
        trie = _bc_value(trie_broadcast)
        location = _bc_value(bundle_broadcast).location
        cleaner = get_cleaner() if normalize else None
        memo: dict = {}

        def link_loc(t):
            hit = memo.get(t)
            if hit is None:
                res = location.parse(t)
                key = '/'.join(x for x in (res['province'], res['city'],
                                           res['county']) if x)
                hit = (key or t, json.dumps(
                    {'province': res['province'], 'city': res['city'],
                     'county': res['county']}, ensure_ascii=False))
                memo[t] = hit
            return hit

        def scan(t):
            if t is None:
                return []
            if cleaner is not None:
                t = _normalize_only(cleaner, t, strip_tags=True)
            hits = trie.scan_fmm(t)
            if len(hits) > 1:
                merged = [hits[0]]
                for h in hits[1:]:
                    prev = merged[-1]
                    if h['type'] == prev['type'] and \
                            h['offset'][0] == prev['offset'][1]:
                        prev['text'] += h['text']
                        prev['offset'][1] = h['offset'][1]
                    else:
                        merged.append(h)
                hits = merged
            out = []
            for m in hits:
                obj, norm = link_loc(m['text'])
                out.append((m['text'], m['offset'][0], m['offset'][1],
                            'lexicon:' + m['type'], norm, obj, 'location'))
            return out

        return text.map(scan)
    return lexicon_linked_udf


def make_linked_mentions_udf(bundle_broadcast, trie_broadcast=None,
                             source: str | None = None):
    """Fused stage-2+3: mention sweep AND canonicalization in ONE Python
    pass per batch → array<linked mention>.

    Physically halves the Python hops of the hot stage (each chained
    ArrowEvalPython node costs a dedicated worker per task); logically the
    output is identical to extract_mentions → link_mentions.

    ``source``: None = input is already extract_text; 'plain'/'html' fold
    the normalization (and CleanHTML main-text extraction) into the SAME
    pass, so a triples-only plan runs ONE ArrowEvalPython node total and
    never pays the redaction chain that only the `clean` deliverable needs.
    """
    from jionlp_spark.kernels.money_extract import get_money_extractor
    from jionlp_spark.kernels.time_extract import get_time_extractor

    # worker-persistent location-parse memo (the UDF object lives across
    # batches in a reused worker): distinct place strings are tiny next to
    # mention volume — same rationale as make_lexicon_linked_udf's memo
    _loc_memo: dict = {}

    @_ndet
    @pandas_udf(T.ArrayType(LINKED_MENTION_TYPE))
    def linked_mentions_udf(text: pd.Series, warc_ts: pd.Series) -> pd.Series:
        bundle = _bc_value(bundle_broadcast)
        trie = _bc_value(trie_broadcast) if trie_broadcast is not None else None
        cleaner = get_cleaner() if source is not None else None
        ex = get_extractor()
        mex = get_money_extractor()
        tex = get_time_extractor()

        def link_one(mtype, t, pre_norm):
            # same canonicalization as make_link_udf, inline
            if mtype in ('cell_phone', 'landline_phone'):
                res = bundle.phone.locate(t)
                geo = ' '.join(x for x in (res['province'], res['city']) if x)
                return (bundle.phone.canonical_number(t), 'phone',
                        json.dumps({'province': res['province'],
                                    'city': res['city'], 'type': res['type'],
                                    'operator': res.get('operator'),
                                    'geo': geo or None}, ensure_ascii=False))
            if mtype == 'id_card':
                res = bundle.idcard.parse(t)
                return (t[:-1] + t[-1].lower(), 'id_card',
                        json.dumps(res, ensure_ascii=False)
                        if res is not None else None)
            if mtype == 'email':
                dom = ex.email_domain(t)
                return (t.lower(), 'email',
                        json.dumps({'domain_name': dom}, ensure_ascii=False)
                        if dom else None)
            if mtype == 'money':
                detail = json.loads(pre_norm) if pre_norm else {}
                num = detail.get('num')
                key = ('{}~{}{}'.format(num[0], num[1], detail.get('case', ''))
                       if isinstance(num, list)
                       else '{}{}'.format(num, detail.get('case', '')))
                return key, 'money', pre_norm
            if mtype in ('time_point', 'time_span', 'time_delta',
                         'time_period'):
                detail = json.loads(pre_norm) if pre_norm else {}
                tval = detail.get('time')
                key = ('~'.join(tval) if isinstance(tval, list) and tval and
                       all(isinstance(x, str) for x in tval)
                       else json.dumps(tval, ensure_ascii=False,
                                       sort_keys=True))
                return key, 'time', pre_norm
            if mtype == 'lexicon:location':
                hit = _loc_memo.get(t)
                if hit is None:
                    res = bundle.location.parse(t)
                    key = '/'.join(x for x in (res['province'], res['city'],
                                               res['county']) if x)
                    hit = (key or t, 'location',
                           json.dumps({'province': res['province'],
                                       'city': res['city'],
                                       'county': res['county']},
                                      ensure_ascii=False))
                    if len(_loc_memo) < 200000:
                        _loc_memo[t] = hit
                return hit
            if mtype == 'licence_plate':
                from jionlp_spark.kernels.plate import parse_licence_plate
                res = parse_licence_plate(t)
                return (t, 'licence_plate',
                        json.dumps(res, ensure_ascii=False)
                        if res is not None else None)
            if mtype and mtype.startswith('lexicon:'):
                return t, mtype.split(':', 1)[1], pre_norm
            return t, mtype, pre_norm

        out_rows = []
        for t, ts in zip(text, warc_ts):
            if t is None:
                out_rows.append([])
                continue
            if source == 'html':
                if isinstance(t, (bytes, bytearray)):
                    t = t.decode('utf-8', errors='replace')
                body, _meta = clean_html(t)
                t = _normalize_only(cleaner, body, strip_tags=False)
            elif source == 'plain':
                t = _normalize_only(cleaner, t, strip_tags=True)
            raw = [(m['text'], m['offset'][0], m['offset'][1], m['type'],
                    None) for m in ex.sweep(t)]
            raw.extend(
                (m['text'], m['offset'][0], m['offset'][1], 'money',
                 json.dumps(m['detail'], ensure_ascii=False))
                for m in mex.extract(t, with_parsing=True))
            tb = ts.to_pydatetime() if ts is not None and not pd.isna(ts) \
                else None
            if tb is not None:
                raw.extend(
                    (m['text'], m['offset'][0], m['offset'][1], m['type'],
                     json.dumps(m['detail'], ensure_ascii=False))
                    for m in tex.extract(t, tb, with_parsing=True))
            if trie is not None:
                hits = trie.scan_fmm(t)
                if len(hits) > 1:
                    merged = [hits[0]]
                    for h in hits[1:]:
                        prev = merged[-1]
                        if h['type'] == prev['type'] and \
                                h['offset'][0] == prev['offset'][1]:
                            prev['text'] += h['text']
                            prev['offset'][1] = h['offset'][1]
                        else:
                            merged.append(h)
                    hits = merged
                raw.extend((m['text'], m['offset'][0], m['offset'][1],
                            'lexicon:' + m['type'], None) for m in hits)
            linked = []
            for mtext, s, e, mtype, pre_norm in raw:
                obj, obj_type, norm = link_one(mtype, mtext, pre_norm)
                linked.append((mtext, s, e, mtype, norm, obj, obj_type))
            out_rows.append(linked)
        return pd.Series(out_rows)
    return linked_mentions_udf


# ---------------------------------------------------------------------------
# helpers

def explode_mentions(df, mentions_col: str = 'mentions', keep_cols=('url',)):
    """array<mention> column → long-format mention rows."""
    cols = [F.col(c) for c in keep_cols]
    return (
        df.select(*cols, F.explode(mentions_col).alias('m'))
        .select(*cols, 'm.text', 'm.offset_start', 'm.offset_end',
                'm.mention_type')
    )


# ---------------------------------------------------------------------------
# Normalization kernels exposed as columnar ops: tra⟷sim conversion,
# stopword filtering, money rendering, per-char pinyin/radical features.
# One fused pandas UDF per op (single ArrowEvalPython node per stage).

NORM_TEXT_RESULT = T.StructType([
    T.StructField('sim_word', T.StringType()),   # tra2sim word (FMM) mode
    T.StructField('sim_char', T.StringType()),   # tra2sim char mode
])

CHARTEXT_RESULT = T.StructType([
    T.StructField('pinyin', T.StringType()),     # space-joined standard form
    T.StructField('radicals', T.StringType()),   # space-joined radicals
    T.StructField('structures', T.StringType()),  # space-joined structures
])


class NormBundle:
    """Driver-side normalization lexicons (tsconv/stopwords/chartext);
    broadcast once per session (~1 MB vendored subsets)."""

    def __init__(self, dict_dir: str | None = None) -> None:
        from jionlp_spark.kernels.chartext import CharRadical, Pinyin
        from jionlp_spark.kernels.stopwords import StopwordFilter
        from jionlp_spark.kernels.tsconv import TSConverter
        ts = lexicons.load_ts_tables(dict_dir)
        self.tsconv = TSConverter(ts['tra2sim_char'], ts['sim2tra_char'],
                                  ts['tra2sim_word'], ts['sim2tra_word'])
        self.stopwords = StopwordFilter(*lexicons.load_stopword_sets(dict_dir))
        phrase, pchar, rad = lexicons.load_char_info(dict_dir)
        self.pinyin = Pinyin(phrase, pchar)
        self.radical = CharRadical(rad)

    def broadcast(self, spark: SparkSession):
        return spark.sparkContext.broadcast(self)


def make_tra2sim_udf(bundle_broadcast):
    @_ndet
    @pandas_udf(NORM_TEXT_RESULT)
    def tra2sim_udf(text: pd.Series) -> pd.DataFrame:
        conv = _bc_value(bundle_broadcast).tsconv
        return pd.DataFrame({
            'sim_word': text.map(lambda t: conv.tra2sim(t, mode='word')),
            'sim_char': text.map(lambda t: conv.tra2sim(t, mode='char'))})
    return tra2sim_udf


def make_stopword_udf(bundle_broadcast, sep: str = '|'):
    """tokens joined by `sep` → filtered tokens joined by `sep` (the full
    reference cascade incl. negation keep-list, remove_stopwords.py:139)."""
    @_ndet
    @pandas_udf(T.StringType())
    def stopword_udf(tokens: pd.Series) -> pd.Series:
        filt = _bc_value(bundle_broadcast).stopwords
        return tokens.map(
            lambda s: sep.join(filt.filter(s.split(sep))))
    return stopword_udf


@_ndet
@pandas_udf(T.StringType())
def money_num2char_sim_udf(num: pd.Series) -> pd.Series:
    from jionlp_spark.kernels.money_fmt import money_num2char
    return num.map(lambda n: money_num2char(n, 'sim'))


@_ndet
@pandas_udf(T.StringType())
def money_num2char_tra_udf(num: pd.Series) -> pd.Series:
    from jionlp_spark.kernels.money_fmt import money_num2char
    return num.map(lambda n: money_num2char(n, 'tra'))


def make_chartext_udf(bundle_broadcast):
    """Fused pinyin + radical/structure lookup (one Python pass per batch)."""
    @_ndet
    @pandas_udf(CHARTEXT_RESULT)
    def chartext_udf(text: pd.Series) -> pd.DataFrame:
        b = _bc_value(bundle_broadcast)
        pys, rads, structs = [], [], []
        for t in text:
            pys.append(' '.join(b.pinyin(t)))
            info = b.radical(t)
            rads.append(' '.join(d['radical'] for d in info))
            structs.append(' '.join(d['structure'] for d in info))
        return pd.DataFrame({'pinyin': pys, 'radicals': rads,
                             'structures': structs})
    return chartext_udf


@_ndet
@pandas_udf(T.BooleanType())
def check_person_name_udf(text: pd.Series) -> pd.Series:
    """Surname-heuristic person-name predicate
    (ref algorithm/ner/check_person_name.py:21-69)."""
    from jionlp_spark.kernels.person import get_person_checker
    ck = get_person_checker()
    return text.map(lambda t: ck(t) if t is not None else None)


def make_sentiment_udf(analyzer_broadcast):
    """Lexicon sentiment score in [0,1]
    (ref algorithm/sentiment/sentiment_analysis.py:94-201)."""
    @_ndet
    @pandas_udf(T.DoubleType())
    def sentiment_udf(text: pd.Series) -> pd.Series:
        sa = _bc_value(analyzer_broadcast)
        return text.map(lambda t: sa(t) if t is not None else None)
    return sentiment_udf


def make_location_town_udf(bundle_broadcast):
    """Five-level location parse (province…village; town_village=True mode,
    ref location_parser.py:488-523)."""
    schema = T.StructType([
        T.StructField('province', T.StringType()),
        T.StructField('city', T.StringType()),
        T.StructField('county', T.StringType()),
        T.StructField('town', T.StringType()),
        T.StructField('village', T.StringType()),
    ])

    @_ndet
    @pandas_udf(schema)
    def location_town_udf(text: pd.Series) -> pd.DataFrame:
        lp = _bc_value(bundle_broadcast).location
        rows = [lp.parse(t, town_village=True) if t is not None else {}
                for t in text]
        return pd.DataFrame({k: [r.get(k) for r in rows]
                             for k in ('province', 'city', 'county',
                                       'town', 'village')})
    return location_town_udf
