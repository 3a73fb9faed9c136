# Regex pattern constants for the rule kernels.
#
# Semantics parity notes: every pattern below reproduces, character for
# character where required, the matching behavior of the reference library
# JioNLP (see /root/reference/jionlp/rule/rule_pattern.py) so that cleaned
# text is byte-identical per url and mention spans line up exactly.  These
# are Python-`re` patterns (lookbehind/lookahead heavy) and must NOT be fed
# to Spark SQL's Java regex engine — they run inside Arrow-batched pandas
# UDFs only.
#
# Each constant cites the reference definition it must stay in sync with.

import re

# ---------------------------------------------------------------------------
# Sentinel characters.  The reference pads text before matching so that the
# (?<=...) / (?=...) guards fire at string boundaries, then shifts offsets by
# -1 (rule/extractor.py:62-69).  '#' is the generic pad; urls use '￥' because
# '#' is a legal url char (extractor.py:364); emails use '龥' (extractor.py:168).
PAD_GENERIC = '#'
PAD_URL = '￥'
PAD_EMAIL = '龥'

# ---------------------------------------------------------------------------
# Phone numbers (rule_pattern.py:16-36)
CELL_PHONE = (
    r'(?<=[^\d])(((\+86)?([- ])?)?((1[3-9][0-9]))([- ])?\d{4}([- ])?\d{4})(?=[^\d])'
)
# location check variant: no trailing guard, used on an exact number string
CELL_PHONE_CHECK = r'(?<=[^\d])(((1[3-9][0-9]))([- ])?\d{4}([- ])?\d{4})'
LANDLINE_PHONE = (
    r'(?<=[^\d])(([\(（])?0\d{2,3}[\)） —-]{1,2}\d{7,8}|\d{3,4}[ -]\d{3,4}[ -]\d{4})(?=[^\d])'
)
LANDLINE_PHONE_CHECK = (
    r'(([\(（])?0\d{2,3}[\)） —-]{1,2}\d{7,8}|\d{3,4}[ -]\d{3,4}[ -]\d{4})'
)
LANDLINE_AREA_CODE = r'(0\d{2,3})[\)） —-]'
PHONE_PREFIX = (
    r'((tel(ephone)?|cell(phone)?|phone|'
    r'((联系)?电[ \t　]*话|手[ \t　]*机)(号(码)?)?)[:：\t 　]*)'
    r'(?=[^:： \t　])'
)

# ---------------------------------------------------------------------------
# E-mail (rule_pattern.py:44-55)
EMAIL = (
    r"(?<=[^0-9a-zA-Z\!\#\$\%\&\'\*\+\-\/\=\?\^\_\`\{\|\}\~\-])"
    r"([a-zA-Z0-9_.-]+@[a-zA-Z0-9_.-]+(?:\.[a-zA-Z0-9]+)*\.[a-zA-Z0-9]{2,6})"
    r"(?=[^0-9a-zA-Z\!\#\$\%\&\'\*\+\-\/\=\?\^\_\`\{\|\}\~\-])"
)
EMAIL_DOMAIN = r'(?<=@)([0-9a-zA-Z]+)(?=\.)'
EMAIL_PREFIX = (
    r'((e(\-|—| |_)?mail|(电子)?邮[箱件])(地址)?[:：\t 　]*)'
    r'(?=[^:： \t　])'
)

# ---------------------------------------------------------------------------
# URL (rule_pattern.py:354-356)
URL = (
    r'(?<=[^.])((?:(?:https?|ftp|file)://|(?<![a-zA-Z\-\.])www\.)'
    r'[\-A-Za-z0-9\+&@\(\)#/%\?=\~_|!:\,\.\;]+[\-A-Za-z0-9\+&@#/%=\~_\|])'
    r'(?=[\.<一-龥￥"，。；！？、“”‘’>（）—《》…● \t\n])'
)

# ---------------------------------------------------------------------------
# Chinese resident ID (rule_pattern.py:93-103): 18 digits with strict
# province/city/county prefixes and a calendar-valid birth date.
ID_CARD = (
    r'(?<=[^0-9a-zA-Z])'
    r'((1[1-5]|2[1-3]|3[1-7]|4[1-6]|5[0-4]|6[1-5]|71|81|82|91)'
    r'(0[0-9]|1[0-9]|2[0-9]|3[0-9]|4[0-3]|5[1-3]|90)'
    r'(0[0-9]|1[0-9]|2[0-9]|3[0-9]|4[0-3]|5[1-7]|6[1-4]|7[1-4]|8[1-7])'
    r'(18|19|20)\d{2}(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])'
    r'\d{3}[0-9xX])'
    r'(?=[^0-9a-zA-Z])'
)
ID_CARD_CHECK = (
    r'^(1[1-5]|2[1-3]|3[1-7]|4[1-6]|5[0-4]|6[1-5]|71|81|82|91)'
    r'(0[0-9]|1[0-9]|2[0-9]|3[0-4]|4[0-3]|5[1-3]|90)'
    r'(0[0-9]|1[0-9]|2[0-9]|3[0-9]|4[0-3]|5[1-7]|6[1-4]|7[1-4]|8[1-7])'
    r'(19|20)\d{2}(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])\d{3}[0-9xX]$'
)

# ---------------------------------------------------------------------------
# IPv4 (rule_pattern.py:108-110)
_IP_OCTET = r'(25[0-5]|2[0-4]\d|[0-1]\d{2}|[1-9]?\d)'
IP_ADDRESS = (
    r'(?<=[^0-9])(' + _IP_OCTET + r'\.' + _IP_OCTET + r'\.'
    + _IP_OCTET + r'\.' + _IP_OCTET + r')(?=[^0-9])'
)

# ---------------------------------------------------------------------------
# QQ / WeChat (rule_pattern.py:188-196)
QQ = r'(?<=[^0-9])([1-9][0-9]{5,10})(?=[^0-9])'
QQ_CUE = r'(qq|QQ|\+q|\+Q|加q|加Q|q号|Q号)'
WECHAT_ID = r'(?<=[^\da-zA-Z_\-])([a-zA-Z][a-zA-Z\d_\-]{5,19})(?=[^\da-zA-Z_\-])'
WECHAT_CUE = r'(微信(号)?(:|：)?|wx(:|：)|wechat(:|：))'
# the strict wechat check looks back this many chars before the candidate
WECHAT_CUE_WINDOW = 8

# ---------------------------------------------------------------------------
# Mainland motor-vehicle licence plates (rule_pattern.py:211-221).
# Province single-char aliases, order as published; plates use all but the
# first three (Hong Kong/Macao/Taiwan are excluded by the reference).
PROVINCE_ALIAS_CHARS = '港澳台京津沪渝黑吉辽新藏青蒙晋冀豫甘陕川贵云宁苏浙皖鲁赣鄂湘粤闽桂琼'
LICENCE_PLATE = (
    '([' + PROVINCE_ALIAS_CHARS[3:] + ']'
    + r'[A-HJ-NP-Za-hj-np-z]'
    + r'[·. 　]?'
    + r'[A-HJ-NP-Za-hj-np-z0-9]{5,6})'
    + r'(?![\da-zA-Z])'
)

# ---------------------------------------------------------------------------
# Chinese characters (rule_pattern.py:29)
CHINESE_CHAR = '[一-龥]'

# ---------------------------------------------------------------------------
# HTML tag removal inside clean_text (rule_pattern.py:88): a tag may not
# contain another '<' nor common CJK punctuation (avoids eating math like
# "a<b，b>c").
HTML_TAG = '<[^<一-龥，。；！？、“”‘’（）—《》…●]+?>'

# ---------------------------------------------------------------------------
# Exception (non-printable / out-of-scope unicode) characters are replaced by
# a space (rule_pattern.py:71-79).  Single-byte whitelist keeps \t..\r, the
# printable ASCII range, NBSP and a few currency/math signs; the unicode arm
# keeps common CJK punctuation, enumeration signs, CJK ideographs, fullwidth
# forms.  The two character classes are concatenated exactly like the
# reference does (complement-of-union).
EXCEPTION_CHAR = (
    '[^\x09-\x0d\x20-\x7e\xa0£¥©®°±×÷'
    '‐-”•·・…‰※℃℉Ⅰ-ⅹ①-⒛　-】〔-〞㈠-㈩一-龥﹐-﹫！-～￠￡￥]'
)

# ---------------------------------------------------------------------------
# Fullwidth → halfwidth translation alphabet (rule_pattern.py:83-84).  Note:
# fullwidth ！？（） etc. are deliberately NOT mapped.
FULLWIDTH_CHARS = (
    '　＂＃＄％＆＇＊＋－．／０１２３４５６７８９＜＝＞＠'
    'ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺ［＼］＾＿｀'
    'ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ｛｜｝～'
)
HALFWIDTH_CHARS = (
    ' "#$%&\'*+-./0123456789<=>@'
    'ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`'
    'abcdefghijklmnopqrstuvwxyz{|}~'
)

# ---------------------------------------------------------------------------
# Redundant-run collapse (rule_pattern.py:201): runs of any of these chars
# collapse to a single occurrence via a (?<=c)c+ alternation.
REDUNDANT_CHARS = ' -\t\n啊哈呀~　\xa0•·・'

# ---------------------------------------------------------------------------
# Bracket pairs handled by remove/extract_parentheses (rule_pattern.py:179),
# listed as left1 right1 left2 right2 ...
BRACKET_PAIRS = '{}「」[]【】()（）<>《》〈〉『』〔〕｛｝＜＞〖〗'


# ---------------------------------------------------------------------------
# Money parsing patterns (rule_pattern.py:141-144, 473-503).  Currency-case
# alternation order is load-bearing (first match wins in the parser).
CURRENCY_CASE = (
    r'(块(钱)?(人民币)?|元((人民|港|日|澳|韩|(新)?台)币)?|(人民|港|日|澳|韩|(新)?台)币|圆(整)?|'
    r'(美|港|澳门|日|韩|缅|马|新加坡|欧|加|新西兰|澳|澳大利亚)元|美(金|刀)|英镑|马克|法郎|卢布|泰铢)'
)
MONEY_PREFIX = (
    r'((将)?近|只有|仅|(大)?约(莫|合)?|大概|至少(要)?|不(到|足|超过)?|逾|(高|大|多)于|(高)?达(到)?|^上|(超)?过|超|(低|小|少)于)'
)
MONEY_SUFFIX = r'(以上|以下|左右|上下)'
MONEY_BLUR = r'((大)?约(莫|合)?|大概|左右|上下)'
MONEY_MINUS = r'((将)?近|不(到|足|超过)?|以下|(低|小|少)于)'
MONEY_PLUS = r'(至少(要)?|逾|(高|大|多)于|上|(超)?过|超|以上)'
MONEY_NUM_SEP = r'[,， ]'
# full currency-unit alternation incl. prefix cases (rule_pattern.py:489-491)
MONEY_SUFFIX_CASE = (
    r'((分|角|毛|块|元)钱?|(人民|港|日|澳|(新)?台)币|圆(整)?|英镑|美(金|分|刀)|马克|法郎|卢布|泰铢|'
    r'元((人民|港|日|澳|韩|(新)?台)币)?|(美|港|澳门|日|韩|缅|马|新加坡|欧|加|加拿大|新西兰|澳|澳大利亚)元|'
    r'(越(南)?)盾|雷亚尔)'
)
MONEY_NUM_STRING = (
    r'^[ \.多个数几百佰k千仟w万萬亿十拾兆〇O0-9零０-９一二两三四五六七八九壹弌贰弍俩叁弎仨肆伍陆柒捌玖]+$'
)
MONEY_KUAI_JIAO_FEN = r'[分角毛块]'
# candidate char-class sweep for the money NER stage (rule_pattern.py:498-503)
MONEY_CHAR_STRING = (
    r'(?!(余|多|分|角|不|块|〇))'
    r'((将)?近|只有|仅|(大)?约(莫|合)?|大概|至少(要)?|不(到|足|超过)?|逾|高于|(高)?达(到)?|^上|(超)?过|超|'
    r'以上|以下|左右|上下|港币|人民币|(新)?台币|(分|角|毛|块|元)钱?|(人民|港|日|澳|(新)?台)币|圆(整)?|英镑|'
    r'美(金|分|刀)|马克|法郎|卢布|泰铢|元((人民|港|日|澳|韩|(新)?台)币)?|(美|港|澳门|日|韩|缅|马|新加坡|欧|'
    r'加|加拿大|新西兰|澳|澳大利亚)元|(越(南)?)盾|雷亚尔|'
    r'[分角毛块 \.\,\-\~—－～，余多个数几百佰k千仟w万萬亿十拾兆〇O0-9零０-９一二两三四五六七八九壹弌贰弍俩叁弎仨肆伍陆柒捌玖\(\)（）不含])+'
)


# ---------------------------------------------------------------------------
# Stopword-filter patterns (rule_pattern.py:116-124, 261-350): full-token
# time/number/location classifiers used by the remove_stopwords kernel.

CHINESE_NUM_CHARS = '[一二三四五六七八九壹弌贰弍叁弎仨肆伍陆柒捌玖俩两零]'
CHINESE_UNIT_CHARS = '[〇O零十百千万亿兆拾佰仟萬億]'
_BASE_NUMBER = ('[' + CHINESE_NUM_CHARS[1:-1] + CHINESE_UNIT_CHARS[1:-1]
                + r'点\d\%％\.\,．多余几]+')
NUMBER_PATTERN = (r'^((十|百|千|万)分之|第|数|好|\-)?' + _BASE_NUMBER
                  + r'([\~\-～－至]?' + _BASE_NUMBER + ')?(多|余)?$')

LOCATION_PATTERN = '^(' + '|'.join([
    '(亚|欧|非|(中)?(北|南)?美|拉丁美|南极|大洋)洲',
    '(东|西|南|北)?(太平|大西|印度|北冰)洋',
    '((东|西|南|北|中|东南|中北)亚|(东|西|南|北|中)欧|(东|西|北)非|拉美|北美|南美|(中|近|远)东)',
    CHINESE_CHAR + '+[县市镇村区山州路河城湖岛港江省湾乡街庄堡国寺桥溪岭海郡]',
]) + ')$'


def _stopword_time_pattern() -> str:
    """The composite TIME_PATTERN of rule_pattern.py:280-350 (full-token
    time classifier for stopword filtering)."""
    ho_n = r'([01]?\d|2[01234])'
    mi_n = r'[012345]?\d'
    se_n = r'[012345]?\d'
    gap = '[:：]'
    hms1 = '^(' + ho_n + gap + mi_n + '(' + gap + se_n + ')?)$'
    hms2 = '^(' + ho_n + '(点|时|小时)(' + mi_n + '分(钟)?(' + se_n + '秒(钟)?)?)?)$'
    hms3 = '^(' + hms1 + r'[\-\~～—]{1,2}' + hms1 + ')$'
    ye_n = r'[12]?\d{2,3}'
    mo_n = r'([0]?\d|1[012])'
    mo_c = r'(元|正|腊|一|二|三|四|五|六|七|八|九|十(一|二)?)'
    da_n = r'([012]?\d|3[01])'
    ymd_gap = r'[\-\~— ～\.]{1,2}'
    span_gap = r'[\~\-～－至]'
    ymd1 = ('^((公元(前)?)?' + ye_n + '年(初|底|中)?)?((' + mo_n + '|' + mo_c
            + ')月(份|底|初)?)?(' + da_n + '[日号])?$')
    ymd2 = '^(' + ye_n + ymd_gap + mo_n + '(' + ymd_gap + da_n + ')?)$'
    ymd3 = '^(' + mo_n + ymd_gap + da_n + '(' + ymd_gap + ye_n + ')?)$'
    ymd4 = ('^((公元(前)?)?' +
            r'(([12]?\d|(二)?十(一|二|三|四|五|六|七|八|九)?)世纪)?'
            r'((\d0|(一|二|三|四|五|六|七|八|九)十)年代)?(初|末)?' + ')$')
    ymd5 = '^(一|二|三|四|五|六|七|八|九|零|〇|○|0){4}年$'
    ymd_hms = '^(' + ymd2[1:-1] + r'([\-\~\—～]{1,2})?' + hms1[1:-1] + ')$'
    lunar = ('((闰)?(元|正|腊|一|二|三|四|五|六|七|八|九|十(一|二)?)月|大年)'
             '(初(一|二|三|四|五|六|七|八|九|十)|(一|二|三|四|五|六|七|八|九|十){2,3})')
    year_span = '^' + ye_n + span_gap + ye_n + '年(代)?$'
    month_span = '^' + mo_n + span_gap + mo_n + '月(份)?$'
    day_span = '^' + da_n + span_gap + da_n + '日$'
    season = '((春|夏|秋|冬){1,2}(季|天|日)|(第)?(一|二|三|四)(季度)(末)?)'
    week = ('((上(半)?|下(半)?|这|本|前|今|当|上上|下下)?(星期|周)'
            '(六日|一|二|三|四|五|六|日|七|天|末|初)?(时)?)')
    c1 = '^(年|月|日|时)$'
    cy = (r'(昔|翌|头(一|两|几|些)?|(大)?前(一|半|两|几|些)?|近(一|两|几|些)?|'
          r'这(一|两|几|些)?|那(一|两|几|些)?|上(半)?|下(半)?|(大)?后(一|半|两|几|些)?|'
          r'同|当|早(一|两|几|些)?|每|去|今|往|本|次|明|明后)?年(中|度|初|前|末|底|终|内)?')
    cs = r'(本|上|下|这)'
    cm = (r'(下(个)?|首(个)?|前(两|几)?|上(个)?|这(个)?|次|这(些|个)?|那(些|个)?|'
          r'上半(个)?|下半(个)?|同|本|当|每)?月(份|中|度|初|末|底)?')
    cd = (r'(昔|首|前(一|两|几|些)?|翌|昨|次|今|往|明|平|即|往|半|旧|近(一|两|几|些)?|'
          r'后(一|两|几|些)?|这(一|两|几|些)?|那(一|两|几|些)?|上半|下半|同|当|每(一)?)?'
          r'(天|日)(前|后)?')
    c2 = '(下|中|上)(午|旬)|近(期|日)|此前'
    c3 = '(晚|早)(上|间)'
    c4 = '(深|每|昨|前|今|午|后|半|上半|下半|春|当|夏|秋|冬)?夜(里|晚|间)?'
    c5 = '(今|傍|昨|当)晚'
    c6 = '(早|凌|今|清)晨|黎明'
    c7 = '午(后|时)'
    return '(' + '|'.join([
        c1, cy, cs, cm, cd, c2, c3, c4, c5, c6, c7,
        week, lunar, ymd_hms, season,
        ymd1, ymd2, ymd3, ymd4, ymd5,
        hms1, hms2, hms3,
        year_span, month_span, day_span]) + ')'


STOPWORD_TIME_PATTERN = _stopword_time_pattern()

# ---------------------------------------------------------------------------
# Time parsing pattern strings (rule_pattern.py:362-469).  Same compositional
# helpers as the reference: b() wraps a group, ba() an optional group,
# a() a trailing '?'.

def _b(s):  # bracket
    return '(' + s + ')'


def _ba(s):  # bracket_absence
    return '(' + s + ')?'


def _a(s):  # absence
    return s + '?'


TP_I = '|'
LIMIT_YEAR_STRING = r'(前(一)?|今|明|去|同|当|后|大前|本|次|上(一)?|这(一)?)年'
YEAR_STRING = r'([12]?\d{2,3}|[一二三四五六七八九零〇]{2,4})年'
MONTH_NUM_STRING = r'(1[012]|[0]?[1-9]|十[一二]|[一二三四五六七八九十])'
MONTH_STRING = MONTH_NUM_STRING + r'月(份)?'
# the reference REDEFINES MONTH_NUM_STRING after MONTH_STRING is built,
# adding 两 (rule_pattern.py:369) — ordinal month contexts use this variant
MONTH_NUM_ORDER_STRING = MONTH_NUM_STRING[:-2] + r'两])'
LIMIT_MONTH_STRING = r'((下(下)?|上(上)?)((一)?个)?|同|本|当|次|(这((一)?个)?))月'
DAY_NUM_STRING = r'(([12]\d|3[01]|[0]?[1-9])|([一二]?十)?[一二三四五六七八九]|(三十)?[一]|[二三]?十)'
DAY_STRING = DAY_NUM_STRING + r'[日号]'
LIMIT_DAY_STRING = r'(前|今|明|同一|当|后|大大前|大大后|大前|大后|昨|次|本)[天日晚]'
LIMIT_SPAN_DAY_STRING = r'(最?[前后]([二两三四五六七八九十\d])[天日])'
WEEK_NUM_STRING = r'周?[一二两三四五六七八九十0-9]{1,3}'
WEEK_STRING = r'(周|星期|礼拜)'
HOUR_STRING = r'((十)?[一两二三四五六七八九]|[零〇十]|二十[一二三四]?|[01]?\d|2[01234])[时点](整|钟)?'
BLUR_HOUR_STRING = r'(凌晨|白天|清[晨|早]|黎明|一(大)?早|早[晨上]?|[上中下]午|午后|(傍)?晚[间上]?|[深半午]?夜[里间]?|[上下前后]半夜)'
CONSECUTIVE_BLUR_HOUR_STRING = r'(一两|两三|三四|四五|五六|六七|七八|八九|九十)[点]'
MIN_SEC_STRING = r'((零|〇|[一二三四五]?十)[一二三四五六七八九]|[二三四五]?十|[012345]?\d)'
TIME_POINT_SUFFIX = r'(左右|许|前后)'
NOW_STRING = r'(现在|此时(此刻)?|此刻)'
DELTA_NUM_STRING = r'(([一两俩二仨三四五六七八九十百千万零]+点)?[一两二三四五六七八九十百千万零]+|([\d十百千万,]+\.)?[\d十百千万,]+)'
QUARTER_NUM_STRING = r'[一两二三四1-4]'
SINGLE_NUM_STRING = r'[一两俩二仨三四五六七八九十\d]'

YEAR_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'[多余]?(周)?年(多)?', TP_I, '半年', TP_I, SINGLE_NUM_STRING, '年半'])
SOLAR_SEASON_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'个(多)?季度'])
MONTH_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'(多)?个(多)?月', TP_I, '(俩|三|仨)月', TP_I, '半(个(多)?)?月', TP_I,
                              SINGLE_NUM_STRING, '个半月'])
WORKDAY_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'[多余]?(个)?(工作|交易)日'])
DAY_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'[多余]?[天日]', TP_I, '半天', TP_I, SINGLE_NUM_STRING, '天半'])
WEEK_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'[多余]?((个(多)?)?(星期|礼拜)|周(?!年))', TP_I, r'俩(星期|礼拜)'])
HOUR_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'[多余]?(个(多)?)?(小时|钟头)', TP_I,
                             '半(个(多)?)?(小时|钟头)', TP_I, '俩(小时|钟头)', TP_I, SINGLE_NUM_STRING, '个半(小时|钟头)'])
QUARTER_DELTA_STRING = ''.join([QUARTER_NUM_STRING, '刻钟'])
MINUTE_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'[多余]?分(钟)?(半)?', TP_I, '半分钟', TP_I,
                               SINGLE_NUM_STRING, '+分半(钟)?'])
SECOND_DELTA_STRING = ''.join([DELTA_NUM_STRING, r'[多余]?秒(钟)?'])
DELTA_SUB = r'([之以]?[内前后来])'

# lunar / festival / solar-term strings (rule_pattern.py:363-425)
LUNAR_YEAR_STRING = r'([一二三四五六七八九零〇]{2}|[一二三四五六七八九零〇]{4}|[12]\d{3}|\d{2})年'
LUNAR_MONTH_STRING = r'(闰)?([正一二三四五六七八九十冬腊]|十[一二]|[1-9]|1[012])月'
SELF_EVI_LUNAR_MONTH_STRING = r'((闰)?[正冬腊]|闰([一二三四五六七八九十]|十[一二]|[1-9]|1[012]))月'
LUNAR_SOLAR_DAY_STRING = r'((初|(二)?十|廿)[一二三四五六七八九]|[初二三]十|初([1-9]|10)|[12]\d|3[01]|[0]?[1-9])'
LUNAR_DAY_STRING = r'((初|(二)?十|廿)[一二三四五六七八九]|[初二三]十|初([1-9]|10))'
SELF_EVI_LUNAR_DAY_STRING = r'([初廿]([一二三四五六七八九十1-9]|10))'
LU_STRING = r'([农阴]历)'
CONJ_STRING = r'([的地得])'
SOLAR_TERM_STRING = (r'(立春|雨水|惊蛰|春分|清明|谷雨|立夏|小满|芒种|夏至|小暑|大暑|'
                     r'立秋|处暑|白露|秋分|寒露|霜降|立冬|小雪|大雪|冬至|小寒|大寒)')
FIXED_SOLAR_FESTIVAL = (
    r'((元旦|十一(?![点时分秒]))|(三八|五一|六一|七一|八一|国庆|圣诞)(节)?|'
    r'((三八)?妇女|女神|植树|(五一)?劳动|(五四)?青年|(六一)?儿童|(七一)?建党|(八一)?建军|教师|情人|愚人|万圣|护士)节|'
    r'地球日|三[\.•·・]?一五|双(十一|11)|(.{1,4})?消费者权益日)')
FIXED_LUNAR_FESTIVAL = (
    r'((春|填仓|上巳|寒食|浴佛|姑姑|财神|下元|寒衣)节|'
    r'(龙抬头|除夕)|'
    r'(大年(初[一二三四五六七八九十]|三十))|'
    r'(端午|端阳|七夕|元宵|中秋|重阳|腊八|中元)(节)?)')
REGULAR_FOREIGN_FESTIVAL = r'(感恩|母亲|父亲)节'

# time NER candidate char-class sweep (rule_pattern.py:458-469)
TIME_CHAR_STRING = ''.join(
    [r'(现在|开始|黎明|过去|未来|愚人|感恩|圣诞|情人|儿童|劳动|父亲|母亲|礼拜|霜降|立春|立冬|小寒|大寒|',
     r'立夏|立秋|冬至|',
     r'[102年月日3589647时午至天上个分今下\:\-点晚前一小后周起内以底三晨钟来半两凌当十份季Qq去早多第五中初廿\.度二从六期旬到间四节号：',
     r'代\~\—～春明昨星末秋之同·世纪本七九秒每次八夏/夜零正冬腊余工作元国清傍交易首 ()（）、万宵全暑头端庆旦－际消费者权益大里农阴历双财',
     r'近运深, ”夕〇几汛假壹无数白百刻许左右的这本])+'])
FAKE_POSITIVE_TIME_PATTERN = TP_I.join([
    r'点' + SINGLE_NUM_STRING + '$',
    r'点' + SINGLE_NUM_STRING + '(?![时分秒刻月日' + SINGLE_NUM_STRING[1:-1] + '])',
])
FAKE_POSITIVE_START_STRING = r'[起到至以开－\—\-\~～]'
FAKE_POSITIVE_END_STRING = r'[到至－\—\-\~～\,]'


def build_redundant_pattern(chars: str = REDUNDANT_CHARS) -> re.Pattern:
    """Collapse runs: for each char c emit ``(?<=c)c+`` (extractor.py:83-94)."""
    alts = ['(?<={c}){c}+'.format(c=re.escape(ch)) for ch in chars]
    return re.compile('|'.join(alts))


def build_remove_brackets_pattern(pairs: str = BRACKET_PAIRS) -> re.Pattern:
    """``left[^leftright]*right`` per pair, or-joined (extractor.py:552-566).

    Applied repeatedly to a fixpoint to peel nested brackets.
    """
    alts = []
    for i in range(0, len(pairs), 2):
        left, right = re.escape(pairs[i]), re.escape(pairs[i + 1])
        alts.append('{l}[^{l}{r}]*{r}'.format(l=left, r=right))
    return re.compile('|'.join(alts))
