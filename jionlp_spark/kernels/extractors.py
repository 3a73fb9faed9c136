"""Rule-based mention extraction kernel (pure Python, UDF-side).

Reproduces the reference extractors in
/root/reference/jionlp/rule/extractor.py (extract_email:154, extract_url:351,
extract_phone_number:240, extract_id_card:204, extract_ip_address:222,
extract_qq:275, extract_wechat_id:305,
extract_motor_vehicle_licence_plate:184, extract_chinese:823) including the
sentinel-padding + offset -1 convention (extractor.py:62-69): the text is
padded with a char that cannot occur inside the target expression so the
boundary lookarounds fire at string edges; spans are then shifted back by 1.

Output mention dicts: {'text', 'offset' (start, end half-open), 'type'}.
"""

from __future__ import annotations

import re

from . import patterns as P


class Mention(dict):
    """A typed mention; plain dict subclass for cheap Arrow conversion."""
    __slots__ = ()


def _scan(pattern: re.Pattern, text: str, pad: str, mtype: str) -> list:
    """Padded scan → mentions with offsets into the unpadded text."""
    padded = pad + text + pad
    out = []
    for m in pattern.finditer(padded):
        s, e = m.span()
        out.append({'text': m.group(1), 'offset': (s - 1, e - 1), 'type': mtype})
    return out


class RuleExtractor:
    """Compile-once extractor bundle (one instance per Python worker)."""

    def __init__(self) -> None:
        self._email = re.compile(P.EMAIL)
        self._email_domain = re.compile(P.EMAIL_DOMAIN)
        self._url = re.compile(P.URL)
        self._cell = re.compile(P.CELL_PHONE)
        self._landline = re.compile(P.LANDLINE_PHONE)
        self._id_card = re.compile(P.ID_CARD)
        self._ip = re.compile(P.IP_ADDRESS)
        self._qq = re.compile(P.QQ)
        self._qq_cue = re.compile(P.QQ_CUE)
        self._wechat = re.compile(P.WECHAT_ID)
        self._wechat_cue = re.compile(P.WECHAT_CUE)
        self._plate = re.compile(P.LICENCE_PLATE)
        self._chinese_run = re.compile(P.CHINESE_CHAR + '+')

    # each extractor returns list[{'text','offset','type'}]

    def extract_email(self, text: str) -> list:
        return _scan(self._email, text, P.PAD_EMAIL, 'email')

    def email_domain(self, email: str) -> str | None:
        m = self._email_domain.search(email)
        return m.group(1) if m else None

    def extract_url(self, text: str) -> list:
        return _scan(self._url, text, P.PAD_URL, 'url')

    def extract_phone_number(self, text: str) -> list:
        cell = _scan(self._cell, text, P.PAD_GENERIC, 'cell_phone')
        landline = _scan(self._landline, text, P.PAD_GENERIC, 'landline_phone')
        return cell + landline

    def extract_id_card(self, text: str) -> list:
        return _scan(self._id_card, text, P.PAD_GENERIC, 'id_card')

    def extract_ip_address(self, text: str) -> list:
        return _scan(self._ip, text, P.PAD_GENERIC, 'ip_address')

    def extract_qq(self, text: str, strict: bool = True) -> list:
        padded = P.PAD_GENERIC + text + P.PAD_GENERIC
        hits = _scan(self._qq, text, P.PAD_GENERIC, 'qq')
        if strict and not self._qq_cue.search(padded):
            # without a "QQ" cue anywhere, bare digit runs are not QQ numbers
            # (extractor.py:295-303)
            return []
        return hits

    def extract_wechat_id(self, text: str, strict: bool = True) -> list:
        hits = _scan(self._wechat, text, P.PAD_GENERIC, 'wechat_id')
        if not strict:
            return hits
        # strict mode: require a wechat cue in the 8 chars before the id.
        # The reference indexes the PADDED text with the UNPADDED offset
        # (extractor.py:337-341) — an off-by-one it ships with; reproduced.
        padded = P.PAD_GENERIC + text + P.PAD_GENERIC
        out = []
        for item in hits:
            end = item['offset'][0]
            start = max(0, end - P.WECHAT_CUE_WINDOW)
            if self._wechat_cue.search(padded[start:end]):
                out.append(item)
        return out

    def extract_licence_plate(self, text: str) -> list:
        return _scan(self._plate, text, P.PAD_GENERIC, 'licence_plate')

    def extract_chinese(self, text: str) -> list:
        if text == '':
            return []
        return [m.group() for m in self._chinese_run.finditer(text)]

    # -- remove / replace variants (extractor.py:507-791) -------------------

    def remove_id_card(self, text: str) -> str:
        return self._id_card.sub('', P.PAD_GENERIC + text
                                 + P.PAD_GENERIC)[1:-1]

    def remove_ip_address(self, text: str) -> str:
        return self._ip.sub('', P.PAD_GENERIC + text + P.PAD_GENERIC)[1:-1]

    def remove_qq(self, text: str, strict: bool = True) -> str:
        if strict and not self._qq_cue.search(text):
            return text
        return self._qq.sub('', P.PAD_GENERIC + text + P.PAD_GENERIC)[1:-1]

    def replace_email(self, text: str, token: str = '<email>') -> str:
        # reference pads with '#' here, not '龥' (extractor.py:685)
        return self._email.sub(token, P.PAD_GENERIC + text
                               + P.PAD_GENERIC)[1:-1]

    def replace_id_card(self, text: str, token: str = '<id>') -> str:
        return self._id_card.sub(token, P.PAD_GENERIC + text
                                 + P.PAD_GENERIC)[1:-1]

    def replace_ip_address(self, text: str, token: str = '<ip>') -> str:
        return self._ip.sub(token, P.PAD_GENERIC + text
                            + P.PAD_GENERIC)[1:-1]

    def replace_phone_number(self, text: str, token: str = '<tel>') -> str:
        padded = P.PAD_GENERIC + text + P.PAD_GENERIC
        padded = self._cell.sub(token, padded)
        padded = self._landline.sub(token, padded)
        return padded[1:-1]

    def replace_qq(self, text: str, strict: bool = True,
                   token: str = '<qq>') -> str:
        if strict and not self._qq_cue.search(text):
            return text
        return self._qq.sub(token, P.PAD_GENERIC + text
                            + P.PAD_GENERIC)[1:-1]

    def replace_url(self, text: str, token: str = '<url>') -> str:
        return self._url.sub(token, P.PAD_URL + text + P.PAD_URL)[1:-1]

    def replace_chinese(self, text: str, substitute: str = ' '):
        if text == '':
            return []
        return re.sub(P.CHINESE_CHAR, substitute, text)

    # -- parentheses (extractor.py:369-432) ----------------------------------

    def extract_parentheses(self, text: str,
                            pairs: str = P.BRACKET_PAIRS,
                            detail: bool = False) -> list:
        """Stack-based pair matcher returning inner spans (incl. brackets)."""
        close2open = {pairs[i + 1]: pairs[i]
                      for i in range(0, len(pairs), 2)}
        char_re = re.compile('[' + re.escape(pairs) + ']')
        stack, starts, out = [], [], []
        for m in char_re.finditer(text):
            ch = text[m.start()]
            if ch in close2open:
                if stack and stack[-1] == close2open[ch]:
                    stack.pop()
                    s = starts.pop()
                    if detail:
                        out.append({'content': text[s: m.start() + 1],
                                    'offset': (s, m.start() + 1)})
                    else:
                        out.append(text[s: m.start() + 1])
            else:
                stack.append(ch)
                starts.append(m.start())
        return out

    # -- predicates (rule/checker.py:26-146) ---------------------------------

    @staticmethod
    def check_any_chinese_char(text: str) -> bool:
        return bool(text) and re.search(P.CHINESE_CHAR, text) is not None

    @staticmethod
    def check_all_chinese_char(text: str) -> bool:
        if not text:
            return False
        m = re.search(P.CHINESE_CHAR + '+', text)
        return m is not None and m.span()[1] - m.span()[0] == len(text)

    @staticmethod
    def check_any_arabic_num(text: str) -> bool:
        return bool(text) and \
            re.search(r'(\d|[０１２３４５６７８９])', text) is not None

    @staticmethod
    def check_all_arabic_num(text: str) -> bool:
        if not text:
            return False
        m = re.search(r'(\d|[０１２３４５６７８９])+', text)
        return m is not None and m.span()[1] - m.span()[0] == len(text)

    # fused sweep used by the Spark mentions stage: one pass per doc emitting
    # every typed mention.  Keeps per-batch overhead to a single call.
    def sweep(self, text: str) -> list:
        out = []
        out.extend(self.extract_phone_number(text))
        out.extend(self.extract_email(text))
        out.extend(self.extract_url(text))
        out.extend(self.extract_id_card(text))
        out.extend(self.extract_ip_address(text))
        out.extend(self.extract_qq(text))
        out.extend(self.extract_wechat_id(text))
        out.extend(self.extract_licence_plate(text))
        return out


_SINGLETON: RuleExtractor | None = None


def get_extractor() -> RuleExtractor:
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = RuleExtractor()
    return _SINGLETON
