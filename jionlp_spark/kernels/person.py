"""Chinese person-name checker.

Behavioral port of the reference CheckPersonName
(/root/reference/jionlp/algorithm/ner/check_person_name.py:21-69): a
2–4-char string is a plausible person name iff it starts with a surname —
single-char surnames from the disambiguated 百家姓 list, or a two-char
compound surname; 4-char names also allow a two-single-surname prefix
(parents' combined surnames).

The surname constants are factual lists and must stay character-identical
to the reference (rule/rule_pattern.py:226-255) for parity — same policy as
kernels/patterns.py.
"""

from __future__ import annotations

import re

# reference rule_pattern.py:240-249 (the disambiguated single-char list; the
# fuller list at :227-236 is overwritten there and never used)
SINGLE_CHINESE_FAMILY_NAME = (
    '赵李吴郑王冯陈褚蒋沈韩杨朱秦尤许何吕张孔曹严魏陶姜戚邹喻窦潘葛奚范彭郎鲁韦'
    '俞袁酆鲍史廉岑薛倪滕殷罗郝邬傅卞康伍卜顾孟穆萧尹姚邵'
    '湛汪祁禹狄臧宋茅董梁杜阮闵贾娄郭盛刁钟徐邱骆'
    '蔡樊凌霍虞柯昝卢莫裘缪丁贲邓郁崔龚嵇邢裴翁荀於惠甄'
    '芮羿储靳汲邴糜弓隗侯宓蓬郗仲伊栾钭刘詹'
    '韶郜黎蓟薄蒲邰鄂蔺乔胥莘翟谭贡逄姬冉郦雍郤璩'
    '濮扈冀郏尚晏瞿阎慕茹宦艾易慎戈廖庾暨衡耿弘匡寇禄阙'
    '殳沃夔厍聂晁敖融訾阚饶毋乜鞠巢蒯後竺逯桓'
    '仉晋楚闫汝鄢涂钦缑亢牟佘佴赏谯笪佟'
)

# reference rule_pattern.py:251-254
TWO_CHAR_CHINESE_FAMILY_NAME = (
    '万俟|司马|上官|欧阳|夏侯|诸葛|闻人|东方|赫连|皇甫|尉迟|公羊|澹台|公冶|宗政|濮阳|淳于|单于|太叔|申屠|'
    '公孙|仲孙|轩辕|令狐|钟离|宇文|长孙|慕容|鲜于|闾丘|司徒|司空|亓官|司寇|子车|颛孙|端木|巫马|公西|漆雕|'
    '乐正|壤驷|公良|拓跋|夹谷|宰父|谷梁|段干|百里|东郭|南门|呼延|羊舌|微生|梁丘|左丘|东门|西门|南宫|第五'
)

CHINESE_FAMILY_NAME = ('(' + '|'.join(SINGLE_CHINESE_FAMILY_NAME) + '|'
                       + TWO_CHAR_CHINESE_FAMILY_NAME + ')')


class CheckPersonName:
    """Same decision procedure as the reference (check_person_name.py:32-69),
    including the quirk that the single-char test reuses the combined
    pattern (a two-char alternative can never match one char)."""

    def __init__(self) -> None:
        self._family = re.compile(CHINESE_FAMILY_NAME)
        self._two_char = re.compile('(' + TWO_CHAR_CHINESE_FAMILY_NAME + ')')

    def __call__(self, text: str) -> bool:
        n = len(text)
        if n <= 1 or n >= 5:
            return False
        if n == 4:
            if self._family.search(text[0]) is not None \
                    and self._family.search(text[1]) is not None:
                return True
            return self._two_char.search(text[:2]) is not None
        if n == 3:
            if self._family.search(text[0]) is not None:
                return True
            return self._two_char.search(text[:2]) is not None
        # n == 2
        return self._family.search(text[0]) is not None


_CHECKER: CheckPersonName | None = None


def get_person_checker() -> CheckPersonName:
    global _CHECKER
    if _CHECKER is None:
        _CHECKER = CheckPersonName()
    return _CHECKER
