"""Byte-level BPE encode/decode kernel.

Behavioral port of the reference ByteLevelBPE
(/root/reference/jionlp/algorithm/bpe/encoder_decoder.py:14-124): the GPT-2
byte→printable-unicode bijection, per-char utf-8 encoding, and the
error-tolerant decode that retries 1–4-byte windows and emits U+FFFD on
failure.  The reference stops here (its merge step is an explicit TODO,
:56); the trainable merge half lives in
jionlp_spark.operators.bpe (a from-scratch distributed implementation).
"""

from __future__ import annotations


def _bytes_to_unicode() -> dict:
    bs = (list(range(ord('!'), ord('~') + 1))
          + list(range(ord('¡'), ord('¬') + 1))
          + list(range(ord('®'), ord('ÿ') + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_BYTE_ENCODER = _bytes_to_unicode()
_BYTE_DECODER = {v: k for k, v in _BYTE_ENCODER.items()}


def byte_level_encode(text: str) -> str:
    """utf-8 bytes → printable unicode string (encoder_decoder.py:77-85)."""
    out = []
    for char in text:
        out.append(''.join(_BYTE_ENCODER[b] for b in char.encode('utf-8')))
    return ''.join(out)


def byte_level_decode(chars: str) -> str:
    """Inverse mapping with 1–4-byte windowed retry and U+FFFD for
    undecodable positions (encoder_decoder.py:99-124)."""
    decoded = []
    idx = 0
    while idx < len(chars):
        matched = False
        i = 1
        for i in range(1, 5):
            window = chars[idx: idx + i]
            try:
                decoded.append(bytearray(
                    [_BYTE_DECODER[b] for b in window]).decode('utf-8'))
                matched = True
                break
            except (KeyError, UnicodeDecodeError):
                pass
        if matched:
            idx += i
        else:
            decoded.append('�')
            idx += 1
    return ''.join(decoded)
