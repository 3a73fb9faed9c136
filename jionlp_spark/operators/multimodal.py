"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` computes real byte-level features (size, magic-sniffed
format, content hash) and returns a deterministic fake for pixel-level
fields, clearly marked.  The Spark-side contract — schema, batch shape,
partitioning, UDF signature — is real and tested; swapping in PIL/ffmpeg on
a production cluster only changes the kernel body.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField('media_id', T.LongType()),
    T.StructField('media_type', T.StringType()),   # image | audio | video
    T.StructField('payload', T.BinaryType()),      # opaque bytes
    T.StructField('meta', T.StringType()),         # JSON sidecar
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField('media_id', T.LongType()),
    T.StructField('n_bytes', T.LongType()),
    T.StructField('format', T.StringType()),
    T.StructField('content_md5', T.StringType()),
    T.StructField('width', T.IntegerType()),       # REAL: header-parsed
    T.StructField('height', T.IntegerType()),      # REAL: header-parsed
    T.StructField('embedding', T.ArrayType(T.FloatType())),  # STUB
])

_MAGIC = [(b'\x89PNG', 'png'), (b'\xff\xd8\xff', 'jpeg'),
          (b'GIF8', 'gif'), (b'RIFF', 'riff'), (b'\x00\x00\x00', 'mp4?')]

# ---------------------------------------------------------------------------
# Stub-boundary contract (pinned interface for a production swap-in).
#
# REAL fields are genuine byte-level features of the payload and keep their
# values when a real decoder replaces the stub kernels.  STUB fields are
# deterministic functions of md5(payload) ONLY — they stand in for decoded
# pixel/sample values and WILL change under a real decoder.  SEMANTIC_STUB
# marks operators whose fields are real byte features but whose meaning
# shifts (frame_sample_stub emits byte offsets where a decoder emits frame
# timestamps).  tests/test_operators.py::test_multimodal_stub_contract
# asserts this table against the kernels, so any drift in the boundary is
# caught before a swap-in relies on it.
REAL_FIELDS = {
    'decode_image_features': ('media_id', 'n_bytes', 'format',
                              'content_md5', 'width', 'height'),
    'decode_audio_features': ('media_id', 'n_bytes', 'format',
                              'content_md5', 'channels', 'sample_rate',
                              'bits', 'duration_ms'),
    'frame_sample_stub': ('media_id', 'offset', 'frame_md5'),
    'resize_image_stub': ('media_id', 'target_w', 'target_h'),
}
STUB_FIELDS = {
    'decode_image_features': ('embedding',),
    'decode_audio_features': ('embedding',),
    'frame_sample_stub': (),
    'resize_image_stub': ('resized', 'resized_md5'),
}
SEMANTIC_STUB = ('frame_sample_stub',)


def _sniff(payload: bytes) -> str:
    for magic, name in _MAGIC:
        if payload[:len(magic)] == magic:
            return name
    return 'unknown'


# JPEG start-of-frame markers (C0–CF minus DHT C4 / JPG C8 / DAC CC) —
# the segment that carries the sample dimensions
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_dimensions(b: bytes) -> tuple | None:
    """REAL pixel dimensions from header bytes, no external libraries
    (r4 verdict item 5): PNG IHDR (bytes 16–24, big-endian), GIF
    logical-screen descriptor (bytes 6–10, little-endian), JPEG SOF0/2
    segment scan.  → (width, height), or None when the payload is not a
    parseable image header (a real decoder would reject it too)."""
    if (b[:8] == b'\x89PNG\r\n\x1a\n' and len(b) >= 24
            and b[12:16] == b'IHDR'):
        w, h = struct.unpack('>II', b[16:24])
        return (w, h)
    if b[:6] in (b'GIF87a', b'GIF89a') and len(b) >= 10:
        return struct.unpack('<HH', b[6:10])
    if b[:3] == b'\xff\xd8\xff':
        i, n = 2, len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                return None  # marker desync — not a well-formed stream
            # the spec allows any number of 0xFF fill bytes before the
            # marker byte — real decoders skip them, so must we
            while i + 1 < n and b[i + 1] == 0xFF:
                i += 1
            if i + 4 > n:
                return None
            marker = b[i + 1]
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker == 0xD9 or marker == 0xDA:
                return None  # EOI / start-of-scan with no SOF seen
            seglen = struct.unpack('>H', b[i + 2: i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 <= n:
                    h, w = struct.unpack('>HH', b[i + 5: i + 9])
                    return (w, h)
                return None
            i += 2 + seglen
    return None


def parse_audio_metadata(b: bytes) -> tuple | None:
    """REAL audio metadata from RIFF/WAVE header bytes, no external
    libraries (the audio analog of parse_image_dimensions): chunk-scan
    from offset 12 — unknown chunks (LIST, bext, …) are skipped by
    their declared length, exactly as a real reader must — until the
    fmt chunk yields (channels, sample_rate, bits) and the data chunk
    its byte size; duration_ms = data_bytes · 1000 // byte_rate (exact
    integer).  → (channels, sample_rate, bits_per_sample, duration_ms),
    or None when the payload is not a parseable WAV."""
    if len(b) < 12 or b[:4] != b'RIFF' or b[8:12] != b'WAVE':
        return None
    i, n = 12, len(b)
    channels = rate = bits = byte_rate = None
    data_size = None
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = struct.unpack('<I', b[i + 4:i + 8])[0]
        if cid == b'fmt ' and i + 24 <= n:
            channels = struct.unpack('<H', b[i + 10:i + 12])[0]
            rate = struct.unpack('<I', b[i + 12:i + 16])[0]
            byte_rate = struct.unpack('<I', b[i + 16:i + 20])[0]
            bits = struct.unpack('<H', b[i + 22:i + 24])[0]
        elif cid == b'data':
            data_size = size
        # chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size + (size & 1)
    if channels is None or data_size is None or not byte_rate:
        return None
    return (channels, rate, bits, data_size * 1000 // byte_rate)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField('media_id', T.LongType()),
    T.StructField('n_bytes', T.LongType()),
    T.StructField('format', T.StringType()),
    T.StructField('content_md5', T.StringType()),
    T.StructField('channels', T.IntegerType()),     # REAL: header-parsed
    T.StructField('sample_rate', T.IntegerType()),  # REAL
    T.StructField('bits', T.IntegerType()),         # REAL
    T.StructField('duration_ms', T.LongType()),     # REAL
    T.StructField('embedding', T.ArrayType(T.FloatType())),  # STUB
])


def decode_audio_features(media: DataFrame,
                          embedding_dim: int = 8) -> DataFrame:
    """binary payload → per-clip features via mapInPandas.  channels /
    sample_rate / bits / duration_ms are REAL — parsed from the
    RIFF/WAVE header (parse_audio_metadata), null for unparseable
    payloads.  The sample-content embedding remains a STUB derived from
    the content hash — replace the marked block with a real encoder."""
    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf['media_id'], pdf['payload']):
                b = bytes(payload) if payload is not None else b''
                digest = hashlib.md5(b).digest()
                meta = parse_audio_metadata(b)
                ch, rate, bits, dur = meta if meta is not None \
                    else (None, None, None, None)
                # --- STUB decode: derived from the hash, deterministic ----
                emb = [(digest[i % 16] - 128) / 128.0
                       for i in range(embedding_dim)]
                # ----------------------------------------------------------
                rows.append((int(mid), len(b), _sniff(b), digest.hex(),
                             ch, rate, bits, dur, emb))
            yield pd.DataFrame(rows, columns=[
                'media_id', 'n_bytes', 'format', 'content_md5',
                'channels', 'sample_rate', 'bits', 'duration_ms',
                'embedding'])

    return media.select('media_id', 'payload') \
        .mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


def decode_image_features(media: DataFrame,
                          embedding_dim: int = 8) -> DataFrame:
    """binary payload → per-image features via mapInPandas (one Arrow batch
    per call).  width/height are REAL — parsed from PNG/GIF/JPEG header
    bytes (parse_image_dimensions), null for unparseable payloads.  The
    pixel-content embedding remains a STUB: a deterministic function of
    the content hash — replace the marked block with a real encoder in
    production.
    """
    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf['media_id'], pdf['payload']):
                b = bytes(payload) if payload is not None else b''
                digest = hashlib.md5(b).digest()
                dims = parse_image_dimensions(b)
                width, height = dims if dims is not None else (None, None)
                # --- STUB decode: derived from the hash, deterministic ----
                emb = [(digest[i % 16] - 128) / 128.0
                       for i in range(embedding_dim)]
                # ----------------------------------------------------------
                rows.append((int(mid), len(b), _sniff(b),
                             digest.hex(), width, height, emb))
            yield pd.DataFrame(rows, columns=[
                'media_id', 'n_bytes', 'format', 'content_md5',
                'width', 'height', 'embedding'])

    return media.select('media_id', 'payload') \
        .mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Video 'frame sampling' plumbing: emits one row per sampled offset
    (real decoders replace byte offsets with frame timestamps)."""
    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf['media_id'], pdf['payload']):
                b = bytes(payload) if payload is not None else b''
                for off in range(0, max(len(b), 1), every_n_bytes):
                    chunk = b[off: off + every_n_bytes]
                    rows.append((int(mid), off,
                                 hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=['media_id', 'offset',
                                              'frame_md5'])

    schema = T.StructType([
        T.StructField('media_id', T.LongType()),
        T.StructField('offset', T.LongType()),
        T.StructField('frame_md5', T.StringType()),
    ])
    return media.select('media_id', 'payload').mapInPandas(kernel, schema)


RESIZED_SCHEMA = T.StructType([
    T.StructField('media_id', T.LongType()),
    T.StructField('target_w', T.IntegerType()),
    T.StructField('target_h', T.IntegerType()),
    T.StructField('resized', T.BinaryType()),       # STUB bytes
    T.StructField('resized_md5', T.StringType()),
])


def resize_image_stub(media: DataFrame, target_w: int = 224,
                      target_h: int = 224) -> DataFrame:
    """Resize plumbing: schema/batching/partitioning are real; the pixel
    resample is a STUB (no PIL in this container) that emits a
    deterministic byte payload derived from the content hash — swap the
    marked block for a real resampler in production."""
    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf['media_id'], pdf['payload']):
                b = bytes(payload) if payload is not None else b''
                # --- STUB resample: hash-derived deterministic bytes ------
                seed = hashlib.md5(b).digest()
                fake = (seed * ((target_w * target_h) // len(seed) + 1)
                        )[: target_w * target_h // 64]
                # ----------------------------------------------------------
                rows.append((int(mid), target_w, target_h, fake,
                             hashlib.md5(fake).hexdigest()))
            yield pd.DataFrame(rows, columns=['media_id', 'target_w',
                                              'target_h', 'resized',
                                              'resized_md5'])

    return media.select('media_id', 'payload').mapInPandas(
        kernel, schema=RESIZED_SCHEMA)
