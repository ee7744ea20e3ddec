"""Real (pure-stdlib) PNG and WAV-PCM codecs for the multimodal slot.

The container has no PIL/cv2/soundfile, but PNG needs only ``zlib``
(stdlib) plus the per-scanline filter reconstruction from the public
PNG spec (RFC 2083 §6), and WAV-PCM needs only ``struct`` over the
public RIFF layout — so the decode math here is REAL, not a stub:
``decode_png`` reproduces exact pixel values (all five filter types,
8-bit gray / gray+alpha / RGB / RGBA) and ``decode_wav`` exact int16
samples.  The encoders exist so pipelines (and tests/oracles) can
round-trip deterministic payloads without any external fixture.

These run inside Arrow-batched ``mapInPandas`` stages
(`operators/multimodal.py`) over thumbnail-sized assets; a production
deployment would swap the per-scanline Python loop for PIL/libpng via
the same slot — the Spark plan does not change.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only; no palette/interlace)
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {v: k for k, v in _COLOR_CHANNELS.items()}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: np.ndarray, filter_for_row=None) -> bytes:
    """Encode an 8-bit image (H×W gray or H×W×C with C in {1,2,3,4})
    as a valid non-interlaced PNG.

    ``filter_for_row(y) -> 0..4`` picks the per-scanline filter
    (default ``y % 5`` — deliberately cycles through ALL filter types
    so decoders must implement every reconstruction rule).
    """
    if filter_for_row is None:
        filter_for_row = lambda y: y % 5  # noqa: E731
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = _CHANNELS_COLOR[ch]
    bpp = ch  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        line = arr[y].tobytes()
        ft = filter_for_row(y)
        raw.append(ft)
        if ft == 0:  # None
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(line))
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(len(line)))
        elif ft == 3:  # Average
            raw += bytes(
                (line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(len(line))
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(len(line))
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to an H×W×C uint8 array —
    real zlib inflate + full filter reconstruction (None/Sub/Up/
    Average/Paeth per RFC 2083 §6.2-6.6)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _COLOR_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}); this decoder covers 8-bit "
            "gray/gray+alpha/RGB/RGBA non-interlaced"
        )
    ch = _COLOR_CHANNELS[color_type]
    bpp = ch
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = bytes(line)
    return out.reshape(h, w, ch)


def encode_apng(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """Encode a list of equally-shaped 8-bit frames as an APNG
    (animated PNG, the public Mozilla/W3C extension): ``acTL`` after
    IHDR, per-frame ``fcTL``, first frame in ``IDAT``, later frames in
    ``fdAT`` — every frame full-size, dispose NONE / blend SOURCE, so
    reconstruction is per-frame independent.

    Each frame's scanlines cycle through all five PNG filter types
    (same as ``encode_png``), so decoding exercises the full
    reconstruction path on every frame.
    """
    if not frames:
        raise ValueError("APNG needs at least one frame")
    first = np.asarray(frames[0], dtype=np.uint8)
    if first.ndim == 2:
        first = first[:, :, None]
    h, w, ch = first.shape
    color_type = _CHANNELS_COLOR[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = bytearray(PNG_MAGIC + _chunk(b"IHDR", ihdr))
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))  # loop forever
    seq = 0

    def fctl(seq_n: int) -> bytes:
        # full-frame, no offset, delay_ms/1000 s, dispose 0, blend 0
        return _chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", seq_n, w, h, 0, 0, delay_ms, 1000, 0, 0),
        )

    for i, frame in enumerate(frames):
        arr = np.asarray(frame, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape != (h, w, ch):
            raise ValueError("APNG frames must share one shape")
        out += fctl(seq)
        seq += 1
        # reuse the still-PNG encoder for the filtered+compressed body
        body = encode_png(arr)
        # extract its IDAT payload (single IDAT by construction)
        pos, idat = 8, b""
        while pos < len(body):
            (length,) = struct.unpack_from(">I", body, pos)
            tag = body[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat = body[pos + 8 : pos + 8 + length]
            pos += 12 + length
        if i == 0:
            out += _chunk(b"IDAT", idat)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + idat)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(data: bytes) -> list[np.ndarray]:
    """Decode an APNG (full-frame frames, as produced by
    ``encode_apng``) to a list of H×W×C uint8 arrays — real chunk walk
    + per-frame zlib inflate + filter reconstruction.

    A plain (non-animated) PNG decodes as a single-frame list, matching
    APNG's own semantics where the default image is the first frame.
    """
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr_body = None
    streams: list[bytearray] = []  # one compressed stream per frame
    saw_actl = False
    saw_fctl_before_idat = False
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr_body = body
        elif tag == b"acTL":
            saw_actl = True
        elif tag == b"fcTL":
            if streams or saw_fctl_before_idat:
                streams.append(bytearray())  # subsequent frame begins
            else:
                saw_fctl_before_idat = True  # first frame = IDAT
        elif tag == b"IDAT":
            if not streams:
                streams.append(bytearray())
            streams[0] += body
        elif tag == b"fdAT":
            if not streams:
                raise ValueError("APNG fdAT before IDAT")
            streams[-1] += body[4:]  # strip sequence number
        elif tag == b"IEND":
            break
    if ihdr_body is None or not streams:
        raise ValueError("PNG missing IHDR/image data")
    if not saw_actl and len(streams) == 1:
        return [decode_png(data)]  # plain PNG fast path
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr_body)
    frames = []
    for s in streams:
        # rebuild a minimal still PNG per frame and reuse decode_png
        still = (
            PNG_MAGIC
            + _chunk(b"IHDR", ihdr_body)
            + _chunk(b"IDAT", bytes(s))
            + _chunk(b"IEND", b"")
        )
        frames.append(decode_png(still))
    return frames


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, n_channels: int = 1
) -> bytes:
    """Encode int16 samples (interleaved if multi-channel, length =
    frames × channels) as a canonical RIFF/WAVE PCM-16 file."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode RIFF/WAVE PCM-16 → (sample_rate, n_channels, int16
    samples interleaved).  Real chunk-walk over the public RIFF layout
    (unknown chunks skipped, word-aligned)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = n_channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={audio_fmt}, bits={bits}); "
                    "this decoder covers PCM-16"
                )
        elif tag == b"data":
            pcm = body
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sample_rate, n_channels, np.frombuffer(pcm, dtype="<i2")


# --------------------------------------------------------------------------
# PPM (P6 binary) — the simplest real raster format: ASCII header +
# raw RGB bytes.  Zero compression, pure stdlib; widens the natively
# decodable set beyond PNG (netpbm files are common as intermediate
# artifacts in vision pipelines).
# --------------------------------------------------------------------------

PPM_MAGIC = b"P6"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (maxval 255)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("PPM needs an (h, w, 3) RGB array")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM → (h, w, 3) uint8.  Handles the full header grammar:
    whitespace-separated tokens with ``#`` comments, exactly one
    whitespace byte after maxval before the raster."""
    if not data.startswith(PPM_MAGIC):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # the single whitespace byte after maxval
    raster = data[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


PGM_MAGIC = b"P5"


def encode_pgm(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → binary PGM (maxval 255)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("PGM needs an (h, w) grayscale array")
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_pgm(data: bytes) -> np.ndarray:
    """Binary PGM → (h, w) uint8 (same header grammar as PPM)."""
    if not data.startswith(PGM_MAGIC):
        raise ValueError("not a binary PGM (P5) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1
    raster = data[pos : pos + w * h]
    if len(raster) != w * h:
        raise ValueError("truncated PGM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w).copy()
