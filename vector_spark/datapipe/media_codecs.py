"""Pure-Python decoders/encoders for UNCOMPRESSED media container
formats — BMP (24-bit uncompressed), PPM/PGM (binary P6/P5), WAV
(16-bit PCM) — so the multimodal pipeline has a REAL end-to-end
decode -> featurize path with zero library dependencies (the
MMDB-reader / OTLP-decoder precedent: the formats are public specs and
the uncompressed subsets are small).

Compressed formats (JPEG/PNG/MP3/video) stay behind the documented
stub in multimodal.py — entropy coding without a codec library is out
of scope; on a real cluster PIL/soundfile drop into the same kernel
seam without touching the plan.

Everything returns/accepts numpy arrays, which is also what an Arrow
batch hands the kernels — no per-pixel Python in the hot path.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40), 24 bpp, BI_RGB


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB.  Handles 4-byte
    row padding, bottom-up (positive height) and top-down (negative
    height) layouts."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(b) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(
        h, stride
    )[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) uint8")
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    pix = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return header + info + pix


# ---------------------------------------------------------------------------
# PPM (P6, RGB) / PGM (P5, gray), binary, maxval 255


def _pnm_header(b: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse magic + whitespace/comment-separated (w, h, maxval);
    returns (magic, w, h, maxval, data offset)."""
    magic = b[:2]
    i = 2
    vals: list[int] = []
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":  # comment to EOL
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(b[i:j]))
        i = j
    return magic, vals[0], vals[1], vals[2], i + 1  # single ws after maxval


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8; binary PGM (P5) -> (H, W)
    uint8."""
    if len(b) < 2 or b[:1] != b"P" or b[1:2] not in (b"5", b"6"):
        raise ValueError("not a binary PNM payload")
    magic, w, h, maxval, off = _pnm_header(b)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(b) < off + need:
        raise ValueError("truncated PNM pixel data")
    arr = np.frombuffer(b, np.uint8, need, off)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) -> P6; (H, W) -> P5."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError("expected (H, W, 3) or (H, W) uint8")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# ---------------------------------------------------------------------------
# WAV: RIFF/WAVE with a PCM-16 fmt chunk + data chunk (proper chunk walk)


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """16-bit PCM WAV -> (sample_rate, (n_samples, channels) int16).
    Walks RIFF chunks (word-aligned), tolerating extra chunks like
    LIST/fact."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    rate = channels = bits = None
    data: bytes | None = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt != 1:
                raise ValueError(f"only PCM (fmt 1) supported, got {fmt}")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported, got {bits}")
    n = len(data) // (2 * channels)
    samples = np.frombuffer(data, "<i2", n * channels).reshape(n, channels)
    return rate, samples


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(n, channels) int16 -> 16-bit PCM WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# featurization kernels (numpy, shared by multimodal.extract_features)


def image_features(img: np.ndarray, dim: int) -> list[float]:
    """Mean luminance per ``dim`` equal slices of the row-major pixel
    stream, normalized to [0, 1] — a deterministic, resolution-free
    signature (the real-embedding stand-in)."""
    lum = (
        img.astype(np.float32).mean(axis=2)
        if img.ndim == 3
        else img.astype(np.float32)
    ).ravel()
    if lum.size == 0:
        return [0.0] * dim
    parts = np.array_split(lum, dim)
    return [float(p.mean() / 255.0) if p.size else 0.0 for p in parts]


def audio_features(samples: np.ndarray, dim: int) -> list[float]:
    """RMS energy per ``dim`` time slices of the mono mix, normalized
    by int16 full scale."""
    mono = samples.astype(np.float32).mean(axis=1)
    if mono.size == 0:
        return [0.0] * dim
    parts = np.array_split(mono, dim)
    return [
        float(np.sqrt(np.mean(p * p)) / 32768.0) if p.size else 0.0
        for p in parts
    ]


def sniff_and_featurize(payload: bytes, dim: int) -> list[float] | None:
    """Magic-sniff a payload and produce its feature vector; None for
    formats without a pure-Python decoder (JPEG/PNG/MP3/video — the
    documented stub boundary: install PIL/soundfile on a real cluster
    and extend this dispatch)."""
    if payload[:2] == b"BM":
        return image_features(decode_bmp(payload), dim)
    if payload[:1] == b"P" and payload[1:2] in (b"5", b"6"):
        return image_features(decode_ppm(payload), dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _rate, samples = decode_wav(payload)
        return audio_features(samples, dim)
    return None


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index maps) — the real pixel
    kernel for the resize_plan seam on BMP/PPM payloads."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]
