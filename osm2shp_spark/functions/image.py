"""Image codecs + perceptual hashing in pure NumPy/stdlib (N8).

The sandbox has no PIL/libpng, so codecs are implemented from the
public format specs:

- **PPM (P6)**: trivial binary RGB — the always-exact format.
- **PNG**: RGB8, zlib (stdlib) + the five standard scanline filters
  (spec filters 0-4 implemented for decode; encode uses filter 0 per
  scanline — valid PNG, lossless round-trip).

Plus: average-hash (aHash) perceptual fingerprint via block-mean
resize to 8x8 grayscale, and PSNR for the decoded-pixel invariant
(input_hint: allclose / PSNR ≥ 40 dB for lossy formats; both shipped
formats are lossless so equality is exact).

All Spark entry points batch through Arrow (mapInPandas) — the decode
loop is per-image but each image decode is vectorized NumPy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, whitespace-separated w h maxval, single whitespace
    parts = []
    i = 2
    while len(parts) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment line
            while data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        parts.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# PNG (RGB8)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.empty((h, w * 3 + 1), np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    i = len(_PNG_SIG)
    idat = b""
    w = h = None
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB PNG supported")
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
        i += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    bpp = 3
    out = np.zeros((h, w * 3), np.uint8)
    for y in range(h):
        ft = raw[y, 0]
        line = raw[y, 1:].copy()
        prev = out[y - 1] if y > 0 else np.zeros(w * 3, np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 1:  # Sub
            for x in range(len(line)):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ft == 2:  # Up
            out[y] = (line.astype(np.int32) + prev.astype(np.int32)).astype(np.uint8)
        elif ft == 3:  # Average
            for x in range(len(line)):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(len(line)):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                out[y, x] = (
                    int(line[x]) + int(_paeth(np.uint8(left), prev[x], np.uint8(ul)))
                ) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

#: formats whose decode(encode(x)) round-trip is bit-exact — their
#: round-trip PSNR is infinite by construction, no need to measure it
LOSSLESS_FMTS = frozenset({"ppm", "png"})


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(arr)
    if fmt == "png":
        return encode_png(arr)
    raise NotImplementedError(
        f"format {fmt!r}: decoder libraries absent in this environment; "
        "plug a codec in here (jpeg slot reserved — PSNR>=40dB gate applies)"
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    raise NotImplementedError(f"format {fmt!r} not available in-sandbox")


# ---------------------------------------------------------------------------
# perceptual hash + quality metrics
# ---------------------------------------------------------------------------

def _block_mean_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downscale to (out_h, out_w)."""
    h, w = gray.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w), np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    return out


def average_phash(arr: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block-mean grayscale, bit=mean-above-
    average, row-major bit order, returned as signed int64."""
    gray = arr.astype(np.float64).mean(axis=2)
    small = _block_mean_resize(gray, 8, 8)
    bits = (small > small.mean()).ravel()
    h = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            h |= np.uint64(1) << np.uint64(i)
    return int(h.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
