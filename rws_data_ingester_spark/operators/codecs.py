"""Pure-numpy compressed-media codecs (SURVEY.md §2.10 [EXT] multimodal).

This runtime ships no media libraries (PIL/cv2/librosa), so the round-2
multimodal tier decoded only header+raw formats (PPM, PCM WAV) and left
JPEG/MP3 as declared stubs. This module closes the image half of that gap
with a REAL baseline JPEG codec implemented from the public spec:

- ``encode_jpeg`` / ``decode_jpeg`` — ITU-T T.81 baseline sequential DCT,
  8-bit, grayscale or YCbCr with 4:4:4 / 4:2:0 subsampling, restart
  intervals, standard Annex K quantization + Huffman tables, IJG-style
  quality scaling. The decoder parses DQT/SOF0/DHT/DRI/SOS from the
  stream (it does NOT assume the encoder's tables), handles 0xFF00 byte
  unstuffing and RSTn markers, and reconstructs via orthonormal IDCT.
- ``adpcm_encode`` / ``adpcm_decode`` — IMA/DVI ADPCM (4 bits/sample,
  ~4:1 vs PCM16), the classic step-size-adaptive differential audio
  codec, with a 4-byte (predictor, index) block header.

MP3 remains out of scope (a polyphase filterbank + psychoacoustic model
is not a reasonable from-scratch target); audio compression is covered by
ADPCM instead and ``multimodal.decode_audio`` documents the boundary.

Everything here is per-row compute with no Spark dependency — the Spark
side (Arrow batching, mapInPandas schema, partitioning) lives in
``operators/multimodal.py`` and is identical for any codec. Reference
parity: the reference repo has no media path at all; this is part of the
[EXT] large-scale-training-pipeline surface mandated by SURVEY §2.10.
"""

from __future__ import annotations

import struct

import numpy as np

# Decompression-bomb guard: a corrupt or adversarial header can declare
# dimensions up to 65535x65535 (JPEG SOF0) or 2^31 x 2^31 (PNG IHDR).
# Allocating the decode planes for such a claim OOM-kills the executor
# BEFORE any exception the PERMISSIVE quarantine could catch — at 100 TB
# one crafted file in a 512 MB task must degrade to a quarantined row,
# not a dead executor. Decoders therefore reject declared pixel counts
# above this cap (64 Mpx ~ 8K x 8K, ~770 MB of float64 JPEG planes at
# 4:2:0) with a ValueError, and the PNG inflate is length-bounded so a
# kilobyte zlib bomb cannot expand to gigabytes first.
MAX_DECODE_PIXELS = 64 * 1024 * 1024

# --------------------------------------------------------------------------
# JPEG constants (ITU-T T.81 Annex K — public spec tables)
# --------------------------------------------------------------------------

# Zigzag scan order: position i in the serialized stream comes from this
# row-major index of the 8x8 block.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 quantization tables (natural row-major order).
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman table specs: (BITS counts for code lengths 1..16, VALS).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal DCT-II basis: forward F = C @ A @ C.T, inverse A = C.T @ F @ C.
_DCT_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_C @ block @ _DCT_C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT_C.T @ coef @ _DCT_C


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex K tables, 100 ≈ all-ones."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing
# --------------------------------------------------------------------------


class BitWriter:
    """MSB-first bit writer; emits 0x00 after any 0xFF data byte."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:
                    self.buf.append(0x00)
                self._acc, self._n = 0, 0

    def pad_byte(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)

    def emit_marker(self, code: int) -> None:
        """Byte-align, then append a raw (un-stuffed) marker — RSTn."""
        self.pad_byte()
        self.buf += bytes([0xFF, code])

    def flush(self) -> bytes:
        self.pad_byte()
        return bytes(self.buf)


class BitReader:
    """MSB-first reader over entropy-coded data; un-stuffs 0xFF00 and
    stops at (but records) RSTn / other markers."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise EOFError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte: literal 0xFF
                else:
                    self.marker = nxt  # hit a real marker
                    raise EOFError(f"marker 0x{nxt:02x} in entropy data")
            self._acc, self._n = b, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Discard bits to the next marker (for RSTn); return its code."""
        self._n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                code = self.data[self.pos + 1]
                self.pos += 2
                self.marker = None
                return code
            self.pos += 1
        raise EOFError("no marker found")


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical T.81 C.2 assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — the decoder-side view of the same canon."""
    return {(ln, code): sym for sym, (code, ln) in build_huffman_codes(bits, vals).items()}


def _decode_symbol(reader: BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits back to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# --------------------------------------------------------------------------
# Color transforms (JFIF full-range BT.601)
# --------------------------------------------------------------------------


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % mult, -w % mult
    if ph or pw:  # edge-replicate so padded blocks compress to ~nothing
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(
    writer: BitWriter,
    block: np.ndarray,
    qtable: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    dc_pred: int,
) -> int:
    coef = _fdct(block.astype(np.float64) - 128.0)
    q = np.round(coef.flatten() / qtable.reshape(64)).astype(np.int64)[ZIGZAG]
    # DC: difference, category + magnitude bits
    diff = int(q[0]) - dc_pred
    s = _category(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    # AC: run/size with ZRL and EOB
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return int(q[0])


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG encode of a uint8 (h, w) grayscale or
    (h, w, 3) RGB array. ``subsample`` is '4:4:4' or '4:2:0' (color only);
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker (with
    DC-predictor reset) every that-many MCUs — at 100 TB restart markers
    are what make a single large scan splittable/recoverable."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = quality_scale(QTABLE_LUMA, quality)
    qc = quality_scale(QTABLE_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(img)
        if subsample == "4:2:0":
            # pad to the 16x16 luma MCU grid, then 2x2-mean downsample chroma
            ypad = _pad_to(ycc[..., 0], 16)
            cbf = _pad_to(ycc[..., 1], 16)
            crf = _pad_to(ycc[..., 2], 16)
            cb = cbf.reshape(cbf.shape[0] // 2, 2, cbf.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crf.reshape(crf.shape[0] // 2, 2, crf.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [ypad, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "4:4:4":
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsample!r}")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = [_pad_to(p, 8 * (hi if not gray else 1)) for p, (hi, vi) in zip(planes, samp)]
    # MCU grid in units of the largest sampling factor
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # make sure every plane covers the full MCU grid
    planes = [
        p
        if p.shape == (mcus_y * 8 * vi, mcus_x * 8 * hi)
        else np.pad(
            p,
            ((0, mcus_y * 8 * vi - p.shape[0]), (0, mcus_x * 8 * hi - p.shape[1])),
            mode="edge",
        )
        for p, (hi, vi) in zip(planes, samp)
    ]

    dc_y = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = BitWriter()
    preds = [0] * len(planes)
    mcu_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.emit_marker(0xD0 + ((mcu_idx // restart_interval - 1) % 8))
                preds = [0] * len(planes)
            mcu_idx += 1
            for ci, (plane, (hi, vi)) in enumerate(zip(planes, samp)):
                qt = qy if ci == 0 else qc
                dct_t, act_t = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        block = plane[r0 : r0 + 8, c0 : c0 + 8]
                        preds[ci] = _encode_block(writer, block, qt, dct_t, act_t, preds[ci])
    entropy = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, tbl in ((0, qy), (1, qc)) if not gray else ((0, qy),):
        body = bytes([tq]) + bytes(int(x) for x in tbl[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def _decode_block(
    reader: BitReader,
    dc_table: dict[tuple[int, int], int],
    ac_table: dict[tuple[int, int], int],
    qtable: np.ndarray,
    dc_pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    s = _decode_symbol(reader, dc_table)
    diff = _extend(reader.read_bits(s), s) if s else 0
    dc = dc_pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_symbol(reader, ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    coef = (zz * qtable.reshape(64)[ZIGZAG]).astype(np.float64)[UNZIGZAG].reshape(8, 8)
    return _idct(coef) + 128.0, dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG. Returns uint8 (h, w) for
    grayscale streams, (h, w, 3) RGB otherwise. All tables (DQT/DHT) are
    read from the stream; restart intervals are honored."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = -1
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while payload[pos + 1] == 0xFF:  # legal fill bytes before a marker
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone markers carry no length field
        length = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT — may hold several tables
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                qtables[tq] = tbl[UNZIGZAG]  # store natural order
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if h * w > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"declared {w}x{h} exceeds decode cap "
                    f"({MAX_DECODE_PIXELS} px) — refusing bomb-sized allocation"
                )
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF marker 0xff{marker:02x} (baseline only)")
        elif marker == 0xC4:  # DHT — may hold several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = build_huffman_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for si in range(ns):
                cid, tables = seg[1 + 2 * si], seg[2 + 2 * si]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tables >> 4, tables & 0x0F
            scan_pos = pos + length
            break
        pos += length
    if scan_pos < 0 or not comps:
        raise ValueError("no scan data found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64) for c in comps
    ]
    reader = BitReader(payload, scan_pos)
    preds = [0] * len(comps)
    mcu_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                code = reader.align_to_marker()
                if not (0xD0 <= code <= 0xD7):
                    raise ValueError(f"expected RSTn, got 0xff{code:02x}")
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block, preds[ci] = _decode_block(
                            reader,
                            htables[(0, c["td"])],
                            htables[(1, c["ta"])],
                            qtables[c["tq"]],
                            preds[ci],
                        )
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
            mcu_idx += 1

    if len(comps) == 1:
        return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
    full = []
    for c, p in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:  # chroma upsample by replication
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[: mcus_y * 8 * vmax, : mcus_x * 8 * hmax])
    ycc = np.stack(full, axis=-1)[:h, :w, :]
    return ycbcr_to_rgb(ycc)


# --------------------------------------------------------------------------
# PNG (lossless; RFC 2083 / ISO 15948 — stdlib zlib does the DEFLATE part)
# --------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Lossless PNG encode of uint8 (h, w) grayscale, (h, w, 3) RGB, or
    (h, w, 4) RGBA. Per scanline, picks the filter (None/Sub/Up) with the
    smallest absolute residual sum — the standard libpng heuristic — so
    smooth content DEFLATEs well; the decoder handles all 5 types."""
    img = np.asarray(img, dtype=np.uint8)
    import zlib

    if img.ndim == 2:
        color_type, nch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, nch = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, nch = 6, 4
        flat = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = flat.reshape(h, w * nch).astype(np.int16)
    left = np.zeros_like(rows)
    left[:, nch:] = rows[:, :-nch]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    candidates = (rows, rows - left, rows - up)  # filter types 0, 1, 2
    raw = bytearray()
    for y in range(h):
        resid = [(c[y] % 256).astype(np.uint8) for c in candidates]
        # minimum sum of |signed residual| — libpng's MSAD heuristic
        costs = [
            int(np.minimum(r.astype(np.int16), 256 - r.astype(np.int16)).sum())
            for r in resid
        ]
        ftype = int(np.argmin(costs))
        raw += bytes([ftype]) + resid[ftype].tobytes()
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over one scanline (int16 math)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (grayscale / RGB / RGBA).
    Verifies chunk CRCs, concatenates IDATs, inflates, and reverses all
    five scanline filters (None/Sub/Up/Average/Paeth)."""
    import zlib

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = nch = -1
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if interlace != 0:
                raise ValueError("Adam7 interlacing not supported")
            nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type, -1)
            if nch < 0:
                raise ValueError(f"unsupported color type {color_type}")
            if w * h > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"declared {w}x{h} exceeds decode cap "
                    f"({MAX_DECODE_PIXELS} px) — refusing bomb-sized allocation"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w < 0 or not idat:
        raise ValueError("missing IHDR or IDAT")
    stride = w * nch
    expected = h * (stride + 1)
    # Bounded inflate: decompress at most expected+1 bytes so a zlib bomb
    # (kilobytes of IDAT inflating to gigabytes) is detected at the cap,
    # never materialized. unused_data/unconsumed_tail non-empty, a
    # too-long/short result, or a stream that never reached its terminator
    # (eof False — e.g. the adler32 trailer truncated away) all mean the
    # stream disagrees with IHDR or is incomplete.
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if (
        len(raw) != expected
        or dec.unconsumed_tail
        or dec.unused_data  # trailing garbage after a complete zlib stream
        or dec.decompress(b"", 1)
        or not dec.eof  # truncated stream: adler32 trailer missing
    ):
        raise ValueError("inflated size does not match dimensions")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, line = int(lines[y, 0]), lines[y, 1:].copy()
        prev = out[y - 1] if y else zero
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = out[y]
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                up = prev[x]
                ul = prev[x - nch] if x >= nch else 0
                if ftype == 1:
                    cur[x] = (int(line[x]) + int(left)) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(line[x]) + (int(left) + int(up)) // 2) & 0xFF
                else:
                    cur[x] = (
                        int(line[x])
                        + int(_paeth(np.uint8(left), np.uint8(up), np.uint8(ul)))
                    ) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
    arr = out.reshape(h, w, nch)
    return arr[:, :, 0] if nch == 1 else arr


# --------------------------------------------------------------------------
# IMA / DVI ADPCM (4 bits per sample, step-size-adaptive DPCM)
# --------------------------------------------------------------------------

ADPCM_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
ADPCM_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _adpcm_step(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """Shared decoder-side state update (also used by the encoder, which
    must track the decoder's reconstruction to stay in sync)."""
    step = int(ADPCM_STEP_TABLE[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(ADPCM_INDEX_TABLE[nibble & 7])))
    return predictor, index


def adpcm_encode(samples: np.ndarray) -> bytes:
    """Encode int16 PCM to IMA ADPCM. Layout: 4-byte header
    (<h seed-sample, <B start-index=0, <B pad-flag) + one 4-bit nibble per
    remaining sample, low nibble first. Sample 0 is stored verbatim as the
    predictor seed (the standard IMA block-header convention); samples
    1..n-1 are step-quantized deltas. The encoder tracks the DECODER's
    reconstruction (not the raw signal) so quantization error never
    accumulates beyond one step."""
    s = np.asarray(samples, dtype=np.int64)
    if len(s) == 0:
        # pad-flag 2 marks an EMPTY stream: a bare (0,0,0) header is
        # indistinguishable from a single zero sample (the seed is
        # emitted unconditionally on decode)
        return struct.pack("<hBB", 0, 0, 2)
    predictor = int(s[0])
    index = 0
    nibbles = bytearray()
    cur = 0
    half = False
    for x in s[1:]:
        step = int(ADPCM_STEP_TABLE[index])
        diff = int(x) - predictor
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        predictor, index = _adpcm_step(nib, predictor, index)
        if half:
            nibbles.append(cur | (nib << 4))
            half = False
        else:
            cur = nib
            half = True
    pad = 0
    if half:
        nibbles.append(cur)
        pad = 1
    return struct.pack("<hBB", int(s[0]), 0, pad) + bytes(nibbles)


def adpcm_decode(payload: bytes) -> np.ndarray:
    """Decode IMA ADPCM produced by :func:`adpcm_encode` back to int16:
    emit the seed sample, then one reconstructed sample per nibble."""
    seed, index, pad = struct.unpack_from("<hBB", payload, 0)
    if pad == 2:  # empty-stream marker (see adpcm_encode)
        return np.asarray([], dtype=np.int16)
    predictor = int(seed)
    out = [predictor]
    for b in payload[4:]:
        for nib in (b & 0x0F, b >> 4):
            predictor, index = _adpcm_step(nib, predictor, index)
            out.append(predictor)
    if pad and len(out) > 1:
        out = out[:-1]  # the final high nibble was padding, not a sample
    return np.asarray(out, dtype=np.int16)
