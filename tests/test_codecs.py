"""Tests for the pure-numpy compressed codecs (operators/codecs.py).

The critical test is `test_decoder_pinned_to_hand_assembled_jpeg`: it
decodes a JPEG assembled BYTE BY BYTE in this file — custom minimal
Huffman tables, all-ones quant table, hand-computed bitstream — against a
closed-form expected image derived from the T.81 IDCT definition. That
pins the decoder to the spec independently of both the encoder and the
Annex K table transcriptions, so a mirrored encoder/decoder bug cannot
cancel out.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rws_data_ingester_spark.operators import codecs, multimodal
from rws_data_ingester_spark.operators.codecs import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    BitReader,
    BitWriter,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QTABLE_LUMA,
    UNZIGZAG,
    ZIGZAG,
    adpcm_decode,
    adpcm_encode,
    build_huffman_codes,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
    quality_scale,
)

SF_DIR = "/root/testdata/sf0.001"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(255.0**2 / mse))


def gradient_rgb(h: int, w: int) -> np.ndarray:
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return (
        (100.0 + 70.0 * np.sin(x / 6.0 + c) + 50.0 * np.cos(y / 4.0))
        .clip(0, 255)
        .astype(np.uint8)
    )


# --------------------------------------------------------------------------
# Structural invariants
# --------------------------------------------------------------------------


def test_zigzag_is_a_permutation_and_unzigzag_inverts_it():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    v = np.arange(64)
    assert np.array_equal(v[ZIGZAG][UNZIGZAG], v)


def test_quality_scale_identity_at_50_and_monotone():
    assert np.array_equal(quality_scale(QTABLE_LUMA, 50), QTABLE_LUMA)
    q90, q10 = quality_scale(QTABLE_LUMA, 90), quality_scale(QTABLE_LUMA, 10)
    assert (q90 <= QTABLE_LUMA).all() and (q10 >= QTABLE_LUMA).all()
    assert q90.min() >= 1 and q10.max() <= 255


def test_annex_k_huffman_tables_are_prefix_free():
    for bits, vals in (
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
    ):
        codes = build_huffman_codes(bits, vals)
        assert len(codes) == len(vals)
        as_strings = [format(c, f"0{ln}b") for c, ln in codes.values()]
        for i, a in enumerate(as_strings):
            for j, b in enumerate(as_strings):
                if i != j:
                    assert not b.startswith(a), f"{a} is a prefix of {b}"


def test_bit_writer_stuffs_ff_and_reader_unstuffs_it():
    w = BitWriter()
    w.write(0xFF, 8)
    w.write(0xA5, 8)
    data = w.flush()
    assert data == b"\xff\x00\xa5"  # stuffed zero byte after 0xFF
    r = BitReader(data)
    assert r.read_bits(8) == 0xFF and r.read_bits(8) == 0xA5


# --------------------------------------------------------------------------
# Decoder pinned to a hand-assembled stream (independent of the encoder)
# --------------------------------------------------------------------------


def test_decoder_pinned_to_hand_assembled_jpeg():
    """8x8 grayscale, all-ones quant table, minimal custom Huffman tables
    (DC: single symbol 5 = code '0'; AC: single symbol 0x00/EOB = '0').
    Bitstream by hand: DC code '0', magnitude 24 = '11000', EOB '0'
    → 0b0110_0001 = 0x61. A DC-only block with coefficient 24 and Q=1
    decodes (orthonormal IDCT) to 24/8 + 128 = 131 everywhere."""
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes([1] * 64)
    sof = b"\xff\xc0" + struct.pack(">H", 2 + 9) + struct.pack(">BHHB", 8, 8, 8, 1) + bytes(
        [1, 0x11, 0]
    )
    dht_dc = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1) + b"\x00" + bytes(
        [1] + [0] * 15
    ) + bytes([5])
    dht_ac = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1) + b"\x10" + bytes(
        [1] + [0] * 15
    ) + bytes([0x00])
    sos = b"\xff\xda" + struct.pack(">H", 2 + 6) + bytes([1, 1, 0x00, 0, 63, 0])
    payload = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes([0x61]) + b"\xff\xd9"
    img = decode_jpeg(payload)
    assert img.shape == (8, 8)
    assert np.array_equal(img, np.full((8, 8), 131, np.uint8))


def test_decoder_skips_app_com_segments_and_fill_bytes():
    """Real-world JPEGs carry APPn/COM metadata segments and may pad with
    0xFF fill bytes before markers; the decoder must skip both."""
    img = gradient_rgb(16, 24)
    payload = encode_jpeg(img, quality=90, subsample="4:4:4")
    assert payload[:2] == b"\xff\xd8"
    jfif = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hello"
    fill = b"\xff"  # fill byte directly before the next marker's 0xFF
    decorated = payload[:2] + jfif + com + fill + payload[2:]
    assert np.array_equal(decode_jpeg(decorated), decode_jpeg(payload))


def test_decoder_rejects_progressive_sof():
    bad = b"\xff\xd8\xff\xc2" + struct.pack(">H", 2 + 9) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bad)


# --------------------------------------------------------------------------
# Encode→decode round trips
# --------------------------------------------------------------------------


def test_constant_image_roundtrips_exactly():
    for val in (0, 77, 130, 255):
        img = np.full((16, 16), val, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=90)), img)


def test_color_roundtrip_psnr_and_dims_both_subsamplings():
    img = gradient_rgb(23, 37)  # deliberately not a multiple of 8 or 16
    for sub, floor in (("4:4:4", 35.0), ("4:2:0", 33.0)):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert dec.shape == img.shape
        assert psnr(img, dec) > floor, (sub, psnr(img, dec))


def test_tiny_images_smaller_than_one_mcu():
    for shape in ((3, 5, 3), (1, 1, 3), (7, 2)):
        img = gradient_rgb(shape[0], shape[1]) if len(shape) == 3 else (
            np.arange(shape[0] * shape[1]).reshape(shape) * 9 % 256
        ).astype(np.uint8)
        for sub in ("4:4:4", "4:2:0") if len(shape) == 3 else ("4:4:4",):
            kw = {"subsample": sub} if len(shape) == 3 else {}
            dec = decode_jpeg(encode_jpeg(img, quality=95, **kw))
            assert dec.shape == img.shape
            assert psnr(img, dec) > 25.0


def test_grayscale_roundtrip():
    g = ((np.arange(24)[:, None] * 3 + np.arange(40)[None, :]) % 200).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == g.shape and psnr(g, dec) > 35.0


def test_restart_markers_decode_bit_identically():
    img = gradient_rgb(50, 70)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample="4:2:0"))
    for ri in (1, 3):
        withrst = decode_jpeg(
            encode_jpeg(img, quality=85, subsample="4:2:0", restart_interval=ri)
        )
        assert np.array_equal(withrst, base)


def test_jpeg_actually_compresses_smooth_content():
    img = gradient_rgb(64, 64)
    payload = encode_jpeg(img, quality=85, subsample="4:2:0")
    assert len(payload) < img.size // 4  # >4:1 on smooth gradients


def test_quality_trades_size_for_fidelity():
    img = gradient_rgb(48, 48)
    lo, hi = encode_jpeg(img, quality=30), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert psnr(img, decode_jpeg(lo)) < psnr(img, decode_jpeg(hi))


# --------------------------------------------------------------------------
# PNG (lossless → exact equality everywhere)
# --------------------------------------------------------------------------


def test_png_roundtrip_is_exact_for_all_color_types():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (19, 31), dtype=np.uint8)
    rgb = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (9, 40, 4), dtype=np.uint8)
    for img in (gray, rgb, rgba):
        dec = decode_png(encode_png(img))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.array_equal(dec, img)  # lossless: bit-exact


def test_png_compresses_smooth_content():
    img = gradient_rgb(64, 64)
    assert len(encode_png(img)) < img.size // 2


def test_png_decoder_handles_all_five_filters():
    """Build IDAT scanlines by hand with every filter type (applying the
    RFC 2083 forward filters to known pixels), so the unfilter logic is
    pinned independently of encode_png (which only emits filter 0)."""
    import zlib

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    h, w, nch = img.shape
    flat = img.reshape(h, w * nch).astype(np.int16)
    lines = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros_like(cur)
        left = np.concatenate([np.zeros(nch, np.int16), cur[:-nch]])
        upleft = np.concatenate([np.zeros(nch, np.int16), prev[:-nch]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_png_rejects_corrupt_crc():
    payload = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    payload[20] ^= 0xFF  # flip a bit inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


# --------------------------------------------------------------------------
# ADPCM
# --------------------------------------------------------------------------


def test_adpcm_sine_snr_ratio_and_length():
    t = np.arange(2048) / 8000.0
    s = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    payload = adpcm_encode(s)
    dec = adpcm_decode(payload)
    assert len(dec) == len(s)
    err = s.astype(np.float64) - dec.astype(np.float64)
    snr = 10 * np.log10((s.astype(np.float64) ** 2).sum() / (err**2).sum())
    assert snr > 18.0, snr
    assert len(s) * 2 / len(payload) > 3.5  # ~4:1 vs PCM16


def test_adpcm_tracks_a_slow_ramp_closely():
    s = np.linspace(-1000, 1000, 500).astype(np.int16)
    dec = adpcm_decode(adpcm_encode(s))
    # after the adaptive step settles, per-sample error stays within a few steps
    assert np.abs(s[10:].astype(int) - dec[10:].astype(int)).max() <= 64


def test_adpcm_odd_length_and_edge_cases():
    s = (np.sin(np.arange(1023) / 5.0) * 3000).astype(np.int16)
    assert len(adpcm_decode(adpcm_encode(s))) == 1023
    one = np.array([123], dtype=np.int16)
    assert adpcm_decode(adpcm_encode(one)).tolist() == [123]  # seed is verbatim
    assert len(adpcm_decode(adpcm_encode(np.array([], dtype=np.int16)))) == 0


# --------------------------------------------------------------------------
# Dispatch + the registered Spark queries
# --------------------------------------------------------------------------


def test_decode_image_dispatch_jpeg_ppm_and_unknown():
    img = gradient_rgb(16, 16)
    assert multimodal.decode_image(encode_jpeg(img, quality=90)).shape == img.shape
    ppm = multimodal.make_ppm(3)
    assert multimodal.decode_image(ppm).shape == (multimodal.IMG_H, multimodal.IMG_W, 3)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"GIF89a....")


def test_decode_audio_dispatch_wav_adpcm_and_unknown():
    rate, s = multimodal.decode_wav(multimodal.make_wav(5))
    payload = b"IMA1" + struct.pack("<I", rate) + adpcm_encode(s)
    rate2, dec = multimodal.decode_audio(payload)
    assert rate2 == rate and len(dec) == len(s)
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3\x04mp3 frames here")


def test_jpeg_decode_query_pins(spark):
    rows = {r["doc_id"]: r for r in multimodal.multimodal_jpeg_decode(spark, SF_DIR).collect()}
    assert len(rows) == 100
    for r in rows.values():
        assert (r["width"], r["height"]) == (multimodal.JPEG_W, multimodal.JPEG_H)
        assert r["psnr_db"] > 30.0  # smooth synthetic content at q85
        assert r["jpeg_bytes"] < r["raw_bytes"]  # it really compressed
        assert 0.0 <= r["mean_r"] <= 255.0


def test_adpcm_query_pins(spark):
    rows = multimodal.multimodal_adpcm_roundtrip(spark, SF_DIR).collect()
    assert len(rows) == 100
    for r in rows:
        assert r["n_samples"] == multimodal.WAV_N
        assert r["sample_rate"] == multimodal.WAV_RATE
        assert r["snr_db"] > 15.0
        assert r["pcm_bytes"] / r["adpcm_bytes"] > 3.5
        # sine at 0.5 FSD → RMS ≈ 0.5/sqrt(2); ADPCM noise is small
        assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 0.02


# --------------------------------------------------------------------------
# Decompression-bomb guards: corrupt/adversarial headers must degrade to a
# prompt ValueError (quarantinable), never a multi-GB allocation that
# OOM-kills the executor outside any except-clause's reach.
# --------------------------------------------------------------------------
def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct as _s
    import zlib as _z

    return (
        _s.pack(">I", len(body))
        + tag
        + body
        + _s.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def _bomb_png(w: int, h: int, idat_raw: bytes) -> bytes:
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(idat_raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_rejects_trailing_garbage_after_complete_stream():
    """A crafted IDAT whose zlib stream inflates to EXACTLY the expected
    size, followed by trailing garbage bytes: the garbage lands in
    ``dec.unused_data`` (not unconsumed_tail), which the validator must
    reject — the stream disagrees with what IHDR promised."""
    import zlib as _z

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    idat = _z.compress(raw) + b"GARBAGE-AFTER-STREAM"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="does not match"):
        codecs.decode_png(payload)
    # the same stream WITHOUT the garbage decodes fine (guard is precise)
    clean = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(clean), img)


def test_png_rejects_truncated_zlib_stream_missing_adler32():
    """A zlib stream cut off right before its 4-byte adler32 trailer
    still inflates to exactly the expected size with empty
    unconsumed_tail/unused_data — only ``dec.eof`` exposes that the
    stream never reached its terminator and the mandatory integrity
    checksum was never verified. The validator must reject it."""
    import zlib as _z

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    idat = _z.compress(raw)[:-4]  # strip the adler32 trailer
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="does not match"):
        codecs.decode_png(payload)


def test_png_rejects_bomb_dimensions_promptly():
    import time

    payload = _bomb_png(50_000, 50_000, b"\x00" * 100)  # claims 7.5 GB
    t0 = time.time()
    with pytest.raises(ValueError, match="decode cap"):
        codecs.decode_png(payload)
    assert time.time() - t0 < 1.0


def test_png_zlib_bomb_is_length_bounded():
    import time

    # header says 4x4 RGB (expected inflate 52 bytes) but the IDAT
    # inflates to 64 MB — the bounded decompress must stop at the cap,
    # not materialize the bomb.
    payload = _bomb_png(4, 4, b"\x00" * (64 * 1024 * 1024))
    t0 = time.time()
    with pytest.raises(ValueError, match="does not match"):
        codecs.decode_png(payload)
    assert time.time() - t0 < 2.0


def test_jpeg_rejects_bomb_dimensions_promptly():
    import time

    good = codecs.encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    # corrupt the SOF0 dims in place: find the C0 marker, patch h and w
    i = good.find(b"\xff\xc0")
    assert i > 0
    bad = bytearray(good)
    bad[i + 5 : i + 9] = (60_000).to_bytes(2, "big") + (60_000).to_bytes(2, "big")
    t0 = time.time()
    with pytest.raises(ValueError, match="decode cap"):
        codecs.decode_jpeg(bytes(bad))
    assert time.time() - t0 < 1.0


def test_quarantined_metadata_extracts_good_rows_and_isolates_bombs(spark):
    """End-to-end PERMISSIVE media decode: one good PPM, one bomb PNG, one
    zlib bomb, one corrupt JPEG, garbage bytes — good rows decode, bad
    rows land in decode_error, the task never dies."""
    from pyspark.sql import functions as F

    ppm = b"P6\n4 3\n255\n" + bytes(range(36))
    rows = [
        (0, bytearray(ppm)),
        (1, bytearray(_bomb_png(50_000, 50_000, b"\x00" * 100))),
        (2, bytearray(_bomb_png(4, 4, b"\x00" * (8 * 1024 * 1024)))),
        (3, bytearray(b"\xff\xd8garbage-after-soi")),
        (4, bytearray(b"not an image at all")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in multimodal.extract_image_metadata_quarantined(df).collect()
    }
    assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (4, 3, 3)
    assert out[0]["decode_error"] is None
    for bad in (1, 2, 3, 4, 5):
        assert out[bad]["decode_error"] is not None
        assert out[bad]["width"] is None
    assert "decode cap" in out[1]["decode_error"]
