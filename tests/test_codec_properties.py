"""Hypothesis property tests for the pure-numpy media codecs — the
generative complement to the pinned/golden cases in test_codecs.py.
No SparkSession needed: these run in milliseconds per example.

Properties:
- PNG is LOSSLESS for every shape × color-type × content (the spec's
  contract, asserted on arbitrary random images, including 1×1 and
  single-row/column shapes that stress the filter predictors);
- JPEG preserves shape/dtype and stays within a coarse error envelope on
  arbitrary noise at every shape (sub-MCU sizes, odd dims, both
  subsamplings — the class of bugs where padding/MCU bookkeeping breaks);
- ADPCM preserves length, stores sample 0 verbatim, is deterministic,
  and tracks slew-limited signals within a small absolute error.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from rws_data_ingester_spark.operators.codecs import (
    adpcm_decode,
    adpcm_encode,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    nch=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_is_exact_for_any_image(h, w, nch, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if nch == 1 else (h, w, nch)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    if nch == 1:
        out = out[:, :, 0] if out.ndim == 3 else out
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    gray=st.booleans(),
    subsample=st.sampled_from(["4:4:4", "4:2:0"]),
    quality=st.sampled_from([50, 85]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_shape_and_error_envelope(h, w, gray, subsample, quality, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    if gray:
        assert out.shape[:2] == (h, w)
        out2 = out[:, :, 0] if out.ndim == 3 else out
        err = np.abs(out2.astype(int) - img.astype(int))
    else:
        assert out.shape == (h, w, 3)
        err = np.abs(out.astype(int) - img.astype(int))
    assert out.dtype == np.uint8
    # coarse envelope: lossy, but any padding/MCU/marker bug produces
    # garbage far beyond this bound on random noise
    assert err.mean() <= 64.0


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_adpcm_length_seed_and_determinism(n, seed):
    rng = np.random.RandomState(seed)
    sig = rng.randint(-32768, 32768, size=n).astype(np.int16)
    payload = adpcm_encode(sig)
    out = adpcm_decode(payload)
    assert len(out) == n
    assert out.dtype == np.int16
    if n:
        assert out[0] == sig[0]  # verbatim predictor seed
    assert adpcm_encode(sig) == payload  # deterministic


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=400),
    step=st.integers(min_value=-80, max_value=80),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_adpcm_tracks_slew_limited_signals(n, step, seed):
    rng = np.random.RandomState(seed)
    deltas = rng.randint(-abs(step) - 1, abs(step) + 2, size=n)
    sig = np.clip(np.cumsum(deltas) + int(rng.randint(-5000, 5000)), -32768, 32767).astype(
        np.int16
    )
    out = adpcm_decode(adpcm_encode(sig))
    # step-quantized deltas: error stays within a handful of quantizer
    # steps for slew-limited input (it may lag briefly after direction
    # flips, never unboundedly)
    assert np.abs(out.astype(int) - sig.astype(int)).max() <= 2048
