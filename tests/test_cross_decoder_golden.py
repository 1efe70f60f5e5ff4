"""Cross-decoder conformance on COMMITTED fixtures (r7 VERDICT #2).

`tests/test_cross_decoder.py` needs Pillow and has skipped in every
environment the round evidence is produced in.  These tests close that
hole with fixtures generated once by `tools/gen_cross_decoder_golden.py`
from javax.imageio — the JDK's independent codec stack (libjpeg-backed
JPEG; pure-Java PNG/GIF/BMP) — and committed under `tests/golden/`:

* direction A: payloads produced by OUR encoders, pixel references from
  ImageIO's decode.  The test (1) decodes the committed payload with OUR
  decoder and compares against the committed independent-decoder pixels,
  and (2) re-encodes the committed source with our deterministic encoder
  and asserts byte-identity with the committed payload — so a symmetric
  encoder+decoder misreading of T.81/GIF/PNG that self-referential
  round-trips would share fails here.
* direction B: payloads produced by ImageIO's ENCODERS (real libjpeg
  quantization tables, its own PNG filter choices, its own GIF palette)
  with ImageIO's own decode as the reference — our decoders must agree.

JPEG tolerance is ±1 (±2 where a color convert stacks on the IDCT): both
decoders run a float IDCT on identical integer coefficients, differing
only in final rounding.  Lossless formats compare exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from platform_etl_openfda_faers_spark.operators import multimodal as mm

GOLDEN = Path(__file__).parent / "golden"
_NPZ = np.load(GOLDEN / "cross_decoder.npz")
_MANIFEST = json.loads(
    (GOLDEN / "cross_decoder_manifest.json").read_text()
)["cases"]

_DECODERS = {
    "jpeg": mm.decode_jpeg,
    "png": mm.decode_png,
    "gif": mm.decode_gif,
    "bmp": mm.decode_bmp,
}


def _case(name):
    meta = _MANIFEST[name]
    return (
        _NPZ[f"{name}__src"],
        _NPZ[f"{name}__payload"].tobytes(),
        _NPZ[f"{name}__ref"],
        meta,
    )


@pytest.mark.parametrize("name", sorted(_MANIFEST))
def test_our_decoder_matches_independent_reference(name):
    """OUR decoder vs the committed independent-reference pixels/samples
    (javax.imageio for images, javax.sound for WAV)."""
    _, payload, ref, meta = _case(name)
    if meta["format"] == "wav":
        samples, channels, rate = mm.decode_wav(payload)
        assert (channels, rate) == (meta["channels"], meta["rate"])
        np.testing.assert_array_equal(samples, ref)
        return
    ours = _DECODERS[meta["format"]](payload)
    assert ours.shape == ref.shape, f"{name}: shape {ours.shape} != {ref.shape}"
    delta = np.max(np.abs(ours.astype(int) - ref.astype(int)))
    assert delta <= meta["tolerance"], (
        f"{name}: max pixel delta {delta} > tol {meta['tolerance']}"
    )
    if meta["tolerance"] == 0:
        np.testing.assert_array_equal(ours, ref)


# direction-A re-encode calls: must mirror tools/gen_cross_decoder_golden.py
def _q16():
    q = np.ones((8, 8), dtype=np.int32)
    q[0, 0] = 256
    return q


def _gif_reencode(src):
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    # recover indices from the committed RGB (palette rows are distinct)
    idx = np.argmax(
        (src[:, :, None, :] == pal[None, None, :, :]).all(-1), axis=-1
    ).astype(np.uint8)
    return mm.encode_gif(idx, pal)


_REENCODE = {
    "a_jpeg_gray_base": mm.encode_jpeg,
    "a_jpeg_gray_prog": mm.encode_jpeg_progressive,
    "a_jpeg_gray_restart": lambda s: mm.encode_jpeg(s, restart_interval=2),
    "a_jpeg_gray_16bitdqt": lambda s: mm.encode_jpeg(s, qtable=_q16()),
    "a_jpeg_rgb_444": mm.encode_jpeg,
    "a_jpeg_rgb_420": lambda s: mm.encode_jpeg(s, subsampling="420"),
    "a_gif_palette": _gif_reencode,
    "a_png_rgb": mm.encode_png,
    "a_png_gray": mm.encode_png,
    "a_png_filters": lambda s: mm.encode_png(s, filters=[0, 1, 2, 3, 4]),
    "a_bmp_rgb": mm.encode_bmp,
    "a_png_adam7": lambda s: mm.encode_png(
        s, filters=[0, 1, 2, 3, 4], interlace=True
    ),
    "a_wav_pcm16": lambda s: mm.encode_wav(s, channels=2, rate=16000),
}


@pytest.mark.parametrize("name", sorted(_REENCODE))
def test_our_encoder_is_byte_stable_on_verified_streams(name):
    """Re-encoding the committed source must reproduce the committed
    payload byte-for-byte — the committed payload is the stream the
    independent decoder verified, so byte-identity pins the encoder to
    an externally-validated interpretation of the format."""
    src, payload, _, _ = _case(name)
    assert _REENCODE[name](src) == payload


def test_manifest_covers_every_fixture_array():
    """No orphan fixtures: every npz array belongs to a manifest case
    and every case has src/payload/ref; direction A cases all have a
    re-encode entry."""
    suffixes = {"src", "payload", "ref"}
    for key in _NPZ.files:
        base, _, suffix = key.rpartition("__")
        assert base in _MANIFEST and suffix in suffixes, key
    for name, meta in _MANIFEST.items():
        for s in suffixes:
            assert f"{name}__{s}" in _NPZ.files, (name, s)
        if meta["direction"] == "A":
            assert name in _REENCODE, name


def test_independent_reference_agrees_with_source_on_lossless():
    """Sanity on the fixtures themselves: for lossless formats the
    committed ImageIO reference must equal the committed source."""
    for name, meta in _MANIFEST.items():
        if meta["tolerance"] == 0 and meta["direction"] == "A":
            src, _, ref, _ = _case(name)
            np.testing.assert_array_equal(ref, src, err_msg=name)
