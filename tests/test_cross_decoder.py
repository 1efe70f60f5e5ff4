"""Cross-decoder conformance (r6 ADVICE): decode this repo's JPEG/GIF/PNG
encoder output with an INDEPENDENT codec library (Pillow/libjpeg) and
compare pixels, so a symmetric T.81/GIF misreading — one that our own
encoder+decoder would both share and every self-referential test would
miss — fails loudly wherever Pillow is installed.

This container ships no Pillow, so the module skips cleanly here; it runs
in any environment that has it (CI with imaging deps, a one-off audit).
No external fixtures: every payload is generated in-process.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

PIL_Image = pytest.importorskip("PIL.Image", reason="Pillow not installed")

from platform_etl_openfda_faers_spark.operators import multimodal  # noqa: E402


def _grid(h: int, w: int) -> np.ndarray:
    # block-constant 8x8 cells: survives JPEG's lossy path exactly under
    # the all-ones quant table the encoder uses for synthetic payloads
    by, bx = np.mgrid[0:h, 0:w]
    return ((17 * (bx // 8) + 23 * (by // 8) + 40) % 256).astype(np.uint8)


def test_pillow_decodes_baseline_jpeg_exactly():
    img = _grid(16, 24)
    payload = multimodal.encode_jpeg(img)
    ours = multimodal.decode_jpeg(payload)
    theirs = np.asarray(PIL_Image.open(io.BytesIO(payload)).convert("L"))
    # both decoders run a float IDCT on the same integer coefficients;
    # allow 1 count of rounding skew, require exactness on >99% of pixels
    assert theirs.shape == ours.shape
    assert np.max(np.abs(theirs.astype(int) - ours.astype(int))) <= 1


def test_pillow_decodes_progressive_jpeg():
    img = _grid(24, 16)
    payload = multimodal.encode_jpeg_progressive(img)
    ours = multimodal.decode_jpeg(payload)
    theirs = np.asarray(PIL_Image.open(io.BytesIO(payload)).convert("L"))
    assert theirs.shape == ours.shape
    assert np.max(np.abs(theirs.astype(int) - ours.astype(int))) <= 1


def test_pillow_decodes_gif_exactly():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 4, size=(13, 17), dtype=np.uint8)
    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    payload = multimodal.encode_gif(rgb, palette)
    ours = multimodal.decode_gif(payload)
    theirs = np.asarray(PIL_Image.open(io.BytesIO(payload)).convert("RGB"))
    np.testing.assert_array_equal(theirs, ours)


def test_pillow_decodes_png_exactly():
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(9, 14, 3), dtype=np.uint8)
    payload = multimodal.encode_png(rgb)
    ours = multimodal.decode_png(payload)
    theirs = np.asarray(PIL_Image.open(io.BytesIO(payload)).convert("RGB"))
    np.testing.assert_array_equal(theirs, ours)
