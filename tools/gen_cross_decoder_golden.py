#!/usr/bin/env python
"""Generate the committed cross-decoder conformance fixtures (round 8).

The r6/r7 cross-decoder module (tests/test_cross_decoder.py) compares our
JPEG/GIF/PNG codecs against Pillow — but this container ships no Pillow,
so it has skipped in every environment the round evidence comes from
(r7 VERDICT "What's missing" #1).  The JDK that PySpark already requires
ships an INDEPENDENT codec stack, javax.imageio (libjpeg-backed JPEG,
pure-Java PNG/GIF/BMP), so conformance can execute here:

  * this script runs ONCE per fixture refresh: it compiles
    tools/cross_decoder/ImageIOTool.java, generates deterministic test
    images, and produces two fixture directions —
      A. OUR encoder -> payload -> ImageIO decode  (committed reference)
      B. ImageIO encoder -> payload -> ImageIO decode (committed reference)
  * tests/test_cross_decoder_golden.py then runs OUR decoders over the
    committed payloads and compares against the committed
    independent-decoder pixels — no JVM, no Pillow, runs everywhere.
    For direction A it also re-encodes the committed source with our
    (deterministic) encoders and asserts byte-identity with the committed
    payload, so an encoder regression is caught even without ImageIO.

Output: tests/golden/cross_decoder.npz + cross_decoder_manifest.json.
Usage:  python tools/gen_cross_decoder_golden.py
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from platform_etl_openfda_faers_spark.operators import multimodal as mm  # noqa: E402

JAVA_SRC = REPO / "tools" / "cross_decoder" / "ImageIOTool.java"
GOLDEN = REPO / "tests" / "golden"


def _grid(h: int, w: int) -> np.ndarray:
    # block-constant 8x8 cells: survives JPEG's lossy path exactly under
    # the all-ones quant table (same generator as test_cross_decoder.py)
    by, bx = np.mgrid[0:h, 0:w]
    return ((17 * (bx // 8) + 23 * (by // 8) + 40) % 256).astype(np.uint8)


class ImageIO:
    """Drives the compiled ImageIOTool over temp files."""

    def __init__(self) -> None:
        self.build = Path(tempfile.mkdtemp(prefix="iio_build_"))
        subprocess.run(
            ["javac", "-d", str(self.build), str(JAVA_SRC)], check=True
        )

    def _run(self, *args: str) -> None:
        subprocess.run(
            ["java", "-Djava.awt.headless=true", "-cp", str(self.build),
             "ImageIOTool", *args],
            check=True,
        )

    def decode(self, payload: bytes) -> np.ndarray:
        with tempfile.TemporaryDirectory() as td:
            src, out = Path(td) / "in.bin", Path(td) / "out.rawi"
            src.write_bytes(payload)
            self._run("decode", str(src), str(out))
            raw = out.read_bytes()
        hdr, _, px = raw.partition(b"\n")
        tag, w, h, bands = hdr.split()
        assert tag == b"RAWI"
        w, h, bands = int(w), int(h), int(bands)
        arr = np.frombuffer(px, dtype=np.uint8, count=w * h * bands)
        return arr.reshape((h, w) if bands == 1 else (h, w, bands)).copy()

    def encode(self, fmt: str, img: np.ndarray) -> bytes:
        h, w = img.shape[:2]
        bands = 1 if img.ndim == 2 else img.shape[2]
        hdr = f"RAWI {w} {h} {bands}\n".encode()
        with tempfile.TemporaryDirectory() as td:
            src, out = Path(td) / "in.rawi", Path(td) / f"out.{fmt}"
            src.write_bytes(hdr + np.ascontiguousarray(img).tobytes())
            self._run("encode", fmt, str(src), str(out))
            return out.read_bytes()

    def encode_wav(self, samples: np.ndarray, rate: int, channels: int) -> bytes:
        frames = len(samples) // channels
        hdr = f"RAWS {rate} {channels} {frames}\n".encode()
        with tempfile.TemporaryDirectory() as td:
            src, out = Path(td) / "in.raws", Path(td) / "out.wav"
            src.write_bytes(hdr + samples.astype("<i2").tobytes())
            self._run("encode-wav", str(src), str(out))
            return out.read_bytes()

    def decode_wav(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        with tempfile.TemporaryDirectory() as td:
            src, out = Path(td) / "in.wav", Path(td) / "out.raws"
            src.write_bytes(payload)
            self._run("decode-wav", str(src), str(out))
            raw = out.read_bytes()
        hdr, _, pcm = raw.partition(b"\n")
        tag, rate, channels, frames = hdr.split()
        assert tag == b"RAWS"
        rate, channels, frames = int(rate), int(channels), int(frames)
        samples = np.frombuffer(pcm, dtype="<i2", count=frames * channels)
        return samples.astype(np.int16), channels, rate


def main() -> None:
    iio = ImageIO()
    arrays: dict[str, np.ndarray] = {}
    manifest: dict[str, dict] = {}

    def record(name, src, payload, direction, fmt, tol, note):
        ref = iio.decode(payload)
        arrays[f"{name}__src"] = src
        arrays[f"{name}__payload"] = np.frombuffer(payload, dtype=np.uint8)
        arrays[f"{name}__ref"] = ref
        manifest[name] = {
            "direction": direction,   # A: ours->imageio, B: imageio->ours
            "format": fmt,
            "tolerance": tol,
            "note": note,
        }
        diff = 0
        if ref.shape == src.shape:
            diff = int(np.max(np.abs(ref.astype(int) - src.astype(int))))
        print(f"  {name}: payload {len(payload)}B ref {ref.shape} "
              f"max|ref-src|={diff}")

    rng = np.random.default_rng(2024)

    # ---- direction A: OUR encoders, ImageIO as the reference decoder ----
    print("direction A (our encoder -> ImageIO reference decode):")
    record("a_jpeg_gray_base", _grid(16, 24), mm.encode_jpeg(_grid(16, 24)),
           "A", "jpeg", 1, "baseline gray, all-ones qtable")
    record("a_jpeg_gray_prog", _grid(24, 16),
           mm.encode_jpeg_progressive(_grid(24, 16)),
           "A", "jpeg", 1, "progressive gray (DC-first + AC band scans)")
    record("a_jpeg_gray_restart", _grid(16, 40),
           mm.encode_jpeg(_grid(16, 40), restart_interval=2),
           "A", "jpeg", 1, "DRI + RSTn markers every 2 MCUs")
    q16 = np.ones((8, 8), dtype=np.int32)
    q16[0, 0] = 256  # forces Pq=1 (16-bit) quant table entries
    img16 = (_grid(16, 24).astype(int) // 32 * 32).astype(np.uint8)
    record("a_jpeg_gray_16bitdqt", img16, mm.encode_jpeg(img16, qtable=q16),
           "A", "jpeg", 1, "Pq=1 16-bit DQT (DC quantizer 256)")
    # block-constant color, chroma-constant per 8x8 cell -> exact path
    cell_colors = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    rgb444 = np.kron(cell_colors.transpose(0, 1, 2).astype(np.uint8),
                     np.ones((8, 8, 1), dtype=np.uint8))
    record("a_jpeg_rgb_444", rgb444, mm.encode_jpeg(rgb444),
           "A", "jpeg", 2, "4:4:4 color, 8x8-block-constant RGB")
    # 4:2:0 with globally constant chroma (R=G=B): box vs fancy chroma
    # upsampling are identical on constant chroma, isolating the
    # luma/entropy path under subsampled scan interleave
    luma = np.kron(((13 * np.arange(4)[:, None] + 29 * np.arange(6)[None, :])
                    % 256).astype(np.uint8), np.ones((8, 8), np.uint8))
    rgb420 = np.repeat(luma[:, :, None], 3, axis=2)
    record("a_jpeg_rgb_420", rgb420, mm.encode_jpeg(rgb420, subsampling="420"),
           "A", "jpeg", 1, "4:2:0, R=G=B so chroma is constant")
    idx = rng.integers(0, 4, size=(13, 17), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    record("a_gif_palette", pal[idx], mm.encode_gif(idx, pal),
           "A", "gif", 0, "4-color palette GIF, LZW")
    png_rgb = rng.integers(0, 256, size=(9, 14, 3), dtype=np.uint8)
    record("a_png_rgb", png_rgb, mm.encode_png(png_rgb),
           "A", "png", 0, "RGB PNG, filter 0")
    png_gray = rng.integers(0, 256, size=(11, 7), dtype=np.uint8)
    record("a_png_gray", png_gray, mm.encode_png(png_gray),
           "A", "png", 0, "gray PNG")
    png_filt = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    record("a_png_filters", png_filt,
           mm.encode_png(png_filt, filters=[0, 1, 2, 3, 4]),
           "A", "png", 0, "PNG cycling scanline filters 0-4")
    bmp_rgb = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    record("a_bmp_rgb", bmp_rgb, mm.encode_bmp(bmp_rgb),
           "A", "bmp", 0, "24-bit BI_RGB, stride padding exercised (w=9)")
    a7 = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    record("a_png_adam7", a7,
           mm.encode_png(a7, filters=[0, 1, 2, 3, 4], interlace=True),
           "A", "png", 0,
           "Adam7-interlaced PNG (r8), cycling filters per pass row")

    # WAV direction A: our encoder, javax.sound as the reference parser
    wav_samples = ((np.arange(600) * 449) % 4001 - 2000).astype(np.int16)
    wav_payload = mm.encode_wav(wav_samples, channels=2, rate=16000)
    ws, wc, wr = iio.decode_wav(wav_payload)
    assert (wc, wr) == (2, 16000) and np.array_equal(ws, wav_samples)
    arrays["a_wav_pcm16__src"] = wav_samples
    arrays["a_wav_pcm16__payload"] = np.frombuffer(wav_payload, dtype=np.uint8)
    arrays["a_wav_pcm16__ref"] = ws
    manifest["a_wav_pcm16"] = {
        "direction": "A", "format": "wav", "tolerance": 0,
        "channels": 2, "rate": 16000,
        "note": "our PCM16 WAV verified sample-exact by javax.sound",
    }
    print(f"  a_wav_pcm16: payload {len(wav_payload)}B ref {ws.shape} exact")

    # ---- direction B: ImageIO encoders, our decoders under test ----
    print("direction B (ImageIO encoder -> our decoder):")
    yy, xx = np.mgrid[0:24, 0:32]
    smooth = ((xx * 255) // 31 * 3 // 4 + yy).clip(0, 255).astype(np.uint8)
    record("b_jpeg_gray", smooth, iio.encode("jpg", smooth),
           "B", "jpeg", 1, "libjpeg default-quality gray (real qtables)")
    rgb_eq = np.repeat(smooth[:, :, None], 3, axis=2)
    record("b_jpeg_rgb", rgb_eq, iio.encode("jpg", rgb_eq),
           "B", "jpeg", 2, "libjpeg color (4:2:0 default), R=G=B source")
    b_png = rng.integers(0, 256, size=(10, 13, 3), dtype=np.uint8)
    record("b_png_rgb", b_png, iio.encode("png", b_png),
           "B", "png", 0, "ImageIO PNG writer (its own filter choices)")
    b_gif_src = pal[rng.integers(0, 4, size=(11, 9), dtype=np.uint8)]
    record("b_gif", b_gif_src, iio.encode("gif", b_gif_src),
           "B", "gif", 0, "ImageIO GIF writer (quantized palette + LZW)")
    b_bmp = rng.integers(0, 256, size=(6, 11, 3), dtype=np.uint8)
    record("b_bmp", b_bmp, iio.encode("bmp", b_bmp),
           "B", "bmp", 0, "ImageIO BMP writer")
    b_a7 = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    record("b_png_adam7", b_a7, iio.encode("png_i", b_a7),
           "B", "png", 0,
           "ImageIO Adam7-interlaced PNG (progressive write mode)")
    b_gif_i = pal[rng.integers(0, 4, size=(13, 7), dtype=np.uint8)]
    gif_i_payload = iio.encode("gif_i", b_gif_i)
    # external validation of decode_gif's 4-pass de-interlace: require
    # the writer actually set the interlace flag in the image descriptor
    assert any(
        gif_i_payload[i] == 0x2C and gif_i_payload[i + 9] & 0x40
        for i in range(len(gif_i_payload))
        if gif_i_payload[i] == 0x2C
    ), "ImageIO did not write an interlaced GIF"
    record("b_gif_interlaced", b_gif_i, gif_i_payload,
           "B", "gif", 0, "ImageIO interlaced GIF (4-pass row order)")

    # WAV direction B: javax.sound encoder, our decode_wav under test
    b_wav_samples = ((np.arange(500) * 277) % 3001 - 1500).astype(np.int16)
    b_wav_payload = iio.encode_wav(b_wav_samples, rate=8000, channels=1)
    bs, bc, br = iio.decode_wav(b_wav_payload)
    assert (bc, br) == (1, 8000) and np.array_equal(bs, b_wav_samples)
    arrays["b_wav_pcm16__src"] = b_wav_samples
    arrays["b_wav_pcm16__payload"] = np.frombuffer(b_wav_payload, dtype=np.uint8)
    arrays["b_wav_pcm16__ref"] = bs
    manifest["b_wav_pcm16"] = {
        "direction": "B", "format": "wav", "tolerance": 0,
        "channels": 1, "rate": 8000,
        "note": "javax.sound-written WAVE parsed by our decode_wav",
    }
    print(f"  b_wav_pcm16: payload {len(b_wav_payload)}B ref {bs.shape} exact")

    GOLDEN.mkdir(exist_ok=True)
    np.savez_compressed(GOLDEN / "cross_decoder.npz", **arrays)
    java_ver = subprocess.run(
        ["java", "-version"], capture_output=True, text=True
    ).stderr.splitlines()[0]
    (GOLDEN / "cross_decoder_manifest.json").write_text(
        json.dumps(
            {"generator": "tools/gen_cross_decoder_golden.py",
             "reference_decoder": f"javax.imageio ({java_ver})",
             "cases": manifest},
            indent=2,
        )
        + "\n"
    )
    print(f"wrote {len(manifest)} cases -> {GOLDEN / 'cross_decoder.npz'}")


if __name__ == "__main__":
    main()
