"""As-of join semantics + multimodal plumbing tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from platform_etl_openfda_faers_spark.operators import multimodal
from platform_etl_openfda_faers_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", ts("2024-01-01T10:00:05"), 100),
            ("A", ts("2024-01-01T10:00:20"), 101),
            ("B", ts("2024-01-01T10:00:01"), 200),
            ("C", ts("2024-01-01T10:00:10"), 300),  # no quotes for C
        ],
        ["sym", "t", "trade_px"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01T10:00:00"), 99.5),
            ("A", ts("2024-01-01T10:00:10"), 100.5),
            ("A", ts("2024-01-01T10:00:20"), 100.9),  # equal ts -> inclusive
            ("B", ts("2024-01-01T10:00:02"), 199.5),  # after B's trade
        ],
        ["sym", "t", "quote_px"],
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="t", by="sym", right_cols=["quote_px"])
    got = {(r.sym, r.trade_px): r.quote_px_right for r in out.collect()}
    assert got[("A", 100)] == 99.5   # latest quote <= 10:00:05
    assert got[("A", 101)] == 100.9  # equal timestamp matches (inclusive)
    assert got[("B", 200)] is None   # no quote before the trade
    assert got[("C", 300)] is None   # no quotes at all
    assert out.count() == trades.count()  # every left row preserved


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="t", by="sym", right_cols=["quote_px"], direction="forward"
    )
    got = {(r.sym, r.trade_px): r.quote_px_right for r in out.collect()}
    assert got[("A", 100)] == 100.5  # earliest quote >= 10:00:05
    assert got[("B", 200)] == 199.5


def test_attach_binary_and_decode(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], ["doc_id", "text"]
    )
    media = multimodal.attach_binary(docs, "text", "doc_id")
    m = {r.media_id: r for r in media.collect()}
    assert bytes(m[1].content) == b"hello world"
    assert m[1].meta.byte_len == 11
    assert len(m[1].meta.sha256) == 64

    decoded = multimodal.decode_media(media, n_features=8)
    d = {r.media_id: r for r in decoded.collect()}
    assert set(d) == {1, 2}
    for r in d.values():
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert 1 <= r.n_channels <= 4
        assert len(r.features) == 8
    # deterministic: same payload -> same fake decode
    again = {r.media_id: r for r in multimodal.decode_media(media).collect()}
    assert again[1] == d[1]


def test_decode_real_codec_gated_for_compressed_formats(spark):
    """fake=False now decodes BMP/PPM/WAV for real; payloads in any OTHER
    format (here: utf8 text bytes) must still fail loudly at decode time
    instead of producing garbage."""
    import py4j.protocol

    from pyspark.errors import PythonException

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    media = multimodal.attach_binary(docs, "text", "doc_id")
    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)) as e:
        multimodal.decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(e.value)


def test_frame_sample(spark):
    docs = spark.createDataFrame([(1, "x" * 200)], ["doc_id", "text"])
    media = multimodal.attach_binary(docs, "text", "doc_id")
    frames = multimodal.frame_sample(media, every_n=1)
    assert frames.count() == 3  # 200 bytes -> 3 frames at 64 B/frame


# ---------------------------------------------------------------------------
# Real pure-NumPy codecs


def test_bmp_roundtrip_with_stride_padding():
    """Widths 1..8 cover every 4-byte row-padding class; bottom-up + BGR
    must round-trip to the exact logical RGB array."""
    import numpy as np

    from platform_etl_openfda_faers_spark.operators import multimodal as mm

    rng = np.random.default_rng(3)
    for w in range(1, 9):
        rgb = rng.integers(0, 256, size=(5, w, 3), dtype=np.uint8)
        assert np.array_equal(mm.decode_bmp(mm.encode_bmp(rgb)), rgb), w


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from platform_etl_openfda_faers_spark.operators import multimodal as mm

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(3, 7, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(rgb)), rgb)
    # header comments per netpbm spec
    with_comment = b"P6\n# a comment\n7 3\n255\n" + rgb.tobytes()
    assert np.array_equal(mm.decode_ppm(with_comment), rgb)


def test_wav_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from platform_etl_openfda_faers_spark.operators import multimodal as mm

    samples = np.arange(-500, 500, 7, dtype=np.int16)
    payload = mm.encode_wav(samples, channels=2, rate=16000)
    got, ch, rate = mm.decode_wav(payload)
    assert np.array_equal(got, samples) and (ch, rate) == (2, 16000)
    # an extra chunk between fmt and data must be skipped, not break parsing
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"info"
    patched = payload[:fmt_end] + extra + payload[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    got2, _, _ = mm.decode_wav(patched)
    assert np.array_equal(got2, samples)


def test_unknown_format_raises_not_implemented():
    import pytest

    from platform_etl_openfda_faers_spark.operators import multimodal as mm

    # JPEG is genuinely unsupported (needs an external codec library)
    with pytest.raises(NotImplementedError, match="codec"):
        mm._real_decode(b"\xff\xd8\xff\xe0 jpeg garbage")
    # PNG is now a real decoder: corrupt PNG bytes fail parsing, loudly
    with pytest.raises(ValueError):
        mm._real_decode(b"\x89PNG\r\n\x1a\n garbage")


def test_decode_media_real_path_spark(spark):
    """End-to-end through mapInPandas: synthesized BMPs decode to the
    formula-predicted dimensions and first-pixel channels."""
    from pyspark.sql import functions as F

    from platform_etl_openfda_faers_spark.operators import multimodal as mm

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_bmp_media(ids, "doc_id")
    dec = mm.decode_media(media, fake=False)
    for r in dec.collect():
        i = r.media_id
        assert (r.width, r.height, r.n_channels) == (4 + i % 9, 3 + i % 5, 3)
        assert r.features[1] == i % 256
        assert r.features[2] == (i + 29) % 256
        assert r.features[3] == (i + 58) % 256


def test_png_roundtrip_all_filters_and_colortypes():
    """Every scanline filter (None/Sub/Up/Average/Paeth) and every
    supported color type must survive an encode->decode round trip."""
    import numpy as np

    rng = np.random.default_rng(11)
    for shape in [(5, 7), (5, 7, 3), (5, 7, 4), (1, 1, 3), (6, 13, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for f in range(5):
            out = multimodal.decode_png(
                multimodal.encode_png(img, filters=[f])
            )
            assert out.shape == img.shape and (out == img).all(), (shape, f)


def test_png_rejects_corrupt_crc_and_unknown_payload():
    import numpy as np
    import pytest

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(multimodal.encode_png(img))
    payload[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(payload))
    with pytest.raises(ValueError, match="PNG"):
        multimodal.decode_png(b"definitely not a png")


def test_png_rejects_malformed_chunk_order_and_trailing_bytes():
    """Strict reject-path behavior beyond CRC: IDAT before IHDR, duplicate
    IHDR, missing IEND, and trailing garbage after IEND are all malformed
    streams, not tolerable variants."""
    import struct
    import zlib

    import numpy as np
    import pytest

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
    idat = chunk(b"IDAT", zlib.compress(b"\x00\x00"))
    iend = chunk(b"IEND", b"")
    # well-formed baseline decodes
    assert multimodal.decode_png(sig + ihdr + idat + iend).shape == (1, 1)
    with pytest.raises(ValueError, match="expected IHDR"):
        multimodal.decode_png(sig + idat + ihdr + iend)
    with pytest.raises(ValueError, match="duplicate IHDR"):
        multimodal.decode_png(sig + ihdr + ihdr + idat + iend)
    with pytest.raises(ValueError, match="missing IEND"):
        multimodal.decode_png(sig + ihdr + idat)
    with pytest.raises(ValueError, match="trailing"):
        multimodal.decode_png(sig + ihdr + idat + iend + b"junk")


def test_png_real_decode_via_spark(spark):
    """End-to-end: synthesize PNGs in one mapInPandas pass, decode in
    another, and check the analytic pixel formula on the far side."""
    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    media = multimodal.synthetic_png_media(df, "doc_id")
    decoded = multimodal.decode_media(media, fake=False)
    rows = {r.media_id: r for r in decoded.collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        w, h = 4 + mid % 11, 3 + mid % 6
        assert (r.width, r.height, r.n_channels) == (w, h, 3)
        expect_sum = sum(
            (mid + 7 * x + 13 * y + 29 * c) % 256
            for x in range(w) for y in range(h) for c in range(3)
        )
        assert int(r.features[0]) == expect_sum
        assert int(r.features[1]) == mid % 256


def test_png_rejects_unsupported_depth_and_interlace():
    """16-bit, palette, and Adam7 PNGs need a full codec library — the
    decoder must fail loudly, not mis-parse."""
    import struct
    import zlib

    import numpy as np
    import pytest

    def png_with_ihdr(w, h, depth, color, interlace):
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF
            )
        raw = b"\x00" + b"\x00" * (w * 3)
        return (
            sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError):
        multimodal.decode_png(png_with_ihdr(1, 1, 16, 2, 0))  # 16-bit
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(png_with_ihdr(1, 1, 8, 3, 0))   # palette
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(png_with_ihdr(1, 1, 8, 2, 1))   # Adam7
    # sanity: the same construction with supported parameters decodes
    out = multimodal.decode_png(png_with_ihdr(1, 1, 8, 2, 0))
    assert out.shape == (1, 1, 3) and (out == 0).all()
