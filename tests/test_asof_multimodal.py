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


def test_decode_real_codec_is_gated(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    media = multimodal.attach_binary(docs, "text", "doc_id")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media, fake=False)


def test_frame_sample(spark):
    docs = spark.createDataFrame([(1, "x" * 200)], ["doc_id", "text"])
    media = multimodal.attach_binary(docs, "text", "doc_id")
    frames = multimodal.frame_sample(media, every_n=1)
    assert frames.count() == 3  # 200 bytes -> 3 frames at 64 B/frame
