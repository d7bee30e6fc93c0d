"""LZO scan path (hdfs-lzo-text-scanner.cc surface): LZO1X codec + lzop
container + executor-side text scan. Codec implemented from the public
LZO1X instruction-stream documentation — roundtrips plus hand-built streams
pin the decoder's M1/M2/M3/M4/extension paths."""

import random
import zlib

import pytest

from impalatogo_spark.sources.lzo import (
    lzo1x_compress,
    lzo1x_decompress,
    read_lzo_text,
    read_lzop_bytes,
    write_lzo_text,
    write_lzop,
)


def _roundtrip(data: bytes) -> None:
    comp = lzo1x_compress(data)
    assert lzo1x_decompress(comp) == data


def test_codec_roundtrip_shapes():
    _roundtrip(b"")
    _roundtrip(b"a")
    _roundtrip(b"abc")
    _roundtrip(b"abcd")
    _roundtrip(b"hello world " * 100)  # M2-distance repeats
    _roundtrip(bytes(range(256)) * 4)  # literal-heavy
    _roundtrip(b"\x00" * 10_000)  # long overlapping match, extended lengths
    _roundtrip(b"ab" * 5_000)


def test_codec_roundtrip_long_range_matches():
    # repeat at distances that force M3 (<=0x4000) and M4 (>0x4000) forms
    rng = random.Random(7)
    filler = bytes(rng.randrange(256) for _ in range(0x5000))
    probe = b"THE-NEEDLE-0123456789"
    data = probe + filler + probe + filler[:0x3000] + probe
    _roundtrip(data)


def test_codec_roundtrip_random_mixed():
    rng = random.Random(42)
    words = [bytes(rng.randrange(65, 91) for _ in range(rng.randrange(3, 12)))
             for _ in range(50)]
    data = b" ".join(rng.choice(words) for _ in range(5_000))
    comp = lzo1x_compress(data)
    assert lzo1x_decompress(comp) == data
    assert len(comp) < len(data) // 2  # actually compresses repetitive text


def test_decoder_handles_handbuilt_m1_and_first_literal_run():
    # Stream built by hand to hit paths the greedy encoder never emits:
    # first-byte short-literal special (17+t), then an M2 match with
    # trailing literals, then an M1 2-byte match reached from match state.
    stream = bytes([
        17 + 3, 65, 66, 67,        # first-byte special: literals "ABC"
        (3 - 1) << 5 | (2 & 7) << 2 | 2, 0,  # M2 len3 dist3 + 2 trail
        88, 89,                    # the 2 trailing literals "XY"
        (0 << 2) | 0, 0,           # M1 from match state: len2 dist1
        0x11, 0x00, 0x00,          # end marker
    ])
    # ABC + match(dist3,len3)->ABC + XY + match(dist1,len2)->YY
    assert lzo1x_decompress(stream) == b"ABCABCXYYY"


def test_decoder_handles_extended_literal_run():
    import struct

    # 16-bit counter stream: every 4-gram is unique -> no matches possible,
    # so the whole input is ONE literal run using the zero-extension form
    data = b"".join(struct.pack(">H", i) for i in range(500))
    comp = lzo1x_compress(data)
    assert comp[0] == 0  # extended-run marker
    assert lzo1x_decompress(comp) == data


def test_lzop_container_roundtrip(tmp_path):
    data = (b"the quick brown fox jumps over the lazy dog\n" * 400
            + bytes(range(256)))
    p = str(tmp_path / "x.lzo")
    write_lzop(p, data, block_size=4096)
    raw = open(p, "rb").read()
    assert read_lzop_bytes(raw) == data


def test_lzop_stored_block_when_incompressible(tmp_path):
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(8192))  # incompressible
    p = str(tmp_path / "r.lzo")
    write_lzop(p, data, block_size=4096)
    assert read_lzop_bytes(open(p, "rb").read()) == data


def test_lzop_detects_corruption(tmp_path):
    p = str(tmp_path / "c.lzo")
    write_lzop(p, b"payload payload payload payload")
    raw = bytearray(open(p, "rb").read())
    raw[-5] ^= 0xFF  # flip a data byte -> adler32 must catch it
    with pytest.raises(ValueError):
        read_lzop_bytes(bytes(raw))
    with pytest.raises(ValueError):
        read_lzop_bytes(b"not an lzo file at all....")


def test_read_lzo_text_scan(spark, tmp_path):
    lines_a = [f"row-{i}|{i * i}" for i in range(500)]
    lines_b = [f"row-{i}|{i + 7}" for i in range(500, 800)]
    write_lzo_text(str(tmp_path / "a.lzo"), lines_a, block_size=2048)
    write_lzo_text(str(tmp_path / "b.lzo"), lines_b, block_size=2048)
    df = read_lzo_text(spark, str(tmp_path))
    got = sorted(r.line for r in df.collect())
    assert got == sorted(lines_a + lines_b)
    # delimited text on top of the LZO lines, the reference's text-table shape
    from pyspark.sql import functions as F

    parsed = df.select(F.split("line", r"\|").alias("c")).select(
        F.col("c")[0].alias("k"), F.col("c")[1].cast("long").alias("v"))
    assert parsed.where(F.col("k") == "row-499").first().v == 499 * 499
