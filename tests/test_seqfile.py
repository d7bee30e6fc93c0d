"""SequenceFile scanner parity via the pure-Python reader
(impalatogo_spark/sources/seqfile.py) — reference
`be/src/exec/hdfs-sequence-scanner.cc` (round-1 verdict: this scanner row
was a scope-out; the Hadoop container format is public, so a real read
path replaces the scope-out)."""

from __future__ import annotations

import os

import pytest

from impalatogo_spark.sources import seqfile as Q

ROWS = [(i, f"line {i} é") for i in range(250)]


def test_roundtrip_plain_and_compressed(tmp_path):
    for comp in (False, True):
        p = os.path.join(tmp_path, f"t{comp}.seq")
        Q.write_seqfile(p, ROWS, key_cls=Q.LONG, val_cls=Q.TEXT, compress=comp)
        kc, vc, recs = Q.decode_seqfile(open(p, "rb").read())
        assert (kc, vc) == (Q.LONG, Q.TEXT)
        assert recs == ROWS  # sync escapes (every 100 recs) skipped cleanly


def test_vint_edge_values(tmp_path):
    import io
    for v in (0, 1, -1, 127, -112, 128, -113, 255, 65536, -65537,
              2**40, -(2**40), 2**62, -(2**62)):
        out = io.BytesIO()
        Q._write_vint(out, v)
        got, pos = Q._read_vint(out.getvalue(), 0)
        assert got == v and pos == len(out.getvalue())


def test_bytes_and_null_writables(tmp_path):
    p = os.path.join(tmp_path, "b.seq")
    rows = [(b"\x00\x01\xff", None), (b"", None)]
    Q.write_seqfile(p, rows, key_cls=Q.BYTES, val_cls=Q.NULL)
    _, _, recs = Q.decode_seqfile(open(p, "rb").read())
    assert recs == rows


def test_read_sequencefile_distributed(spark, tmp_path):
    d = os.path.join(tmp_path, "tbl")
    os.makedirs(d)
    Q.write_seqfile(os.path.join(d, "p0.seq"), ROWS[:100])
    Q.write_seqfile(os.path.join(d, "p1.seq"), ROWS[100:], compress=True)
    df = Q.read_sequencefile(spark, d)
    assert df.schema.simpleString() == "struct<key:bigint,value:string>"
    got = sorted((r.key, r.value) for r in df.collect())
    assert got == ROWS


def test_block_compressed_rejected(tmp_path):
    p = os.path.join(tmp_path, "bc.seq")
    Q.write_seqfile(p, ROWS[:5])
    data = bytearray(open(p, "rb").read())
    # flip the block-compression flag byte (right after the two class names
    # and the compression flag)
    pos = 4
    for _ in range(2):
        n, pos = Q._read_vint(bytes(data), pos)
        pos += n
    data[pos + 1] = 1
    with pytest.raises(ValueError, match="block-compressed"):
        Q.decode_seqfile(bytes(data))
