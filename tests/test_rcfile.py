"""RCFile scanner parity via the pure-Python reader
(impalatogo_spark/sources/rcfile.py) — reference
`be/src/exec/hdfs-rcfile-scanner.cc` (round-1 scope-out; the Hive RCFile
container format is public, so a real read path replaces the scope-out)."""

from __future__ import annotations

import io
import os
import struct
import zlib

import pytest

from impalatogo_spark.sources import rcfile as R
from impalatogo_spark.sources.seqfile import _write_vint

ROWS = [(i, f"name {i} é", None if i % 7 == 0 else i * 1.5) for i in range(300)]
STR_ROWS = [(str(a), b, None if c is None else repr(c)) for a, b, c in ROWS]


def test_roundtrip_plain_and_compressed(tmp_path):
    for comp in (False, True):
        p = os.path.join(tmp_path, f"t{comp}.rc")
        R.write_rcfile(p, STR_ROWS, n_cols=3, compress=comp,
                       rows_per_group=77)  # multiple groups + sync escapes
        n_cols, rows = R.decode_rcfile(open(p, "rb").read())
        assert n_cols == 3
        got = [
            tuple(None if c is None else c.decode("utf-8") for c in r)
            for r in rows
        ]
        assert got == STR_ROWS


def test_column_projection_skips_columns(tmp_path):
    p = os.path.join(tmp_path, "t.rc")
    R.write_rcfile(p, STR_ROWS, n_cols=3, rows_per_group=100)
    _, rows = R.decode_rcfile(open(p, "rb").read(), columns=[2, 0])
    assert rows[1] == (
        [STR_ROWS[1][2].encode(), STR_ROWS[1][0].encode()]
    )
    assert rows[0][0] is None  # row 0's third column is SerDe-NULL


def test_cell_length_rle():
    lens = [4, 4, 4, 9, 1, 1, 0, 0, 0, 0, 5]
    buf = R._encode_cell_lengths(lens)
    assert R._decode_cell_lengths(buf, len(lens)) == lens
    # constant column compresses to one (len, ~run) pair
    const = R._encode_cell_lengths([3] * 1000)
    assert len(const) <= 4


def test_legacy_seq_style_header_read(tmp_path):
    """The reference scanner's primary form: SequenceFile v6 header with
    RCFile$KeyBuffer/ValueBuffer classes (hdfs-rcfile-scanner.cc
    RCFILE_KEY_CLASS_NAME)."""
    p = os.path.join(tmp_path, "t.rc")
    R.write_rcfile(p, STR_ROWS[:50], n_cols=3)
    data = open(p, "rb").read()
    # rebuild with a legacy header: SEQ6 + classes + compress/blockcompress
    out = io.BytesIO()
    out.write(b"SEQ" + bytes([6]))
    for cls in (R.KEY_CLASS, R.VALUE_CLASS):
        raw = cls.encode("utf-8")
        _write_vint(out, len(raw))
        out.write(raw)
    out.write(bytes([0, 0]))  # uncompressed, not block-compressed
    body_off = 4 + 1  # new header: magic+version, then compressed flag
    legacy = out.getvalue() + data[body_off:]
    n_cols, rows = R.decode_rcfile(legacy)
    assert n_cols == 3 and len(rows) == 50


def test_rejects_non_rcfile_and_lzo(tmp_path):
    with pytest.raises(ValueError, match="bad magic"):
        R.decode_rcfile(b"PAR1whatever")
    out = io.BytesIO()
    out.write(R.RCF_MAGIC + bytes([1, 1]))
    raw = b"com.hadoop.compression.lzo.LzoCodec"
    _write_vint(out, len(raw))
    out.write(raw)
    out.write(struct.pack(">i", 0))
    with pytest.raises(ValueError, match="unsupported codec"):
        R.decode_rcfile(out.getvalue() + b"\x00" * 16)


def test_read_rcfile_distributed(spark, tmp_path):
    d = os.path.join(tmp_path, "tbl")
    os.makedirs(d)
    R.write_rcfile(os.path.join(d, "p0.rc"), STR_ROWS[:150], n_cols=3)
    R.write_rcfile(os.path.join(d, "p1.rc"), STR_ROWS[150:], n_cols=3,
                   compress=True)
    df = R.read_rcfile(spark, d, "id INT, name STRING, score DOUBLE")
    assert df.schema.simpleString() == \
        "struct<id:int,name:string,score:double>"
    got = {r.id: (r.name, r.score) for r in df.collect()}
    assert len(got) == 300
    assert got[1] == ("name 1 é", 1.5)
    assert got[7] == ("name 7 é", None)  # SerDe \\N -> typed NULL
    assert got[299] == ("name 299 é", 448.5)
