"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched Pandas UDFs (mapInPandas).

The decode step is STUBBED (no image/audio libs in this container): the
feature extractor is a deterministic fake (byte length + md5 content hash +
fake 4-dim feature vector derived from the hash). The Spark-side plumbing is
REAL and exercised end-to-end: binary column handling, explicit output
schema, mapInPandas batch iteration, partition-preserving shape.

Swap `_fake_decode_features` for a real decoder (PIL/torchaudio/ffmpeg) and
nothing else changes — that is the point of the plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for image/audio decode + feature extraction.
    Real decoders plug in here (would raise NotImplementedError if this were
    production); the 4-dim output mimics a pooled feature vector."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:4]]


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: a `binary` payload column + metadata,
    exactly the schema shape a real image/audio table would carry."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched (not row-at-a-time): each pandas batch is processed as a
    vectorized column. At 100 TB this runs one Python worker per core per
    executor, streaming batches — no driver involvement, no collect.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: _fake_decode_features(bytes(b))
                    ),
                }
            )

    return df.mapInPandas(featurize, FEATURE_SCHEMA)


TREND_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("slope", T.DoubleType(), True),
        T.StructField("mean_value", T.DoubleType(), False),
    ]
)


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user linear trend of event `value` over time via applyInPandas
    (grouped-map Pandas UDF) — the third Pandas-UDF flavor next to
    mapInPandas (extract_features) and applyInPandasWithState (streaming).

    slope = cov(x, y) / var(x) with x = hours since epoch, computed with the
    explicit centered-moment formula so the SQL oracle reproduces it
    (np.polyfit's lstsq would differ numerically).

    Scale: groups are per-user — thousands of independent pandas calls,
    Arrow-batched, no skew beyond the busiest user.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["ts"].astype("int64") / 3.6e12  # ns -> hours
        y = pdf["value"].astype("float64")
        n = len(pdf)
        xc, yc = x - x.mean(), y - y.mean()
        denom = (xc * xc).sum()
        slope = float((xc * yc).sum() / denom) if denom > 0 else None
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [n],
                "slope": [slope],
                "mean_value": [float(y.mean())],
            }
        )

    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        fit, TREND_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_bytes", T.LongType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)

FRAME_SIZE = 64


def sample_frames(df: DataFrame, frame_size: int = FRAME_SIZE) -> DataFrame:
    """Frame sampling over binary payloads: one input row -> N frame rows
    (the 1-to-N mapInPandas shape a video pipeline needs: decode container ->
    emit per-frame records). The 'decoder' chunks the byte payload at fixed
    strides — a real decoder (ffmpeg keyframe extraction) plugs in here with
    no plumbing change.

    Scale: frames are emitted inside the Arrow batch loop — no driver
    involvement; downstream per-frame ops (feature extract, dedup) partition
    on (doc_id, frame_no).
    """

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame_bytes": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range(0, max(len(data), 1), frame_size):
                    frame = data[i : i + frame_size]
                    out["doc_id"].append(int(doc_id))
                    out["frame_no"].append(i // frame_size)
                    out["frame_bytes"].append(len(frame))
                    out["frame_hash"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(chunk, FRAME_SCHEMA)


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("thumbnail", T.ArrayType(T.IntegerType()), False),
    ]
)


def fake_resize_4x4(df: DataFrame) -> DataFrame:
    """'Resize' stub: a deterministic 4x4 grayscale thumbnail (16 ints in
    0..255) derived from the payload's md5 — the plumbing (binary in, typed
    fixed-shape tensor out, Arrow-batched) is exactly what a real
    PIL.Image.resize would need; swap `_thumb` for the real decoder."""

    def _thumb(payload: bytes) -> list[int]:
        return list(hashlib.md5(payload).digest())

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumbnail": pdf["payload"].map(lambda b: _thumb(bytes(b))),
                }
            )

    return df.mapInPandas(resize, THUMB_SCHEMA)


def thumbnail_oracle() -> str:
    """DuckDB twin: decode the 16 md5 hex byte-pairs to ints."""
    hexpos = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"
    pairs = ", ".join(
        f"CAST(({hexpos.format(p=2 * i + 1)}) * 16 + ({hexpos.format(p=2 * i + 2)}) AS INT)"
        for i in range(16)
    )
    return f"""
WITH t AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT doc_id, [{pairs}] AS thumbnail FROM t
"""


def ahash_16(df: DataFrame) -> DataFrame:
    """Average-hash (aHash) over the 4x4 thumbnail: bit i set iff pixel i is
    above the thumbnail mean — the classic perceptual-hash recipe, with the
    mean comparison done as the exact integer cross-multiplication
    16*pixel > sum(pixels) (no division, engine-exact). Input: fake_resize_
    4x4 output; swap in the real resizer and this stage is unchanged —
    aHash only ever sees the decoded thumbnail."""
    total = F.aggregate("thumbnail", F.lit(0), lambda a, x: a + x)
    out = df.withColumn("__total", total)
    ahash = F.expr(
        "aggregate(sequence(0, 15), 0,"
        " (acc, i) -> acc + IF(16 * thumbnail[i] > __total,"
        " shiftleft(1, i), 0))"
    )
    return out.select("doc_id", ahash.alias("ahash"))


def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual-hash near-dup pairs at Hamming <= max_hamming via the
    pigeonhole banded join (4 nibbles; <=3 differing bits guarantee >=1
    equal nibble — the simhash_pairs_banded argument), then the exact
    Hamming verify on candidates only. Never all-pairs."""
    bands = hashes.select(
        "doc_id", "ahash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
    ).withColumn("nib", F.expr("shiftright(ahash, band * 4)").bitwiseAND(15))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def fake_resize_8x8(df: DataFrame) -> DataFrame:
    """8x8 twin of fake_resize_4x4 (64 ints in 0..255): four salted md5
    digests of the payload concatenated — the wide-thumbnail decode stub
    the auto-width phash path (r07) uses once the corpus outgrows the
    16-bit hash space. Same Arrow-batched plumbing; swap `_thumb` for the
    real 8x8 resizer."""

    def _thumb(payload: bytes) -> list[int]:
        out: list[int] = []
        for salt in (b"", b"a", b"b", b"c"):
            out.extend(hashlib.md5(salt + payload).digest())
        return out

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumbnail": pdf["payload"].map(lambda b: _thumb(bytes(b))),
                }
            )

    return df.mapInPandas(resize, THUMB_SCHEMA)


def ahash_64_halves(df: DataFrame) -> DataFrame:
    """64-bit aHash over the 8x8 thumbnail, emitted as TWO 32-bit halves
    (h0 = bits 0..31, h1 = bits 32..63): bit i set iff 64*pixel_i >
    sum(pixels) — integer-exact like ahash_16. Halves keep every shift
    strictly below the BIGINT sign bit on both engines (the morton-code
    rule: never build a value that needs bit 63)."""
    total = F.aggregate("thumbnail", F.lit(0), lambda a, x: a + x)
    out = df.withColumn("__total", total)
    h0 = F.expr(
        "aggregate(sequence(0, 31), 0L, (acc, i) -> acc +"
        " IF(64 * thumbnail[i] > __total, shiftleft(1L, i), 0L))"
    )
    h1 = F.expr(
        "aggregate(sequence(32, 63), 0L, (acc, i) -> acc +"
        " IF(64 * thumbnail[i] > __total, shiftleft(1L, i - 32), 0L))"
    )
    return out.select("doc_id", h0.alias("h0"), h1.alias("h1"))


def phash_near_dup_pairs_64(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """64-bit twin of phash_near_dup_pairs: 4 bands of 16 bits (two per
    half; <= 3 differing bits guarantee >= 1 equal band — same pigeonhole),
    exact Hamming verify as the sum of the halves' popcounts."""
    bands = hashes.select(
        "doc_id", "h0", "h1",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
    ).withColumn(
        "bkey",
        F.expr(
            "CASE WHEN band < 2 THEN shiftright(h0, band * 16)"
            " ELSE shiftright(h1, (band - 2) * 16) END"
        ).bitwiseAND(65535),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.h0").alias("h0a"), F.col("a.h1").alias("h1a"),
            F.col("b.h0").alias("h0b"), F.col("b.h1").alias("h1b"),
        )
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("h0a").bitwiseXOR(F.col("h0b")))
        + F.bit_count(F.col("h1a").bitwiseXOR(F.col("h1b")))
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# Corpora at or below this doc count keep the 16-bit 4x4 aHash (the
# 64-bit space would yield zero fake-hash pairs on a tiny corpus);
# above it the 64-bit 8x8 path takes over — at a FIXED 16-bit width the
# hash space saturates (sf1 audit: 14.6M qualifying pairs / 257 MB
# shuffle at 50k docs, a testdata-artifact answer that itself grows
# quadratically) while 64 bits keeps the true answer realistic.
AUTO_PHASH_SMALL = 5_000


def phash_pairs_auto(payload_docs: DataFrame, n_docs: int,
                     max_hamming: int = 3) -> DataFrame:
    """Auto-width perceptual-hash near-dup pairs: 16-bit nibble bands for
    small corpora, 64-bit 16-bit-band halves above AUTO_PHASH_SMALL (pass
    the RAW documents count; the oracle mirrors the branch with a
    count(*) gate)."""
    if n_docs <= AUTO_PHASH_SMALL:
        return phash_near_dup_pairs(ahash_16(fake_resize_4x4(payload_docs)),
                                    max_hamming)
    return phash_near_dup_pairs_64(ahash_64_halves(fake_resize_8x8(payload_docs)),
                                   max_hamming)


def phash_dedup_oracle(max_hamming: int = 3) -> str:
    """DuckDB twin: thumbnail ints from the md5 hex pairs, integer-exact
    aHash bits, nibble-banded candidates, exact Hamming verify."""
    hexpos = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"
    pairs = ", ".join(
        f"CAST(({hexpos.format(p=2 * i + 1)}) * 16"
        f" + ({hexpos.format(p=2 * i + 2)}) AS INT)"
        for i in range(16)
    )
    bits = " + ".join(
        f"CASE WHEN 16 * tb[{i + 1}] > list_sum(tb) THEN {1 << i} ELSE 0 END"
        for i in range(16)
    )
    return f"""
WITH t AS (SELECT doc_id, md5(text) AS h FROM documents),
px AS (SELECT doc_id, [{pairs}] AS tb FROM t),
ah AS (SELECT doc_id, CAST({bits} AS INT) AS ahash FROM px),
b AS (
  SELECT doc_id, ahash, CAST(gs.band AS INT) AS band,
         (ahash >> (4 * CAST(gs.band AS INT))) & 15 AS nib
  FROM ah, (SELECT unnest(range(4)) AS band) gs
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                  x.ahash AS ha, y.ahash AS hb
  FROM b x JOIN b y
    ON x.band = y.band AND x.nib = y.nib AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
"""


def phash_dedup_auto_oracle(max_hamming: int = 3) -> str:
    """DuckDB twin of phash_pairs_auto: BOTH width branches in one query,
    each gated by a scalar count(*) subquery pushed into its source CTE's
    WHERE — the inactive branch's scan emits zero rows, so its banded
    join never enumerates (the gate predicate is uncorrelated and DuckDB
    evaluates it once). Shifts are fully parenthesized and the 64-bit
    hash lives in two 32-bit halves (never bit 63)."""
    hexpos = "strpos('0123456789abcdef', substr({s}, {p}, 1)) - 1"

    def pairs(src: str) -> str:
        return ", ".join(
            f"CAST(({hexpos.format(s=src, p=2 * i + 1)}) * 16"
            f" + ({hexpos.format(s=src, p=2 * i + 2)}) AS INT)"
            for i in range(16)
        )

    bits16 = " + ".join(
        f"CASE WHEN 16 * tb[{i + 1}] > list_sum(tb) THEN {1 << i} ELSE 0 END"
        for i in range(16)
    )
    h0bits = " + ".join(
        f"CASE WHEN 64 * tb[{i + 1}] > list_sum(tb)"
        f" THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END"
        for i in range(32)
    )
    h1bits = " + ".join(
        f"CASE WHEN 64 * tb[{i + 1}] > list_sum(tb)"
        f" THEN (CAST(1 AS BIGINT) << {i - 32}) ELSE 0 END"
        for i in range(32, 64)
    )
    return f"""
WITH st AS (SELECT doc_id, md5(text) AS h FROM documents
            WHERE (SELECT count(*) FROM documents) <= {AUTO_PHASH_SMALL}),
spx AS (SELECT doc_id, [{pairs('h')}] AS tb FROM st),
sah AS (SELECT doc_id, CAST({bits16} AS INT) AS ahash FROM spx),
sb AS (
  SELECT doc_id, ahash, CAST(gs.band AS INT) AS band,
         (ahash >> (4 * CAST(gs.band AS INT))) & 15 AS nib
  FROM sah, (SELECT unnest(range(4)) AS band) gs
),
scand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                  x.ahash AS ha, y.ahash AS hb
  FROM sb x JOIN sb y
    ON x.band = y.band AND x.nib = y.nib AND x.doc_id < y.doc_id
),
bt AS (SELECT doc_id, md5(text) AS hx0, md5('a' || text) AS hx1,
              md5('b' || text) AS hx2, md5('c' || text) AS hx3
       FROM documents
       WHERE (SELECT count(*) FROM documents) > {AUTO_PHASH_SMALL}),
bpx AS (SELECT doc_id,
               [{pairs('hx0')}, {pairs('hx1')}, {pairs('hx2')}, {pairs('hx3')}]
                 AS tb
        FROM bt),
bah AS (SELECT doc_id, CAST({h0bits} AS BIGINT) AS h0,
               CAST({h1bits} AS BIGINT) AS h1 FROM bpx),
bb AS (
  SELECT doc_id, h0, h1, CAST(gs.band AS INT) AS band,
         (CASE WHEN CAST(gs.band AS INT) < 2
               THEN (h0 >> (16 * CAST(gs.band AS INT)))
               ELSE (h1 >> (16 * (CAST(gs.band AS INT) - 2))) END) & 65535
           AS bkey
  FROM bah, (SELECT unnest(range(4)) AS band) gs
),
bcand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                  x.h0 AS h0a, x.h1 AS h1a, y.h0 AS h0b, y.h1 AS h1b
  FROM bb x JOIN bb y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM scand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
UNION ALL
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS INT)
         AS hamming
FROM bcand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= {max_hamming}
"""


CLIP_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("img_feat", T.ArrayType(T.LongType()), False),
    ]
)


def clip_image_features(df: DataFrame, n_dims: int = 8) -> DataFrame:
    """Image-tower half of a CLIP-style alignment check: Arrow-batched
    mapInPandas decodes each binary payload into an integer feature vector
    (md5-derived deterministic fake — a real encoder plugs into the same
    batch loop; schema, batching and partitioning are the production
    shape)."""

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "img_feat": pdf["payload"].map(
                        lambda b: [int(x) for x in
                                   hashlib.md5(bytes(b)).digest()[:n_dims]]
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(embed, CLIP_FEAT_SCHEMA)


def clip_alignment_gate(docs: DataFrame, text_col: str = "text",
                        n_dims: int = 8) -> DataFrame:
    """CLIP-style image-text alignment gate: integer dot product between
    the mapInPandas image features and a text-tower vector computed
    JVM-side (md5 bytes of a salted text hash), keep = above-corpus-mean
    alignment (exact integer cross-multiplication — no float threshold).
    This is the data-curation shape of LAION-style filtering: score every
    (image, caption) pair, drop the bottom of the distribution.

    Scale: the Python stage touches only (doc_id, payload) batches; the
    join back to the text tower is on doc_id (co-partitioned); the corpus
    mean is a broadcast 1-row aggregate, never a driver collect. The
    scored frame is persisted: the mean pass and the output pass would
    otherwise each re-run the Python encode stage (measured 2x)."""
    from impalatogo_spark.session import tracked_persist

    payload = attach_binary_payload(docs, text_col=text_col)
    img = clip_image_features(payload, n_dims=n_dims)
    txt_md5 = F.md5(F.concat(F.lit("t:"), F.col(text_col)))
    txt_feat = F.array(
        *[
            F.conv(F.substring(txt_md5, 2 * i + 1, 2), 16, 10).cast("long")
            for i in range(n_dims)
        ]
    )
    txt = docs.select("doc_id", txt_feat.alias("txt_feat"))
    scored = tracked_persist(img.join(txt, "doc_id").select(
        "doc_id",
        F.aggregate(
            F.zip_with("img_feat", "txt_feat", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("align"),
    ))
    tot = scored.agg(F.count(F.lit(1)).alias("d"),
                     F.sum("align").alias("s"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            "doc_id", "align",
            (F.col("align") * F.col("d") >= F.col("s")).alias("keep"),
        )
        .orderBy("doc_id")
    )


def clip_alignment_oracle(n_dims: int = 8) -> str:
    """DuckDB twin: payload == UTF-8 text bytes, so md5(payload) ==
    md5(text); hex-pair bytes via the strpos polynomial."""

    def byte_at(md5_expr: str, i: int) -> str:
        hi = (f"CAST(strpos('0123456789abcdef', substr({md5_expr}, {2 * i + 1}, 1))"
              f" - 1 AS BIGINT)")
        lo = (f"CAST(strpos('0123456789abcdef', substr({md5_expr}, {2 * i + 2}, 1))"
              f" - 1 AS BIGINT)")
        return f"(16 * {hi} + {lo})"

    txt_md5 = "md5('t:' || text)"
    dot = " + ".join(
        f"{byte_at('md5(text)', i)} * {byte_at(txt_md5, i)}"
        for i in range(n_dims)
    )
    return f"""
WITH s AS (
  SELECT doc_id, CAST({dot} AS BIGINT) AS align FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS d,
               CAST(sum(align) AS BIGINT) AS s FROM s)
SELECT s.doc_id, s.align, s.align * tot.d >= tot.s AS keep
FROM s, tot ORDER BY s.doc_id
"""
