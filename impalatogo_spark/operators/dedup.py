"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design notes (100 TB scale):
  * All hashing is md5-based and engine-agnostic, so the DuckDB oracle can
    replicate results bit-for-bit — and so results are stable across cluster
    sizes/partitionings (no JVM-hash nondeterminism).
  * MinHash signatures are computed as 16 independent `min()` aggregates over
    the exploded shingle set — ONE shuffle (groupBy doc_id), no seed
    explosion. Band buckets then shuffle by (band, key): only co-bucketed
    docs ever meet, which is the entire point of LSH at scale.
  * SimHash avoids exploding tokens x bits: 16 conditional-sum aggregates in
    a single groupBy.
  * Verification (exact Jaccard) runs only over LSH candidate pairs.

No equivalent exists in the reference (it is a relational engine); these are
net-new capabilities built on the operator set SURVEY.md §2 maps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
BANDS = 4  # rows per band = N_HASHES // BANDS = 4
SIMHASH_BITS = 32
HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def word_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per document: (id, g), distinct by default.

    distinct=False skips the dedup SHUFFLE — correct for MinHash signature
    computation (min() is duplicate-insensitive), so the signature path goes
    scan -> explode -> partial-agg min with no exchange before the groupBy.
    Jaccard verification needs the distinct set.

    Whole-stage-codegen friendly: split + transform + explode, no Python.
    """
    # materialize the split ONCE per row: referencing F.split(...) inside the
    # transform lambda re-evaluates the split per element (~200x per doc)
    words = F.col("__words")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + k + 1) for k in range(n)]),
    )
    out = (
        df.select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("__words"))
        .filter(F.size(words) >= n)
        .select("id", F.explode(grams).alias("g"))
    )
    return out.distinct() if distinct else out


def word_shingles_oracle(n: int = 3) -> str:
    """DuckDB twin of word_shingles over the `documents` view."""
    parts = " || ' ' || ".join(f"words[i+{k}]" for k in range(n))
    return f"""
  SELECT DISTINCT doc_id AS id, {parts} AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       LATERAL (SELECT unnest(range(1, len(words) - {n - 2})) AS i)
  WHERE len(words) >= {n}
"""


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the min id per group.
    One shuffle on the md5 fingerprint (never on the full text — at 100 TB
    the shuffle payload is the 32-byte hash, not the document)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_col(seed: int) -> Column:
    return F.min(F.md5(F.concat(F.lit(f"{seed}:"), F.col("g")))).alias(f"mh{seed}")


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(id, mh0..mh{N-1}): per-doc MinHash signature, one aggregation pass."""
    return sh.groupBy("id").agg(*[_minhash_col(j) for j in range(N_HASHES)])


def lsh_band_buckets(sig: DataFrame) -> DataFrame:
    """Explode each signature into BANDS (band, key) bucket rows."""
    rows = N_HASHES // BANDS
    band_keys = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
                "key"
            ),
        )
        for b in range(BANDS)
    ]
    return sig.select("id", F.explode(F.array(*band_keys)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def lsh_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing >=1 band bucket. The join key is
    (band, key) — only hash-colliding docs shuffle together."""
    a = buckets.select(F.col("id").alias("id_a"), "band", "key")
    b = buckets.select(F.col("id").alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs only (the LSH verify step)."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("id").alias("id_a"), "g")
    sb = sh.select(F.col("id").alias("id_b"), "g")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_oracle(threshold: float) -> str:
    """DuckDB twin of the full minhash->LSH->verify pipeline."""
    rows = N_HASHES // BANDS
    mh_cols = ",\n         ".join(
        f"min(md5('{j}:' || g)) AS mh{j}" for j in range(N_HASHES)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5("
        + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        + ") AS key FROM sig"
        for b in range(BANDS)
    )
    return f"""
WITH sh AS ({word_shingles_oracle()}),
sig AS (SELECT id, {mh_cols} FROM sh GROUP BY id),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c JOIN sh sa ON sa.id = c.id_a JOIN sh sb ON sb.id = c.id_b AND sb.g = sa.g
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, round(inter * 1.0 / (na.n + nb.n - inter), 4) AS jaccard
FROM inter JOIN sizes na ON na.id = id_a JOIN sizes nb ON nb.id = id_b
WHERE inter * 1.0 / (na.n + nb.n - inter) >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash per document. Bit b of token t = parity of hex digit b
    of md5(t) (all 32 hex chars used); v[b] = sum(+1/-1 over token
    occurrences); bit = v[b] > 0. Computed as 32 conditional sums in one
    groupBy — no token x bit blowup. 16 bits proved too weak at 5k docs
    (21k hamming<=3 pairs, mostly false); 32 bits is discriminative."""
    tokens = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    h = F.md5(F.col("tok"))
    vs = [
        F.sum(
            F.when(((F.instr(F.lit(HEX), F.substring(h, b + 1, 1)) - 1) % 2) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tokens.groupBy("id").agg(*vs)
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(0)
        sim = term if sim is None else sim + term
    return agg.select("id", sim.cast("long").alias("simhash"))


def simhash_oracle() -> str:
    vs = ",\n         ".join(
        f"sum(CASE WHEN (strpos('{HEX}', substr(md5(tok), {b + 1}, 1)) - 1) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tokens AS (
  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents
),
agg AS (SELECT id, {vs} FROM tokens GROUP BY id)
SELECT id, CAST({bits} AS BIGINT) AS simhash FROM agg
"""


def simhash_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance on the 16-bit SimHash.

    Implementation here is the exact all-pairs comparison (fine for oracle
    parity at test SF). The scale path is banding the 16 bits into 4 chunks
    and joining on exact-match chunks (any pair within hamming<=3 shares at
    least one exact chunk by pigeonhole) — see simhash_pairs_banded."""
    a = sim.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sim.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_banded(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Scale path: band the 16 bits into max_hamming+1 chunks; a pair within
    the Hamming budget must agree exactly on >=1 chunk (pigeonhole), so the
    join key is (chunk_index, chunk_value) — no cross product."""
    chunks = max_hamming + 1
    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    parts = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask)).alias("val"),
        )
        for c in range(chunks)
    ]
    bucketed = sim.select(
        "id", "simhash", F.explode(F.array(*parts)).alias("bk")
    ).select("id", "simhash", F.col("bk.chunk").alias("chunk"), F.col("bk.val").alias("val"))
    a = bucketed.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"), "chunk", "val")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"), "chunk", "val")
    return (
        a.join(b, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
