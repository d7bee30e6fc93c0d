"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design notes (100 TB scale):
  * All hashing is md5-based and engine-agnostic, so the DuckDB oracle can
    replicate results bit-for-bit — and so results are stable across cluster
    sizes/partitionings (no JVM-hash nondeterminism).
  * MinHash signatures are computed as 16 independent `min()` aggregates over
    the exploded shingle set — ONE shuffle (groupBy doc_id), no seed
    explosion — over ONE md5 per shingle reduced to a 32-bit base hash and
    16 linear permutations (a*h+b mod 2^31-1), all inside whole-stage
    codegen. Band buckets then shuffle by (band, key): only co-bucketed
    docs ever meet, which is the entire point of LSH at scale.
  * Near-dup clustering (connected_components) turns verified pairs into
    transitive clusters via iterative min-label propagation.
  * SimHash avoids exploding tokens x bits: 16 conditional-sum aggregates in
    a single groupBy.
  * Verification (exact Jaccard) runs only over LSH candidate pairs.

No equivalent exists in the reference (it is a relational engine); these are
net-new capabilities built on the operator set SURVEY.md §2 maps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from impalatogo_spark.session import tracked_local_checkpoint as _ckpt

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
    # The split must evaluate ONCE per row: split_words puts it behind a
    # Generate barrier, because a plain projection gets CollapseProject-
    # inlined into the transform lambda and re-evaluates per element
    # (O(len^2) per doc — 7.6x measured at sf0.1).
    from impalatogo_spark.operators import split_words

    words = F.col("__words")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + k + 1) for k in range(n)]),
    )
    # distinct=True: per-document set semantics. Because each document is
    # ONE input row, a per-row array_distinct before the explode is exactly
    # the global (id, g) DISTINCT — with ZERO shuffle (the old .distinct()
    # exchanged every shingle row; measured 4.9s -> 2.0s for the capped
    # Jaccard shingle build at sf0.1).
    return (
        split_words(df.select(F.col(id_col).alias("id"), F.col(text_col)),
                    text_col=text_col, out="__words")
        .filter(F.size(words) >= n)
        .select(
            "id",
            F.explode(F.array_distinct(grams) if distinct else grams).alias("g"),
        )
    )


def word_shingles_oracle(n: int = 3) -> str:
    """DuckDB twin of word_shingles over the `documents` view."""
    parts = " || ' ' || ".join(f"words[i+{k}]" for k in range(n))
    return f"""
  SELECT DISTINCT doc_id AS id, {parts} AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       LATERAL (SELECT unnest(range(1, len(words) - {n - 2})) AS i)
  WHERE len(words) >= {n}
"""


def cap_shingle_df(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles appearing in more than `max_df` documents (stopword
    shingles) before any shingle-equijoin.

    This is the standard guard against the hot-key scale-killer in exact
    shingle-join candidate generation: boilerplate n-grams ("terms of
    service", license headers) have document frequency in the millions at
    100 TB, and a self-equijoin on the raw shingle does per-key O(DF^2) work
    on ONE shuffle partition. Capping DF bounds per-key join work at
    max_df^2 while near-dup semantics are preserved — a shingle shared by
    thousands of documents carries no near-duplicate signal (the same reason
    MinHash implementations drop stop-shingles).

    The hot list is produced by a map-side-combined count on `g`; the
    anti-join is left to AQE to broadcast when the hot list is small (it is,
    by definition, at most |shingle rows| / max_df keys).
    """
    hot = (
        sh.groupBy("g")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("g")
    )
    return sh.join(hot, "g", "left_anti")


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

# Linear-permutation MinHash: ONE md5 per shingle (the only hash DuckDB and
# Spark share bit-for-bit) reduced to a 32-bit base value, then N_HASHES
# cheap (a*h + b) mod p permutations, p = 2^31-1 (Mersenne). At scale this
# replaces 16 md5-of-concat evaluations per shingle row with 1 md5 + 16
# fused multiply-adds inside whole-stage codegen — the signature stage is
# hash-bound, so this is ~an order of magnitude less CPU per row.
# Overflow-safe: a < 2^30, h < 2^32 -> a*h + b < 2^63.
P_MERSENNE = 2147483647  # 2^31 - 1
_MH_A = [((1103515245 * (j + 1) + 12345) % (1 << 30)) | 1 for j in range(N_HASHES)]
_MH_B = [(69069 * (j + 1) + 1) % P_MERSENNE for j in range(N_HASHES)]


def _minhash_col(seed: int) -> Column:
    return F.min(
        (F.lit(_MH_A[seed]) * F.col("__h") + F.lit(_MH_B[seed])) % P_MERSENNE
    ).alias(f"mh{seed}")


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(id, mh0..mh{N-1}): per-doc MinHash signature, one aggregation pass
    over a single md5-derived base hash per shingle."""
    base = F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
    return (
        sh.select("id", base.alias("__h"))
        .groupBy("id")
        .agg(*[_minhash_col(j) for j in range(N_HASHES)])
    )


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
    # hex -> bigint polynomial over the first 8 md5 chars (DuckDB has no
    # conv(); strpos-based digit decode, BIGINT throughout)
    hex_poly = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    mh_cols = ",\n         ".join(
        f"min(({a} * h + {b}) % {P_MERSENNE}) AS mh{j}"
        for j, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5("
        + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        + ") AS key FROM sig"
        for b in range(BANDS)
    )
    return f"""
WITH sh AS ({word_shingles_oracle()}),
hashed AS (SELECT id, ({hex_poly}) AS h FROM (SELECT id, md5(g) AS hx FROM sh)),
sig AS (SELECT id, {mh_cols} FROM hashed GROUP BY id),
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
    # Decode the 32-hex-char md5 into four 32-bit ints ONCE per token row
    # (4 conv calls), then read bit b's parity with shift/mask — instead of
    # 32 instr(substring(...)) string probes per row. Same simhash values
    # bit-for-bit, so the DuckDB oracle (strpos form) is unchanged.
    h = F.md5(F.col("tok"))
    decoded = tokens.select(
        "id",
        *[
            F.conv(F.substring(h, 8 * k + 1, 8), 16, 10).cast("long").alias(f"c{k}")
            for k in range(SIMHASH_BITS // 8)
        ],
    )
    vs = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"c{b // 8}"), (7 - b % 8) * 4).bitwiseAND(F.lit(1)) == 1,
                1,
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = decoded.groupBy("id").agg(*vs)
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


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(node, cluster_id) for the undirected graph given by (id_a, id_b)
    pairs; cluster_id = min node id in the component. This is the step after
    pair generation in a dedup pipeline: transitive near-dup groups, each
    with a canonical (min-id) representative.

    Distributed min-label propagation, converging in O(diameter) rounds;
    near-dup components are shallow (diameter ~ a few), so 2-3 rounds in
    practice. Each round is ONE join + one min-aggregate: the edge set is
    augmented with self-loops up front, so min over the CLOSED neighborhood
    replaces the usual propagate-then-least-with-own-label second join —
    two shuffles per round instead of three, and the static (self-looped)
    edge side is persisted once and reused every round. Round 1 is FUSED
    with initialization (r07): initial labels are the identity, so the
    first round is a single min(dst)-per-src aggregate over the edges —
    no identity-label frame, no first join. Convergence is a scalar
    aggregate over the round's labels, not a join against the previous
    round: labels only ever DECREASE, so an unchanged sum(label) (decimal —
    no overflow at any node count) means fixpoint; non-numeric ids fall
    back to a changed-row join probe. Each round's labels are
    localCheckpoint-ed LAZILY and materialized by that same convergence
    aggregate — one job per round, and iterative plans otherwise DOUBLE in
    size per round (an 11-round chain already produces a 2 GB plan string):
    lineage truncation is mandatory for any iterative DataFrame algorithm,
    not an optimization. At much larger graph scale, swap the loop body for
    the large-star/small-star transforms (Kiveris et al.) — same join/agg
    building blocks, fewer rounds on skewed high-degree components.
    """
    if max_iter < 1:
        # the fused init+round-1 aggregate always runs, so "0 rounds" has
        # no meaning here — reject rather than silently doing one round
        raise ValueError("connected_components: max_iter must be >= 1")
    sym = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # closed neighborhood: every node also sees its own label through a
    # self-loop, so one join+min per round subsumes the least(own, nbr) step
    edges = (
        sym.union(sym.select("src", F.col("src").alias("dst"))).distinct().persist()
    )
    # ROUND 1 FUSED WITH INITIALIZATION (r07): the initial labels are the
    # identity, so round 1's min over the closed neighborhood is just
    # min(dst) per src — the separate identity-label frame (a distinct
    # shuffle + eager checkpoint + sum probe) and the first join disappear.
    # Per round, the checkpoint is LAZY and the convergence probe's
    # aggregate materializes it: one job per round instead of two. The
    # round-1 probe reads the convergence baseline sum(initial label) ==
    # sum(node) out of the same aggregate.
    labels = _ckpt(
        edges.groupBy("src").agg(F.min("dst").alias("label"))
        .withColumnRenamed("src", "node"),
        eager=False,
    )
    numeric = dict(labels.dtypes)["label"] in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    ) or dict(labels.dtypes)["label"].startswith("decimal")

    def _label_sum(lb: DataFrame):
        return lb.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    if numeric:
        node_sum, prev_sum = labels.agg(
            F.sum(F.col("node").cast("decimal(38,0)")),
            F.sum(F.col("label").cast("decimal(38,0)")),
        ).collect()[0]
        done = prev_sum == node_sum
    else:
        # identity comparison needs no join: round-1 label vs own node id
        done = labels.filter(F.col("label") != F.col("node")).limit(1).count() == 0
    for _ in range(max_iter - 1):
        if done:
            break
        new_labels = _ckpt(
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "node"),
            eager=False,
        )
        if numeric:
            new_sum = _label_sum(new_labels)
            done = new_sum == prev_sum
            prev_sum = new_sum
        else:
            done = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
                == 0
            )
        labels = new_labels
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def connected_components_star(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(doc_id, cluster_id): same contract as connected_components, via the
    alternating large-star / small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"). Converges in O(log n)
    rounds independent of graph DIAMETER — the scale path when components
    can be long chains — and the star transforms keep high-degree (skewed)
    nodes from funneling through one reducer the way label propagation's
    min-aggregate does.

    Each round:
      large-star: for every node u, link every LARGER neighbor to the
        minimum of u's closed neighborhood — strictly shrinks tall trees.
      small-star: link every neighbor <= u (and u) to that minimum —
        flattens the remainder into stars.
    Fixpoint: the edge set stops changing; edges then ARE the (node ->
    component-min) star mapping. Every round localCheckpoints (lineage
    doubles per round otherwise; see connected_components)."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )  # canonical: u > v
        .distinct()
        .transform(_ckpt)
    )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        # symmetric neighborhoods, then min over the CLOSED neighborhood
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        joined = sym.join(mins, "u")
        # large-star links neighbors v > u; small-star links v <= u and u itself
        linked = (
            joined.filter(F.col("v") > F.col("u")) if large
            else joined.filter(F.col("v") <= F.col("u"))
        ).select(F.col("v").alias("a"), F.col("m").alias("b"))
        self_link = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
        out = linked.union(self_link) if not large else linked
        return (
            out.filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
        )

    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .transform(_ckpt)
    )
    for _ in range(max_iter):
        after = _star(_star(edges, large=True), large=False).transform(_ckpt)
        changed = (
            after.exceptAll(edges).limit(1).count() + edges.exceptAll(after).limit(1).count()
        )
        edges = after
        if changed == 0:
            break
    # stars: u -> v is (node -> component min); isolated minima map to themselves
    labels = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    mins_self = nodes.join(
        edges.select(F.col("u").alias("node")), "node", "left_anti"
    ).select(F.col("node").alias("doc_id"), F.col("node").alias("cluster_id"))
    return labels.union(mins_self)


def incremental_components_update(state: DataFrame,
                                  new_pairs: DataFrame,
                                  return_delta: bool = False) -> DataFrame:
    """Merge a batch of new verified pairs into an EXISTING components
    table in O(batch), not O(corpus) — the incremental form of
    connected_components (r05 verdict #7; dedup_clusters rebuilt the
    whole graph per ingest).

    state: (doc_id, cluster_id) with cluster_id = min doc_id of the
    component (connected_components' contract). new_pairs: (id_a, id_b)
    verified edges from the incoming batch (batch-internal and
    batch-vs-corpus — every genuinely NEW edge is incident to the batch).

    Shape: contract every existing component to its representative
    (cluster ids ARE the min member ids, so the contracted node id is the
    component min), map the new edges' endpoints through the state (a
    broadcast-hash join whose BUILD side is the O(batch) endpoint set —
    the corpus-sized state streams map-side, zero corpus shuffle), run
    connected_components on the contracted graph (O(batch) nodes+edges),
    then apply the result as (a) a broadcast relabel of rows in TOUCHED
    components only and (b) direct inserts for endpoints that had no
    component yet (new-batch docs and old singletons). Untouched
    components never shuffle; min-id labels stay globally correct because
    min over contracted representatives == min over underlying members.
    The gate (dedup_clusters_incremental) proves two ingest rounds equal
    the full recompute, value-exact."""
    ids = (
        new_pairs.select(F.col("id_a").alias("doc_id"))
        .union(new_pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    # endpoint -> existing cluster (broadcast the O(batch) endpoint set;
    # the corpus-sized state scans map-side, output is O(batch)). The
    # checkpoint is lazy: the first consumer (the contracted graph's
    # broadcast build) materializes it — no separate eager job.
    lookup = _ckpt(state.join(F.broadcast(ids), "doc_id"), eager=False)
    la = lookup.select(F.col("doc_id").alias("id_a"),
                       F.col("cluster_id").alias("ca"))
    lb = lookup.select(F.col("doc_id").alias("id_b"),
                       F.col("cluster_id").alias("cb"))
    contracted = (
        new_pairs.join(F.broadcast(la), "id_a", "left")
        .join(F.broadcast(lb), "id_b", "left")
        .select(F.coalesce("ca", "id_a").alias("id_a"),
                F.coalesce("cb", "id_b").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    tiny = connected_components(contracted).withColumnRenamed(
        "doc_id", "node").withColumnRenamed("cluster_id", "new_label")
    # edges entirely inside one existing component contract away; nothing
    # to relabel or insert then
    if tiny.isEmpty():
        return state.limit(0) if return_delta else state
    reps = lookup.select(F.col("cluster_id").alias("node")).distinct()
    relabel = _ckpt(tiny.join(reps, "node")
                    .withColumnRenamed("node", "cluster_id"), eager=False)
    fresh = (
        tiny.join(reps, "node", "left_anti")
        .select(F.col("node").alias("doc_id"),
                F.col("new_label").alias("cluster_id"))
    )
    if return_delta:
        # only the rows whose assignment changed (touched-cluster members
        # with a NEW label) plus the fresh inserts — the O(touched) payload
        # a versioned state store appends per ingest
        relabeled = (
            state.join(F.broadcast(relabel.filter(
                F.col("new_label") != F.col("cluster_id"))), "cluster_id")
            .select("doc_id", F.col("new_label").alias("cluster_id"))
        )
        return relabeled.unionByName(fresh)
    updated = (
        state.join(F.broadcast(relabel), "cluster_id", "left")
        .select("doc_id",
                F.coalesce("new_label", "cluster_id").alias("cluster_id"))
    )
    return updated.unionByName(fresh)


def components_state_write(spark, path: str, delta: DataFrame,
                           note: str = "") -> int:
    """Append one ingest round's component-assignment DELTA to a
    snapshot-versioned state store (operators/snapshots.py manifests —
    immutable data files, O(files) driver work). Row payload per version
    is O(touched + fresh), never the full state; the version stamp rides
    in a __v column so reads can resolve last-writer-wins. The stamp is
    applied INSIDE snapshot_write from the version it actually commits
    (r06 ADVICE: recomputing head+1 here could diverge from the manifest
    under a concurrent writer)."""
    from impalatogo_spark.operators import snapshots as SN

    return SN.snapshot_write(
        spark, path, delta.select("doc_id", "cluster_id"), note=note,
        stamp=lambda d, v: d.withColumn("__v", F.lit(v)))


def components_state_read(spark, path: str,
                          version: int | None = None) -> DataFrame:
    """Reconstruct the (doc_id, cluster_id) components table AS OF a
    snapshot version (default head): union the delta files the manifest
    lists, keep each doc's highest-version assignment. The per-doc pick is
    a packed-struct max — (__v, cluster_id) is unique per doc per version,
    so no engine-arbitrary tie (round-4 mode()/max_by rule)."""
    from impalatogo_spark.operators import snapshots as SN

    raw = SN.snapshot_read(spark, path, version)
    return (
        raw.groupBy("doc_id")
        .agg(F.max(F.struct("__v", "cluster_id")).alias("m"))
        .select("doc_id", F.col("m.cluster_id").alias("cluster_id"))
    )


def batch_incident_pairs(cumulative: DataFrame | None,
                         batch: DataFrame | None,
                         threshold: float = 0.5, *,
                         b_cum: DataFrame | None = None,
                         b_batch: DataFrame | None = None,
                         sh_all: DataFrame | None = None) -> DataFrame:
    """Verified near-dup pairs with >= 1 endpoint in the incoming batch:
    batch-internal LSH pairs plus the batch x cumulative bucket join (the
    candidate shape of incremental_dedup_indexed — per-band shuffle is
    O(batch + matching corpus buckets), never all-corpus-pairs). Together
    with the pairs already processed for earlier batches this covers every
    verified pair of the grown corpus exactly once: signatures are
    per-document content hashes, so pair (a, b) collides independently of
    the rest of the corpus and is generated at the stage its LATER member
    arrives.

    b_cum / b_batch / sh_all (r07 optimization pass): precomputed band
    buckets and shingles for the two sides — the SIGNATURE-STORE shape;
    pass EITHER both raw frames or the full precomputed trio (a partial
    kwarg set with None raw frames is rejected up front).
    Signatures are per-document content hashes, so a caller ingesting
    multiple rounds derives buckets/shingles ONCE for the whole corpus
    (persisted), filters per round, and passes them in; the default path
    re-derives the CUMULATIVE side from raw text every round, which is
    O(corpus) re-hash work per ingest a real system avoids by keeping the
    signature table. Results are bit-identical either way."""
    if (cumulative is None or batch is None) and (
            b_cum is None or b_batch is None or sh_all is None):
        raise ValueError(
            "batch_incident_pairs: pass both raw frames (cumulative, batch) "
            "or the full precomputed trio (b_cum, b_batch, sh_all)")
    if b_batch is None:
        b_batch = lsh_band_buckets(minhash_signatures(
            word_shingles(batch, distinct=False)))
    if b_cum is None:
        b_cum = lsh_band_buckets(minhash_signatures(
            word_shingles(cumulative, distinct=False)))
    cand = batch_incident_candidates(b_cum, b_batch)
    if sh_all is None:
        sh_all = word_shingles(batch).union(word_shingles(cumulative))
    return verify_jaccard(cand, sh_all, threshold).select("id_a", "id_b")


def batch_incident_candidates(b_cum: DataFrame,
                              b_batch: DataFrame) -> DataFrame:
    """Candidate (id_a, id_b) pairs with >= 1 endpoint in the batch, from
    precomputed band buckets: batch-internal LSH pairs plus the
    batch x cumulative bucket join. Split out of batch_incident_pairs (r08)
    so a MULTI-batch ingest can union every batch's candidates and verify
    them in ONE Jaccard pass — candidates are pure content-hash products
    (bucket keys are per-document signatures), so they are independent of
    any clustering state and can all be generated up front."""
    within = lsh_candidate_pairs(b_batch)
    cross = (
        b_cum.select(F.col("id").alias("id_a"), "band", "key")
        .join(b_batch.select(F.col("id").alias("id_b"), "band", "key"),
              ["band", "key"])
        .select("id_a", "id_b")
        .distinct()
    )
    return within.union(cross).distinct()


def edit_distance_pairs(docs: DataFrame, k: int = 8, q: int = 4) -> DataFrame:
    """Exact edit-distance self-join (Ed-Join, Xiao et al. 2008): all
    document pairs with levenshtein(text_a, text_b) <= k, WITHOUT the
    all-pairs DP.

    Candidate filter (lossless by the q-gram lemma): strings with edit
    distance <= k share at least |G(x)| - k*q positional q-grams counted
    with multiplicity, so indexing only each document's k*q + 1 RAREST
    (gram, occurrence#) elements under one global rarity order guarantees
    every qualifying pair collides in prefixes — the same prefix-filter
    proof as dedup_jaccard_prefix_filter, over q-gram multisets. The lemma
    needs |G| > k*q, i.e. |text| > q*(k+1) - 1; docs at or below that
    floor (where the bound goes non-positive and a qualifying pair may
    share ZERO grams) are routed through an UNCONDITIONAL length-banded
    pairing instead (r07, ADVICE: the 44-char floor of the documents
    table was an empirical property, not enforced) — their partners are
    themselves short (|len| band), so that block stays tiny. A
    |len_a - len_b| <= k band is applied everywhere (k edits change
    length by at most k). Verification is Spark's BANDED 3-arg
    levenshtein (O(k*n) diagonal DP, -1 above k), never the full O(n*m)
    matrix. The oracle is the NAIVE length-banded all-pairs ground truth,
    so the gate proves the prefix filter lossless.

    Shuffle shape (r07 constant-factor cut — this was the registry's
    largest shuffle, 557 MB at sf1, with the gram stream crossing THREE
    exchanges): ONE repartition of the raw doc table pins
    hash(doc_id) partitioning for the whole gram pipeline —
    HashPartitioning(doc_id) satisfies the (doc_id, g) and (doc_id)
    clustering both windows require, so occ-numbering and rarity-ranking
    are partition-local sorts with no exchange; the (gram, occ) document
    frequencies come from a co-partitioned per-doc count + sequence
    explode (no window output consumed twice) and join back as a
    BROADCAST (the df table is vocab-bounded: alphabet^q x max-occ, not
    data-sized). The gram stream itself is never shuffled."""
    d = docs.select("doc_id", "text", F.length("text").alias("n"))
    floor_len = q * (k + 1) - 1
    dp = d.filter(F.col("n") > floor_len).repartition("doc_id")
    grams = dp.select(
        "doc_id", "n",
        F.posexplode(F.expr(
            f"transform(sequence(1, n - {q - 1}), i -> substring(text, i, {q}))"
        )).alias("pos", "g"),
    )
    w_occ = Window.partitionBy("doc_id", "g").orderBy("pos")
    elems = grams.select(
        "doc_id", "n", "g", F.row_number().over(w_occ).alias("occ"))
    df_tab = (
        grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .select("g", F.explode(F.expr("sequence(1, c)")).alias("occ"))
        .groupBy("g", "occ").agg(F.count(F.lit(1)).alias("df"))
    )
    w_rank = Window.partitionBy("doc_id").orderBy("df", "g", "occ")
    # tracked_persist: the self-join consumes prefix twice, and with no
    # exchange at the prefix output (the whole point of the r07 rewrite)
    # ReuseExchange can no longer dedup the two sides — without the
    # persist the entire gram pipeline (explode + two sorts + df agg)
    # executes once per side. The prefix is k*q+1 skinny rows per doc.
    from impalatogo_spark.session import tracked_persist

    prefix = tracked_persist(
        elems.join(F.broadcast(df_tab), ["g", "occ"])
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k * q + 1)
        .select("doc_id", "n", "g", "occ")
    )
    cand_main = (
        prefix.alias("a")
        .join(prefix.alias("b"),
              (F.col("a.g") == F.col("b.g"))
              & (F.col("a.occ") == F.col("b.occ"))
              & (F.col("b.doc_id") > F.col("a.doc_id"))
              & (F.abs(F.col("a.n") - F.col("b.n")) <= k))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
    )
    # docs at/below the q-gram floor: unconditional length-banded pairs
    # (both members are short — |len| <= floor+k — so this block is tiny;
    # the broadcast nested-loop is over the SHORT side only, never the
    # corpus)
    short = d.filter(F.col("n") <= floor_len)
    near = d.filter(F.col("n") <= floor_len + k)
    cand_short = (
        F.broadcast(short.select(F.col("doc_id").alias("s_id"),
                                 F.col("n").alias("s_n")))
        .join(near.select(F.col("doc_id").alias("o_id"),
                          F.col("n").alias("o_n")),
              (F.col("s_id") != F.col("o_id"))
              & (F.abs(F.col("s_n") - F.col("o_n")) <= k))
        .select(F.least("s_id", "o_id").alias("id_a"),
                F.greatest("s_id", "o_id").alias("id_b"))
    )
    cand = cand_main.union(cand_short).distinct()
    ta = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("t_a"))
    tb = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("t_b"))
    return (
        cand.join(ta, "id_a").join(tb, "id_b")
        .withColumn("ed", F.levenshtein("t_a", "t_b", k))
        .filter(F.col("ed") >= 0)
        .select("id_a", "id_b", "ed")
    )


def edit_distance_oracle(k: int = 8) -> str:
    """DuckDB twin of edit_distance_pairs: the NAIVE length-banded
    all-pairs ground truth (full-DP levenshtein on every length-compatible
    pair) — NOT a mirror of the prefix filter, so a MATCH proves the
    filter lossless."""
    return f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.text, b.text) AS ed
FROM d a JOIN d b
  ON b.doc_id > a.doc_id AND abs(a.n - b.n) <= {k}
WHERE levenshtein(a.text, b.text) <= {k}
ORDER BY id_a, id_b
"""


def clusters_oracle(pairs_sql: str) -> str:
    """DuckDB twin: transitive closure via recursive CTE (UNION dedups, so
    the fixpoint terminates), then min reachable id per node."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, min(dst) AS cluster_id
FROM reach GROUP BY src
"""


# ---------------------------------------------------------------------------
# incremental dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------

def build_corpus_index(corpus: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The corpus-side dedup index: (fingerprints, LSH band buckets,
    distinct shingles). In steady state these are WRITTEN ONCE per corpus
    snapshot (parquet/bucketed tables) and joined by every incoming batch —
    at 100 TB this turns per-batch cost from O(corpus) to O(batch +
    matching buckets). tests/test_scale.py proves the persisted-index path
    is byte-identical to the inline derivation."""
    fp = corpus.select(F.md5("text").alias("fp")).distinct()
    buckets = lsh_band_buckets(minhash_signatures(word_shingles(corpus, distinct=False)))
    shingles = word_shingles(corpus)
    return fp, buckets, shingles


def incremental_dedup_indexed(incoming: DataFrame, fp_old: DataFrame,
                              b_old: DataFrame, sh_old: DataFrame,
                              threshold: float = 0.5) -> DataFrame:
    """Incremental dedup against a PRECOMPUTED corpus index (the steady-state
    form — see build_corpus_index). Same per-doc status contract as
    incremental_dedup."""
    from impalatogo_spark.session import tracked_persist

    fp_new = incoming.select("doc_id", F.md5("text").alias("fp"))
    exact = (
        fp_new.join(fp_old, "fp", "left_semi")
        .select("doc_id", F.lit("exact_dup").alias("status"))
    )
    surv = fp_new.join(fp_old, "fp", "left_anti").select("doc_id")
    surv_docs = incoming.join(surv, "doc_id", "left_semi")

    # ONE persisted shingle derivation for the surviving batch feeds both
    # the signature pass and the verify union (min() over the distinct set
    # equals min() over the multiset, and the anti-join + scan + explode
    # upstream would otherwise run once per consumer — r07 pass)
    sh_new = tracked_persist(word_shingles(surv_docs))
    b_new = lsh_band_buckets(minhash_signatures(sh_new))
    cand = (
        b_new.select(F.col("id").alias("id_a"), "band", "key")
        .join(b_old.select(F.col("id").alias("id_b"), "band", "key"), ["band", "key"])
        .select("id_a", "id_b")
        .distinct()
    )
    # disjoint id spaces, so one unioned shingle relation serves both sides
    sh_all = sh_new.union(sh_old)
    near = (
        verify_jaccard(cand, sh_all, threshold)
        .select(F.col("id_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.lit("near_dup").alias("status"))
    )
    kept = (
        surv.join(near.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit("kept").alias("status"))
    )
    return exact.union(near).union(kept).orderBy("doc_id")


def incremental_dedup(incoming: DataFrame, corpus: DataFrame,
                      threshold: float = 0.5) -> DataFrame:
    """Dedup an INCOMING batch against an EXISTING corpus — the production
    shape for a continuously-ingesting training pipeline (the whole-corpus
    variants above re-cluster everything; this touches only the delta).

    Per incoming doc: status 'exact_dup' (corpus already has the identical
    text), 'near_dup' (a corpus doc within the MinHash-LSH Jaccard
    threshold), or 'kept'.

    Scale shape: phase 1 is a 32-byte-fingerprint anti-join (the text never
    shuffles). Phase 2 runs LSH banding on BOTH sides but candidates come
    from an incoming x corpus bucket join, so per-band shuffle volume is
    O(batch + matching corpus buckets), and Jaccard verification touches
    only candidate pairs. This self-contained form derives the corpus index
    inline (the oracle must see one query); the steady-state form joins the
    PERSISTED index instead — build_corpus_index + incremental_dedup_indexed,
    equivalence-tested in tests/test_scale.py."""
    from impalatogo_spark.session import tracked_persist

    # corpus-side signature-store shape (r07 pass): one persisted shingle
    # frame feeds the bucket derivation AND the verify union — signatures
    # are identical off the distinct set (min is duplicate-insensitive),
    # and the corpus scan + explode runs once instead of once per consumer
    fp_old = corpus.select(F.md5("text").alias("fp")).distinct()
    sh_old = tracked_persist(word_shingles(corpus))
    b_old = lsh_band_buckets(minhash_signatures(sh_old))
    return incremental_dedup_indexed(incoming, fp_old, b_old, sh_old, threshold)


def incremental_oracle(threshold: float = 0.5) -> str:
    """DuckDB twin of incremental_dedup with corpus = even doc_ids and
    incoming = odd doc_ids (the deterministic snapshot split the query
    wrapper uses). Mirrors minhash_lsh_oracle's machinery, cross-set."""
    rows = N_HASHES // BANDS
    hex_poly = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    mh_cols = ",\n         ".join(
        f"min(({a} * h + {b}) % {P_MERSENNE}) AS mh{j}"
        for j, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )

    def band_rows(sig: str) -> str:
        return " UNION ALL ".join(
            f"SELECT id, {b} AS band, md5("
            + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
            + f") AS key FROM {sig}"
            for b in range(BANDS)
        )

    return f"""
WITH fp_new AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 1),
fp_old AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0),
exact AS (SELECT doc_id, 'exact_dup' AS status FROM fp_new
          WHERE fp IN (SELECT fp FROM fp_old)),
surv AS (SELECT doc_id FROM fp_new WHERE fp NOT IN (SELECT fp FROM fp_old)),
sh0 AS ({word_shingles_oracle()}),
sh_new AS (SELECT * FROM sh0 WHERE id IN (SELECT doc_id FROM surv)),
sh_old AS (SELECT * FROM sh0 WHERE id % 2 = 0),
h_new AS (SELECT id, ({hex_poly}) AS h FROM (SELECT id, md5(g) AS hx FROM sh_new)),
h_old AS (SELECT id, ({hex_poly}) AS h FROM (SELECT id, md5(g) AS hx FROM sh_old)),
sig_new AS (SELECT id, {mh_cols} FROM h_new GROUP BY id),
sig_old AS (SELECT id, {mh_cols} FROM h_old GROUP BY id),
b_new AS ({band_rows('sig_new')}),
b_old AS ({band_rows('sig_old')}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM b_new a JOIN b_old b ON a.band = b.band AND a.key = b.key),
sizes AS (SELECT id, count(*) AS n FROM sh0 GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN sh_new sa ON sa.id = c.id_a
          JOIN sh_old sb ON sb.id = c.id_b AND sb.g = sa.g
          GROUP BY c.id_a, c.id_b),
near AS (SELECT DISTINCT id_a AS doc_id, 'near_dup' AS status
         FROM inter JOIN sizes na ON na.id = id_a JOIN sizes nb ON nb.id = id_b
         WHERE round(inter * 1.0 / (na.n + nb.n - inter), 4) >= {threshold}),
kept AS (SELECT doc_id, 'kept' AS status FROM surv
         WHERE doc_id NOT IN (SELECT doc_id FROM near))
SELECT * FROM exact UNION ALL SELECT * FROM near UNION ALL SELECT * FROM kept
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (C4/RefinedWeb-style span dedup)
# ---------------------------------------------------------------------------

def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    seg_words: int = 10) -> DataFrame:
    """Span-level exact dedup with document reassembly: split each doc into
    consecutive `seg_words`-word segments (the corpus has no newlines, so
    fixed word windows stand in for paragraphs), keep only the GLOBALLY
    first occurrence of each distinct segment (ordered by (doc_id,
    seg_idx)), and reassemble each doc from its surviving segments in
    order — the C4-style boilerplate/span dedup every pre-training corpus
    pass runs.

    Scale shape: two data shuffles (plus the final presentation sort), both
    full map-side combine, with NO join and NO window —
    segs.groupBy(segment).agg(min(packed key)) picks
    the keeper (a hot boilerplate segment partial-aggregates to one row
    per input partition, so skew cannot funnel), then groupBy(doc_id)
    reassembles. Output is (doc_id, n_kept, clean_len, clean_md5); the md5
    keeps the driver compare compact while pinning the exact reassembled
    text."""
    from impalatogo_spark.operators import split_words

    w = F.col("__w")
    segs = (
        split_words(df.select("doc_id", F.col(text_col)), text_col=text_col)
        .select(
            "doc_id",
            "__w",
            F.explode(
                F.sequence(F.lit(0),
                           (F.ceil(F.size(w) / float(seg_words)) - 1).cast("int"))
            ).alias("seg_idx"),
        )
        .select(
            "doc_id",
            "seg_idx",
            F.concat_ws(
                " ", F.slice(w, F.col("seg_idx") * seg_words + 1, seg_words)
            ).alias("seg"),
        )
    )
    # keeper per distinct segment: min (doc_id, seg_idx), packed into one
    # BIGINT so min() map-side-combines (seg_idx < 1e6 at any plausible
    # doc length)
    kept = (
        segs.groupBy("seg")
        .agg(F.min(F.col("doc_id") * 1000000 + F.col("seg_idx")).alias("k"))
        .select(
            F.expr("k div 1000000").alias("doc_id"),
            (F.col("k") % 1000000).alias("seg_idx"),
            "seg",
        )
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))), lambda x: x.seg
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.length(F.array_join(ordered, " ")).alias("clean_len"),
            F.md5(F.array_join(ordered, " ")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


def paragraph_dedup_oracle(seg_words: int = 10) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(w[(i*{seg_words}+1):((i+1)*{seg_words})], ' ') AS seg
  FROM words,
       UNNEST(range(CAST(ceil(len(w) / {seg_words}.0) AS BIGINT))) AS t(i)),
kept AS (
  SELECT k // 1000000 AS doc_id, k % 1000000 AS seg_idx, seg
  FROM (SELECT seg, min(doc_id * 1000000 + seg_idx) AS k FROM segs GROUP BY seg)),
clean AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_idx) AS txt
  FROM kept GROUP BY doc_id)
SELECT doc_id, n_kept, length(txt) AS clean_len, md5(txt) AS clean_md5
FROM clean ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact duplicated-substring spans (Lee et al., "Deduplicating Training Data
# Makes Language Models Better": remove verbatim substrings that occur more
# than once in the corpus). Word-level approximation of the suffix-array
# method: a duplicated span is a maximal run of k-gram fingerprints whose
# fingerprint occurs >= min_count times corpus-wide.
# ---------------------------------------------------------------------------

def substring_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 8,
                    min_count: int = 2) -> DataFrame:
    """Maximal duplicated word-span detection: every position whose k-word
    gram repeats (>= min_count occurrences corpus-wide) is duplicated;
    overlapping/adjacent duplicated grams merge into one span per document.

    Output: (doc_id, span_start, span_end, span_tokens, n_grams) — token
    positions are 0-based inclusive.

    Scale shape (100 TB): the shuffle key is the 32-byte md5 of the k-gram,
    never the text; the frequency pass is a map-side-combining groupBy; the
    span merge is one window per document (one shuffle on doc id). No
    suffix array materializes — the k-gram lattice IS the index, exactly
    the trade the reference's comparison-harness-style exact twins make.
    The semi join against duplicated fingerprints is a shuffled hash join
    (dup set is corpus-sized; do NOT broadcast).
    """
    from impalatogo_spark.operators import split_words

    w = split_words(
        df.select(F.col(id_col).alias("id"), text_col),
        text_col=text_col, out="__words", keep=("id",),
    )
    words = F.col("__words")
    grams = (
        w.filter(F.size(words) >= k)
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - k),
                    lambda p: F.md5(F.concat_ws(" ", F.slice(words, p + 1, k))),
                )
            ).alias("start", "fp"),
        )
    )
    dup = (
        grams.groupBy("fp")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("fp")
    )
    spans = grams.join(dup, "fp", "left_semi").select(
        "id",
        F.col("start").cast("long").alias("start"),
        (F.col("start") + (k - 1)).cast("long").alias("end"),
    )
    win = Window.partitionBy("id").orderBy("start")
    prev_end = F.max("end").over(
        win.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "ni",
        F.when(prev_end.isNull() | (F.col("start") > prev_end + 1), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("ni").over(win.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_grams",
        )
    )


def substring_spans_oracle(k: int = 8, min_count: int = 2) -> str:
    """DuckDB twin of substring_spans over the `documents` view — identical
    gram fingerprints (md5 of the space-joined k words), identical
    overlap-or-adjacent island merge."""
    return f"""
WITH w AS (SELECT doc_id AS id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT id, i AS start, md5(array_to_string(words[(i+1):(i+{k})], ' ')) AS fp
  FROM w, UNNEST(range(len(words) - {k - 1})) AS t(i)
  WHERE len(words) >= {k}
),
dup AS (SELECT fp FROM g GROUP BY fp HAVING count(*) >= {min_count}),
s AS (
  SELECT g.id, CAST(g.start AS BIGINT) AS start,
         CAST(g.start + {k - 1} AS BIGINT) AS e
  FROM g SEMI JOIN dup ON g.fp = dup.fp
),
f AS (
  SELECT id, start, e,
         CASE WHEN max(e) OVER pw IS NULL OR start > max(e) OVER pw + 1
              THEN 1 ELSE 0 END AS ni
  FROM s
  WINDOW pw AS (PARTITION BY id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
i AS (
  SELECT id, start, e,
         sum(ni) OVER (PARTITION BY id ORDER BY start
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM f
)
SELECT id AS doc_id, min(start) AS span_start, max(e) AS span_end,
       max(e) - min(start) + 1 AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_grams
FROM i GROUP BY id, island
"""


# ---------------------------------------------------------------------------
# Near-dup survivor selection: clusters -> one canonical document kept per
# cluster (the end-to-end "which rows do I actually drop" step).
# ---------------------------------------------------------------------------

def near_dup_survivors(docs: DataFrame, components: DataFrame,
                       id_col: str = "doc_id",
                       quality_col: str = "n_chars") -> DataFrame:
    """Per near-dup cluster (size >= 2), pick the survivor: max quality,
    then min doc_id as the deterministic tie-break. Returns one row per
    cluster: (cluster_id, survivor_id, cluster_size, removed).

    `components` is (doc_id, cluster_id) from connected_components[_star].
    Scale: one broadcast-size-agnostic shuffled join docs->components on
    doc_id, then a per-cluster aggregate — the survivor pick is a max over
    a packed (quality, -id) key, not a window sort.
    """
    joined = components.join(
        docs.select(F.col(id_col).alias("doc_id"), quality_col), "doc_id"
    )
    # pack (quality asc, doc_id desc) into one orderable struct: survivor =
    # max struct -> greatest quality, smallest id on ties
    packed = joined.select(
        "cluster_id",
        F.struct(
            F.col(quality_col).alias("q"), (-F.col("doc_id")).alias("nid")
        ).alias("pick"),
    )
    return (
        packed.groupBy("cluster_id")
        .agg(F.max("pick").alias("best"), F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
        .select(
            "cluster_id",
            (-F.col("best.nid")).alias("survivor_id"),
            "cluster_size",
            (F.col("cluster_size") - 1).alias("removed"),
        )
    )


def survivors_oracle(clusters_sql: str, quality_col: str = "n_chars") -> str:
    """DuckDB twin: same packed-max survivor rule over the recursive-CTE
    cluster assignment."""
    return f"""
WITH comp AS ({clusters_sql}),
j AS (
  SELECT comp.cluster_id, d.doc_id, d.{quality_col} AS q
  FROM comp JOIN documents d ON d.doc_id = comp.doc_id
),
r AS (
  SELECT cluster_id,
         max(struct_pack(q := q, nid := -doc_id)) AS best,
         CAST(count(*) AS BIGINT) AS cluster_size
  FROM j GROUP BY cluster_id
)
SELECT cluster_id, -best.nid AS survivor_id, cluster_size,
       cluster_size - 1 AS removed
FROM r WHERE cluster_size >= 2
"""


# ---------------------------------------------------------------------------
# Bloom-filter membership prefilter (batch-vs-corpus exact dedup at scale)
# ---------------------------------------------------------------------------

BLOOM_M = 65536  # bit-space size
BLOOM_K = 4      # hash functions (4 disjoint md5 hex chunks)


def _bloom_positions(text: Column, m: int = BLOOM_M) -> Column:
    """BLOOM_K bit positions for one document: disjoint 4-hex-char chunks of
    md5(text), each mod m — k independent-enough hashes from ONE md5
    evaluation, engine-mirrorable bit-for-bit."""
    return F.array(
        *[
            F.conv(F.substring(F.md5(text), 1 + 8 * j, 4), 16, 10).cast("long") % m
            for j in range(BLOOM_K)
        ]
    )


def bloom_prefilter_dedup(incoming: DataFrame, corpus: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          m: int = BLOOM_M) -> DataFrame:
    """Exact batch-vs-corpus dedup behind a Bloom-filter prefilter: the
    corpus is summarized as the SET BIT POSITIONS of a Bloom filter
    (BLOOM_K md5-derived positions per doc, BLOOM_M-bit space); an incoming
    doc is a candidate only if ALL its k positions are set. Only candidates
    pay the exact fingerprint join — the standard way to make a
    batch-vs-100-TB-corpus membership check cheap: the filter is O(m) bits
    (a broadcast bitmap on a cluster; here a distinct-positions table whose
    size is <= min(m, k * corpus_docs)), the corpus itself never joins.

    By construction there are NO false negatives (every exact dup is a
    bloom hit — asserted in tests/test_dedup.py); false positives are the
    documented Bloom trade-off and are resolved by the exact join, so the
    final exact_dup column is exact.

    Returns one row per incoming doc: (doc_id, bloom_hit, exact_dup).
    """
    bits = (
        corpus.select(F.explode(_bloom_positions(F.col(text_col), m)).alias("pos"))
        .distinct()
    )
    inc = incoming.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("fp"),
        F.explode(_bloom_positions(F.col(text_col), m)).alias("pos"),
    )
    # per incoming doc: count how many of its (distinct) positions are set.
    # distinct BEFORE the count: two hash chunks of one doc may collide on
    # the same position, which must count once against the k-of-k test.
    hits = (
        inc.select("doc_id", "fp", "pos")
        .distinct()
        .withColumn("n_pos", F.count("*").over(Window.partitionBy("doc_id")))
        .join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "fp", "n_pos")
        .agg(F.count("*").alias("n_set"))
        .filter(F.col("n_set") == F.col("n_pos"))
        .select("doc_id", "fp")
    )
    corpus_fp = corpus.select(F.md5(F.col(text_col)).alias("fp")).distinct()
    exact = hits.join(corpus_fp, "fp", "left_semi").select(
        "doc_id", F.lit(True).alias("exact_dup")
    )
    return (
        incoming.select(F.col(id_col).alias("doc_id"))
        .join(hits.select("doc_id", F.lit(True).alias("bloom_hit")), "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("bloom_hit", F.lit(False)).alias("bloom_hit"),
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
        )
        .orderBy("doc_id")
    )


def bloom_prefilter_oracle(inject_offset: int = 1_000_000_000) -> str:
    """DuckDB twin of the registered query: odd-doc batch PLUS relabeled
    copies of every 10th even corpus doc (known duplicates — the testdata
    has no natural exact dups, so the dup path would otherwise be vacuous),
    identical md5-chunk positions, set-bit table, k-of-k membership test,
    exact verify on candidates only."""
    def poly(start: int) -> str:
        return "(" + " + ".join(
            f"CAST(strpos('{HEX}', substr(h, {start + i}, 1)) - 1 AS BIGINT)"
            f" * {16 ** (3 - i)}"
            for i in range(4)
        ) + f") % {BLOOM_M}"

    pos_c = " UNION ALL ".join(
        f"SELECT doc_id, h, {poly(1 + 8 * j)} AS pos FROM hashed_c"
        for j in range(BLOOM_K)
    )
    pos_b = " UNION ALL ".join(
        f"SELECT doc_id, h, {poly(1 + 8 * j)} AS pos FROM hashed_b"
        for j in range(BLOOM_K)
    )
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {inject_offset} AS doc_id, text
  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
hashed_c AS (SELECT doc_id, md5(text) AS h FROM corpus),
hashed_b AS (SELECT doc_id, md5(text) AS h FROM batch),
pos_c AS ({pos_c}),
bits AS (SELECT DISTINCT pos FROM pos_c),
pos_b AS ({pos_b}),
inc AS (SELECT DISTINCT doc_id, h, pos FROM pos_b),
npos AS (SELECT doc_id, count(*) AS n_pos FROM inc GROUP BY doc_id),
hits AS (
  SELECT inc.doc_id, any_value(inc.h) AS h
  FROM inc JOIN bits USING (pos) JOIN npos USING (doc_id)
  GROUP BY inc.doc_id, npos.n_pos
  HAVING count(*) = npos.n_pos
),
corpus_fp AS (SELECT DISTINCT h FROM hashed_c),
exact AS (SELECT doc_id FROM hits WHERE h IN (SELECT h FROM corpus_fp))
SELECT b.doc_id,
       (hits.doc_id IS NOT NULL) AS bloom_hit,
       (exact.doc_id IS NOT NULL) AS exact_dup
FROM batch b
LEFT JOIN hits ON hits.doc_id = b.doc_id
LEFT JOIN exact ON exact.doc_id = b.doc_id
ORDER BY b.doc_id
"""


# ---------------------------------------------------------------------------
# Corpus-frequency boilerplate removal (CCNet/RefinedWeb-style): drop EVERY
# occurrence of any segment whose corpus-wide document frequency reaches the
# threshold (headers, licenses, nav chrome). Differs from paragraph_dedup
# (which keeps the first occurrence): boilerplate is noise in all copies.
# ---------------------------------------------------------------------------

def boilerplate_removal(df: DataFrame, text_col: str = "text",
                        seg_words: int = 10, df_cap: int = 3) -> DataFrame:
    """Remove all copies of segments appearing in >= df_cap distinct docs.

    Scale shape: same two map-side-combining shuffles as paragraph_dedup —
    segs.groupBy(seg) counts DISTINCT docs via a (seg, doc) pre-aggregation
    (so a hot segment combines per input partition; skew cannot funnel),
    then the boilerplate set joins back as a broadcast (by construction it
    is the small high-DF tail of the segment distribution). Reassembly is
    one groupBy(doc_id). No window, no self-join.
    """
    from impalatogo_spark.operators import split_words

    w = F.col("__w")
    segs = (
        split_words(df.select("doc_id", F.col(text_col)), text_col=text_col)
        .select(
            "doc_id",
            "__w",
            F.explode(
                F.sequence(F.lit(0),
                           (F.ceil(F.size(w) / float(seg_words)) - 1).cast("int"))
            ).alias("seg_idx"),
        )
        .select(
            "doc_id",
            "seg_idx",
            F.concat_ws(
                " ", F.slice(w, F.col("seg_idx") * seg_words + 1, seg_words)
            ).alias("seg"),
        )
    )
    # distinct-doc frequency with a (seg, doc) pre-combine, then the cap
    boiler = (
        segs.select("seg", "doc_id").distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("seg_df"))
        .filter(F.col("seg_df") >= df_cap)
        .select("seg")
    )
    kept = segs.join(F.broadcast(boiler), "seg", "left_anti")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))), lambda x: x.seg
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.length(F.array_join(ordered, " ")).alias("clean_len"),
            F.md5(F.array_join(ordered, " ")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


def boilerplate_removal_oracle(seg_words: int = 10, df_cap: int = 3) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(w[(i*{seg_words}+1):((i+1)*{seg_words})], ' ') AS seg
  FROM words,
       UNNEST(range(CAST(ceil(len(w) / {seg_words}.0) AS BIGINT))) AS t(i)),
boiler AS (
  SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS seg_df
                   FROM segs GROUP BY seg)
  WHERE seg_df >= {df_cap}),
kept AS (
  SELECT s.* FROM segs s ANTI JOIN boiler b USING (seg)),
clean AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_idx) AS txt
  FROM kept GROUP BY doc_id)
SELECT doc_id, n_kept, length(txt) AS clean_len, md5(txt) AS clean_md5
FROM clean ORDER BY doc_id
"""


def shingle_arrays(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 3) -> DataFrame:
    """Per-document DISTINCT shingle SET as an array column (id, arr, n):
    the compact carrier for candidate-pair verification — joining two
    ~50-element arrays and size(array_intersect(..)) beats re-joining the
    exploded shingle stream twice (the stream is 50x more rows to persist
    and shuffle). Same grams as word_shingles (split behind the Generate
    barrier, array_distinct for set semantics)."""
    from impalatogo_spark.operators import split_words

    words = F.col("__words")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + k + 1)
                                     for k in range(n)]),
    )
    return (
        split_words(df.select(F.col(id_col).alias("id"), F.col(text_col)),
                    text_col=text_col, out="__words")
        .filter(F.size(words) >= n)
        .select("id", F.array_distinct(grams).alias("arr"))
        .withColumn("n", F.size("arr"))
    )


# ---------------------------------------------------------------------------
# k-core peeling over the near-dup pair graph (template/boilerplate mining)
# ---------------------------------------------------------------------------

def kcore_peel(pairs: DataFrame, k: int = 2, rounds: int = 3) -> DataFrame:
    """k-core peeling over an undirected pair graph (Seidman 1983 cores;
    Matula & Beck 1983 peeling): repeatedly drop nodes with degree < k, a
    fixed `rounds` times, then report surviving nodes with their in-core
    degree. On a near-dup pair graph the dense residue is the TEMPLATE /
    boilerplate families (spam farms, mirrored layouts) that per-pair dedup
    under-reports — the standard dense-subgraph curation signal.

    A fixed round count (not a fixpoint loop) keeps the operator a single
    declarative plan the DuckDB oracle unrolls as chained CTEs; each round
    is monotone, so round R is a superset of the true k-core and equals it
    once a round removes nothing (rounds=3 converges on every SF of the
    synthetic corpus — asserted in tests/test_dedup.py).

    Scale shape per round: degree = map-side-combined count over the two
    endpoint projections (shuffle carries (node, partial)), survivors
    filter, then two semi joins back to the edge list — O(E) per round,
    partitionable by node, no all-pairs step. The edge frame is
    LOCAL-CHECKPOINTED each round, not merely persisted: every round
    references e three times (two degree projections + the semi-join
    probe), so without a lineage cut the LOGICAL plan grows ~6^rounds
    copies of the upstream pair-derivation subtree — at 3 rounds over the
    LSH pipeline the plan string overflowed 2^31 chars and OOM'd the
    driver. Same mechanism as connected_components' per-iteration _ckpt."""
    from impalatogo_spark.session import tracked_persist

    e = _ckpt(pairs.select("id_a", "id_b"))
    for _ in range(rounds):
        deg = (
            e.select(F.col("id_a").alias("node"))
            .unionAll(e.select(F.col("id_b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = tracked_persist(deg.filter(F.col("deg") >= k).select("node"))
        e = _ckpt(
            e.join(alive.select(F.col("node").alias("id_a")), "id_a",
                   "left_semi")
            .join(alive.select(F.col("node").alias("id_b")), "id_b",
                  "left_semi")
        )
    final_deg = (
        e.select(F.col("id_a").alias("doc_id"))
        .unionAll(e.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )
    return final_deg.filter(F.col("core_deg") >= k).orderBy("doc_id")


def kcore_oracle(pairs_sql: str, k: int = 2, rounds: int = 3) -> str:
    """DuckDB twin: the peel loop unrolled as chained CTEs (degree -> alive
    -> SEMI-join edge filter per round), same fixed round count. Every
    multiply-referenced CTE is AS MATERIALIZED — DuckDB inlines CTEs by
    default, and inlining e{r} (3 refs/round) re-derives the whole LSH
    pipeline 3^rounds times."""
    steps = []
    for r in range(rounds):
        steps.append(f"""
d{r} AS (SELECT node, count(*) AS deg FROM (
  SELECT id_a AS node FROM e{r} UNION ALL SELECT id_b AS node FROM e{r})
  GROUP BY node),
a{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
e{r + 1} AS MATERIALIZED (
  SELECT e{r}.id_a, e{r}.id_b FROM e{r}
  SEMI JOIN a{r} ON e{r}.id_a = a{r}.node
  SEMI JOIN a{r} AS a{r}b ON e{r}.id_b = a{r}b.node)""")
    return f"""
WITH pairs AS ({pairs_sql}),
e0 AS MATERIALIZED (SELECT id_a, id_b FROM pairs),{",".join(steps)},
dfin AS (SELECT node, count(*) AS deg FROM (
  SELECT id_a AS node FROM e{rounds}
  UNION ALL SELECT id_b AS node FROM e{rounds}) GROUP BY node)
SELECT node AS doc_id, CAST(deg AS BIGINT) AS core_deg
FROM dfin WHERE deg >= {k} ORDER BY doc_id
"""
