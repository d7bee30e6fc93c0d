"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — correct at any scale if the query set is
small (broadcast queries x partitioned corpus: embarrassingly parallel, no
shuffle until the final per-query top-k, which TakeOrderedAndProject handles).

Scale path: random-hyperplane LSH bucketing — corpus hashed once (linear
scan), queries probe only their bucket. Hyperplane components are derived
from md5 so the index is deterministic and reproducible across runs/clusters.

All vector math stays JVM-side (zip_with/aggregate on array<double>), no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def with_double_embedding(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Cast array<float> -> array<double> so all arithmetic is double
    precision (matches the oracle's arithmetic; avoids float32 accumulation
    drift)."""
    return df.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    queries: (q_id, q_emb) — small, broadcast; corpus: (vec_id, embedding).
    Ranking uses the ROUNDED similarity with vec_id tie-break so the result
    set is deterministic and oracle-comparable.
    """
    from pyspark.sql import Window as W

    joined = corpus.join(F.broadcast(queries), F.col("q_id") != F.col("vec_id"))
    scored = joined.select(
        "q_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )


def cosine_pairs(corpus: DataFrame, threshold: float) -> DataFrame:
    """All-pairs cosine >= threshold (embedding near-dup detection).
    Exact quadratic form for oracle parity; lsh_buckets() is the scale path.
    """
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("ea"), F.col("eb")), 4).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _plane_component(table_i: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived. Computed driver-side (hashlib) so the per-row expression is
    a plain float literal — the in-expression F.md5(F.lit(...)) variant built
    a 1000+-node tree Catalyst wouldn't fold, costing ~25s/query."""
    import hashlib

    h = hashlib.md5(f"t{table_i}_plane{plane}_dim{dim}".encode()).hexdigest()
    return int(h[:8], 16) / 2147483648.0 - 1.0


def lsh_bucket(emb: Column, n_dims: int, table_i: int = 0,
               n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane LSH bucket id for one hash table:
    bit p = sign(dot(emb, plane_p)). Planes are array literals + zip_with
    folds (compact expression tree; a 64-term add-chain per plane made
    codegen the bottleneck)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(_plane_component(table_i, p, d)) for d in range(n_dims)]
        )
        dot = F.aggregate(
            F.zip_with(emb, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def _with_table_buckets(df: DataFrame, emb_col: str, n_dims: int,
                        n_tables: int, n_planes: int) -> DataFrame:
    """Explode df into (row, table, bucket) — one bucket per hash table.
    Recall/cost trade-off: more tables -> higher recall, more candidates
    (candidate if the pair collides in ANY table)."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col(emb_col), n_dims, t, n_planes).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return df.select("*", F.explode(buckets).alias("tb")).select(
        *df.columns, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, n_dims: int, k: int = 5,
                 n_tables: int = 4, n_planes: int = 4) -> DataFrame:
    """Multi-table hyperplane-LSH ANN top-k: a corpus vector is a candidate
    for a query if they share a bucket in ANY of the n_tables hash tables
    (standard OR-construction — single-probe recall on high-dim data is near
    zero, see tests/test_similarity.py). At 100 TB: corpus hashed once
    (linear, embarrassingly parallel), candidates via bucketed hash join,
    exact rescoring only on candidates."""
    from pyspark.sql import Window as W

    c = _with_table_buckets(corpus, "embedding", n_dims, n_tables, n_planes)
    q = _with_table_buckets(queries, "q_emb", n_dims, n_tables, n_planes)
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "q_emb", "vec_id", "embedding")
        .distinct()
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + per-cell posting lists
# ---------------------------------------------------------------------------

def ivf_index(corpus: DataFrame, n_cells: int = 16, seed: int = 42):
    """Build an IVF index: k-means (MLlib, fixed seed -> deterministic)
    assigns every vector to its nearest centroid cell. Returns
    (assigned_corpus_df_with_cell, centroids_list).

    Scale: the clustering pass is linear and one-off; the index is the
    (cell -> vectors) partitioning. At 100 TB persist the assigned corpus
    bucketed by cell."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = corpus.withColumn("features", array_to_vector("embedding"))
    km = KMeans(k=n_cells, seed=seed, maxIter=20)
    model = km.fit(vecs)
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cell").drop(
        "features"
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_ann_topk(assigned: DataFrame, centroids: list, queries: DataFrame,
                 k: int = 5, n_probe: int = 4) -> DataFrame:
    """IVF search: score each query against the centroids driver-side (tiny),
    probe the n_probe nearest cells, exact-rescore only those posting lists.
    Probing n_probe>1 cells recovers most of the recall a single Voronoi cell
    loses at its boundaries (recall asserted in tests/test_similarity.py)."""
    import math

    from pyspark.sql import Window as W

    q_rows = queries.collect()  # |queries| is small by contract (broadcast side)
    probe_rows = []
    for r in q_rows:
        q_emb = list(r.q_emb)
        qn = math.sqrt(sum(x * x for x in q_emb))
        sims = []
        for cell, c in enumerate(centroids):
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            dot = sum(a * b for a, b in zip(q_emb, c))
            sims.append((dot / (qn * cn), cell))
        for _, cell in sorted(sims, reverse=True)[:n_probe]:
            probe_rows.append((r.q_id, q_emb, cell))
    spark = assigned.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "q_id bigint, q_emb array<double>, cell int"
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )


# ===========================================================================
# Vector aggregation + compression (training-pipeline embedding ops)
# ===========================================================================

def label_centroids(df: DataFrame, emb_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label mean vector in skinny (label, dim, centroid) form.

    Scale shape: posexplode -> groupBy(label, dim) with map-side combine —
    the shuffle carries one partial (sum, count) per (label, dim) per task
    (~640 rows/task here), never the vectors themselves. The wide-array form
    (one row per label) is a cheap F.array of 64 firsts after this; the
    skinny form IS the contract because it aggregates and compares exactly.
    """
    e = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("dim", "v"),
    )
    return (
        e.groupBy("label", "dim")
        .agg(
            F.round(F.avg("v"), 5).alias("centroid"),
            F.count("*").alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


def label_centroids_oracle() -> str:
    return """
WITH e AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings)
SELECT label, dim, round(avg(v), 5) AS centroid, count(*) AS n_vectors
FROM e GROUP BY label, dim ORDER BY label, dim
"""


def quantize_int8(df: DataFrame, emb_col: str = "embedding",
                  id_col: str = "vec_id", label_col: str = "label") -> DataFrame:
    """Scalar int8 quantization with per-dimension global [min, max] ranges:
    q = floor((v - min_d) * 255 / (max_d - min_d)), clamped to [0, 255] —
    the 4x compression step for a 100 TB embedding store (float32 -> uint8).

    floor (not round) keeps the mapping engine-exact: both engines evaluate
    the same IEEE double expression, and floor has no half-way ambiguity.
    Per-vector output is an exact integer signature (dim-weighted sum) plus
    quantized min/max — value-comparable without listing 64 columns.

    Scale shape: pass 1 computes the 64-row range table (map-side-combined
    min/max — fixed-size state); pass 2 broadcasts it back onto the exploded
    vectors. Both shuffles carry O(dims), not O(vectors).
    """
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("dim", "v"),
    )
    ranges = e.groupBy("dim").agg(
        F.min("v").alias("min_v"), F.max("v").alias("max_v")
    )
    q = (
        e.join(F.broadcast(ranges), "dim")
        .withColumn(
            "q",
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("v") - F.col("min_v"))
                        * 255.0
                        / (F.col("max_v") - F.col("min_v"))
                    ),
                ),
            ).cast("long"),
        )
    )
    return (
        q.groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("q") * (F.col("dim") + 1)).alias("q_signature"),
            F.min("q").alias("q_min"),
            F.max("q").alias("q_max"),
        )
        .orderBy("vec_id")
    )


def quantize_int8_oracle() -> str:
    return """
WITH e AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings),
r AS (SELECT dim, min(v) AS min_v, max(v) AS max_v FROM e GROUP BY dim),
q AS (
  SELECT e.vec_id, e.label, e.dim,
         least(255, greatest(0,
           CAST(floor((e.v - r.min_v) * 255.0 / (r.max_v - r.min_v)) AS BIGINT)
         )) AS q
  FROM e JOIN r USING (dim))
SELECT vec_id, label,
       CAST(sum(q * (dim + 1)) AS BIGINT) AS q_signature,
       min(q) AS q_min, max(q) AS q_max
FROM q GROUP BY vec_id, label ORDER BY vec_id
"""
