"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal plumbing. These extend the reference's pure
batch-relational surface (SURVEY.md §1.1) with the operations a 100 TB
training-data pipeline needs, built Spark-first (declarative DataFrame ops;
Pandas UDFs only where built-ins can't express the semantics).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_words(df: DataFrame, text_col: str = "text", out: str = "__w",
                keep: tuple[str, ...] | None = None) -> DataFrame:
    """Split `text_col` into a word array MATERIALIZED behind a Generate
    barrier: `explode(array(split(...)))` (a one-row explode) forces the
    array to be computed once per row.

    Why not a plain projection: CollapseProject inlines a projected
    `split()` into downstream higher-order-function lambdas, so the split
    re-evaluates PER ARRAY ELEMENT — O(len^2) per document. Measured 7.6x
    on 3-gram shingling at sf0.1 (3.45s -> 0.45s); a nondeterministic
    column does NOT block the collapse, a Generate node does.
    """
    cols = list(keep) if keep is not None else [c for c in df.columns if c != text_col]
    return df.select(
        *cols, F.explode(F.array(F.split(F.col(text_col), " "))).alias(out)
    )
