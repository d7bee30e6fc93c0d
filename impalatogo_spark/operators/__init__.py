"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal plumbing. These extend the reference's pure
batch-relational surface (SURVEY.md §1.1) with the operations a 100 TB
training-data pipeline needs, built Spark-first (declarative DataFrame ops;
Pandas UDFs only where built-ins can't express the semantics).
"""
