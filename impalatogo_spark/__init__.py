"""impalatogo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ImpalaToGo reference (see SURVEY.md).

Not a port: Catalyst/Tungsten is the execution engine; this package is the
SQL-surface / function-library / semantics layer plus large-scale
training-data-pipeline operators (dedup, similarity, text analysis).
"""

from impalatogo_spark.session import get_spark, register_tables, table, TABLES
from impalatogo_spark.queries import all_queries, spark_queries, oracle_map

__all__ = [
    "get_spark",
    "register_tables",
    "table",
    "TABLES",
    "all_queries",
    "spark_queries",
    "oracle_map",
]
