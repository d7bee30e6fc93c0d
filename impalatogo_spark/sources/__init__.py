from impalatogo_spark.sources.external import SyntheticDocsDataSource

__all__ = ["SyntheticDocsDataSource"]
