from impalatogo_spark.sources.external import SyntheticDocsDataSource
from impalatogo_spark.sources.avro import read_avro, write_container

__all__ = ["SyntheticDocsDataSource", "read_avro", "write_container"]
