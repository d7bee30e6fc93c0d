from impalatogo_spark.sources.external import SyntheticDocsDataSource
from impalatogo_spark.sources.avro import read_avro, write_container
from impalatogo_spark.sources.seqfile import read_sequencefile, write_seqfile

__all__ = [
    "SyntheticDocsDataSource",
    "read_avro",
    "write_container",
    "read_sequencefile",
    "write_seqfile",
]
