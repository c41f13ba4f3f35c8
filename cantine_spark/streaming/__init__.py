from cantine_spark.streaming.incremental import StreamingIndexer  # noqa: F401
