from cantine_spark.build.builder import IndexBuilder, build_index  # noqa: F401
