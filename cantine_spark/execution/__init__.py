from cantine_spark.execution.executor import SearchExecutor  # noqa: F401
