from cantine_spark.queryparser.parser import QueryParser  # noqa: F401
from cantine_spark.queryparser.raw import RawQuery, parse_query  # noqa: F401
