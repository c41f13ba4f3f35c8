from cantine_spark.plans.nodes import (  # noqa: F401
    All, Boolean, Boost, DisMax, Phrase, QueryNode, Term,
)
