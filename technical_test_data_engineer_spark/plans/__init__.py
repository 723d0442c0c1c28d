"""Query registry: importing this package registers every query module
into ``star_queries.QUERIES`` / ``star_queries.ORACLE``."""

from technical_test_data_engineer_spark.plans.star_queries import (  # noqa: F401
    ORACLE,
    QUERIES,
    flagship,
)
from technical_test_data_engineer_spark.plans import (  # noqa: F401
    dedup_queries,
    multimodal_queries,
    parity_queries,
    relational_breadth_queries,
    similarity_queries,
    streaming_queries,
    text_queries,
    tpch_queries,
    window_queries,
)
