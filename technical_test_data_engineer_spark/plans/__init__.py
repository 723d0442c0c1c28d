from technical_test_data_engineer_spark.plans.star_queries import (  # noqa: F401
    QUERIES,
    ORACLE,
    flagship,
)
