from technical_test_data_engineer_spark.sources.parquet_source import (  # noqa: F401
    load_table,
    load_tables,
)
from technical_test_data_engineer_spark.sources.catalog import (  # noqa: F401
    table_exists,
    register_star,
)
