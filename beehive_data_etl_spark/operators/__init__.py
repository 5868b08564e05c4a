from beehive_data_etl_spark.operators.lww import lww_dedup  # noqa: F401
from beehive_data_etl_spark.operators.schema_evolution import (  # noqa: F401
    align_to_schema,
    evolve_schema,
)
