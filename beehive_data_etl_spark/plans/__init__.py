from beehive_data_etl_spark.plans.queries import ORACLES, QUERIES  # noqa: F401
