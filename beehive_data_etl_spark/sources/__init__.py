from beehive_data_etl_spark.sources.eventlog import (  # noqa: F401
    BASE_ENVELOPE_SCHEMA,
    EVOLVED_ENVELOPE_SCHEMA,
    generate_event_log,
    tokens_for,
)
