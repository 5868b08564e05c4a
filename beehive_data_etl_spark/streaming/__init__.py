from beehive_data_etl_spark.streaming.replay import (  # noqa: F401
    replay_incremental,
    replay_stream,
)
