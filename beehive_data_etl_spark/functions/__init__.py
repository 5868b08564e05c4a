from beehive_data_etl_spark.functions.hashing import portable_hash32  # noqa: F401
from beehive_data_etl_spark.functions.text import (  # noqa: F401
    clean_text_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)
