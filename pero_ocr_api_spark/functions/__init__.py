from pero_ocr_api_spark.functions.html_clean import (  # noqa: F401
    clean_html_col,
    clean_html_py,
    duckdb_clean_html_sql,
)
from pero_ocr_api_spark.functions.text_stats import (  # noqa: F401
    quality_score_col,
    token_count_col,
)
