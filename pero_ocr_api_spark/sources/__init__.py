from pero_ocr_api_spark.sources.tables import (  # noqa: F401
    DOCUMENTS_SCHEMA,
    EXTRACTED_SCHEMA,
    LINEAGE_SCHEMA,
    MEDIA_SCHEMA,
    SPAN_STRUCT,
    load_testdata,
    read_table,
)
