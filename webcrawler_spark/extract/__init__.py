from webcrawler_spark.extract.extractor import (  # noqa: F401
    PageData,
    extract_page,
    gate_and_extract,
    parse_rfc3339,
)
