from webcrawler_spark.functions.textnorm import (  # noqa: F401
    GO_SPACE_CHARS,
    go_fields,
    go_trim_space,
    normalize_text,
    tokenize,
)
