from alligator_spark.functions.textnorm import (  # noqa: F401
    clean_str_col,
    token_sort_key_col,
    tokens_col,
)
