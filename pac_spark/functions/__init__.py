from pac_spark.functions.exact import money_sum, money_sum_sql, exact_avg, exact_avg_sql
from pac_spark.functions.normalize import (
    normalize_string,
    normalize_ticker,
    name_parts,
    sanitize_key,
)
from pac_spark.functions.fuzzy import (
    token_sort_key,
    levenshtein_ratio,
    token_sort_ratio,
    weighted_similarity,
)

__all__ = [
    "money_sum",
    "money_sum_sql",
    "exact_avg",
    "exact_avg_sql",
    "normalize_string",
    "normalize_ticker",
    "name_parts",
    "sanitize_key",
    "token_sort_key",
    "levenshtein_ratio",
    "token_sort_ratio",
    "weighted_similarity",
]
