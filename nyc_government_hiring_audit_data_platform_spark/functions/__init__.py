"""Pure Column expression library (no UDFs - everything here stays inside
whole-stage codegen)."""

from nyc_government_hiring_audit_data_platform_spark.functions.text import (  # noqa: F401
    PUNCT_CLASS,
    normalize_text,
    normalize_text_sql,
    tokens,
)
from nyc_government_hiring_audit_data_platform_spark.functions.dates import (  # noqa: F401
    format_posting_ts,
    impute_post_until,
    parse_post_until,
    parse_posting_ts,
    posting_duration_days,
)
from nyc_government_hiring_audit_data_platform_spark.functions.similarity import (  # noqa: F401
    cosine_similarity,
    levenshtein_similarity,
    token_jaccard,
)
