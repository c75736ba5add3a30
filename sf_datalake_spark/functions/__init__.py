"""Column-level function library (all JVM-side built-ins, no Python UDFs)."""

from sf_datalake_spark.functions.dates import (  # noqa: F401
    month_index,
    month_sequence,
    month_trunc,
    monthly_date_dim,
    spread_over_months,
)
from sf_datalake_spark.functions.numeric import (  # noqa: F401
    clip,
    count_missing_values,
    count_nan_values,
    sigmoid,
)
from sf_datalake_spark.functions.profile import (  # noqa: F401
    check_constraints,
    profile_table,
)
from sf_datalake_spark.functions.text import (  # noqa: F401
    bpe_token_count,
    char_ngrams,
    normalize_text,
    stopword_hits,
    text_fingerprint,
    token_count,
    tokenize,
    word_shingles,
)
from sf_datalake_spark.functions.zorder import (  # noqa: F401
    write_zordered,
    z_value,
)
from sf_datalake_spark.functions.vector import (  # noqa: F401
    array_cosine_similarity,
    array_dot,
    array_norm,
)
