"""DataFrame-level operators (compositions of built-in Spark ops)."""

from sf_datalake_spark.operators.aggregates import aggregate_by_keys  # noqa: F401
from sf_datalake_spark.operators.asof import merge_asof  # noqa: F401
from sf_datalake_spark.operators.components import (  # noqa: F401
    connected_components,
    dedup_clusters,
)
from sf_datalake_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from sf_datalake_spark.operators.intervals import (  # noqa: F401
    sessionize,
    union_intervals,
    with_interval_ids,
)
from sf_datalake_spark.operators.merge import (  # noqa: F401
    merge_upsert,
    scd2_apply,
)
from sf_datalake_spark.operators.resample import resample_classes  # noqa: F401
from sf_datalake_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    brute_force_topk_np,
    embedding_near_dup_pairs,
    hyperplane_buckets_np,
    ivf_topk,
    lsh_topk,
    sharded_topk_np,
)
from sf_datalake_spark.operators.skew import salted_aggregate, salted_join  # noqa: F401
from sf_datalake_spark.operators.split import (  # noqa: F401
    hash_bucket,
    hash_split,
    train_test_split_grouped,
)
from sf_datalake_spark.operators.windows import (  # noqa: F401
    dedup_by_rank,
    with_bfill,
    with_diff,
    with_ewma,
    with_ffill,
    with_lag,
    with_linear_interpolation,
    with_moving_average,
)
