"""Operator surface: DataFrame-in / DataFrame-out building blocks."""

from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    simhash,
)
from .governance import (  # noqa: F401
    apply_takedown,
    decontaminate,
    stratified_sample,
)
from .merge import collapse_duplicates, upsert  # noqa: F401
from .multimodal import attach_payload, extract_features  # noqa: F401
from .quality import check, expect_in_range, expect_not_null  # noqa: F401
from .scale import salted_join, two_phase_agg, write_bucketed  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    ivf_train_centroids,
    srp_topk,
)
from .text import (  # noqa: F401
    lang_id,
    quality_features,
    shingles,
    tokens,
    winnowing_fingerprints,
)
from .weather import daily_rollup, flatten_hourly, read_bronze  # noqa: F401
