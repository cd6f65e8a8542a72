from occ_gnn_tpu.cache.autosize import (
    auto_cache_percentage,
    hbm_budget_bytes,
    resolve_cache_percentage,
)
from occ_gnn_tpu.cache.feature_cache import CachePlan, SplitFeatureCache, SingleChipCache

__all__ = [
    "CachePlan",
    "SplitFeatureCache",
    "SingleChipCache",
    "auto_cache_percentage",
    "hbm_budget_bytes",
    "resolve_cache_percentage",
]
