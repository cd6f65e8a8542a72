from occ_gnn_tpu.cache.feature_cache import CachePlan, SplitFeatureCache, SingleChipCache

__all__ = ["CachePlan", "SplitFeatureCache", "SingleChipCache"]
