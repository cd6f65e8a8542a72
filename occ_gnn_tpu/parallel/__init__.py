from occ_gnn_tpu.parallel.split import SplitLayer, SplitBatch, make_mesh

__all__ = ["SplitLayer", "SplitBatch", "make_mesh"]
