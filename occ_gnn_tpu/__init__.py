"""occ_gnn_tpu — TPU-native split-parallel GNN training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the OCC-GNN /
GSplit prototype (reference: sandeep06011991/OCC-GNN): binary dataset ingest
with graph partitioning, pipelined host-side neighbor sampling, online
per-minibatch split-parallel slicing into per-chip bipartite subgraphs with
node dedup and feature-cache-aware placement, sparse segment SpMM/SDDMM
message passing (GCN / GraphSAGE / GAT), and cross-chip boundary-activation
shuffle as an ICI all-to-all under ``jax.shard_map``.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):

    train CLI            occ_gnn_tpu.train
    models               occ_gnn_tpu.models.{sage,gcn,gat}
    split-parallel layer occ_gnn_tpu.parallel.split
    padded block ops     occ_gnn_tpu.ops.{blocks,segment}
    sampler + slicer     occ_gnn_tpu.sampling.{neighbor,slicer} (+ C++ csrc/)
    feature cache        occ_gnn_tpu.cache.feature_cache
    dataset layer        occ_gnn_tpu.data.{graph,binary_format,partition,synthetic}
"""

__version__ = "0.1.0"

NUM_PARTITIONS_DEFAULT = 4
