from occ_gnn_tpu.sampling.neighbor import NeighborSampler, plan_capacities

__all__ = ["NeighborSampler", "plan_capacities"]
