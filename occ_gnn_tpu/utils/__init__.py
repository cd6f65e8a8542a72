from occ_gnn_tpu.utils.timers import PhaseTimers

__all__ = ["PhaseTimers"]
