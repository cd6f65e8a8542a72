from occ_gnn_tpu.models.sage import SAGEModel
from occ_gnn_tpu.models.gcn import GCNModel
from occ_gnn_tpu.models.gat import GATModel


def get_model(name: str, in_dim: int, hidden: int, num_classes: int,
              num_layers: int, **kw):
    """Model factory (reference: python/models/factory.py:46-56, generalized
    to gcn|sage|gat instead of the reference's hardcoded DistSAGEModel)."""
    name = name.lower()
    if name in ("sage", "graphsage"):
        return SAGEModel(in_dim, hidden, num_classes, num_layers, **kw)
    if name == "gcn":
        return GCNModel(in_dim, hidden, num_classes, num_layers, **kw)
    if name == "gat":
        return GATModel(in_dim, hidden, num_classes, num_layers, **kw)
    raise ValueError(f"unknown model: {name}")


__all__ = ["SAGEModel", "GCNModel", "GATModel", "get_model"]
