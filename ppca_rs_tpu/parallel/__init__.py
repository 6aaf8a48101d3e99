from .mesh import DATA_AXIS, MODEL_AXIS, dataset_mesh, make_mesh, shard_dataset
from .api import fns_for

__all__ = ["DATA_AXIS", "MODEL_AXIS", "dataset_mesh", "make_mesh", "shard_dataset", "fns_for"]
