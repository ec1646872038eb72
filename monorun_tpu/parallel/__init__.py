from .gather import allgather_results, dataset_shard  # noqa: F401
from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
