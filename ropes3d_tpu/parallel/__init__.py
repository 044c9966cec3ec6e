"""Device parallelism: mesh construction, shardings, memory budgets."""

from .memory import device_memory_bytes, lookup_budget_elements
from .mesh import get_mesh, shard_batch

__all__ = [
    "device_memory_bytes",
    "lookup_budget_elements",
    "get_mesh",
    "shard_batch",
]
