"""Device-memory budgeting.

Replaces the reference's ``nvidia-smi`` VRAM query (``robotpose/utils.py:
21-37``) with the accelerator's own memory stats: the lookup depth stack is
sized to a fraction of TPU HBM (``HBM_MEMORY_ALLOWED_FOR_LOOKUP``, the same
10% knob as reference ``constants.py:28``).
"""

from __future__ import annotations

import jax

from ..config import HBM_MEMORY_ALLOWED_FOR_LOOKUP

_DEFAULT_BYTES = 8 << 30  # fallback when the backend reports no stats (CPU)


def device_memory_bytes(device=None) -> int:
    """Total memory of the target device in bytes."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return _DEFAULT_BYTES


def device_memory_bits(device=None) -> int:
    return device_memory_bytes(device) * 8


def lookup_budget_elements(
    element_bits: int = 32, fraction: float = None, n_devices: int = 1
) -> int:
    """Lookup budget in the reference's unit convention.

    The reference expresses ``max_elements`` as a *bit* budget
    (``get_gpu_memory`` returns bits, utils.py:36) and later divides by
    ``crop_size * element_bits`` to get a pose count (lookup.py:270) — the
    same two-step is kept so table sizing matches scale-for-scale on equal
    memory.  With ``n_devices`` > 1 the stack shards over the candidate axis
    and the budget scales accordingly (SURVEY.md §2.9).
    """
    fraction = HBM_MEMORY_ALLOWED_FOR_LOOKUP if fraction is None else fraction
    return int(device_memory_bits() * fraction * n_devices)
