from .checkpoint import load_state, save_state
from .precision import HIGHEST, einsum_hp, matmul_hp
from .profiling import annotate, device_timer, trace

__all__ = [
    "HIGHEST",
    "einsum_hp",
    "matmul_hp",
    "save_state",
    "load_state",
    "annotate",
    "trace",
    "device_timer",
]
