from .checkpoint import load_state, save_state
from .cli import enable_compile_cache, parse_pyramid
from .precision import HIGHEST, einsum_hp, matmul_hp
from .profiling import annotate, device_timer, trace
from .trajectory_io import load_trajectory_tum, save_trajectory_tum

__all__ = [
    "HIGHEST",
    "einsum_hp",
    "matmul_hp",
    "save_state",
    "load_state",
    "enable_compile_cache",
    "parse_pyramid",
    "annotate",
    "trace",
    "device_timer",
    "save_trajectory_tum",
    "load_trajectory_tum",
]
