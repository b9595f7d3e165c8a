from .knn import knn_points, nn_points
from .knn_pallas import nn_points_pallas

_KNN_BACKEND = "xla"


def set_knn_backend(backend: str):
    """Select the 1-NN implementation: 'xla' (lax.scan streaming, default,
    works on every backend) or 'pallas' (fused TPU kernel; target set must
    fit VMEM)."""
    global _KNN_BACKEND
    if backend not in ("xla", "pallas"):
        raise ValueError(f"Unknown knn backend: {backend}")
    _KNN_BACKEND = backend


def get_knn_backend() -> str:
    return _KNN_BACKEND


def nn_points_auto(src, tgt, tgt_mask=None):
    """Dispatch 1-NN to the selected backend."""
    if _KNN_BACKEND == "pallas":
        import jax

        d, i = nn_points_pallas(src, tgt, tgt_mask)
        # association indices/distances are non-differentiable plumbing
        return jax.lax.stop_gradient(d), i
    return nn_points(src, tgt, tgt_mask)


__all__ = [
    "nn_points",
    "knn_points",
    "nn_points_pallas",
    "nn_points_auto",
    "set_knn_backend",
    "get_knn_backend",
]
