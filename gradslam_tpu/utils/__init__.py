from .precision import HIGHEST, einsum_hp, matmul_hp

__all__ = ["HIGHEST", "einsum_hp", "matmul_hp"]
