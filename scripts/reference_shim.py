"""Make the reference gradslam (at /root/reference) importable on this machine.

The reference hard-depends on two packages absent here:
- ``kornia`` — only ``compose_transformations`` / ``inverse_transformation``
  are used (SURVEY §2.4); shimmed with ~10 lines of torch.
- ``chamferdist`` — CUDA KNN; shimmed with a brute-force torch.cdist 1-NN
  (slow but exact), sufficient for CPU baseline measurement and parity checks.
- ``open3d`` — import hack at gradslam/__init__.py:1-2; shimmed as a no-op.

Usage: ``import reference_shim; gradslam = reference_shim.load_reference()``.
"""

import sys
import types


def _install_kornia():
    import torch

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    linalg = types.ModuleType("kornia.geometry.linalg")

    def compose_transformations(trans_01, trans_12):
        return torch.matmul(trans_01, trans_12)

    def inverse_transformation(trans):
        rmat = trans[..., :3, :3]
        tvec = trans[..., :3, 3]
        rmat_t = rmat.transpose(-1, -2)
        tinv = torch.zeros_like(trans)
        tinv[..., :3, :3] = rmat_t
        tinv[..., :3, 3] = -torch.matmul(rmat_t, tvec.unsqueeze(-1)).squeeze(-1)
        tinv[..., 3, 3] = 1.0
        return tinv

    linalg.compose_transformations = compose_transformations
    linalg.inverse_transformation = inverse_transformation
    geometry.linalg = linalg
    kornia.geometry = geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.linalg"] = linalg


def _install_chamferdist():
    import torch

    chamferdist = types.ModuleType("chamferdist")
    chamfer = types.ModuleType("chamferdist.chamfer")

    class _KNNResult:
        def __init__(self, dists, idx):
            self.dists = dists
            self.idx = idx

    def knn_points(src, tgt):
        # (1, N, 3) x (1, M, 3) -> squared dists/idx (1, N, 1)
        d = torch.cdist(src, tgt) ** 2
        dists, idx = d.min(dim=-1)
        return _KNNResult(dists.unsqueeze(-1), idx.unsqueeze(-1))

    chamfer.knn_points = knn_points
    chamferdist.chamfer = chamfer
    sys.modules["chamferdist"] = chamferdist
    sys.modules["chamferdist.chamfer"] = chamfer


def _install_open3d():
    sys.modules.setdefault("open3d", types.ModuleType("open3d"))


def _install_plotly():
    """Viz-only dep of the reference structures modules."""
    plotly = types.ModuleType("plotly")
    go = types.ModuleType("plotly.graph_objects")
    subplots = types.ModuleType("plotly.subplots")

    class _Stub:
        def __init__(self, *a, **k):
            pass

    for name in ("Figure", "Scatter3d", "Image", "Frame", "Layout"):
        setattr(go, name, _Stub)
    subplots.make_subplots = _Stub
    plotly.graph_objects = go
    plotly.subplots = subplots
    sys.modules.setdefault("plotly", plotly)
    sys.modules.setdefault("plotly.graph_objects", go)
    sys.modules.setdefault("plotly.subplots", subplots)


def load_reference():
    _install_kornia()
    _install_chamferdist()
    _install_open3d()
    _install_plotly()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import gradslam

    return gradslam
