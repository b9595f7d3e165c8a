"""Torch-tensor inputs at the structure boundary (migration ergonomics).

The reference is a torch library; its users migrate with torch pipelines in
hand (docs/migration.md). ``jnp`` does not understand torch dtypes, so the
structure constructors coerce torch tensors to host numpy
(structutils.coerce_torch) — numpy/jax inputs pass through untouched.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gradslam_tpu import Pointclouds, RGBDImages
from gradslam_tpu.structures.structutils import coerce_torch


class TestCoerceTorch:
    def test_torch_tensor_to_numpy(self):
        t = torch.arange(6, dtype=torch.float32).reshape(2, 3)
        out = coerce_torch(t)
        assert isinstance(out, np.ndarray)
        np.testing.assert_array_equal(out, t.numpy())

    def test_grad_history_detached(self):
        t = torch.ones(2, 3, requires_grad=True) * 2.0
        out = coerce_torch(t)  # .numpy() on a grad-tracking tensor raises
        np.testing.assert_array_equal(out, 2.0)

    def test_passthrough(self):
        for x in (None, np.zeros(3), jnp.zeros(3), [1.0, 2.0]):
            assert coerce_torch(x) is x


class TestTorchInputs:
    def test_rgbdimages_from_torch(self):
        B, L, H, W = 1, 2, 8, 10
        fr = RGBDImages(
            torch.rand(B, L, H, W, 3),
            torch.rand(B, L, H, W, 1) + 0.5,
            torch.eye(4).expand(B, 1, 4, 4).contiguous(),
            torch.eye(4).expand(B, L, 4, 4).contiguous(),
        )
        assert fr.vertex_map.shape == (B, L, H, W, 3)
        assert np.isfinite(np.asarray(fr.normal_map)).all()
        # with_poses accepts torch too
        fr2 = fr.with_poses(torch.eye(4).expand(B, L, 4, 4).contiguous())
        assert fr2.poses.shape == (B, L, 4, 4)

    def test_rgbdimages_shape_validation_still_fires(self):
        with pytest.raises(ValueError, match="rgb_image"):
            RGBDImages(
                torch.rand(1, 2, 3, 8, 10),  # channels-first without flag
                torch.rand(1, 2, 1, 8, 10),
                torch.eye(4)[None, None],
            )

    def test_pointclouds_from_torch(self):
        pc = Pointclouds(
            points=torch.rand(1, 8, 3),
            num_points=torch.tensor([5], dtype=torch.int32),
            colors=torch.rand(1, 8, 3),
        )
        assert int(pc.num_points[0]) == 5
        moved = pc.offset(jnp.ones(3))  # applies to the 5 valid rows only
        np.testing.assert_allclose(
            np.asarray(moved.points)[0, :5],
            np.asarray(pc.points)[0, :5] + 1.0,
            atol=1e-6,
        )

    def test_pointclouds_from_list_torch(self):
        pc = Pointclouds.from_list([torch.rand(5, 3), torch.rand(3, 3)])
        np.testing.assert_array_equal(np.asarray(pc.num_points), [5, 3])
