"""End-to-end gradient-based refinement (examples/gradient_refinement.py):
sensor miscalibration recovered by optax THROUGH the full SLAM pipeline —
the optimization-loop counterpart of the pointwise differentiability tests
(the capability the reference paper demos but its repo never shipped)."""

import importlib.util
import os

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "gradient_refinement",
        os.path.join(REPO, "examples", "gradient_refinement.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestGradientRefinement:
    def test_chamfer_recovers_calibration(self):
        # Corruptions: depth scale x1.08, focal x0.94. Recovery means the
        # correction x corruption products approach 1.0.
        mod = _load_module()
        losses, rec_depth, rec_focal = mod.refine(
            H=24, W=32, L=3, steps=25, lr=0.08, verbose=False
        )
        assert losses[-1] < 0.02 * losses[0]
        assert abs(rec_depth - 1.0) < 0.02  # started at 0.08 away
        assert abs(rec_focal - 1.0) < 0.03  # started at 0.06 away

    def test_dense_depth_field_refinement(self):
        # The dense mode: every pixel of every frame gets its own gradient
        # through the fused map; a smooth 2-3% bias field is undone to mm.
        mod = _load_module()
        losses, before, after = mod.refine(
            H=24, W=32, L=3, steps=30, lr=0.01, optimize="depth",
            verbose=False,
        )
        assert losses[-1] < 0.05 * losses[0]
        assert after < 0.2 * before  # ~22 mm MAE -> ~1.6 mm measured

    def test_ate_with_gt_odometry_raises(self):
        # odom='gt' echoes the reference poses, so the ate loss would be
        # identically zero — refuse instead of silently recovering nothing.
        mod = _load_module()
        with pytest.raises(ValueError, match="tracked odometry"):
            mod.refine(H=24, W=32, L=2, steps=1, loss="ate", odometry="gt",
                       verbose=False)

    @pytest.mark.slow
    def test_ate_recovers_calibration_through_gradicp(self):
        # Trajectory loss: gradients flow through every gradLM ICP solve.
        mod = _load_module()
        losses, rec_depth, rec_focal = mod.refine(
            H=24, W=32, L=3, steps=15, lr=0.03, loss="ate",
            odometry="gradicp", verbose=False,
        )
        assert losses[-1] < 0.2 * losses[0]
        assert abs(rec_depth - 1.0) < 0.03
        assert abs(rec_focal - 1.0) < 0.04
