"""Viz helper tests — the plotly-free parts of the frame-animation viewer
(plotly itself is an optional dep and absent in CI; the figure assembly is a
thin lazy-imported wrapper around these)."""

import numpy as np
import pytest

from gradslam_tpu.structures import (
    animation_slider,
    animation_updatemenus,
    img_to_b64str,
    plotly_image_hovertemplate,
)


class TestImgToB64Str:
    def test_roundtrip_prefix_and_decodes(self):
        import base64

        import cv2

        rng = np.random.RandomState(0)
        img = (rng.rand(16, 24, 3) * 255).astype(np.uint8)
        s = img_to_b64str(img, quality=95)
        assert s.startswith("data:image/jpeg;base64,")
        raw = base64.b64decode(s.split(",", 1)[1])
        dec = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
        assert dec.shape == (16, 24, 3)

    def test_greyscale(self):
        img = np.zeros((8, 8), np.uint8)
        assert img_to_b64str(img).startswith("data:image/jpeg;base64,")


class TestHovertemplate:
    """Exact reference strings (structutils.py:141-151)."""

    def test_color(self):
        assert plotly_image_hovertemplate(False) == (
            "x: %{x}<br>y: %{y}<br>color: [%{z[0]}, %{z[1]}, %{z[2]}]"
            "<extra></extra>"
        )

    def test_depth_with_scale(self):
        assert plotly_image_hovertemplate(True, scale=10.0) == (
            "x: %{x}<br>y: %{y}<br>depth: %{z[0]}<br>scale: x10<br>"
            "<extra></extra>"
        )


class TestAnimationLayout:
    """Slider/buttons dict structure (reference rgbdimages.py:840-881)."""

    def test_slider(self):
        (s,) = animation_slider(5)
        assert len(s["steps"]) == 5
        assert s["steps"][3]["label"] == 3
        assert s["steps"][3]["args"][0] == [3]
        assert s["steps"][0]["method"] == "animate"
        assert s["currentvalue"]["prefix"] == "Frame: "

    def test_updatemenus(self):
        (m,) = animation_updatemenus(50)
        play, stop = m["buttons"]
        assert play["label"] == "&#9654;"
        assert play["args"][1]["frame"]["duration"] == 50
        assert stop["args"][0] == [None]
        assert m["type"] == "buttons"


class TestPlotlyMethodsRequirePlotly:
    """Without plotly installed the viewers must fail with ImportError at
    call time, not at import time (lazy imports)."""

    def test_rgbdimages_plotly_lazy(self):
        import jax.numpy as jnp

        from gradslam_tpu import RGBDImages

        pytest.importorskip  # (not skipping — asserting the lazy failure)
        try:
            import plotly  # noqa: F401

            pytest.skip("plotly installed; lazy-import failure not testable")
        except ImportError:
            pass
        fr = RGBDImages(
            jnp.zeros((1, 2, 4, 4, 3)),
            jnp.ones((1, 2, 4, 4, 1)),
            jnp.eye(4)[None, None],
            jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        )
        with pytest.raises(ImportError):
            fr.plotly(0)
        with pytest.raises(TypeError):
            fr.plotly("0")
