from .io import load_ply, save_ply
from .pointclouds import Pointclouds
from .rgbdimages import RGBDImages
from .structutils import (
    animation_slider,
    animation_updatemenus,
    img_to_b64str,
    list_to_padded,
    numpy_to_plotly_image,
    padded_to_list,
    plotly_image_hovertemplate,
)
from .utils import estimate_normals, pointclouds_from_rgbdimages

__all__ = [
    "Pointclouds",
    "RGBDImages",
    "pointclouds_from_rgbdimages",
    "estimate_normals",
    "list_to_padded",
    "padded_to_list",
    "save_ply",
    "load_ply",
]
