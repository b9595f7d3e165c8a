from . import datautils, tumutils
from .base import RGBDSequenceDataset, chunk_sequence
from .icl import ICL
from .scannet import Scannet, get_color_encoding, nyu40_to_scannet20
from .synthetic import SyntheticRGBD, hard_sequence, synthetic_sequence
from .tum import TUM

__all__ = [
    "TUM",
    "ICL",
    "Scannet",
    "SyntheticRGBD",
    "hard_sequence",
    "synthetic_sequence",
    "RGBDSequenceDataset",
    "chunk_sequence",
    "get_color_encoding",
    "nyu40_to_scannet20",
    "datautils",
    "tumutils",
]
