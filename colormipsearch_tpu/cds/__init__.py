from .scores import PixelMatchScore, ShapeMatchScore
from .oracle import PixelMatchOracle, pixel_gap_f64
