from .scores import PixelMatchScore, ShapeMatchScore
from .oracle import PixelMatchOracle, pixel_gap_f64, match_exact_rational
from .factory import (create_pixel_match_engine, create_shape_match_scorer,
                      is_match)
