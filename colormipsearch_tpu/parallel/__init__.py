from .mesh import make_pair_mesh
from .sweep import sharded_pixel_sweep, local_pixel_sweep
