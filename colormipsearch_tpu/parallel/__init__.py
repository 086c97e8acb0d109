from .mesh import make_pair_mesh
from .sweep import (local_pixel_sweep, merge_topk, sharded_pixel_sweep,
                    sharded_pixel_sweep_topk, sharded_shape_scores)
from .multihost import (distribute, global_pair_mesh,
                        maybe_init_distributed, process_block)
