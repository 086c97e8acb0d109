from .mipops import (available, max_filter_rgb_native, pack_planes_native,
                     packbits_decode_range_native, rgb_gray_signal_native)
