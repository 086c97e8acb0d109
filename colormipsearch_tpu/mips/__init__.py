from .loader import NeuronMIP, load_compute_file, load_image_from_filedata, MIPsCache
