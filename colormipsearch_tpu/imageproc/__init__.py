from .io import ImageKind, Image, load_image, image_from_array
from .regions import label_regions_mask, no_regions_mask
