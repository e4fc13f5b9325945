from .census import census_transform
from .color import flow_to_color, luminance
from .cost import (
    pack_frame,
    patch_cost,
    patch_cost_candidates,
    patch_cost_planefitting,
)
from .patchmatch import patchmatch, random_init
from .resize import bilinear_resize, gaussian_filter, gaussian_pyramid
