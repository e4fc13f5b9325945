from .census import census_transform
from .color import flow_to_color, luminance, rgb2luv, rgb2yuv, yuv2rgb
from .cost import (
    pack_frame,
    patch_cost,
    patch_cost_candidates,
    patch_cost_planefitting,
    patch_cost_scaled,
)
from .dense import dense_refine_flow, median3, median3_flow, warp_pack
from .match import global_match, match_coarse, patch_descriptors
from .patchmatch import (
    patchmatch,
    patchmatch_planefitting,
    patchmatch_scaled,
    random_init,
)
from .resize import bilinear_resize, gaussian_filter, gaussian_pyramid
from .subpixel import bicubic_resize2x, census_2x, subpixel_refine
from .warp import warp_image_by_flow
