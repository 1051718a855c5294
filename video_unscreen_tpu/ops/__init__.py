"""L1 tensor ops: pure, shape-static, jittable functions.

Conventions (shared across the framework):
- Images are float32 (or bfloat16 inside nets) arrays in **0..255 scale**,
  channel order **BGR** at API boundaries, layout (H, W, C) or (H, W).
  This preserves the uint8 semantics of the reference pipeline while staying
  device-friendly.
- Masks / alphas are (H, W) float32 in 0..255; trimaps use {0, 128, 255}.
- All functions are pure and jittable; anything data-dependent in *shape*
  (target sizes, crop grids) is resolved on the host and passed as static
  Python ints.
"""

from .geometry import (  # noqa: F401
    get_target_size,
    resize,
    pad_resize,
    inv_pad_resize,
    imnormalize,
    affine_warp,
    get_affine_params,
    remove_blackborder,
    add_blackborder,
)
from .color import (  # noqa: F401
    bgr2gray,
    bgr2rgb,
    bgr2hsv,
    hsv2bgr,
    bgr2lab,
)
from .morphology import (  # noqa: F401
    ellipse_kernel,
    dilate,
    erode,
    box_filter,
    morph_open,
    morph_close,
    get_outer_boundary,
)
from .compositing import (  # noqa: F401
    is_pixel_inrange,
    get_fg,
    get_bg,
    get_fg_naive,
    get_fg_with_colorremove,
    get_mask,
    get_fgbox,
    composite_fgbg,
    color_correct,
    exist_foreground,
)
from .chroma import chroma_segment, estimate_screen_color_hsv  # noqa: F401
from .connected import (  # noqa: F401
    connected_components,
    remove_invalid_objects,
    score_map as build_score_map,
)
from .regionfill import regionfill  # noqa: F401
from .metrics import miou, sad, mse, gradient_error, connectivity_error  # noqa: F401
from .trimap import generate_trimap, generate_trimap_withbg  # noqa: F401
from .gmm import gmm_fit_em, gmm_pdf, GMMParams  # noqa: F401
