from fresco_tpu.ops.warp import (
    coords_grid,
    bilinear_sample,
    flow_warp,
    forward_backward_consistency,
)
from fresco_tpu.ops.resize import resize_bilinear, max_pool2d
from fresco_tpu.ops.adain import calc_mean_std, adain
from fresco_tpu.ops.morphology import dilate
from fresco_tpu.ops.image import (
    uint8_to_unit_range,
    unit_range_to_uint8,
    resolution_to_64,
)
