from decnet_tpu.ops.warp import (grid_sample_bilinear, grid_sample_normalized,
                                 warp_by_disparity, warp_volume_by_disparity)
from decnet_tpu.ops.resize import interpolate, downsample_gt, avg_pool
from decnet_tpu.ops.regression import (uniform_disp_samples,
                                       adaptive_disp_samples,
                                       disparity_regression)
from decnet_tpu.ops.cost_volume import build_cost_volume
from decnet_tpu.ops.matching import sparse_matching, sparse_var, matching_moments
from decnet_tpu.ops.detail import detail_masks, wavelet_detail_masks, gaussian_blur
