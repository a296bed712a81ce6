from decnet_tpu.nn.layers import (ConvUnit, DeconvUnit, Conv3dUnit,
                                  unfold_nonoverlap, unfold3x3_replicate,
                                  pixel_shuffle, he_fan_out)
from decnet_tpu.nn.feature import FeatureExtractor, ASPP, DeconvBlock
from decnet_tpu.nn.heads import (CostRegNet, DynamicUpsampling, SoftAttention,
                                 Refinement, DetailHead)
