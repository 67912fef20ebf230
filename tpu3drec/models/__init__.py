"""Neural depth models (flax/linen, NHWC, bf16-friendly).

Monodepth2-class self-supervised monocular depth (`models/monodepth.py`)
and PSMNet-class stereo disparity (`models/psmnet.py`), re-designed
TPU-first: NHWC layouts for XLA conv tiling, static shapes, losses built
from vmappable primitives, training steps sharded with pjit over the
(data, space, model) mesh.
"""

from tpu3drec.models.resnet import ResNetEncoder
from tpu3drec.models.depth_decoder import DepthDecoder
from tpu3drec.models.pose_net import PoseNet
from tpu3drec.models.monodepth import (
    MonodepthModel,
    disp_to_depth,
    MonodepthLossConfig,
    monodepth_loss,
)
