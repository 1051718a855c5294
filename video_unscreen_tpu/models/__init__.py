"""L2 models: flax/linen model families, NHWC, bf16-ready.

TPU-native rebuilds of the five reference model families
(`unscreen/binseg/deeplab`, `unscreen/binseg/human_parse.py`,
`unscreen/stm/model.py`, `unscreen/vmatting/model.py`,
`unscreen/iseg/brs/models/`). Design rules:

- NHWC layout everywhere (XLA TPU native); batch leading.
- Inference uses folded weights: spectral norm becomes `w / sigma` at load
  time, batch norm folds its running stats at call time via
  `use_running_average`.
- All forward passes are pure functions of (params, batch_stats, inputs),
  jittable and `pjit`-shardable; no data-dependent Python control flow.
"""

from .matting_unet import MattingUNet  # noqa: F401
from .resnet import ResNet, BasicBlock, Bottleneck  # noqa: F401
from .deeplab import DeepLabV3Plus, build_deeplab  # noqa: F401
from .human_parse import SCHPHumanParser  # noqa: F401
from .stm import STM  # noqa: F401
from .iseg import DistMapsModel  # noqa: F401
