"""L3 agents: pipeline stages with the reference agent contract.

Each agent mirrors the constructor/forward surface of its counterpart in
AnyiRao/video_unscreen (`unscreen/<stage>/agent.py`) but is a thin host
shell around jitted device programs: `__init__` resolves config and builds
parameters; `forward` takes/returns numpy uint8-scale arrays for API parity
while the math runs on TPU. The pipeline drivers additionally use the
agents' `device_*` methods to keep tensors resident across stages.
"""

from .colorfiltering import ColorFilteringAgent  # noqa: F401
from .trimap import TrimapAgent  # noqa: F401
from .bgmodel import BackgroundAgent  # noqa: F401
from .harmonization import HarmonizationAgent  # noqa: F401
from .binseg import SegAgent, HumanSegAgent, ChromaSegAgent  # noqa: F401
from .vmatting import VMattingAgent  # noqa: F401
from .stm import STMAgent  # noqa: F401
from .iseg import ISegAgent  # noqa: F401
