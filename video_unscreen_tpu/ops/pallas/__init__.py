"""Pallas TPU kernels for the hot ops.

Currently: the STM memory-read attention (`attention.py`) — a flash-style
masked cross-attention that never materializes the (THW x HW) score
matrix the reference builds with bmm (`unscreen/stm/model.py:141-148`).
"""

from .attention import masked_memory_attention  # noqa: F401
