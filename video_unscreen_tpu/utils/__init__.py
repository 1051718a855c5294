"""Host-side utilities: file/video I/O, visualization, checkpoints.

The thin host shell around the device programs (codec I/O stays on the
host, pipelined so the TPU never starves — SURVEY.md §7).
"""

from .fileio import (read_txt_list, write_txt_list, parallel_read_img,
                     save_img, save_video)  # noqa: F401
from .video import get_frame_count, get_frame_size  # noqa: F401
from .visualize import fuse_fgbg  # noqa: F401
from .checkpoint import save_variables, load_variables  # noqa: F401
