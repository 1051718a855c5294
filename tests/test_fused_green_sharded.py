"""Frame-parallel (multi-chip) fused green over the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.pipeline.fused_green import FusedGreenPipeline
from tests.test_pipeline_green import TEST_CFG, make_clip


def test_segments_match_sequential():
    frames, _ = make_clip(n=8)
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128,
                              fetch_fg="device")
    # 4 segments x 2 frames over the data axis (4 data devices)
    mesh = make_mesh(8)  # (data=4, model=2)
    segs = jnp.asarray(np.stack(frames).reshape(4, 2, h, w, 3))
    packed_par, bg_par = pipe.process_segments(mesh, segs)
    assert packed_par.shape[:2] == (4, 2)

    # sequential reference: each segment scanned independently
    for s in range(4):
        _, (packed_seq, bg_seq) = pipe.process_chunk(
            pipe.init_carry(), segs[s])
        np.testing.assert_allclose(np.asarray(packed_par[s]),
                                   np.asarray(packed_seq), atol=1)
        np.testing.assert_allclose(np.asarray(bg_par[s]),
                                   np.asarray(bg_seq), atol=1e-2)
