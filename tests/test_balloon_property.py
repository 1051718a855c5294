"""Property test for the STM balloon-fallback threshold (VERDICT r4
weak #8: `balloon_ratio: 1.6` was chosen on one synthetic clip family
with no sensitivity bound).

The heuristic flags a tracked mask whose area exceeds `balloon_ratio` x
the previous frame's alpha area (`FusedBgPipeline._ballooned`) — the
distractor-latch signature. Its failure mode is a FALSE positive on
legitimate growth (subject approaching the camera). This test measures
the per-frame area dynamics of realistic growth clips and of the latch
signature, and asserts the shipped 1.6 sits inside the safe window with
margin on both sides:

  - a walking-pace approach (+5% scale/frame with gait-swing area
    variance) stays >= 20% below the threshold; a FAST approach
    (+12%/frame, area x2.5 over the clip) measures 1.41 peak — still
    under 1.6 but the documented edge of the safe window;
  - absorbing the occluder pillar (the smallest pillar data_synth
    renders: 5% of frame width, full height) jumps area past it in one
    step.

Growth faster than a fast approach (a door swinging open, a cape
unfurling) can false-positive — the cost is one extra seed frame for
that frame, not a failure mode.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from video_unscreen_tpu.parallel.data_synth import render_soft_person


def _area(mask):
    return float((mask >= 128).sum())


def _growth_areas(scale_rate, n=8, h=162, w=288):
    rng = np.random.RandomState(7)
    state = rng.get_state()
    areas = []
    for t in range(n):
        rng.set_state(state)  # same body, same pose arc as a real clip
        _, alpha = render_soft_person(rng, h, w, ss=2,
                                      scale=0.35 * (1 + scale_rate) ** t,
                                      phase=2.0 * np.pi * t / 8.0,
                                      cx_frac=0.5)
        areas.append(_area(alpha * 255.0))
    return areas


def test_balloon_threshold_window():
    # legitimate growth at walking pace: +5% scale/frame (~10% area)
    # compounded with the limb-swing area variance of a real gait
    areas = _growth_areas(0.05)
    growth_ratios = [areas[t + 1] / max(areas[t], 1.0)
                     for t in range(len(areas) - 1)]
    max_growth = max(growth_ratios)

    # boundary documentation: a FAST approach (+12% scale/frame, area
    # x2.5 over the clip) peaks at ~1.41 — still below 1.6, but with
    # under 15% margin; growth faster than that (a door swinging open,
    # a cape unfurling) can false-positive, which costs one extra seed
    # frame, not a failure
    fast = _growth_areas(0.12)
    fast_max = max(fast[t + 1] / max(fast[t], 1.0)
                   for t in range(len(fast) - 1))
    assert fast_max < 1.6, fast_max

    # latch signature: the person mask absorbs the SMALLEST pillar the
    # occluder variant renders (5% of width, full height) in one step
    h, w = 162, 288
    rng = np.random.RandomState(7)
    _, alpha = render_soft_person(rng, h, w, ss=2, scale=0.55,
                                  phase=0.0, cx_frac=0.5)
    person = (alpha * 255.0 >= 128)
    pillar = np.zeros((h, w), bool)
    px0 = int(w * 0.5)
    pillar[:, px0:px0 + int(w * 0.05)] = True
    min_latch = float((person | pillar).sum()) / max(float(person.sum()), 1)

    # the window must exist and 1.6 must sit inside it with >=20% margin
    assert max_growth * 1.2 < 1.6, (max_growth, growth_ratios)
    assert 1.6 * 1.2 < min_latch, min_latch


def test_ballooned_flags_latch_not_growth():
    """Integration: `_ballooned` on the same mask dynamics."""
    from video_unscreen_tpu.pipeline.fused_bg import FusedBgPipeline
    from tests.test_pipeline_bg import BG_TEST_CFG

    cfg = dict(BG_TEST_CFG)
    cfg["stm"] = dict(cfg["stm"], balloon_ratio=1.6)
    pipe = FusedBgPipeline(cfg, (96, 128), work_long_side=128,
                           use_stm_tracking=False)

    h, w = 162, 288
    rng = np.random.RandomState(7)
    state = rng.get_state()
    rng.set_state(state)
    _, a0 = render_soft_person(rng, h, w, ss=2, scale=0.45, phase=0.0,
                               cx_frac=0.5)
    rng.set_state(state)
    _, a1 = render_soft_person(rng, h, w, ss=2, scale=0.45 * 1.12,
                               phase=2.0 * np.pi / 8.0, cx_frac=0.5)
    prev = jnp.asarray(a0 * 255.0)
    grown = jnp.asarray(a1 * 255.0)
    assert not bool(pipe._ballooned(grown, prev))

    latched = np.asarray(a1 * 255.0).copy()
    latched[:, w // 2:w // 2 + int(w * 0.05)] = 255.0
    assert bool(pipe._ballooned(jnp.asarray(latched), prev))
