"""Synthetic data generators: person figures, eval clips, human batches."""
import numpy as np

from video_unscreen_tpu.parallel.data_synth import (draw_person,
                                                    make_eval_clip,
                                                    make_nongreen_clip)
from video_unscreen_tpu.parallel.train_human import make_human_batch


def test_draw_person_parts():
    rng = np.random.RandomState(0)
    img, parts = draw_person(rng, 192, 192)
    present = set(np.unique(parts))
    # background + at least head/torso/limb classes
    assert 0 in present
    assert {2, 5, 13}.issubset(present), present
    assert parts.max() < 20
    frac = (parts > 0).mean()
    assert 0.02 < frac < 0.5, frac
    assert img.shape == (192, 192, 3) and img.dtype == np.float32


def test_draw_person_avoid_green():
    """Green-screen eval clips must not dress the person in green."""
    for seed in range(8):
        rng = np.random.RandomState(seed)
        img, parts = draw_person(rng, 96, 96, avoid_green=True)
        for cls in (5, 9):  # upper clothes, pants
            sel = parts == cls
            if sel.sum() == 0:
                continue
            mean_bgr = img[sel].mean(0)
            assert mean_bgr[1] < mean_bgr.max() + 1e-6
            # green never dominates by a margin
            assert not (mean_bgr[1] > mean_bgr[0] + 0.05
                        and mean_bgr[1] > mean_bgr[2] + 0.05), (seed, mean_bgr)


def test_eval_clip_soft_and_moving():
    frames, gts = make_eval_clip("natural", n=4, h=96, w=160, seed=7, ss=4)
    assert len(frames) == 4 and frames[0].shape == (96, 160, 3)
    a = gts[0].astype(np.float32) / 255.0
    # supersampled rendering leaves a soft band
    assert ((a > 0.05) & (a < 0.95)).mean() > 0.001
    # the person moves between first and last frame
    assert (np.abs(gts[0].astype(int) - gts[-1].astype(int)) > 64).mean() \
        > 0.002
    # deterministic
    frames2, gts2 = make_eval_clip("natural", n=4, h=96, w=160, seed=7, ss=4)
    assert np.array_equal(frames[0], frames2[0])
    assert np.array_equal(gts[-1], gts2[-1])


def test_nongreen_clip_coherent():
    frames, gts, parts = make_nongreen_clip(n=3, h=96, w=128, seed=1)
    # same person geometry, translated
    assert np.array_equal(np.roll(gts[0], 2, axis=1), gts[1])
    assert (gts[0] > 0).mean() > 0.02


def test_make_human_batch_contract():
    rng = np.random.RandomState(0)
    b = make_human_batch(rng, 2, (64, 64))
    assert b["img"].shape == (2, 64, 64, 3)
    assert b["label"].shape == (2, 16, 16)
    assert b["label"].max() < 20 and b["label"].min() >= 0
    bu = make_human_batch(rng, 2, (64, 64), raw_uint8=True)
    assert bu["img"].dtype == np.uint8


def test_multishot_clip_has_hard_cut():
    from video_unscreen_tpu.parallel.data_synth import make_multishot_clip
    frames, masks, cuts = make_multishot_clip(n_shots=2, frames_per_shot=5)
    assert len(frames) == 10 and len(masks) == 10 and cuts == [5]
    # hard cut: consecutive frames across the cut differ much more than
    # consecutive frames within a shot
    def d(a, b):
        return np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()
    within = d(frames[3], frames[4])
    across = d(frames[4], frames[5])
    assert across > 3 * within, (within, across)
    # masks are binary and non-empty in every frame
    for m in masks:
        assert set(np.unique(m)).issubset({0, 255}) and (m > 0).any()
