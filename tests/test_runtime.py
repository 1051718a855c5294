"""Native C++ loader runtime tests (threaded JPEG decode/encode)."""
import os
import tempfile

import cv2
import numpy as np
import pytest

from video_unscreen_tpu import runtime


@pytest.fixture(scope="module")
def jpeg_dir():
    d = tempfile.mkdtemp(prefix="vu_runtime_test_")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = np.zeros((72, 96, 3), np.uint8)
        img[:] = (i * 20, 100, 200 - i * 20)
        img[10:50, 20:70] = rng.randint(0, 255, 3)
        p = os.path.join(d, f"frame_{i:06d}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return d, paths


def test_available():
    assert runtime.available(), "native runtime failed to build"


def test_probe(jpeg_dir):
    _, paths = jpeg_dir
    assert runtime.probe(paths[0]) == (72, 96)


def test_decode_matches_cv2(jpeg_dir):
    _, paths = jpeg_dir
    out = runtime.decode_batch(paths, threads=4)
    assert out.shape == (6, 72, 96, 3)
    for i, p in enumerate(paths):
        ref = cv2.imread(p)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.mean() < 2.0, f"frame {i}: mean diff {diff.mean()}"


def test_decode_with_resize(jpeg_dir):
    _, paths = jpeg_dir
    out = runtime.decode_batch(paths, target_hw=(36, 48), threads=4)
    assert out.shape == (6, 36, 48, 3)
    ref = cv2.resize(cv2.imread(paths[0]), (48, 36))
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert diff.mean() < 4.0


def test_encode_roundtrip(jpeg_dir):
    d, _ = jpeg_dir
    rng = np.random.RandomState(1)
    imgs = np.stack([np.full((40, 50, 3), c, np.uint8)
                     for c in (30, 128, 220)])
    paths = [os.path.join(d, f"enc_{i}.jpg") for i in range(3)]
    failures = runtime.encode_batch(paths, imgs, quality=95, threads=2)
    assert failures == 0
    for i, p in enumerate(paths):
        back = cv2.imread(p)
        assert np.abs(back.astype(int) - imgs[i].astype(int)).mean() < 3.0
