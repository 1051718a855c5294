"""Video probing (`unscreen/utils/video.py`)."""

from __future__ import annotations

import cv2


def get_frame_count(video_path: str) -> int:
    cap = cv2.VideoCapture(video_path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def get_frame_size(video_path: str):
    cap = cv2.VideoCapture(video_path)
    try:
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        return h, w
    finally:
        cap.release()


def get_duration(video_path: str) -> float:
    """Clip duration in seconds (`video.py:38-52` used ffprobe; frame
    count / fps through cv2 avoids the subprocess)."""
    cap = cv2.VideoCapture(video_path)
    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
        frames = cap.get(cv2.CAP_PROP_FRAME_COUNT)
        return float(frames / fps) if fps > 0 else 0.0
    finally:
        cap.release()
