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
