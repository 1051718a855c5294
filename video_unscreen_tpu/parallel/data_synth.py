"""Synthetic matting training data.

The reference ships pretrained weights and no training pipeline; this
framework trains its own matting net. Each sample is a composite of a
soft-edged foreground over a textured background with the exact input
contract of the green/bg pipelines: normalized RGB + previous-frame alpha
+ one-hot trimap, supervised by the GT alpha (loss lives on the unknown
band, `parallel/train.py`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import cv2
import numpy as np


def _smooth_noise(rng, h, w, scale=8):
    small = rng.rand(max(h // scale, 1), max(w // scale, 1), 3)
    return cv2.resize(small.astype(np.float32), (w, h),
                      interpolation=cv2.INTER_CUBIC).clip(0, 1)


def _random_alpha(rng, h, w):
    """Union of random ellipses, gaussian-soft edges."""
    alpha = np.zeros((h, w), np.float32)
    for _ in range(rng.randint(1, 4)):
        cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(
            w // 4, 3 * w // 4)
        ay, ax = rng.randint(h // 8, h // 3), rng.randint(w // 8, w // 3)
        ang = rng.randint(0, 180)
        cv2.ellipse(alpha, (cx, cy), (ax, ay), ang, 0, 360, 1.0, -1)
    k = rng.choice([3, 5, 7])
    return cv2.GaussianBlur(alpha, (k, k), 0).clip(0, 1)


# LIP part classes used by the synthetic person generator (subset of the
# 20 SCHP-LIP classes, `unscreen/binseg/human_parse.py` head): any class
# > 0 is "person" for the HumanSegAgent's argmax>0 binarization
# (`unscreen/binseg/agent_human.py:304-305`).
LIP_HAIR, LIP_UPPER, LIP_PANTS, LIP_FACE = 2, 5, 9, 13
LIP_ARM_L, LIP_ARM_R, LIP_LEG_L, LIP_LEG_R = 14, 15, 16, 17
LIP_SHOE_L, LIP_SHOE_R = 18, 19


def draw_person(rng: np.random.RandomState, h: int, w: int,
                scale: float = None, phase: float = None,
                cx_frac: float = None, hair_strands: bool = False,
                avoid_green: bool = False):
    """Articulated person-shaped figure with LIP part labels.

    Returns (img (h,w,3) float32 BGR 0..1, parts (h,w) int32 LIP classes).
    Head+hair, torso, two arms, pants+lower legs, shoes — each part its
    own class and color, slight pose jitter, so the parser learns person
    shape rather than a single blob.

    `phase` (radians) drives a deterministic walking swing of the limbs
    (for temporally coherent clips); `cx_frac` pins the horizontal body
    center; `hair_strands` adds thin polyline hair wisps off the head cap
    (rendered hi-res + downsampled by the eval-clip makers, these become
    the soft sub-pixel boundaries matting metrics care about).
    """
    parts = np.zeros((h, w), np.int32)
    s = (scale if scale is not None
         else rng.uniform(0.35, 0.9)) * h  # body height in px
    cx = (cx_frac if cx_frac is not None
          else rng.uniform(0.25, 0.75)) * w
    y0 = rng.uniform(0.02, max(0.04, 0.95 - s / h)) * h
    lean = rng.uniform(-0.08, 0.08)  # whole-body lean
    swing = 0.0 if phase is None else float(np.sin(phase))

    def pt(dx, dy):
        """Body-frame point: dx in body widths, dy in body heights."""
        return (int(cx + (dx + lean * dy) * s), int(y0 + dy * s))

    th = max(int(0.055 * s), 2)  # limb thickness
    hip_y, knee_y, foot_y = 0.55, 0.78, 0.97
    spread = rng.uniform(0.04, 0.12)
    for side, leg_cls, shoe_cls in ((-1, LIP_LEG_L, LIP_SHOE_L),
                                    (1, LIP_LEG_R, LIP_SHOE_R)):
        sp = side * spread + 0.08 * swing * side
        hip = pt(side * 0.05, hip_y)
        knee = pt(sp, knee_y)
        foot = pt(sp * rng.uniform(0.9, 1.6), foot_y)
        cv2.line(parts, hip, knee, LIP_PANTS, th)          # thigh = pants
        cv2.line(parts, knee, foot, int(leg_cls), th)      # lower leg
        cv2.ellipse(parts, foot, (max(int(0.06 * s), 2),
                                  max(int(0.03 * s), 1)),
                    0, 0, 360, int(shoe_cls), -1)
    # torso (upper clothes) over the hip area
    cv2.ellipse(parts, pt(0, 0.38), (max(int(0.14 * s), 3),
                                     max(int(0.19 * s), 4)),
                int(lean * 60), 0, 360, LIP_UPPER, -1)
    # arms from the shoulders: walking counter-swing or random pose
    for side, arm_cls in ((-1, LIP_ARM_L), (1, LIP_ARM_R)):
        sw = -0.06 * swing * side
        sh = pt(side * 0.12, 0.24)
        elbow = pt(side * rng.uniform(0.14, 0.24) + sw, 0.38)
        hand = pt(side * rng.uniform(0.08, 0.3) + 2 * sw,
                  rng.uniform(0.46, 0.56))
        cv2.line(parts, sh, elbow, int(arm_cls), max(int(0.04 * s), 2))
        cv2.line(parts, elbow, hand, int(arm_cls), max(int(0.04 * s), 2))
    # head: face circle with a hair cap
    head_c = pt(rng.uniform(-0.02, 0.02), 0.10)
    hr = max(int(0.085 * s), 3)
    cv2.circle(parts, head_c, hr, LIP_FACE, -1)
    cv2.ellipse(parts, (head_c[0], head_c[1] - int(0.35 * hr)),
                (int(1.05 * hr), hr), 0, 180, 360, LIP_HAIR, -1)
    if hair_strands:
        # thin wisps off the cap — sub-pixel soft edges after downsample
        for _ in range(rng.randint(10, 22)):
            ang = rng.uniform(-2.6, -0.5)  # upward-ish fan
            x0 = head_c[0] + int(np.cos(ang) * hr * 0.9)
            y0s = head_c[1] + int(np.sin(ang) * hr * 0.9)
            pts = [(x0, y0s)]
            vx, vy = np.cos(ang), np.sin(ang)
            for _seg in range(3):
                vx += rng.uniform(-0.4, 0.4)
                vy += rng.uniform(-0.2, 0.4)  # droop
                step = rng.uniform(0.2, 0.55) * hr
                pts.append((int(pts[-1][0] + vx * step),
                            int(pts[-1][1] + vy * step)))
            cv2.polylines(parts, [np.asarray(pts, np.int32)], False,
                          LIP_HAIR, max(int(0.012 * s), 1))

    # paint: per-part base color x smooth texture
    img = np.zeros((h, w, 3), np.float32)
    skin = rng.uniform(0.35, 0.85, 3).astype(np.float32)
    colors = {
        LIP_HAIR: rng.uniform(0.02, 0.35, 3),
        LIP_FACE: skin, LIP_ARM_L: skin, LIP_ARM_R: skin,
        LIP_UPPER: rng.uniform(0.05, 0.95, 3),
        LIP_PANTS: rng.uniform(0.05, 0.8, 3),
        LIP_LEG_L: None, LIP_LEG_R: None,   # pants color or skin
        LIP_SHOE_L: rng.uniform(0.02, 0.5, 3),
        LIP_SHOE_R: None,
    }
    colors[LIP_SHOE_R] = colors[LIP_SHOE_L]
    if avoid_green:  # green-screen clips: clothing must not key out
        for cls in (LIP_UPPER, LIP_PANTS):
            c = np.asarray(colors[cls], np.float32)
            if c[1] >= c.max() - 0.05:  # BGR: green-dominant
                c[1] = c.min() * 0.8
            colors[cls] = c
    leg = skin if rng.rand() < 0.5 else colors[LIP_PANTS]
    colors[LIP_LEG_L] = colors[LIP_LEG_R] = leg
    tex = 0.85 + 0.3 * _smooth_noise(rng, h, w, 8)
    for cls, col in colors.items():
        sel = parts == cls
        img[sel] = np.asarray(col, np.float32)
    img = (img * tex).clip(0, 1)
    return img, parts


def make_nongreen_clip(n=5, h=96, w=128, seed=0, person_scale=0.7,
                       walk=False):
    """Synthetic non-green clip: a walking person over a textured natural
    background (the bg-mode workload — reference `tools/unscreen/bg.py`).

    `walk=True` articulates the limbs with a walking phase per frame
    (harder tracking: the silhouette deforms, not just translates).

    Returns (frames uint8 BGR list, gt alpha uint8 list, parts list)."""
    rng = np.random.RandomState(seed)
    bg = (_smooth_noise(rng, h, w, scale=max(h // 6, 1)) * 0.85
          + _smooth_noise(rng, h, w, scale=max(h // 24, 1)) * 0.15)
    # lighting gradient so the background is not statistically flat
    gy = np.linspace(0.75, 1.15, h, dtype=np.float32)[:, None, None]
    bg = (bg * gy).clip(0, 1)
    frames, gts, parts_list = [], [], []
    state = rng.get_state()
    for t in range(n):
        rng.set_state(state)  # same person geometry each frame...
        phase = (2.0 * np.pi * t / 8.0) if walk else None
        person, parts = draw_person(rng, h, w, scale=person_scale,
                                    phase=phase)
        shift = int(round(2.0 * t))  # ...translated across frames
        person = np.roll(person, shift, axis=1)
        parts = np.roll(parts, shift, axis=1)
        alpha = (parts > 0).astype(np.float32)
        img = alpha[..., None] * person + (1 - alpha[..., None]) * bg
        img = img + np.random.RandomState(seed + 100 + t).randn(
            h, w, 3).astype(np.float32) * 0.015
        frames.append((img.clip(0, 1) * 255).astype(np.uint8))
        gts.append((alpha * 255).astype(np.uint8))
        parts_list.append(parts)
    return frames, gts, parts_list


def render_soft_person(rng: np.random.RandomState, h: int, w: int,
                       ss: int = 4, **kw):
    """Person rendered at `ss`x resolution and area-downsampled: the hard
    part labels become a soft continuous alpha with sub-pixel hair-wisp
    boundaries (what SAD/GRAD/CONN actually measure)."""
    img_hi, parts_hi = draw_person(rng, h * ss, w * ss,
                                   hair_strands=True, **kw)
    alpha_hi = (parts_hi > 0).astype(np.float32)
    img = cv2.resize(img_hi, (w, h), interpolation=cv2.INTER_AREA)
    alpha = cv2.resize(alpha_hi, (w, h), interpolation=cv2.INTER_AREA)
    return img, alpha


EVAL_VARIANTS = ("plain", "motion_blur", "shadow", "jpeg", "occluder",
                 "two_person")


def make_eval_clip(kind: str = "green", n: int = 12, h: int = 288,
                   w: int = 512, seed: int = 0, ss: int = 4,
                   variant: str = "plain"):
    """Eval-protocol clip (VERDICT round-1 item 4): a walking person with
    soft hair-wisp boundaries and limb motion over a gradient-lit green
    screen ("green") or textured natural background ("natural").

    `variant` (VERDICT round-2 item 5 — degradations real footage has):
      - "motion_blur": the person layer is directionally blurred by its
        per-frame displacement before compositing.
      - "shadow": the subject casts a soft offset shadow on the bg.
      - "jpeg": the composite round-trips JPEG at quality 40-60.
      - "occluder": a static foreground pillar the person walks behind
        (GT alpha excludes the occluded band; exercises tracking
        re-seeds).
      - "two_person": a second, smaller walker in counter-phase; GT is
        the union.

    Returns (frames uint8 BGR list, GT soft alphas uint8 list).
    """
    rng = np.random.RandomState(seed)
    gy = np.linspace(rng.uniform(0.75, 0.95), rng.uniform(1.0, 1.2), h,
                     dtype=np.float32)[:, None, None]
    if kind == "green":
        bg = np.zeros((h, w, 3), np.float32)
        bg[...] = (rng.uniform(0.1, 0.3), rng.uniform(0.55, 0.8),
                   rng.uniform(0.15, 0.35))
        bg += _smooth_noise(rng, h, w, 16) * 0.08
    else:
        # two-octave texture: coarse structure + mild fine detail
        bg = (_smooth_noise(rng, h, w, scale=max(h // 6, 1)) * 0.85
              + _smooth_noise(rng, h, w, scale=max(h // 24, 1)) * 0.15)
    bg = (bg * gy).clip(0, 1)
    scale = rng.uniform(0.55, 0.8)
    state = rng.get_state()

    if variant == "occluder":
        # static pillar in the walker's path, never green (it must key as
        # foreground-colored background, the hard case)
        px0 = int(w * rng.uniform(0.45, 0.55))
        pw = int(w * rng.uniform(0.05, 0.09))
        pillar_mask = np.zeros((h, w), np.float32)
        pillar_mask[:, px0:px0 + pw] = 1.0
        pillar_color = np.array([rng.uniform(0.3, 0.6),
                                 rng.uniform(0.1, 0.25),
                                 rng.uniform(0.3, 0.6)], np.float32)
        pillar = (pillar_color[None, None]
                  * (0.8 + 0.4 * _smooth_noise(rng, h, w, 12)))
    if variant == "two_person":
        scale2 = scale * rng.uniform(0.55, 0.75)
        seed2 = rng.randint(1 << 31)
    jpeg_q = int(rng.uniform(40, 60))

    frames, gts = [], []
    prev_cx = None
    for t in range(n):
        rng.set_state(state)  # same body geometry, varying pose/position
        cxf = 0.32 + 0.36 * t / max(n - 1, 1)
        img, alpha = render_soft_person(rng, h, w, ss=ss, scale=scale,
                                        phase=2.0 * np.pi * t / 8.0,
                                        cx_frac=cxf,
                                        avoid_green=(kind == "green"))
        if variant == "motion_blur":
            # directional blur over the inter-frame displacement
            dx = 0 if prev_cx is None else int(round((cxf - prev_cx) * w))
            ksz = min(max(abs(dx), 1), max(w // 40, 3)) * 2 + 1
            kern = np.zeros((1, ksz), np.float32)
            kern[0, :] = 1.0 / ksz
            img = cv2.filter2D(img, -1, kern)
            alpha = cv2.filter2D(alpha, -1, kern)
            prev_cx = cxf
        if variant == "two_person":
            rng2 = np.random.RandomState(seed2)
            cxf2 = 0.72 - 0.3 * t / max(n - 1, 1)  # walks the other way
            img2, alpha2 = render_soft_person(
                rng2, h, w, ss=ss, scale=scale2,
                phase=np.pi + 2.0 * np.pi * t / 8.0, cx_frac=cxf2,
                avoid_green=(kind == "green"))
            # person 1 in front of person 2
            img = (alpha[..., None] * img
                   + (1 - alpha[..., None]) * alpha2[..., None] * img2)
            alpha = np.maximum(alpha, alpha2)
        comp_bg = bg
        if variant == "shadow":
            sh = np.roll(alpha, (int(0.04 * h), int(0.06 * w)), (0, 1))
            sh = cv2.GaussianBlur(sh, (0, 0), max(h / 72.0, 1.0))
            comp_bg = bg * (1.0 - 0.45 * sh[..., None])
        comp = alpha[..., None] * img + (1 - alpha[..., None]) * comp_bg
        if variant == "occluder":
            comp = (pillar_mask[..., None] * pillar
                    + (1 - pillar_mask[..., None]) * comp)
            alpha = alpha * (1.0 - pillar_mask)
        comp = comp + np.random.RandomState(seed + 500 + t).randn(
            h, w, 3).astype(np.float32) * 0.01
        frame = (comp.clip(0, 1) * 255).astype(np.uint8)
        if variant == "jpeg":
            ok, enc = cv2.imencode(".jpg", frame,
                                   [cv2.IMWRITE_JPEG_QUALITY, jpeg_q])
            assert ok
            frame = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        frames.append(frame)
        gts.append((alpha * 255).astype(np.uint8))
    return frames, gts


def make_multishot_clip(n_shots: int = 2, frames_per_shot: int = 8,
                        h: int = 128, w: int = 128, seed: int = 5):
    """Multi-shot clip for the STM-propagation + iseg-correction protocol
    (BASELINE.json config 4: "STM mask propagation with iseg correction
    on a multi-shot clip"). Each shot is a flat-color subject drifting
    over its own textured background — the shipped STM weights' training
    distribution (`parallel/train_stm.py` make_pair_batch) — and a HARD
    CUT separates shots: new background, new subject color/geometry, new
    position. Propagation from the first-frame mask cannot survive the
    cut (nothing matches across it); the protocol's correction step
    re-seeds there.

    Returns (frames uint8 BGR, gt_masks uint8 {0,255}, cut_frames) with
    `cut_frames` the indices where a new shot begins (first shot's 0 is
    not included)."""
    frames, masks, cuts = [], [], []
    for s in range(n_shots):
        rng = np.random.RandomState(seed + 37 * s)
        small = rng.rand(16, 16, 3).astype(np.float32)
        bg = cv2.resize(small, (w, h),
                        interpolation=cv2.INTER_CUBIC).clip(0, 1)
        fg_color = rng.uniform(0.2, 0.8, 3).astype(np.float32)
        cx = int(rng.uniform(0.25, 0.75) * w)
        cy = int(rng.uniform(0.35, 0.65) * h)
        ax = int(rng.uniform(0.12, 0.2) * w)
        ay = int(rng.uniform(0.18, 0.28) * h)
        ang = rng.uniform(0, 180)
        vx, vy = rng.uniform(1.5, 3.5), rng.uniform(0.5, 2.0)
        base = np.zeros((h, w), np.float32)
        cv2.ellipse(base, (cx, cy), (ax, ay), ang, 0, 360, 1.0, -1)
        if s > 0:
            cuts.append(len(frames))
        for t in range(frames_per_shot):
            m = np.float32([[1, 0, vx * t], [0, 1, vy * t]])
            alpha = cv2.warpAffine(base, m, (w, h))
            img = (alpha[..., None] * fg_color
                   + (1 - alpha[..., None]) * bg)
            img += rng.randn(h, w, 3).astype(np.float32) * 0.02
            frames.append((img.clip(0, 1) * 255).astype(np.uint8))
            masks.append((alpha > 0.5).astype(np.uint8) * 255)
    return frames, masks, cuts


def make_batch(rng: np.random.RandomState, batch: int,
               hw: Tuple[int, int] = (128, 128),
               imagenet_norm: bool = True) -> Dict[str, np.ndarray]:
    h, w = hw
    imgs, alpha_pres, trimaps, gts = [], [], [], []
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    for _ in range(batch):
        r_bg = rng.rand()
        if r_bg < 0.3:
            # green screen (green-mode matting uses the same net)
            bg = np.zeros((h, w, 3), np.float32)
            bg[...] = (rng.uniform(0.05, 0.35), rng.uniform(0.5, 0.9),
                       rng.uniform(0.1, 0.4))
            bg += _smooth_noise(rng, h, w, 16) * 0.1
        elif r_bg < 0.7:
            # textured gradient-lit background (the bg-mode clips)
            coarse = max(h // rng.choice([4, 6, 8]), 1)
            bg = (_smooth_noise(rng, h, w, scale=coarse) * 0.85
                  + _smooth_noise(rng, h, w, scale=max(h // 24, 1)) * 0.15)
            gy = np.linspace(rng.uniform(0.6, 1.0), rng.uniform(0.9, 1.3),
                             h, dtype=np.float32)[:, None, None]
            bg = (bg * gy).clip(0, 1)
        else:
            bg = _smooth_noise(rng, h, w)
        r_fg = rng.rand()
        if r_fg < 0.35:
            # soft-boundary person (hair wisps, thin limbs) — the unknown
            # band the eval-set matting actually has to solve
            fg, alpha = render_soft_person(rng, h, w, ss=2)
        elif r_fg < 0.65:
            # hard-boundary person: the band's GT is bimodal 0/1 and the
            # net must resolve it crisply, not hedge at 0.5 (the fused-bg
            # halo failure: ~uniform 0.6 predicted across the band)
            fg, parts = draw_person(rng, h, w)
            alpha = (parts > 0).astype(np.float32)
        else:
            fg = _smooth_noise(rng, h, w, scale=4)
            alpha = _random_alpha(rng, h, w)
        # motion-blur augmentation (VERDICT r4 item 3: green_mblur is
        # the recorded hard case — the directionally blurred boundary's
        # soft ramp extends far past the default trimap band and the net
        # hedged on bands it never trained on). 30% of samples blur the
        # fg layer AND its alpha by a directional kernel up to ~9% of
        # the crop width — the same fraction-of-width the eval clips
        # reach (`make_eval_clip` motion_blur, w//40*2+1) — and widen
        # the trimap band below to cover the ramp.
        blur_len = 0
        if rng.rand() < 0.3:
            blur_len = int(rng.uniform(3, max(w // 12, 6)))
            ang = rng.uniform(-0.35, 0.35)  # mostly-horizontal walks
            kern = np.zeros((blur_len, blur_len), np.float32)
            c = (blur_len - 1) / 2.0
            for i in range(blur_len):
                y = int(round(c + (i - c) * np.tan(ang)))
                if 0 <= y < blur_len:
                    kern[y, i] = 1.0
            kern /= max(kern.sum(), 1.0)
            fg = cv2.filter2D(fg, -1, kern)
            alpha = cv2.filter2D(alpha, -1, kern)

        img = alpha[..., None] * fg + (1 - alpha[..., None]) * bg
        img += rng.randn(h, w, 3).astype(np.float32) * 0.02
        img = img.clip(0, 1)

        # trimap from GT morphology band (like trimap/agent.py); blurred
        # samples widen the band so the whole soft ramp is unknown —
        # the inference-side counterpart is the displacement-adaptive
        # band in the fused green pipeline
        hard = (alpha > 0.5).astype(np.uint8)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        iters = rng.randint(2, 6) + blur_len // 2
        dil = cv2.dilate(hard, kernel, iterations=iters)
        ero = cv2.erode(hard, kernel, iterations=iters)
        tri_cls = np.ones((h, w), np.int32)  # unknown
        tri_cls[ero > 0] = 2
        tri_cls[dil == 0] = 0
        trimap = np.eye(3, dtype=np.float32)[tri_cls]

        # previous-frame alpha: GT jittered (simulates temporal recurrence)
        shift = rng.randint(-3, 4, size=2)
        m = np.float32([[1, 0, shift[1]], [0, 1, shift[0]]])
        alpha_pre = cv2.warpAffine(alpha, m, (w, h))
        if rng.rand() < 0.2:
            alpha_pre = np.zeros_like(alpha)  # first frame of a clip

        rgb = img[..., ::-1]
        if imagenet_norm:
            rgb = (rgb - mean) / std
        imgs.append(rgb)
        alpha_pres.append(alpha_pre[..., None])
        trimaps.append(trimap)
        gts.append(alpha)
    return {
        "img": np.stack(imgs),
        "alpha_pre": np.stack(alpha_pres),
        "trimap": np.stack(trimaps),
        "alpha_gt": np.stack(gts),
    }
