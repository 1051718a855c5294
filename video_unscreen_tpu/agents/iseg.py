"""ISegAgent — click-based interactive segmentation with optional BRS.

TPU-native rebuild of `unscreen/iseg/agent.py` + `unscreen/iseg/brs/`.
Click history is host-side bookkeeping (`Clicker`); the forward is one
jitted program over a fixed-size click tensor, with optional flip TTA
(`brs/transforms.py:34-67`) and optional **BRS**: per-channel scale/bias
on the `after_aspp` features optimized so the prediction agrees with the
user's clicks (`brs/brs_predictor.py:164-229`).

BRS design: the reference calls scipy L-BFGS-B on the host with a torch
backward per evaluation (`brs_predictor.py:215`); here the whole
optimization is `jax.scipy.optimize.minimize(method="BFGS")` inside jit —
the objective (click-miss loss + L2 reg, `brs_optimizer.py:13-28,118-133`)
re-runs only the post-insertion head, and backbone features are computed
once and closed over.
"""

from __future__ import annotations

import functools
from collections import namedtuple
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.iseg import DistMapsModel
from ..ops.geometry import (get_target_size, imnormalize, inv_pad_resize,
                            pad_resize)
from ..utils.checkpoint import load_variables

Click = namedtuple("Click", ["is_positive", "coords"])


class Clicker:
    """Click bookkeeping + disk click maps (`brs/clicker.py:8-75`)."""

    def __init__(self, shape_hw: Tuple[int, int], click_radius: int = 1):
        self.height, self.width = shape_hw
        self.radius = click_radius
        self.clicks_list: List[Click] = []

    def add_click(self, is_positive: bool, y: int, x: int):
        self.clicks_list.append(Click(is_positive, (int(y), int(x))))

    def get_clicks_maps(self):
        pos = np.zeros((self.height, self.width), np.float32)
        neg = np.zeros_like(pos)
        r = self.radius
        for click in self.clicks_list:
            y, x = click.coords
            target = pos if click.is_positive else neg
            target[max(y - r, 0):y + r + 1, max(x - r, 0):x + r + 1] = 1.0
        return pos, neg

    def points_tensor(self, max_clicks: int = 20) -> np.ndarray:
        pts = np.full((max_clicks, 3), -1.0, np.float32)
        for i, click in enumerate(self.clicks_list[:max_clicks]):
            pts[i] = (1.0 if click.is_positive else 0.0,
                      click.coords[0], click.coords[1])
        return pts


class ISegAgent:
    """Same surface as `unscreen/iseg/agent.py:10-119`."""

    def __init__(self, model_path: Optional[str] = None,
                 with_brs: bool = False, input_long_side: int = 800,
                 prob_thresh: float = 0.5, with_flip: bool = True,
                 cuda_device: int = 0, max_clicks: int = 20,
                 brs_reg_weight: float = 1e-3,
                 brs_reg_bias_weight: float = 10.0,
                 brs_maxiter: int = 20,
                 insertion_mode: str = "after_aspp",
                 dtype=jnp.float32, seed: int = 0):
        """`insertion_mode`: where BRS perturbs features — "after_aspp"
        (ASPP+skip concat, the reference default), "after_c4" (backbone
        output; ASPP re-runs inside the optimization), or
        "after_deeplab" (post-head; only the inst head re-runs) —
        `brs_predictor.py:143-162`."""
        if insertion_mode not in ("after_aspp", "after_c4",
                                  "after_deeplab"):
            raise ValueError(f"unknown insertion_mode {insertion_mode!r}")
        self.insertion_mode = insertion_mode
        self.model = DistMapsModel(dtype=dtype)
        self.input_long_side = int(input_long_side)
        self.prob_thresh = float(prob_thresh)
        self.with_flip = bool(with_flip)
        self.with_brs = bool(with_brs)
        self.max_clicks = int(max_clicks)
        self.brs_reg_weight = float(brs_reg_weight)
        self.brs_reg_bias_weight = float(brs_reg_bias_weight)
        self.brs_maxiter = int(brs_maxiter)
        z = jnp.zeros((1, 64, 64, 3), dtype)
        pts = jnp.full((1, self.max_clicks, 3), -1.0, dtype)
        self.variables = self.model.init(jax.random.PRNGKey(seed), z, pts)
        if model_path:
            self.variables = load_variables(model_path, self.variables)

    # -- device cores ---------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 3))
    def device_predict(self, variables, batch_img, hw, points):
        """Plain prediction with optional flip TTA, returns (H, W) probs."""
        logits = self.model.apply(variables, batch_img, points)
        probs = jax.nn.sigmoid(logits[..., 0])
        if self.with_flip:
            probs = 0.5 * (probs[0] + probs[1, :, ::-1])
        else:
            probs = probs[0]
        return probs

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def device_predict_brs(self, variables, batch_img, hw, points,
                           pos_map, neg_map):
        """BRS prediction: optimize per-channel (scale, bias) on the
        configured insertion point's features so the output agrees with
        the clicks."""
        mode = self.insertion_mode
        feats, aux = self.model.apply(
            variables, batch_img, points,
            method=lambda m, i, p: m.features(i, p,
                                              insertion_mode=mode))
        c = feats.shape[-1]

        def predict(scale, bias):
            return self.model.apply(
                variables, feats, hw, scale, bias,
                method=lambda m, f, o, s, b: m.logits_from_features(
                    f, o, s, b, insertion_mode=mode, aux=aux))

        def objective(x):
            scale, bias = x[:c], x[c:]
            logits = predict(scale, bias)
            probs = jax.nn.sigmoid(logits[..., 0])
            if self.with_flip:
                probs = 0.5 * (probs[0] + probs[1, :, ::-1])
            else:
                probs = probs[0]
            pos_diff = (1.0 - probs) * pos_map
            neg_diff = probs * neg_map
            loss = ((pos_diff ** 2).sum() / (pos_map.sum() + 1e-5)
                    + (neg_diff ** 2).sum() / (neg_map.sum() + 1e-5))
            reg = self.brs_reg_weight * (
                (scale ** 2).sum()
                + self.brs_reg_bias_weight * (bias ** 2).sum())
            return loss + reg

        # L-BFGS inside jit (the reference drives scipy fmin_l_bfgs_b from
        # the host, `brs_predictor.py:215`)
        import optax
        opt = optax.lbfgs()
        x0 = jnp.zeros(2 * c, jnp.float32)
        value_and_grad = optax.value_and_grad_from_state(objective)

        def step(carry, _):
            x, state = carry
            value, grad = value_and_grad(x, state=state)
            updates, state = opt.update(grad, state, x, value=value,
                                        grad=grad, value_fn=objective)
            return (optax.apply_updates(x, updates), state), None

        (x, _), _ = jax.lax.scan(step, (x0, opt.init(x0)), None,
                                 length=self.brs_maxiter)
        logits = predict(x[:c], x[c:])
        probs = jax.nn.sigmoid(logits[..., 0])
        if self.with_flip:
            probs = 0.5 * (probs[0] + probs[1, :, ::-1])
        else:
            probs = probs[0]
        return probs

    # -- host API ---------------------------------------------------------------
    def forward(self, img: np.ndarray, click_history) -> np.ndarray:
        """img BGR uint8 + [(is_positive, y, x), ...] -> mask {0, 255}.

        Mirrors `iseg/agent.py:92-119`: pad_resize to input_long_side,
        clicks scaled by the resize ratio, sigmoid+TTA, threshold.
        """
        probs = self.predict_probs(img, click_history)
        return (probs > self.prob_thresh).astype(np.uint8) * 255

    def predict_probs(self, img: np.ndarray, click_history,
                      use_brs: Optional[bool] = None) -> np.ndarray:
        """Foreground probabilities at the input resolution.

        `use_brs` overrides the agent's `with_brs` — lets callers compare
        the plain and BRS predictions on identical preprocessing (the
        click-satisfaction contract of `brs/brs_optimizer.py:97-105`).
        """
        if use_brs is None:
            use_brs = self.with_brs
        ori_hw = img.shape[:2]
        input_hw = get_target_size(*ori_hw, self.input_long_side)
        # resize ratio of pad_resize (imgprocess.py:83-94)
        ratio = (float(input_hw[0]) / ori_hw[0]
                 if ori_hw[0] / ori_hw[1] > input_hw[0] / input_hw[1]
                 else float(input_hw[1]) / ori_hw[1])

        img_d = pad_resize(jnp.asarray(img, jnp.float32), input_hw)
        norm = imnormalize(img_d)
        clicker = Clicker(input_hw)
        for rec in click_history:
            clicker.add_click(bool(rec[0]), int(rec[1] * ratio),
                              int(rec[2] * ratio))
        pts = clicker.points_tensor(self.max_clicks)

        if self.with_flip:
            batch = jnp.stack([norm, norm[:, ::-1]])
            h, w = input_hw
            pts_flipped = pts.copy()
            valid = pts_flipped[:, 1] >= 0
            pts_flipped[valid, 2] = w - 1 - pts_flipped[valid, 2]
            points = jnp.stack([jnp.asarray(pts), jnp.asarray(pts_flipped)])
        else:
            batch = norm[None]
            points = jnp.asarray(pts)[None]

        if use_brs and len(click_history) > 0:
            pos_map, neg_map = clicker.get_clicks_maps()
            probs = self.device_predict_brs(
                self.variables, batch, input_hw, points,
                jnp.asarray(pos_map), jnp.asarray(neg_map))
        else:
            probs = self.device_predict(self.variables, batch, input_hw,
                                        points)
        return np.asarray(inv_pad_resize(probs, ori_hw))
