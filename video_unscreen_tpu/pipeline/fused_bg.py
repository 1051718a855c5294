"""Fused bg mode — background-estimation unscreen as one compiled scan.

Device-resident rebuild of `tools/unscreen/bg.py` (the modular driver is
`pipeline/bg.py`). Per frame, inside one `lax.scan`:

  seg (STM tracking from the previous frame | chroma/neural seed)
  -> object removal -> trimap -> matting pass 1
  -> per-frame background: (1-a)*frame + CG regionfill of the hole
  -> background-difference mask -> matting pass 2 -> fg un-blend

Key structural observation: the reference's STM call in bg mode always
sees exactly two frames (`bg.py:53`), i.e. memorize(prev, alpha_pre) then
segment(cur). That contract cannot remember the subject across an
occluder, so the scan carry additionally holds a SMALL ring bank of
committed memories (capacity `stm.fused_bank_capacity`, default 2 —
the `agents/stm.py:62-115` mechanics at reduced capacity, reference
semantics `unscreen/stm/agent.py:145-168`): tracking frames commit every
`memory_step`-th memory FIFO, and the segment read attends over
committed slots + the previous frame. The bank is NOT cleared on
re-seeds — within a clip segment the pre-occlusion appearance stays
available.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.stm import STMAgent
from ..agents.vmatting import VMattingAgent
from ..ops import morphology as morph
from ..ops.color import bgr2gray, bgr2hsv, hsv2bgr
from ..ops.compositing import get_fg
from ..ops.connected import remove_invalid_objects_ds
from ..ops.geometry import get_target_size, imnormalize, resize
from ..ops.regionfill import regionfill_with_state, solve_shape
from ..ops.trimap import generate_trimap
from ..parallel.streaming import FrameStreamer
from .common import build_score_map
from .fused_green import _build_seed_segmenter, _canon, seed_mask


class BgCarry(NamedTuple):
    alpha_pre: jax.Array    # (H, W) work-res
    tracking: jax.Array     # scalar bool
    frame_prev: jax.Array   # (H, W, 3) normalized previous frame
    fid: jax.Array          # scalar int32
    bg_prev: jax.Array      # (sh, sw, 3) solve-res regionfill warm start
    bank_k: jax.Array       # (cap, hm, wm, 128) STM ring-bank keys
    bank_v: jax.Array       # (cap, hm, wm, 512) STM ring-bank values
    bank_n: jax.Array       # scalar int32, committed slots
    bg_model: jax.Array     # (H, W, 3) temporal background EMA
    bg_seen: jax.Array      # (H, W) observed-as-background weight


class FusedBgPipeline:
    """Compiled bg-mode runner for one clip geometry."""

    def __init__(self, cfg: dict, frame_hw: Tuple[int, int],
                 work_long_side: int = 960, use_stm_tracking: bool = True,
                 matting_dtype=jnp.bfloat16, stm_dtype=jnp.bfloat16,
                 seg_dtype=jnp.bfloat16, wire: str = "bgr",
                 fetch: str = "auto", bg_downscale: int = 2,
                 pass1_downscale: int = 2, pack_d2h="auto"):
        """`fetch` — what crosses the device->host link per frame:
          - "device": all four artifacts (alpha + segmask + fg + bg,
            8 uint8 channels/px).
          - "host": alpha + segmask + the regionfilled bg at
            1/`bg_downscale` res (2 + 3/ds^2 ~ 2.75 B/px, ~3x less d2h);
            fg and full-res bg are reconstructed host-side (fg via the
            native `vu_unblend_fg_batch`, bg = alpha==0 ? frame : bg_up).
          - "auto": "host" when the native runtime is available.
        `wire` — host->device format: "bgr" (default, lossless parity with
        the reference's full-res BGR feed) or "yuv420" (I420 uint8, 1.5
        B/px — the bench/production choice on bandwidth-limited links)."""
        from .. import runtime as native_runtime
        if fetch == "auto":
            fetch = "host" if native_runtime.available() else "device"
        self.fetch = fetch
        # bit-packed d2h wire for the alpha+segmask planes (stacked into
        # one (2h, w) plane, `ops/wirepack.py`): 2 B/px -> ~0.56 B/px,
        # bit-exact with a device-resident full-plane overflow fallback.
        # "auto" enables it in host-fetch mode (same as FusedGreen).
        if pack_d2h == "auto":
            pack_d2h = fetch == "host"
        self.pack_d2h = bool(pack_d2h) and fetch == "host"
        self.bg_downscale = int(bg_downscale)
        self.cfg = cfg
        self.wire = wire  # see FusedGreenPipeline: I420 host->HBM format
        self.ori_hw = tuple(frame_hw)
        # one work resolution, divisible by 32 (matting) and 16 (STM)
        self.work_hw = get_target_size(frame_hw[0], frame_hw[1],
                                       work_long_side, division=32)
        self.vmat = VMattingAgent(
            model_path=cfg["vmatting"].get("model_path"),
            input_long_side=work_long_side, dtype=matting_dtype)
        # matting pass 1 runs the UNet at 1/`pass1_downscale` resolution
        # (VERDICT r5: the UNet is the top line of the bg budget at
        # 7.5 ms x2 passes). Pass 1's alpha only seeds the regionfill
        # hole (binarized + dilated) and the bg-diff ensemble mask that
        # pass 2 re-mats at full res — its band detail is discarded, so
        # the quarter-cost forward loses nothing the protocol can see
        # (gated: scores within 0.005 MIOU). The trimap/unknown-band
        # reset stays full-res; only the net's interior runs low-res
        # (`vmatting/agent.py:128-131` semantics preserved exactly).
        self.pass1_downscale = max(int(
            cfg["vmatting"].get("pass1_downscale", pass1_downscale)), 1)
        # the long side must itself be div-32 (get_target_size only
        # rounds the short side): 288-work/2 = 144 would desync the
        # UNet's H/32 decoder vs its shortcut stacks
        p1_long = -(-(max(self.work_hw) // self.pass1_downscale) // 32) * 32
        self.pass1_hw = get_target_size(
            self.work_hw[0] // self.pass1_downscale,
            self.work_hw[1] // self.pass1_downscale, p1_long, division=32)
        self.use_stm = bool(use_stm_tracking)
        self.stm_dtype = stm_dtype
        stm_cfg = cfg.get("stm", {})
        self.bank_cap = (int(stm_cfg.get("fused_bank_capacity", 2))
                         if self.use_stm else 0)
        self.memory_step = int(stm_cfg.get("memory_step", 2))
        # STM tracking can latch onto foreground-colored static objects
        # (key-similarity reads have no notion of "that pillar was
        # background a frame ago") — the mask then BALLOONS in one step.
        # When the tracked area exceeds `balloon_ratio` x the previous
        # frame's alpha area, the step falls back to the seed segmenter
        # for that frame (SCHP localizes the person correctly; measured
        # natural_occl MIOU 0.62 -> see results/protocol: the ballooned
        # mask absorbed the occluder pillar). 0 disables.
        self.balloon_ratio = float(stm_cfg.get("balloon_ratio", 1.6))
        if self.use_stm:
            # einsum memory read: the STM call sits inside the scan's
            # tracking `lax.cond`, where XLA's scoped-VMEM accounting
            # rejects the Pallas custom call (106MB phantom stack ask);
            # the bg-mode bank is a single slot (`bg.py:53` semantics),
            # so the dense (HW/256)^2 score matrix is small anyway. The
            # flash kernel stays on the standalone STMAgent's ring-bank
            # scan, where it compiles and runs fine.
            self.stm = STMAgent(model_path=cfg["stm"].get("model_path"),
                                input_long_side=work_long_side,
                                dtype=stm_dtype, pallas_attention=False)
        # seed segmenter for non-tracking frames (reference bg mode runs
        # the SCHP HumanSegAgent there, `tools/unscreen/bg.py:56`)
        self.seg = _build_seed_segmenter(cfg.get("binseg", {}), seg_dtype)
        self.score_map = jnp.asarray(
            build_score_map(self.work_hw[0], self.work_hw[1], cfg))
        self.fg_exist_thr = float(cfg["fg_exist_thr"])
        self.bg_mask_thr = float(cfg["bg_mask"]["thr"])
        # streaming always-bg: pixels the matte calls background
        # accumulate into a temporal EMA carried through the scan, and
        # the bg-difference mask diffs against
        # beta*perframe + (1-beta)*EMA wherever the EMA has observations
        # — the reference's bg_offline stage-2 temporal mean + stage-3
        # beta-fusion (`bg_offline.py:101-113,140-141`, fusion_weight)
        # made streaming. Where the subject currently stands, the
        # membrane fill guessed the occluded background; the EMA holds
        # the pixels actually SEEN there, so static foreground-colored
        # structures (the natural_occl pillar) diff to ~0 instead of
        # diffing against a hallucinated fill. `fusion_weight` 1 (or
        # `temporal: false`) disables.
        self.bg_fusion_beta = float(cfg["bg_mask"].get("fusion_weight",
                                                       0.1))
        self.bg_temporal = bool(cfg["bg_mask"].get("temporal", True))
        self.bg_ema_rate = float(cfg["bg_mask"].get("ema_rate", 0.3))
        # recovery blend rate for EMA pixels the seed segmenter disputes
        # while nothing is tracked (see `_bg_model_update`)
        self.bg_recover_rate = float(cfg["bg_mask"].get("recover_rate",
                                                        0.25))
        self.saliency_thr = float(cfg["objectremoval"]["saliency_thr"])
        self.consensus_thr = float(cfg["objectremoval"]["consensus_thr"])
        # see FusedGreenPipeline: CC labeling/stats resolution divisor
        self.or_downscale = int(cfg["objectremoval"].get("downscale", 2))
        tri = cfg["trimap"]
        self.tri_kernel = int(tri["kernelsize"])
        self.tri_iters = int(tri["iters"])

    def init_carry(self) -> BgCarry:
        h, w = self.work_hw
        sh, sw = solve_shape(h, w, 0.5)
        hm, wm = h // 16, w // 16
        cap = self.bank_cap
        return _canon(BgCarry(
            alpha_pre=jnp.zeros((h, w), jnp.float32),
            tracking=jnp.asarray(False),
            frame_prev=jnp.zeros((h, w, 3), jnp.float32),
            fid=jnp.asarray(0, jnp.int32),
            bg_prev=jnp.zeros((sh, sw, 3), jnp.float32),
            bank_k=jnp.zeros((cap, hm, wm, 128), self.stm_dtype),
            bank_v=jnp.zeros((cap, hm, wm, 512), self.stm_dtype),
            bank_n=jnp.asarray(0, jnp.int32),
            bg_model=jnp.zeros((h, w, 3), jnp.float32),
            bg_seen=jnp.zeros((h, w), jnp.float32)))

    # -- sub-stages ----------------------------------------------------------
    def _ballooned(self, tracked: jax.Array, alpha_pre: jax.Array):
        """True when the tracked mask's area jumped `balloon_ratio`x over
        the previous frame's alpha — the STM-latched-onto-a-distractor
        signature (a subject's area changes a few % frame to frame; a
        pillar absorbed into the mask doubles it in one step)."""
        if self.balloon_ratio <= 0:
            return jnp.asarray(False)
        ta = (tracked >= 128).sum()
        pa = (alpha_pre >= 128).sum()
        return ta > self.balloon_ratio * jnp.maximum(pa, 1)

    def _bg_model_update(self, carry: BgCarry, frame, alpha, segmask,
                         bgimg):
        """Fold pixels the matte calls background (alpha == 0, the same
        confidence `bg.py:99-102` uses to copy the frame into the output
        bg) into the streaming always-bg EMA. First observation takes
        the frame directly; a moving subject vacates any pixel within a
        few frames, so absorption of a briefly-missed subject decays at
        `ema_rate`.

        Two guards against the EMA permanently suppressing a static
        subject (ADVICE round-4 medium: a frame-wide alpha zeroing folds
        the subject into the EMA, after which diff~0 -> alphabg=0 ->
        alpha=0 self-reinforces with no recovery path):
          - pixels the CURRENT segmask calls foreground never update the
            EMA — a seed-segmenter recovery stops the reinforcement;
          - where the seed disputes the EMA while nothing is tracked
            (segmask fg, alpha 0, pixel previously seen — the
            suppression signature; a genuinely-occluded-background pixel
            has `tracking` True instead), the EMA blends toward the
            per-frame regionfill estimate at `recover_rate`, so the
            bg-difference re-acquires a truly present subject within a
            few frames while a seed false-positive over real background
            (fill ~= frame) is unaffected."""
        if not self.bg_temporal:
            return carry.bg_model, carry.bg_seen
        seg_fg = segmask >= 128
        is_bg = (alpha == 0) & ~seg_fg
        r = self.bg_ema_rate
        first = is_bg & (carry.bg_seen == 0)
        ema = (1.0 - r) * carry.bg_model + r * frame
        upd = jnp.where(first[..., None], frame, ema)
        bg_model = jnp.where(is_bg[..., None], upd, carry.bg_model)
        recover = ((alpha == 0) & seg_fg & (carry.bg_seen > 0)
                   & ~carry.tracking)
        rr = self.bg_recover_rate
        bg_model = jnp.where(recover[..., None],
                             (1.0 - rr) * bg_model + rr * bgimg,
                             bg_model)
        bg_seen = jnp.where(is_bg,
                            jnp.minimum(carry.bg_seen + 1.0, 255.0),
                            carry.bg_seen)
        return bg_model, bg_seen

    def _segment_and_bank(self, carry: BgCarry, frame, norm):
        """STM tracking when a subject was present, else the seed
        segmenter — SCHP/DeepLab per the binseg config, chroma as the
        weights-free fallback (`bg.py:49-56`). A tracked mask that
        balloons (`_ballooned`) is discarded for THIS frame's seed
        segmenter output — same-frame fallback, so `alpha_pre` stays
        clean and every subsequent balloon re-triggers. Returns
        (segmask, (bank_k, bank_v, bank_n)) — tracking frames commit
        their (previous-frame, hence clean) memory to the ring bank
        (see module docstring)."""
        bank = (carry.bank_k, carry.bank_v, carry.bank_n)
        use_track = carry.tracking & (carry.fid > 0)
        if not self.use_stm:
            segmask = jax.lax.cond(
                use_track,
                lambda op: op[0],
                lambda op: seed_mask(self.seg, op[1]),
                (carry.alpha_pre, frame))
            return segmask, bank

        hm, wm = self.work_hw[0] // 16, self.work_hw[1] // 16

        def stm_branch(args):
            norm_, carry_ = args
            return self._stm_track_mask(carry_, norm_)

        def stm_zero(args):
            return (jnp.zeros(self.work_hw, jnp.float32),
                    jnp.zeros((hm, wm, 128), self.stm_dtype),
                    jnp.zeros((hm, wm, 512), self.stm_dtype))

        tracked, k, v = jax.lax.cond(use_track, stm_branch, stm_zero,
                                     (norm, carry))
        balloon = use_track & self._ballooned(tracked, carry.alpha_pre)
        use_seed = (~use_track) | balloon
        seed = jax.lax.cond(
            use_seed,
            lambda fr: seed_mask(self.seg, fr),
            lambda fr: jnp.zeros(fr.shape[:2], jnp.float32), frame)
        segmask = jnp.where(use_seed, seed, tracked)
        return segmask, self._bank_update(carry, k, v, use_track)

    def _bank_update(self, carry: BgCarry, k, v, did_track):
        """FIFO-commit the previous frame's memory (k, v) every
        `memory_step`-th tracking frame — `agents/stm.py:98-110`
        mechanics on the scan carry."""
        cap = self.bank_cap
        if cap == 0:
            return carry.bank_k, carry.bank_v, carry.bank_n
        commit = did_track & (carry.fid % self.memory_step == 0)
        full = carry.bank_n >= cap
        rolled_k = jnp.where(full, jnp.roll(carry.bank_k, -1, axis=0),
                             carry.bank_k)
        rolled_v = jnp.where(full, jnp.roll(carry.bank_v, -1, axis=0),
                             carry.bank_v)
        idx = jnp.minimum(carry.bank_n, cap - 1)
        new_k = jax.lax.dynamic_update_slice_in_dim(
            rolled_k, k[None].astype(rolled_k.dtype), idx, axis=0)
        new_v = jax.lax.dynamic_update_slice_in_dim(
            rolled_v, v[None].astype(rolled_v.dtype), idx, axis=0)
        bank_k = jnp.where(commit, new_k, carry.bank_k)
        bank_v = jnp.where(commit, new_v, carry.bank_v)
        bank_n = jnp.where(commit,
                           jnp.minimum(carry.bank_n + 1, cap),
                           carry.bank_n)
        return bank_k, bank_v, bank_n

    def _matting_pass(self, frame, alpha_pre, mask, coarse: bool = False):
        """object removal -> trimap -> matting (`bg.py:67-70,92-95`).

        `coarse` runs the UNet at `pass1_hw` (1/pass1_downscale res) —
        `pad_resize` inside `device_forward_impl` downsamples, the
        inverse geometry upsamples, and the full-res trimap's hard
        fg/bg reset applies unchanged, so only the unknown band's
        interior is low-res. Used for pass 1, whose output feeds the
        regionfill hole and the ensemble mask, never the final matte."""
        alphaor = remove_invalid_objects_ds(
            mask, mask, self.score_map, saliency_thr=self.saliency_thr,
            consensus_thr=self.consensus_thr,
            downscale=self.or_downscale)
        trimap = generate_trimap(alphaor, self.tri_kernel, self.tri_iters)
        net_hw = self.pass1_hw if coarse else self.work_hw
        return self.vmat.device_forward_impl(
            self.vmat.variables, frame, alpha_pre, trimap, net_hw)

    def _per_frame_background(self, frame, alpha, bg_prev):
        """(1-a)*frame, regionfill behind dilated binarized alpha
        (`bg.py:71-83`). The V-channel un-blend + 3-channel CG solve stays
        on device; half-res solve like the reference's factor handling.

        `bg_prev` (solve-res, from the scan carry) warm-starts the CG:
        the background changes slowly frame to frame, so steady-state
        solves converge in a fraction of the cold-start iterations and
        the CG while_loop exits early. Returns (bg, bg_sol) with
        `bg_sol` the new solve-res warm start."""
        a = (alpha / 255.0)[..., None]
        bg = jnp.clip((1.0 - a) * bgr2hsv(frame), 0.0, 255.0)
        bg = hsv2bgr(bg)
        hole = morph.dilate(jnp.where(alpha > 128, 255.0, 0.0), 3, 2)
        channels, sols = [], []
        for c in range(3):
            filled, sol = regionfill_with_state(
                bg[..., c], hole, 0.5, cg_iters=200,
                x0=bg_prev[..., c])
            channels.append(filled)
            sols.append(sol)
        return jnp.stack(channels, axis=-1), jnp.stack(sols, axis=-1)

    def _stm_track_mask(self, carry: BgCarry, norm: jax.Array):
        """Propagate the previous frame's alpha through STM — the
        tracking branch of `_segment_and_bank`. The segment read attends
        over the committed ring-bank slots PLUS the previous frame's
        memory, so a subject that vanishes behind an occluder for a few
        frames still matches its pre-occlusion keys. Returns
        (mask, k, v) with (k, v) the prev-frame memory for the bank."""
        mask_prev = (carry.alpha_pre >= 128).astype(jnp.float32)
        k, v = self.stm.model.apply(
            self.stm.variables, carry.frame_prev[None],
            mask_prev[None], 1.0 - mask_prev[None],
            method=lambda m, f, mf, mb: m.memorize(f, mf, mb))
        cap = self.bank_cap
        eff_k = jnp.concatenate(
            [carry.bank_k.astype(k.dtype)[None], k[:, None]], axis=1)
        eff_v = jnp.concatenate(
            [carry.bank_v.astype(v.dtype)[None], v[:, None]], axis=1)
        slot_ids = jnp.arange(cap + 1)[None, :]
        valid = (slot_ids < carry.bank_n) | (slot_ids == cap)
        logits = self.stm.model.apply(
            self.stm.variables, norm[None], eff_k, eff_v, valid,
            method=lambda m, f, mk, mv, vl: m.segment(f, mk, mv, vl))
        mask = jnp.argmax(logits[0], axis=-1).astype(jnp.float32) * 255.0
        return mask, k[0], v[0]

    # -- per-frame step --------------------------------------------------------
    def _prep_frame(self, frame_full: jax.Array) -> jax.Array:
        frame = frame_full.astype(jnp.float32)
        if frame.shape[:2] != self.work_hw:
            frame = resize(frame, self.work_hw)
        return frame

    def _step(self, carry: BgCarry, frame_full: jax.Array):
        frame = self._prep_frame(frame_full)
        norm = imnormalize(frame)
        segmask, bank = self._segment_and_bank(carry, frame, norm)
        return self._post_seg(carry, frame, norm, segmask, bank)

    def _step_batched(self, carries: BgCarry, frames_b: jax.Array,
                      model_axis=None):
        """Per-frame step over S stacked segments. Like
        `FusedGreenPipeline._step_batched`: a plain vmap would run BOTH
        `_segment` branches (STM tracking AND the SCHP/DeepLab seed) for
        every segment every frame. Here STM tracking runs batched every
        step (it is the common branch), and the seed segmenter is
        hoisted behind one scalar `any(need_seed)` cond."""
        frames = jax.vmap(self._prep_frame)(frames_b)
        norms = jax.vmap(imnormalize)(frames)
        need_seed = ~(carries.tracking & (carries.fid > 0))  # (S,)

        if self.use_stm:
            # the STM forward is hoisted behind the mirror cond of the
            # seed branch: on steps where EVERY segment seeds (frame 0,
            # short segments) no tracking compute runs at all
            s = frames.shape[0]
            hm, wm = self.work_hw[0] // 16, self.work_hw[1] // 16

            def track_all(c, nr):
                return jax.vmap(self._stm_track_mask)(c, nr)

            def track_none(c, nr):
                return (jnp.zeros(nr.shape[:3], jnp.float32),
                        jnp.zeros((s, hm, wm, 128), self.stm_dtype),
                        jnp.zeros((s, hm, wm, 512), self.stm_dtype))

            tracked, ks, vs = jax.lax.cond(
                (~need_seed).any(), track_all, track_none, carries, norms)
            banks = jax.vmap(self._bank_update)(carries, ks, vs,
                                                ~need_seed)
            # ballooned tracking (STM latched onto a distractor) falls
            # back to the seed segmenter for this frame — `_ballooned`
            balloon = (~need_seed) & jax.vmap(self._ballooned)(
                tracked, carries.alpha_pre)
            need_seed = need_seed | balloon
        else:
            tracked = carries.alpha_pre
            banks = (carries.bank_k, carries.bank_v, carries.bank_n)

        def seed_all(fr):
            return jax.vmap(
                lambda f: seed_mask(self.seg, f, model_axis))(fr)

        seeds = jax.lax.cond(
            need_seed.any(), seed_all,
            lambda fr: jnp.zeros(fr.shape[:3], jnp.float32), frames)
        segmask = jnp.where(need_seed[:, None, None], seeds, tracked)
        return jax.vmap(self._post_seg)(carries, frames, norms, segmask,
                                        banks)

    def _post_seg(self, carry: BgCarry, frame: jax.Array, norm: jax.Array,
                  segmask: jax.Array, bank):
        """Everything after segmentation (per sample). `bank` is the
        updated (bank_k, bank_v, bank_n) from `_segment_and_bank`."""
        h, w = self.work_hw
        fg_exists = (segmask >= 128).sum() > self.fg_exist_thr * h * w

        # matting pass 1 (coarse: quarter-cost UNet, see _matting_pass)
        # + background estimation (CG warm-started from the previous
        # frame's solved background)
        alpha1 = self._matting_pass(frame, carry.alpha_pre, segmask,
                                    coarse=True)
        bgimg, bg_sol = self._per_frame_background(frame, alpha1,
                                                   carry.bg_prev)

        # background-difference mask (`bg.py:85-89`) — against the
        # per-frame estimate beta-fused with the streaming always-bg EMA
        # where that has observations (stage-2/3 semantics, see __init__)
        if self.bg_temporal:
            seen = (carry.bg_seen > 0)[..., None]
            bg_for_diff = jnp.where(
                seen,
                self.bg_fusion_beta * bgimg
                + (1.0 - self.bg_fusion_beta) * carry.bg_model,
                bgimg)
        else:
            bg_for_diff = bgimg
        diff = bgr2gray(jnp.abs(frame - bg_for_diff))
        alphabg = jnp.where(diff > self.bg_mask_thr, 255.0, diff)
        alphabg = morph.dilate(jnp.clip(alphabg, 0.0, 255.0), 4, 2)

        # matting pass 2 on alpha * bgmask
        alpha_ensm = alpha1 * jnp.floor(alphabg / 255.0)
        alpha = self._matting_pass(frame, carry.alpha_pre, alpha_ensm)

        # no-foreground gate before the outputs so host- and device-fetch
        # reconstruct identical artifacts (`bg.py:59-66` gates at seg time)
        alpha = jnp.where(fg_exists, alpha, 0.0)

        bg_model, bg_seen = self._bg_model_update(carry, frame, alpha,
                                                  segmask, bgimg)
        tracking = (alpha >= 128).sum() > self.fg_exist_thr * h * w
        new_carry = _canon(BgCarry(alpha_pre=alpha, tracking=tracking,
                                   frame_prev=norm, fid=carry.fid + 1,
                                   bg_prev=bg_sol, bank_k=bank[0],
                                   bank_v=bank[1], bank_n=bank[2],
                                   bg_model=bg_model, bg_seen=bg_seen))
        if self.fetch == "device":
            # fg un-blend (`bg.py:99-102`) on device; 8 channels/px d2h
            bg_final = jnp.where((alpha == 0)[..., None], frame, bgimg)
            fg = get_fg(frame, alpha, bg_final)
            fg = jnp.where(fg_exists, fg, 0.0)
            packed = jnp.concatenate(
                [alpha[..., None], segmask[..., None], fg, bg_final],
                axis=-1).astype(jnp.uint8)
            bg_small = jnp.zeros((1, 1, 3), jnp.uint8)
        else:
            # wire discipline: alpha + segmask full-res, regionfilled bg
            # at 1/ds res; fg/bg reconstructed host-side
            ds = self.bg_downscale
            bg_small = jnp.clip(resize(bgimg, (h // ds, w // ds)),
                                0.0, 255.0).astype(jnp.uint8)
            if self.pack_d2h:
                from ..ops.wirepack import pack_plane
                both = jnp.concatenate(
                    [jnp.clip(alpha, 0.0, 255.0),
                     jnp.clip(segmask, 0.0, 255.0)],
                    axis=0).astype(jnp.uint8)       # (2h, w)
                return new_carry, (pack_plane(both), bg_small, both)
            packed = jnp.concatenate(
                [alpha[..., None], segmask[..., None]],
                axis=-1).astype(jnp.uint8)
        return new_carry, (packed, bg_small)

    @functools.partial(jax.jit, static_argnums=(0,))
    def process_chunk(self, carry: BgCarry, frames: jax.Array):
        if frames.ndim == 3:  # (N, H*3/2, W) I420 uint8 wire format
            from ..ops.color import yuv420_to_bgr
            frames = jax.vmap(yuv420_to_bgr)(frames)
        return jax.lax.scan(self._step, carry, frames)

    # -- bg_step (offline) stage scans ----------------------------------------
    def _stage1_step(self, carry: BgCarry, frame_full: jax.Array):
        """bg_step stage 1 per-frame body (`bg_offline.py:51-97`): seg ->
        object removal -> trimap -> matting -> per-frame regionfill bg.
        Emits (segmask, bg) — the stage's artifact contract — and
        accumulates the always-bg EMA in the carry: the final
        (bg_model, bg_seen) becomes a stage-1 artifact that stage 3
        prefers over the stage-2 temporal mean wherever a pixel was ever
        actually SEEN as background (VERDICT r4 item 1 — the offline
        stages now consume the same streaming-EMA evidence that fixed
        the occluder in bg mode; reference fusion contract
        `bg_offline.py:150-151`)."""
        h, w = self.work_hw
        frame = frame_full.astype(jnp.float32)
        if frame.shape[:2] != self.work_hw:
            frame = resize(frame, self.work_hw)
        norm = imnormalize(frame)

        segmask, bank = self._segment_and_bank(carry, frame, norm)
        fg_exists = (segmask >= 128).sum() > self.fg_exist_thr * h * w
        # coarse pass-1 matte, same as the streaming step: its alpha
        # only shapes the regionfill hole and next frame's recurrence;
        # stage 3 runs the full-res final matte
        alpha = self._matting_pass(frame, carry.alpha_pre, segmask,
                                   coarse=True)
        alpha = jnp.where(fg_exists, alpha, 0.0)
        bgimg, bg_sol = self._per_frame_background(frame, alpha,
                                                   carry.bg_prev)
        # no foreground -> the frame IS the background
        # (`bg_offline.py:69-70`)
        bgimg = jnp.where(fg_exists, bgimg, frame)

        bg_model, bg_seen = self._bg_model_update(carry, frame, alpha,
                                                  segmask, bgimg)
        tracking = (alpha >= 128).sum() > self.fg_exist_thr * h * w
        new_carry = _canon(BgCarry(alpha_pre=alpha, tracking=tracking,
                                   frame_prev=norm, fid=carry.fid + 1,
                                   bg_prev=bg_sol, bank_k=bank[0],
                                   bank_v=bank[1], bank_n=bank[2],
                                   bg_model=bg_model,
                                   bg_seen=bg_seen))
        packed = jnp.concatenate(
            [segmask[..., None], jnp.clip(bgimg, 0.0, 255.0)],
            axis=-1).astype(jnp.uint8)
        return new_carry, packed

    @functools.partial(jax.jit, static_argnums=(0,))
    def process_chunk_stage1(self, carry: BgCarry, frames: jax.Array):
        """bg_step stage 1 over a frame chunk: one compiled scan instead
        of the per-stage host round-trips of the modular loop."""
        if frames.ndim == 3:
            from ..ops.color import yuv420_to_bgr
            frames = jax.vmap(yuv420_to_bgr)(frames)
        return jax.lax.scan(self._stage1_step, carry, frames)

    def _stage3_step(self, carry: BgCarry, xs):
        """bg_step stage 3 per-frame body (`bg_offline.py:133-177`):
        bg-difference mask against the fused (per-frame x global) bg ->
        second matting pass -> fg un-blend. Emits (alpha, fg)."""
        frame_full, bgimg_u8, segmask_u8 = xs
        frame = frame_full.astype(jnp.float32)
        if frame.shape[:2] != self.work_hw:
            frame = resize(frame, self.work_hw)
        bgimg = bgimg_u8.astype(jnp.float32)
        segmask = segmask_u8.astype(jnp.float32)

        diff = bgr2gray(jnp.abs(frame - bgimg))
        alphabg = jnp.where(diff > self.bg_mask_thr, 255.0, diff)
        alphabg = morph.dilate(jnp.clip(alphabg, 0.0, 255.0), 4, 2)
        alpha_ensm = segmask * jnp.floor(alphabg / 255.0)

        # first frame seeds alpha_pre from the ensembled mask
        # (`bg_offline.py:138-139`)
        alpha_pre = jnp.where(carry.fid == 0, alpha_ensm, carry.alpha_pre)
        alpha = self._matting_pass(frame, alpha_pre, alpha_ensm)

        bg_final = jnp.where((alpha == 0)[..., None], frame, bgimg)
        fg = get_fg(frame, alpha, bg_final)

        new_carry = _canon(BgCarry(alpha_pre=alpha, tracking=carry.tracking,
                                   frame_prev=carry.frame_prev,
                                   fid=carry.fid + 1,
                                   bg_prev=carry.bg_prev,
                                   bank_k=carry.bank_k,
                                   bank_v=carry.bank_v,
                                   bank_n=carry.bank_n,
                                   bg_model=carry.bg_model,
                                   bg_seen=carry.bg_seen))
        packed = jnp.concatenate(
            [alpha[..., None], jnp.clip(fg, 0.0, 255.0)],
            axis=-1).astype(jnp.uint8)
        return new_carry, packed

    @functools.partial(jax.jit, static_argnums=(0,))
    def process_chunk_stage3(self, carry: BgCarry, frames: jax.Array,
                             bgimgs: jax.Array, segmasks: jax.Array):
        if frames.ndim == 3:
            from ..ops.color import yuv420_to_bgr
            frames = jax.vmap(yuv420_to_bgr)(frames)
        return jax.lax.scan(self._stage3_step, carry,
                            (frames, bgimgs, segmasks))

    # -- single-chip: S independent segments batched through one scan ---------
    def init_carries(self, n_segments: int) -> BgCarry:
        return jax.tree.map(
            lambda x: jnp.stack([x] * n_segments), self.init_carry())

    @functools.partial(jax.jit, static_argnums=(0,))
    def process_chunk_segments(self, carries: BgCarry, frames: jax.Array):
        """Advance S independent clip segments N frames in lockstep (see
        `FusedGreenPipeline.process_chunk_segments` — same trade:
        per-dispatch compute rises ~Sx while wire bytes/frame stay
        identical; the seed segmenter runs only on steps where a segment
        needs seeding, `_step_batched`).

        frames: (S, N, H, W, 3) BGR or (S, N, H*3/2, W) I420."""
        if frames.ndim == 4:
            from ..ops.color import yuv420_to_bgr
            frames = jax.vmap(jax.vmap(yuv420_to_bgr))(frames)
        xs = jnp.swapaxes(frames, 0, 1)          # (N, S, ...)
        carries, ys = jax.lax.scan(self._step_batched, carries, xs)
        return carries, tuple(jnp.swapaxes(y, 0, 1) for y in ys)

    # -- multi-chip: segments of one clip in parallel over the data axis ----
    def process_segments(self, mesh, segments: jax.Array):
        """Run S clip segments in parallel, one per `data`-axis device
        (see `FusedGreenPipeline.process_segments`; segment boundaries
        reset the carry — the re-seed `bg.py:103-104` performs whenever
        tracking drops).

        segments: (S, L, H, W, 3) with S divisible by mesh.shape['data'].
        Each device receives a block of S/data segments and advances them
        in lockstep through `_step_batched` (the single-chip
        segment-batching step), so S > data is handled — no segment is
        dropped. Returns (packed (S, L, h, w, C),
        bg_small (S, L, h/ds, w/ds, 3)).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        n_data = mesh.shape["data"]
        if segments.shape[0] % n_data:
            raise ValueError(
                f"S={segments.shape[0]} segments not divisible by the "
                f"mesh data axis ({n_data})")

        # SegAgent seeds shard their TTA crop batch over the model axis
        # (VERDICT r4 item 6); SCHP/chroma seeds accept-and-ignore it
        model_axis = (("model", mesh.shape["model"])
                      if mesh.shape.get("model", 1) > 1 else None)

        def one_segment(seg):
            # seg: (S/data, L, H, W, 3) — this device's segment block
            carries = self.init_carries(seg.shape[0])
            xs = jnp.swapaxes(seg, 0, 1)          # (L, S_local, ...)
            _, ys = jax.lax.scan(
                lambda c, x: self._step_batched(c, x, model_axis),
                carries, xs)
            return tuple(jnp.swapaxes(y, 0, 1) for y in ys)

        n_outs = 3 if self.pack_d2h else 2  # pack mode adds the fallback
        fn = shard_map(one_segment, mesh=mesh,
                       in_specs=P("data"),
                       out_specs=tuple([P("data")] * n_outs),
                       check_vma=False)
        seg_sharded = jax.device_put(
            segments, NamedSharding(mesh, P("data")))
        return jax.jit(fn)(seg_sharded)

    # -- host driver -----------------------------------------------------------
    def _preprocess(self, host_downscale):
        import cv2
        wh = (self.work_hw[1], self.work_hw[0])

        def preprocess(arr):
            if host_downscale and arr.shape[1:3] != self.work_hw:
                arr = np.stack([cv2.resize(f, wh) for f in arr])
            if self.wire == "yuv420":
                arr = np.stack([
                    cv2.cvtColor(np.ascontiguousarray(f, np.uint8),
                                 cv2.COLOR_BGR2YUV_I420) for f in arr])
            return arr
        return preprocess

    def _fetch_packed(self, p: np.ndarray, outs, s=None) -> np.ndarray:
        """Fetched payload -> (N, h, w, C) uint8 planes. In pack mode
        `p` is (N, P) packed vectors of the stacked (2h, w)
        alpha+segmask plane; `outs[2]` holds the device-resident full
        planes, fetched per frame only on band-budget overflow. `s`
        indexes the segment axis in segmented runs."""
        if not self.pack_d2h:
            return p
        from ..ops.wirepack import unpack_planes
        full = outs[2]

        def fallback(i):
            return full[i] if s is None else full[s, i]
        h, w = self.work_hw
        both = unpack_planes(p, 2 * h, w, fallback=fallback)
        return np.stack([both[:, :h], both[:, h:]], axis=-1)

    def _assemble_outputs(self, frames, packed, bg_small):
        """Artifacts from the d2h payload. Host-fetch mode reconstructs:
        bg = alpha==0 ? frame : upsampled regionfilled bg; fg = HSV
        un-blend against that bg (native `vu_unblend_fg_batch`, numpy
        fallback)."""
        import cv2
        wh = (self.work_hw[1], self.work_hw[0])
        frames_w = np.stack([
            cv2.resize(np.asarray(f, np.uint8), wh)
            if f.shape[:2] != self.work_hw else np.asarray(f, np.uint8)
            for f in frames])
        alphas, segmasks = packed[..., 0], packed[..., 1]
        if self.fetch == "device":
            return alphas, segmasks, packed[..., 2:5], packed[..., 5:8]
        # Hole-aware reconstruction. The device bg is, per pixel
        # (`_per_frame_background` + `bg.py:99-102` semantics):
        #   alpha == 0          -> the frame itself
        #   inside the dilated hole -> the regionfill membrane (smooth —
        #       survives the wire downsample losslessly in practice)
        #   else (soft ring)    -> (1-a) * frame darkened in HSV —
        #       recomputed here EXACTLY from frame + alpha, because
        #       down/upsampling that ring would bleed subject color into
        #       the hole (the failure mode of naive where(alpha==0)).
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        bgs = np.empty_like(frames_w)
        for i in range(frames_w.shape[0]):
            a = alphas[i]
            hole = cv2.dilate((a > 128).astype(np.uint8), kernel,
                              iterations=2)
            hsv = cv2.cvtColor(frames_w[i], cv2.COLOR_BGR2HSV).astype(
                np.float32)
            dark = cv2.cvtColor(
                np.clip((1.0 - a / 255.0)[..., None] * hsv, 0,
                        255).astype(np.uint8), cv2.COLOR_HSV2BGR)
            bg_up = cv2.resize(bg_small[i], wh,
                               interpolation=cv2.INTER_LINEAR)
            bg = np.where((hole > 0)[..., None], bg_up, dark)
            bgs[i] = np.where((a == 0)[..., None], frames_w[i], bg)
        from .. import runtime as native_runtime
        if native_runtime.available():
            fgs = native_runtime.unblend_fg_batch(frames_w, alphas, bgs)
        else:
            fgs = _unblend_fg_numpy(frames_w, alphas, bgs)
        return alphas, segmasks, fgs, bgs

    def run(self, frames, chunk_size: int = 4, host_downscale: bool = True,
            timer=None):
        """Returns (alphas, segmasks, fgs, bgs) uint8 at work res.

        `timer`: optional `utils.profiling.StageTimer` — same per-stage
        report contract as `FusedGreenPipeline.run`."""
        from ..utils.profiling import StageTimer
        timer = timer or StageTimer()
        frames = list(frames)
        carry = self.init_carry()
        outs, lengths = [], []
        streamer = iter(FrameStreamer(frames, chunk_size=chunk_size,
                                      preprocess=self._preprocess(
                                          host_downscale)))
        while True:
            with timer.stage("stream_wait"):
                chunk = next(streamer, None)
            if chunk is None:
                break
            n = chunk.shape[0]
            if n < chunk_size:
                pad = jnp.tile(chunk[-1:],
                               (chunk_size - n,) + (1,) * (chunk.ndim - 1))
                chunk = jnp.concatenate([chunk, pad], axis=0)
            with timer.stage("dispatch"):
                carry, chunk_outs = self.process_chunk(carry, chunk)
                if timer.block:
                    jax.block_until_ready(chunk_outs)
            for buf in chunk_outs[:2]:  # never auto-fetch the fallback
                buf.copy_to_host_async()
            outs.append(chunk_outs)
            lengths.append(n)
        with timer.stage("fetch"):
            packed = np.concatenate(
                [self._fetch_packed(np.asarray(o[0])[:n], o)
                 for o, n in zip(outs, lengths)])
            bg_small = np.concatenate(
                [np.asarray(o[1])[:n] for o, n in zip(outs, lengths)])
        with timer.stage("reconstruct"):
            return self._assemble_outputs(frames, packed, bg_small)

    def run_segmented(self, frames, n_segments: int = 2,
                      chunk_size: int = 4, host_downscale: bool = True,
                      timer=None):
        """Like `run`, but splits the clip into `n_segments` contiguous
        segments advanced in lockstep (single-chip batching; segment
        boundaries reset the carry — the same re-seed the reference
        performs whenever tracking drops, `bg.py:103-104`)."""
        from ..utils.profiling import StageTimer
        timer = timer or StageTimer()
        frames = list(frames)
        n = len(frames)
        seg_len = -(-n // n_segments)
        padded = frames + [frames[-1]] * (n_segments * seg_len - n)
        prep = self._preprocess(host_downscale)

        from .fused_green import _prefetch_chunks

        def build_chunk(c0, cn):
            return np.stack([
                prep(np.stack(
                    [padded[s * seg_len + min(c0 + i, seg_len - 1)]
                     for i in range(chunk_size)]))
                for s in range(n_segments)])

        specs = [(c0, min(chunk_size, seg_len - c0))
                 for c0 in range(0, seg_len, chunk_size)]
        carries = self.init_carries(n_segments)
        device_outs, lengths = [], []
        for chunk, cn in _prefetch_chunks(build_chunk, specs):
            with timer.stage("dispatch"):
                carries, chunk_outs = self.process_chunk_segments(
                    carries, chunk)
                if timer.block:
                    jax.block_until_ready(chunk_outs)
            for buf in chunk_outs[:2]:  # never auto-fetch the fallback
                buf.copy_to_host_async()
            device_outs.append(chunk_outs)
            lengths.append(cn)

        with timer.stage("fetch"):
            seg_p = [[] for _ in range(n_segments)]
            seg_b = [[] for _ in range(n_segments)]
            for chunk_outs, cn in zip(device_outs, lengths):
                p = np.asarray(chunk_outs[0])[:, :cn]
                b = np.asarray(chunk_outs[1])[:, :cn]
                for s in range(n_segments):
                    seg_p[s].append(
                        self._fetch_packed(p[s], chunk_outs, s))
                    seg_b[s].append(b[s])
            packed = np.concatenate(
                [np.concatenate(sp) for sp in seg_p])[:n]
            bg_small = np.concatenate(
                [np.concatenate(sb) for sb in seg_b])[:n]
        with timer.stage("reconstruct"):
            return self._assemble_outputs(frames, packed, bg_small)


def _unblend_fg_numpy(frames: np.ndarray, alphas: np.ndarray,
                      bgs: np.ndarray) -> np.ndarray:
    """Vectorized numpy fallback of `vu_unblend_fg_batch` (HSV un-blend
    with a per-pixel background, `fgfuncs.py:84-110` semantics)."""
    import cv2
    out = np.empty_like(frames)
    for i in range(frames.shape[0]):
        img_hsv = cv2.cvtColor(frames[i], cv2.COLOR_BGR2HSV).astype(
            np.float32)
        bg_hsv = cv2.cvtColor(bgs[i], cv2.COLOR_BGR2HSV).astype(np.float32)
        a = (alphas[i] / 255.0)[..., None]
        fg_hsv = np.clip(img_hsv - (1.0 - a) * bg_hsv, 0, 255)
        out[i] = cv2.cvtColor(fg_hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
    return out


def run_fused(cfg: dict, frames=None, save: bool = True,
              chunk_size: int = 4, work_long_side: int = 960,
              use_stm_tracking: bool = True, segments: int = 1,
              wire: str = "bgr", profile: bool = False) -> dict:
    """Driver-compatible bg-mode runner on the fused path (same artifacts
    as `pipeline/bg.py`: segmask_/bg_/alphamask_/fg_*.jpg at work res).

    `segments > 1` batches S independent clip segments through one
    compiled scan (single-chip MXU utilization; carries reset at segment
    boundaries). `wire` selects the host->device frame format. `profile`
    prints the per-stage runtime report and honors $VU_TRACE_DIR."""
    import os
    import time

    from .common import read_frames, artifact_path
    from .. import runtime as native_runtime
    from ..utils.fileio import save_img
    from ..utils.profiling import StageTimer, maybe_trace

    data = cfg["data"]
    if save:
        os.makedirs(data["dst_img_dir"], exist_ok=True)
    st = time.time()
    frame_list = frames if frames is not None else read_frames(cfg)
    h, w, _ = frame_list[0].shape
    print(f"{len(frame_list)} frames. Reading Data Done! "
          f"{time.time() - st:.2f}s")

    pipe = FusedBgPipeline(cfg, (h, w), work_long_side=work_long_side,
                           use_stm_tracking=use_stm_tracking, wire=wire)
    timer = StageTimer(block=True) if profile else None
    st = time.time()
    with maybe_trace():
        if segments > 1:
            alphas, segmasks, fgs, bgs = pipe.run_segmented(
                frame_list, n_segments=segments, chunk_size=chunk_size,
                timer=timer)
        else:
            alphas, segmasks, fgs, bgs = pipe.run(frame_list,
                                                  chunk_size=chunk_size,
                                                  timer=timer)
    elapsed = time.time() - st
    if timer is not None:
        print(timer.report(numframes=len(frame_list)))
    print(f"fused bg: {len(frame_list)} frames in {elapsed:.2f}s "
          f"({len(frame_list) / elapsed:.2f} fps)")

    if save:
        dst = data["dst_img_dir"]
        outputs = (("alphamask", np.repeat(alphas[..., None], 3, -1)),
                   ("segmask", np.repeat(segmasks[..., None], 3, -1)),
                   ("fg", fgs), ("bg", bgs))
        if native_runtime.available():
            for kind, imgs in outputs:
                paths = [artifact_path(dst, kind, i)
                         for i in range(len(frame_list))]
                native_runtime.encode_batch(paths,
                                            np.ascontiguousarray(imgs))
        else:
            for kind, imgs in outputs:
                for i in range(len(frame_list)):
                    save_img(artifact_path(dst, kind, i), imgs[i])
    return {"alphas": list(alphas), "numframes": len(frame_list),
            "fps": len(frame_list) / elapsed}
