"""Fused green mode — the whole per-frame stage chain as ONE compiled
program, scanned over frame chunks.

This is the performance path (SURVEY.md §7 step 8): where the modular
driver (`pipeline/green.py`) crosses host<->device at every stage like the
reference crosses host<->GPU (`SURVEY.md §2.4`), this path keeps frames,
the GMM state, and the alpha recurrence device-resident:

    host:   decode -> FrameStreamer (double-buffered device_put)
    device: lax.scan over frames of
              seg (tracking shortcut | DeepLab TTA | chroma seed) ->
              color-filter (cond: refit / predict) ->
              object removal -> trimap -> matting UNet -> color-correct ->
              fg un-blend
    host:   fetch uint8 artifacts per chunk

All stages run at one work resolution (long side `work_long_side`,
divisible by 32 for the matting net). Data-dependent gates (tracking,
fg-exists, cf refit schedule) are `lax.cond`/selects inside the scan —
one compiled program serves the entire clip.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.binseg import HumanSegAgent, SegAgent
from ..agents.colorfiltering import CFState, ColorFilteringAgent
from ..agents.vmatting import VMattingAgent
from ..ops.chroma import chroma_segment
from ..ops.color import hsv2bgr
from ..ops.compositing import color_correct, get_fg
from ..ops.connected import remove_invalid_objects_ds
from ..ops.geometry import get_target_size, resize
from ..ops.trimap import generate_trimap_withbg
from ..parallel.streaming import FrameStreamer
from .common import build_score_map


class GreenCarry(NamedTuple):
    alpha_pre: jax.Array     # (H, W) work-res alpha of previous frame
    tracking: jax.Array      # scalar bool
    cf_state: CFState
    fid: jax.Array           # scalar int32


def _canon(tree):
    """Strip weak types so carry avals are stable across scan/chunk calls."""
    return jax.tree.map(
        lambda x: jax.lax.convert_element_type(x, x.dtype), tree)


def _build_seed_segmenter(cfg_binseg: dict, dtype):
    """Seed-segmenter dispatch for the fused pipelines.

    Returns None for the weights-free chroma seed; otherwise a
    SegAgent/HumanSegAgent whose `predict_mask_impl` runs inside the scan's
    non-tracking branch. `type` defaults to "deeplab" when a model_path is
    configured (the reference green mode always runs SegAgent) and
    "chroma" otherwise.
    """
    kw = dict(cfg_binseg)
    kind = kw.pop("type", None)
    if kind is None:
        kind = "deeplab" if kw.get("model_path") else "chroma"
    if kind == "chroma":
        return None
    kw.setdefault("dtype", dtype)
    if kind == "human":
        return HumanSegAgent(**kw)
    return SegAgent(**kw)


def seed_mask(seg, frame: jax.Array, model_axis=None) -> jax.Array:
    """Non-tracking seed mask: neural segmenter or chroma prior.
    `model_axis` = ("axis_name", size) shards SegAgent's TTA crop batch
    over that bound mesh axis (see `SegAgent._tta_scores_sharded`)."""
    if seg is None:
        return chroma_segment(frame)[0]
    return seg.predict_mask_impl(seg.variables, frame,
                                 model_axis=model_axis)


def _prefetch_chunks(build, specs, depth: int = 2):
    """Background-thread chunk builder: host prep (resize + wire pack +
    device_put) of chunk t+1 overlaps the device's work on chunk t — the
    `run_segmented` analog of FrameStreamer's double buffering.

    Yields (device_array, n_valid) per spec (c0, cn)."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for c0, cn in specs:
                q.put((jnp.asarray(build(c0, cn)), cn))
        except Exception as e:  # surface errors to the consumer
            q.put(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        if isinstance(item, Exception):
            raise item
        yield item
    t.join()


class FusedGreenPipeline:
    """Compiled green-mode runner for one clip geometry."""

    def __init__(self, cfg: dict, frame_hw: Tuple[int, int],
                 work_long_side: int = 960, fetch_fg: str = "auto",
                 matting_dtype=jnp.bfloat16, seg_dtype=jnp.bfloat16,
                 wire: str = "bgr", cc_downscale: int = 2,
                 pack_d2h="auto"):
        """`fetch_fg`: where the fg artifact materializes.
          - "device": fg computed and fetched from the device (preferred on
            PCIe-attached hosts).
          - "host": only the alpha plane and per-frame bg color cross the
            device->host link; fg is reconstructed by the native C++
            runtime (`vu_get_fg_batch`) — 4x less d2h traffic, right call
            on bandwidth-limited links.
          - "auto": "host" when the native runtime is available.
        `pack_d2h`: bit-pack the d2h alpha plane (`ops/wirepack.py` —
        two bitplanes + compacted unknown-band values, ~3.3x fewer d2h
        bytes, reconstruction bit-exact; band-budget overflows fall back
        to fetching that frame's full plane, kept device-resident).
        "auto" enables it in host-fetch mode.
        """
        from .. import runtime as native_runtime
        if fetch_fg == "auto":
            fetch_fg = "host" if native_runtime.available() else "device"
        self.fetch_fg = fetch_fg
        if pack_d2h == "auto":
            pack_d2h = fetch_fg == "host"
        self.pack_d2h = bool(pack_d2h) and fetch_fg == "host"
        # "bgr" (default) ships packed uint8 BGR — lossless parity with
        # the reference's full-res BGR feed. "yuv420" crosses the
        # host->HBM link as I420 uint8 (1.5 bytes/px, the format video
        # decoders emit natively, converted to BGR on device) — the
        # bench/production opt-in on bandwidth-limited links; it
        # round-trips through lossy studio-swing BT.601 4:2:0.
        self.wire = wire
        self.cfg = cfg
        self.ori_hw = tuple(frame_hw)
        self.work_hw = get_target_size(frame_hw[0], frame_hw[1],
                                       work_long_side, division=32)
        self.cf = ColorFilteringAgent(**{
            k: v for k, v in cfg["colorfiltering"].items()
            if k != "input_long_side"}, input_long_side=work_long_side)
        # bf16 compute on the MXU for the matting UNet (params stay f32;
        # the alpha leaves the net in f32 via the tanh output)
        self.vmat = VMattingAgent(
            model_path=cfg["vmatting"].get("model_path"),
            input_long_side=work_long_side, dtype=matting_dtype)
        self.score_map = jnp.asarray(
            build_score_map(self.work_hw[0], self.work_hw[1], cfg))
        # seed segmenter for non-tracking frames (reference
        # `tools/unscreen/green.py:74-80` runs SegAgent there; chroma is
        # this framework's weights-free fallback, `binseg.type: "chroma"`)
        self.seg = _build_seed_segmenter(cfg.get("binseg", {}), seg_dtype)
        self.fg_exist_thr = float(cfg["fg_exist_thr"])
        self.cf_duration = int(cfg["colorfiltering_update_duration"])
        self.cf_train_iters = int(cfg["colorfiltering_train_iters"])
        self.saliency_thr = float(cfg["objectremoval"]["saliency_thr"])
        self.consensus_thr = float(cfg["objectremoval"]["consensus_thr"])
        # labeling/stats resolution divisor for invalid-object removal:
        # the segmented-scan CC flood is the heaviest non-MXU stage
        # (10.9 ms/frame at ds=2 on 960x544 vs the matting UNet's 8.0);
        # decisions are area ratios, so ds=4 halves that cost with
        # near-identical keep/drop behavior (min_area rescales)
        self.or_downscale = int(cfg["objectremoval"].get("downscale", 2))
        # color_correct's Lab-distance map resolution divisor: the map is
        # a smooth distance to ONE color (sqrt-iterated globally), and the
        # reference already nearest-resamples it onto the alpha
        # (`imgprocess.py:263-300` computes at 960 then F.interpolate) —
        # computing it at work/cc_downscale quarters the stage's cost
        # (1.75 ms -> ~0.5 at 960x544) with the final multiply still at
        # full res. 1 restores the exact-res map.
        self.cc_long_side = max(self.work_hw) // max(int(cc_downscale), 1)
        tri = cfg["trimap"]
        self.tri_kernel = int(tri["kernelsize"])
        self.tri_iters = int(tri["iters"])
        self.tri_winsize = tuple(int(v) for v in tri["color_winsize"])
        # displacement-adaptive unknown band (VERDICT r4 item 3): a
        # motion-blurred boundary's soft ramp extends ~half the
        # inter-frame displacement past the hard mask — far outside the
        # default +-`iters` band, and the matting net can only predict
        # INSIDE the band (`vmatting/agent.py:128-131` hard reset). When
        # the mask centroid moved more than `2*iters` px since the last
        # frame, the band widens to 2x (beyond `4*iters` px: 4x; beyond
        # `5*iters` px: 8x). The top tier exists for the production
        # geometry: at work 960 / config iters 5 the protocol mblur clip
        # moves ~31 px/frame (blur half-ramp ~24 px) while the 4x band
        # reaches only 20 px — measured green_mblur 0.78 at the 960
        # operating point vs 0.87 at the test geometry, whose band is
        # RELATIVELY 2x wider (iters 3 of width 288). The tier index is
        # resolved per STEP outside the vmapped body, so
        # only the selected morphology width executes (`lax.switch`
        # with an unbatched index stays real control flow under vmap).
        # `trimap.adaptive_band: false` restores the fixed band.
        self.tri_adaptive = bool(tri.get("adaptive_band", True))
        self.tri_tiers = (1, 2, 4, 8)

    def init_carry(self) -> GreenCarry:
        h, w = self.work_hw
        return _canon(GreenCarry(
            alpha_pre=jnp.zeros((h, w), jnp.float32),
            tracking=jnp.asarray(False),
            cf_state=self.cf.reset_gmms(),
            fid=jnp.asarray(0, jnp.int32)))

    # -- per-frame step (traced once) ----------------------------------------
    def _prep_frame(self, frame_full: jax.Array) -> jax.Array:
        frame = frame_full.astype(jnp.float32)
        if frame.shape[:2] != self.work_hw:
            frame = resize(frame, self.work_hw)
        return frame

    def _step(self, carry: GreenCarry, frame_full: jax.Array):
        frame = self._prep_frame(frame_full)

        # 1. segmentation: tracking shortcut or seed segmenter. `lax.cond`
        # (not a select) so the neural forward only executes on frames
        # that actually lost tracking, like the reference
        # (`tools/unscreen/green.py:74-80`).
        segmask = jax.lax.cond(
            carry.tracking,
            lambda op: op[0],
            lambda op: seed_mask(self.seg, op[1]),
            (carry.alpha_pre, frame))
        return self._post_seg(carry, frame, segmask)

    def _step_batched(self, carries: GreenCarry, frames_b: jax.Array,
                      model_axis=None):
        """Per-frame step over S stacked segments.

        NOT a plain `vmap(self._step)`: under vmap the tracking
        `lax.cond` becomes a select that executes BOTH branches, so the
        seed segmenter's grid TTA (the heaviest compute in the pipeline
        with `binseg.type: "deeplab"`) would run on every frame of every
        segment. Instead the seed branch is hoisted behind one scalar
        `any(~tracking)` cond: it runs — batched over all S segments —
        only on steps where at least one segment actually needs a seed
        (frame 0 and tracking losses), and a per-segment select picks
        seed vs shortcut. Everything downstream is vmapped."""
        frames = jax.vmap(self._prep_frame)(frames_b)

        need_seed = ~carries.tracking  # (S,)

        def seed_all(fr):
            return jax.vmap(
                lambda f: seed_mask(self.seg, f, model_axis))(fr)

        seeds = jax.lax.cond(
            need_seed.any(), seed_all,
            lambda fr: jnp.zeros(fr.shape[:3], jnp.float32), frames)
        segmask = jnp.where(need_seed[:, None, None], seeds,
                            carries.alpha_pre)

        # GMM color-filter refit, hoisted the same way: the EM fit
        # (cf_train_iters x 6 GMM fits) belongs on every-30th-frame +
        # seeding steps only (`green.py:88-96`); a vmapped per-segment
        # cond would run it every frame for every segment. Three tiers
        # (VERDICT r4 weak #6): segments advance in lockstep, so their
        # fid%duration schedules usually COINCIDE — the common refit
        # step is "all S refit", which runs the vmapped fit alone. Only
        # a desynced step (a tracking loss re-seeded one segment's
        # schedule) pays fit AND predict for the tree-select; no-refit
        # steps run predict only.
        refits = jax.vmap(self._cf_refit_flag)(carries)

        def fit_all(args):
            fr, sm, st = args
            return jax.vmap(self._run_cf_fit)(fr, sm, st)

        def fit_some(args):
            fr, sm, st = args
            fit = jax.vmap(self._run_cf_fit)(fr, sm, st)
            pred = jax.vmap(self._run_cf_predict)(fr, sm, st)

            def sel(a, b):
                flags = refits.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(flags, a, b)
            return jax.tree.map(sel, fit, pred)

        def fit_mixed(args):
            return jax.lax.cond(refits.all(), fit_all, fit_some, args)

        def fit_none(args):
            fr, sm, st = args
            return jax.vmap(self._run_cf_predict)(fr, sm, st)

        alphacf, bg_color, _, cf_state = jax.lax.cond(
            refits.any(), fit_mixed, fit_none,
            (frames, segmask, carries.cf_state))
        # one shared band tier for the lockstep segments (max over the
        # batch) so the trimap `lax.switch` index stays unbatched
        tier = jax.vmap(self._band_tier)(carries.alpha_pre, alphacf).max()
        return jax.vmap(
            self._post_cf, in_axes=(0, 0, 0, 0, 0, 0, None))(
            carries, frames, segmask, alphacf, bg_color, cf_state, tier)

    # -- cf stage helpers -----------------------------------------------------
    def _cf_refit_flag(self, carry: GreenCarry):
        """cf_iters schedule (`tools/unscreen/green.py:88-96`)."""
        return ((carry.fid % self.cf_duration == 0)
                | ~carry.tracking | ~carry.cf_state.trained)

    def _run_cf_fit(self, frame, segmask, state):
        return self.cf.device_forward_impl(frame, segmask,
                                           self.cf_train_iters, state)

    def _run_cf_predict(self, frame, segmask, state):
        return self.cf.device_forward_impl(frame, segmask, 0, state)

    # -- displacement-adaptive trimap band ------------------------------------
    def _band_tier(self, alpha_pre: jax.Array,
                   alpha_now: jax.Array) -> jax.Array:
        """Band-width tier (0/1/2) from the mask-centroid displacement
        between the previous matte and the current chroma alpha — the
        inter-frame motion whose blur ramp the unknown band must cover."""
        if not self.tri_adaptive:
            return jnp.asarray(0, jnp.int32)
        h, w = self.work_hw
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)

        def centroid(m):
            wgt = (m >= 128).astype(jnp.float32)
            tot = wgt.sum()
            cy = (wgt.sum(axis=1) * ys).sum() / jnp.maximum(tot, 1.0)
            cx = (wgt.sum(axis=0) * xs).sum() / jnp.maximum(tot, 1.0)
            return cy, cx, tot
        cy0, cx0, t0 = centroid(alpha_pre)
        cy1, cx1, t1 = centroid(alpha_now)
        disp = jnp.sqrt((cy1 - cy0) ** 2 + (cx1 - cx0) ** 2)
        it = float(self.tri_iters)
        tier = jnp.where(disp > 5.0 * it, 3,
                         jnp.where(disp > 4.0 * it, 2,
                                   jnp.where(disp > 2.0 * it, 1, 0)))
        return jnp.where((t0 > 0) & (t1 > 0), tier, 0).astype(jnp.int32)

    def _gen_trimap(self, alphaor: jax.Array, frame: jax.Array,
                    bg_color: jax.Array, tier: jax.Array) -> jax.Array:
        """Trimap with a tier-selected OUTWARD band widening.

        Only the dilate side widens (bg 0 -> unknown 128 in a wider ring
        around the mask): the blur ramp the matting net must resolve
        extends outward past the binarized boundary, while widening the
        ERODE side was measured catastrophic (iters*4 erosion swallows
        thin limbs whole — the solid-fg anchor vanishes and the net
        hedges; 512-geometry walker MIOU 0.98 -> 0.67). Within the
        widened ring, pixels the chroma window confirms as pure screen
        color STAY hard background: the ring necessarily covers the
        region the subject just vacated, where `alpha_pre` is still high
        and the net's temporal prior paints a ~0.6 ghost trail (measured:
        fp 1.5% of the frame, a third of the subject's area) — a
        genuinely blur-mixed pixel is pushed outside the strict HSV
        window by the foreground contribution, so the chroma test
        separates ramp from ghost. `tier` must be an UNBATCHED scalar so
        `lax.switch` stays real control flow (the extra dilate executes
        only on steps that need it)."""
        base = generate_trimap_withbg(
            alphaor, frame, bg_color, self.tri_kernel, self.tri_iters,
            self.tri_winsize)
        if not self.tri_adaptive:
            return base

        def widen(mult):
            def f(tri, mask, fr, bg):
                from ..ops.compositing import is_pixel_inrange
                from ..ops.morphology import dilate
                wide = dilate(mask, self.tri_kernel,
                              self.tri_iters * mult)
                bg_like = is_pixel_inrange(fr, bg, self.tri_winsize)
                return jnp.where(
                    (tri == 0.0) & (wide >= 128.0) & ~bg_like, 128.0,
                    tri)
            return f
        branches = [lambda tri, mask, fr, bg: tri] + [
            widen(m) for m in self.tri_tiers[1:]]
        return jax.lax.switch(tier, branches, base, alphaor, frame,
                              bg_color)

    def _post_seg(self, carry: GreenCarry, frame: jax.Array,
                  segmask: jax.Array):
        """Color filter (cond-gated) + everything after (per sample)."""
        alphacf, bg_color, _, cf_state = jax.lax.cond(
            self._cf_refit_flag(carry),
            lambda a: self._run_cf_fit(*a),
            lambda a: self._run_cf_predict(*a),
            (frame, segmask, carry.cf_state))
        tier = self._band_tier(carry.alpha_pre, alphacf)
        return self._post_cf(carry, frame, segmask, alphacf, bg_color,
                             cf_state, tier)

    def _post_cf(self, carry: GreenCarry, frame: jax.Array,
                 segmask: jax.Array, alphacf: jax.Array,
                 bg_color: jax.Array, cf_state, tier: jax.Array):
        """Object removal -> trimap -> matting -> color-correct -> fg
        (per sample)."""
        h, w = self.work_hw
        fg_exists = (segmask >= 128).sum() > self.fg_exist_thr * h * w

        # 3. invalid-object removal (segmask consensus unless tracking),
        # labeled at half res — decisions are ratio-based (see
        # remove_invalid_objects_ds)
        consensus_ref = jnp.where(carry.tracking, alphacf, segmask)
        alphaor = remove_invalid_objects_ds(
            alphacf, consensus_ref, self.score_map,
            saliency_thr=self.saliency_thr,
            consensus_thr=self.consensus_thr,
            downscale=self.or_downscale)

        # 4. trimap (displacement-adaptive band width) + matting
        trimap = self._gen_trimap(alphaor, frame, bg_color, tier)
        alpha = self.vmat.device_forward_impl(
            self.vmat.variables, frame, carry.alpha_pre, trimap,
            self.work_hw)

        # 5. color correction (distance map at work/cc_downscale res)
        alpha = color_correct(frame, alpha, bg_color,
                              target_long_side=self.cc_long_side)

        # 6. fg un-blend (on device only in "device" fetch mode; in "host"
        # mode the native runtime reconstructs it from alpha + bg_color)
        if self.fetch_fg == "device":
            bgimg = jnp.where((alpha < 128)[..., None], frame,
                              jnp.broadcast_to(bg_color, frame.shape))
            fg = get_fg(frame, alpha, bgimg)
        else:
            fg = None

        # no-foreground gate (`green.py:82-86`)
        alpha = jnp.where(fg_exists, alpha, 0.0)
        if fg is not None:
            fg = jnp.where(fg_exists, fg, 0.0)

        tracking = (alpha >= 128).sum() > self.fg_exist_thr * h * w
        # canonicalize (strip weak types) so chunk N+1 reuses chunk N's
        # compiled program — weak-type drift would force a recompile
        new_carry = _canon(GreenCarry(alpha_pre=alpha, tracking=tracking,
                                      cf_state=cf_state, fid=carry.fid + 1))
        # one packed uint8 output tensor — a single d2h round trip per
        # chunk. bg is NEVER shipped: it is alpha<128 ? frame : bg_color,
        # reconstructable on the host from the per-frame bg_color for free.
        if fg is not None:
            packed = jnp.concatenate(
                [alpha[..., None], fg], axis=-1).astype(jnp.uint8)
            return new_carry, (packed, bg_color)
        if self.pack_d2h:
            # bit-packed alpha wire (~0.31 vs 1 B/px): the full plane
            # stays device-resident as the overflow fallback and is only
            # fetched for frames whose band exceeded the packed budget
            from ..ops.wirepack import pack_plane
            alpha_u8 = jnp.clip(alpha, 0.0, 255.0).astype(jnp.uint8)
            return new_carry, (pack_plane(alpha_u8), bg_color, alpha_u8)
        return new_carry, (alpha[..., None].astype(jnp.uint8), bg_color)

    @functools.partial(jax.jit, static_argnums=(0,))
    def process_chunk(self, carry: GreenCarry, frames: jax.Array):
        """frames: (N, H, W, 3) BGR 0..255, or (N, H*3/2, W) I420 uint8
        stacks (the yuv420 wire format), device-resident."""
        if frames.ndim == 3:
            from ..ops.color import yuv420_to_bgr
            frames = jax.vmap(yuv420_to_bgr)(frames)
        return jax.lax.scan(self._step, carry, frames)

    # -- single-chip: S independent segments batched through one scan ---------
    def init_carries(self, n_segments: int) -> GreenCarry:
        return jax.tree.map(
            lambda x: jnp.stack([x] * n_segments), self.init_carry())

    @functools.partial(jax.jit, static_argnums=(0,))
    def process_chunk_segments(self, carries: GreenCarry,
                               frames: jax.Array):
        """Advance S independent clip segments N frames in lockstep.

        frames: (S, N, H, W, 3) BGR or (S, N, H*3/2, W) I420. The scan
        iterates the frame axis with `_step_batched` over segments —
        per-dispatch compute rises ~Sx while bytes/frame stay identical,
        and the seed segmenter still runs only on steps where a segment
        actually needs seeding (see `_step_batched`). Segment carries
        are independent (fresh GMM/tracking per segment, the same
        chunk-boundary semantics as `process_segments`)."""
        if frames.ndim == 4:
            from ..ops.color import yuv420_to_bgr
            frames = jax.vmap(jax.vmap(yuv420_to_bgr))(frames)
        xs = jnp.swapaxes(frames, 0, 1)          # (N, S, ...)
        carries, ys = jax.lax.scan(self._step_batched, carries, xs)
        return carries, tuple(jnp.swapaxes(y, 0, 1) for y in ys)

    # -- multi-chip: segments of one clip in parallel over the data axis ----
    def process_segments(self, mesh, segments: jax.Array):
        """Run S clip segments in parallel, one per `data`-axis device.

        The frame recurrence (alpha_pre / tracking / GMM warm start) is
        sequential *within* a segment; segments start from fresh carries —
        the chunk-boundary re-seed the reference pipeline itself performs
        whenever tracking resets (`tools/unscreen/green.py:137`,
        SURVEY.md §5 long-context note). This is the TPU-native equivalent
        of the reference's per-video process fan-out
        (`tools/unscreen_parallel.py:22-24`), applied *within* a video.

        segments: (S, L, H, W, 3) with S divisible by mesh.shape['data'].
        Each device receives a block of S/data segments and advances them
        in lockstep through `_step_batched` (the single-chip
        segment-batching step), so S > data is handled — no segment is
        dropped. Returns (packed (S, L, h, w, C), bg_colors (S, L, 3)).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        n_data = mesh.shape["data"]
        if segments.shape[0] % n_data:
            raise ValueError(
                f"S={segments.shape[0]} segments not divisible by the "
                f"mesh data axis ({n_data})")

        # seed-TTA crop batch sharded over the model axis inside the
        # shard_map (VERDICT r4 item 6): the data-axis pairing's second
        # chip contributes to the seed forward instead of idling
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

        # check_vma off: the scan carry mixes replicated constants with
        # data-varying values through nested conds; each device's segment
        # is fully independent so varying-axis tracking adds nothing here.
        n_outs = 3 if self.pack_d2h else 2  # pack mode adds the fallback
        fn = shard_map(one_segment, mesh=mesh,
                       in_specs=P("data"),
                       out_specs=tuple([P("data")] * n_outs),
                       check_vma=False)
        seg_sharded = jax.device_put(
            segments, NamedSharding(mesh, P("data")))
        return jax.jit(fn)(seg_sharded)

    # -- host driver ----------------------------------------------------------
    def run_segmented(self, frames, n_segments: int = 2,
                      chunk_size: int = 4, host_downscale: bool = True,
                      timer=None):
        """Like `run`, but splits the clip into `n_segments` contiguous
        segments advanced in lockstep through `process_chunk_segments`
        (single-chip batching: ~Sx device work per dispatch, same wire
        bytes per frame). Segment boundaries reset the carry — the same
        re-seed the reference performs whenever tracking drops."""
        import cv2

        from ..utils.profiling import StageTimer
        timer = timer or StageTimer()

        frames = list(frames)
        n = len(frames)
        seg_len = -(-n // n_segments)
        # pad the clip tail so every segment has seg_len frames
        padded = frames + [frames[-1]] * (n_segments * seg_len - n)
        wh = (self.work_hw[1], self.work_hw[0])

        def prep(f):
            f = np.asarray(f, np.uint8)
            if host_downscale and f.shape[:2] != self.work_hw:
                f = cv2.resize(f, wh)
            if self.wire == "yuv420":
                f = cv2.cvtColor(np.ascontiguousarray(f),
                                 cv2.COLOR_BGR2YUV_I420)
            return f

        def build_chunk(c0, cn):
            return np.stack([
                np.stack([prep(padded[s * seg_len + c0 + i])
                          for i in range(cn)]
                         + [prep(padded[s * seg_len + c0 + cn - 1])]
                         * (chunk_size - cn))
                for s in range(n_segments)])

        specs = [(c0, min(chunk_size, seg_len - c0))
                 for c0 in range(0, seg_len, chunk_size)]
        carries = self.init_carries(n_segments)
        device_outs, lengths = [], []
        for chunk, cn in _prefetch_chunks(build_chunk, specs):
            with timer.stage("dispatch"):
                carries, outs = self.process_chunk_segments(carries, chunk)
                if timer.block:
                    jax.block_until_ready(outs)
            for buf in outs[:2]:  # never auto-fetch the pack fallback
                buf.copy_to_host_async()
            device_outs.append(outs)
            lengths.append(cn)

        # reassemble: per segment, concatenate chunks, then trim the pad
        with timer.stage("fetch"):
            seg_alpha = [[] for _ in range(n_segments)]
            seg_fg = [[] for _ in range(n_segments)]
            seg_bg = [[] for _ in range(n_segments)]
            for outs, cn in zip(device_outs, lengths):
                p = np.asarray(outs[0])[:, :cn]
                b = np.asarray(outs[1])[:, :cn]
                for s in range(n_segments):
                    seg_alpha[s].append(self._fetch_alphas(p[s], outs, s))
                    if self.fetch_fg == "device":
                        seg_fg[s].append(p[s][..., 1:4])
                    seg_bg[s].append(b[s])
            alphas = np.concatenate(
                [np.concatenate(sa) for sa in seg_alpha])[:n]
            bg_colors = np.concatenate(
                [np.concatenate(sb) for sb in seg_bg])[:n]
            fgs = (np.concatenate([np.concatenate(sf) for sf in seg_fg])[:n]
                   if self.fetch_fg == "device" else None)
        with timer.stage("reconstruct"):
            return self._assemble_outputs(frames, alphas, bg_colors, fgs)

    def _fetch_alphas(self, p: np.ndarray, outs, s=None) -> np.ndarray:
        """Alpha planes from one chunk's fetched payload `p` — (N, P)
        packed vectors in pack mode, (N, h, w, C) otherwise. `outs` is
        the chunk's device output tuple (outs[2] = the device-resident
        full planes, fetched per frame only on band-budget overflow);
        `s` indexes the segment axis in segmented runs."""
        if not self.pack_d2h:
            return p[..., 0]
        from ..ops.wirepack import unpack_planes
        full = outs[2]

        def fallback(i):
            return full[i] if s is None else full[s, i]
        h, w = self.work_hw
        return unpack_planes(p, h, w, fallback=fallback)

    def _assemble_outputs(self, frames, alphas, bg_colors, fgs=None):
        """Host-side artifact reconstruction from the fetched alphas:
        work-res frames come from the HOST originals (never fetched back
        over the link); fg via the native runtime unless the device
        already shipped it (`fgs`); bg = alpha<128 ? frame : bg_color."""
        import cv2
        wh = (self.work_hw[1], self.work_hw[0])
        frames_w = np.stack([
            cv2.resize(np.asarray(f, np.uint8), wh)
            if f.shape[:2] != self.work_hw else np.asarray(f, np.uint8)
            for f in frames])
        if fgs is None:
            from .. import runtime as native_runtime
            fgs = native_runtime.get_fg_batch(frames_w, alphas, bg_colors)
        bgs = np.where((alphas[..., None] < 128), frames_w,
                       bg_colors[:, None, None, :].astype(np.uint8))
        return alphas, fgs, bgs

    def run(self, frames, chunk_size: int = 8, host_downscale: bool = True,
            timer=None):
        """Stream a clip through the compiled pipeline.

        Returns (alphas, fgs, bgs) as uint8 numpy arrays at work res.

        Wire discipline (the tunnel/PCIe is the bottleneck, not compute):
        - `host_downscale` resizes frames to work res on the host before
          transfer (the reference resizes on host too,
          `binseg/agent.py:193`), cutting h2d bytes ~15x at 1080p.
        - outputs start their d2h copy asynchronously right after each
          chunk's dispatch, overlapping the next chunk's compute.
        - bg frames are reconstructed host-side from (alpha, bg_color).

        `timer` (an optional `utils.profiling.StageTimer`) splits the run
        into the reference's per-stage report (`green.py:21-28`
        equivalent): stream_wait / dispatch / fetch / reconstruct — with
        `timer.block=True` the dispatch stage blocks on the chunk's
        outputs, so it reads as true device time (at the cost of the
        overlap the unprofiled run exploits).
        """
        import cv2

        carry = self.init_carry()
        wh = (self.work_hw[1], self.work_hw[0])

        def preprocess(arr):
            if host_downscale and arr.shape[1:3] != self.work_hw:
                arr = np.stack([cv2.resize(f, wh) for f in arr])
            if self.wire == "yuv420":
                arr = np.stack([
                    cv2.cvtColor(np.ascontiguousarray(f, np.uint8),
                                 cv2.COLOR_BGR2YUV_I420) for f in arr])
            return arr

        from ..utils.profiling import StageTimer
        timer = timer or StageTimer()

        device_outs = []
        lengths = []
        streamer = iter(FrameStreamer(frames, chunk_size=chunk_size,
                                      preprocess=preprocess))
        while True:
            with timer.stage("stream_wait"):
                chunk = next(streamer, None)
            if chunk is None:
                break
            n = chunk.shape[0]
            if n < chunk_size:  # pad the tail to the compiled shape
                pad = jnp.tile(chunk[-1:],
                               (chunk_size - n,) + (1,) * (chunk.ndim - 1))
                chunk = jnp.concatenate([chunk, pad], axis=0)
            outs = None
            with timer.stage("dispatch"):
                carry, outs = self.process_chunk(carry, chunk)
                if timer.block:
                    jax.block_until_ready(outs)
            for buf in outs[:2]:  # never auto-fetch the pack fallback
                buf.copy_to_host_async()
            device_outs.append(outs)
            lengths.append(n)

        alphas, fgs, bgs = [], [], []
        start = 0
        for outs, n in zip(device_outs, lengths):
            with timer.stage("fetch"):
                p = np.asarray(outs[0])[:n]
                bc = np.asarray(outs[1])[:n]
                a = self._fetch_alphas(p, outs)
            with timer.stage("reconstruct"):
                alphas.append(a)
                # work-res frames from the HOST originals (never fetch
                # frames back over the device->host link)
                frames_w = np.stack([
                    cv2.resize(np.asarray(f, np.uint8), wh)
                    if f.shape[:2] != self.work_hw
                    else np.asarray(f, np.uint8)
                    for f in frames[start:start + n]])
                start += n
                if self.fetch_fg == "device":
                    fgs.append(p[..., 1:4])
                else:
                    from .. import runtime as native_runtime
                    fgs.append(native_runtime.get_fg_batch(
                        frames_w, a, bc))
                bg = np.where((a[..., None] < 128), frames_w,
                              bc[:, None, None, :].astype(np.uint8))
                bgs.append(bg)
        return (np.concatenate(alphas), np.concatenate(fgs),
                np.concatenate(bgs))


def run_fused(cfg: dict, frames=None, save: bool = True,
              chunk_size: int = 8, work_long_side: int = 960,
              segments: int = 1, wire: str = "bgr",
              profile: bool = False) -> dict:
    """Driver-compatible green-mode runner on the fused path.

    Same artifacts as `pipeline/green.py` (`alphamask_/fg_/bg_*.jpg` at
    work resolution); JPEG encode goes through the native threaded
    runtime when available. `segments > 1` batches S independent clip
    segments through one compiled scan (single-chip MXU utilization);
    `wire` selects the host->device frame format ("bgr" | "yuv420").
    `profile` prints the reference's per-stage runtime report
    (`green.py:21-28` equivalent: device time vs host/wire time per
    frame) and honors $VU_TRACE_DIR for a JAX profiler trace.
    """
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

    pipe = FusedGreenPipeline(cfg, (h, w), work_long_side=work_long_side,
                              wire=wire)
    timer = StageTimer(block=True) if profile else None
    st = time.time()
    with maybe_trace():
        if segments > 1:
            alphas, fgs, bgs = pipe.run_segmented(frame_list,
                                                  n_segments=segments,
                                                  chunk_size=chunk_size,
                                                  timer=timer)
        else:
            alphas, fgs, bgs = pipe.run(frame_list, chunk_size=chunk_size,
                                        timer=timer)
    elapsed = time.time() - st
    print(f"fused green: {len(frame_list)} frames in {elapsed:.2f}s "
          f"({len(frame_list) / elapsed:.2f} fps)")
    if timer is not None:
        print(timer.report(numframes=len(frame_list)))

    if save:
        dst = data["dst_img_dir"]
        if native_runtime.available():
            for kind, imgs in (
                    ("alphamask", np.repeat(alphas[..., None], 3, axis=-1)),
                    ("fg", fgs), ("bg", bgs)):
                paths = [artifact_path(dst, kind, i)
                         for i in range(len(frame_list))]
                native_runtime.encode_batch(paths,
                                            np.ascontiguousarray(imgs))
        else:
            for i in range(len(frame_list)):
                save_img(artifact_path(dst, "alphamask", i), alphas[i])
                save_img(artifact_path(dst, "fg", i), fgs[i])
                save_img(artifact_path(dst, "bg", i), bgs[i])
    return {"alphas": list(alphas), "numframes": len(frame_list),
            "fps": len(frame_list) / elapsed}
