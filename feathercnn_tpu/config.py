"""Engine configuration.

The reference's entire runtime configuration is one constructor knob,
``feather::Net(num_threads)`` plus a mempool pointer bundled as
``RuntimeParameter`` ([pub] src/rt_param.h).  The TPU-native analog is this
dataclass: dtype policy, kernel backend, quantization mode, algorithm
overrides, and mesh/parallelism spec — all static at compile (trace) time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

__all__ = ["EngineConfig", "apply_baked_overrides"]


def apply_baked_overrides(config: "EngineConfig",
                          meta: Dict[str, Any]) -> "EngineConfig":
    """Apply a graph's measured per-model config bakes
    (``meta['config_overrides']``) to ``config`` for every field the
    caller left at its dataclass default.

    An explicit NON-default user value always wins; a value equal to the
    default is indistinguishable from "unset", so to counter a bake pass
    a non-default value or clear the meta entry (bench/batch_sweep.py
    strips the meta when A/B-ing a baked flag for exactly this reason).
    """
    baked = meta.get("config_overrides")
    if not baked:
        return config
    defaults = {f.name: f.default for f in dataclasses.fields(EngineConfig)}
    apply = {k: v for k, v in baked.items()
             if k in defaults and getattr(config, k) == defaults[k]}
    return config.replace(**apply) if apply else config


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # Activation compute dtype: "float32" or "bfloat16" (f32 accumulation
    # either way via preferred_element_type on the MXU).
    compute_dtype: str = "float32"

    # Kernel backend for the hot ops:
    #   "xla"    — pure jnp/lax lowering (the test oracle; runs anywhere)
    #   "pallas" — hand-written Pallas MXU/VPU kernels
    backend: str = "xla"

    # Quantization mode: None | "w8" (weight-only int8, per-out-channel
    # symmetric, dequant fused in epilogue) | "w8a8" (full int8).
    quant: Optional[str] = None

    # Per-layer conv algorithm override: name -> "gemm"|"winograd"|
    # "depthwise"|"direct".  Default: dispatcher picks (SelectAlgo analog,
    # [pub] src/booster/arm/booster.cpp).
    algo_overrides: Tuple[Tuple[str, str], ...] = ()

    # Parallelism: None (single device) or a ShardingConfig (parallel/mesh.py).
    sharding: Optional[Any] = None

    # Run Pallas kernels in interpreter mode (CPU CI without a TPU).
    interpret: bool = False

    # Horizontal fusion: merge sibling convs (same input, same geometry)
    # into one wider conv + channel Slice (passes.merge_sibling_convs) —
    # one HBM read of the shared input instead of one per sibling.
    merge_siblings: bool = True

    # Collapse back-to-back per-channel affines into one Scale
    # (passes.fold_scale_chain): DenseNet-style deploys emit BN->Scale
    # pairs after every Concat; folding halves those elementwise passes
    # and removes one int8 requant round trip per pair.  Exact to f32
    # rounding; numerics only improve under w8a8.  Off = the unfused
    # oracle (A/B via batch_sweep --variants no-fold_scale_chains).
    fold_scale_chains: bool = True

    # Horizontal fusion, Concat form: same-input convs feeding one channel
    # Concat become ONE conv (smaller kernels zero-padded up to the
    # group's max, Concat deleted) — passes.merge_concat_siblings.  The
    # SqueezeNet fire expand1x1+expand3x3 case.  Default OFF: measured
    # -8% paired on SqueezeNet int8 b128 (the only zoo model it fires on)
    # — the 9x FLOPs on the promoted 1x1 branch cost more than the saved
    # input read + Concat (bench/batch_sweep.py --variants
    # no-merge_concats, 2026-08-18).
    merge_concats: bool = False

    # w8a8: layer names whose input activations stay float (weights still
    # int8; the output still emits int8 when consumers agree).  The
    # classic use is the stem: at C_in=3 XLA's int8 conv is ~25% slower
    # than bf16 (measured), and first-layer fp activations are standard
    # int8-accuracy practice.
    fp_act_layers: Tuple[str, ...] = ()

    # Per-layer quant-mode override: name -> "fp_act" | "fp".
    #   "fp_act" — this layer's INPUT activations stay float (weights
    #     still int8, dequant in epilogue); same effect as listing it in
    #     fp_act_layers.
    #   "fp"     — full float edges: input float AND the layer never
    #     emits/accepts int8 in any role (conv emit, Eltwise/Axpy/
    #     Concat/Scale/LRN/pool marks).  Use to flip a specific layer or
    #     stage back to bf16 where the roofline table shows XLA's int8
    #     emitter far below the bf16 rate (e.g. grouped convs at
    #     ResNeXt stage-2 shapes) without giving up int8 elsewhere.
    # Mirrors algo_overrides; consumed by quant/rewrite.py.
    quant_overrides: Tuple[Tuple[str, str], ...] = ()

    # w8a8: enable the requantizing int8 edge types — mixed-scale Concat
    # (concat_int8) and Scale/LRN dequant->op->requant (requant_int8).
    # Off = only single-scale passthrough edges (accuracy debugging).
    int8_requant_ops: bool = True

    # w8a8: let grouped (cardinality/depthwise) convs take int8 edges.
    # Exact (int32 accumulation); XLA's grouped int8 conv is slower than
    # bf16 at equal shapes but the halved edge traffic wins whole-model
    # (paired A/B: ResNeXt-50 +9.5%, MobileNet +5.9%; no-op for group==1
    # models).  Disable per model if a calibration set shows accuracy
    # pressure on depthwise layers.
    int8_grouped: bool = True

    # w8a8: let Axpy (the SE gate*x + y residual add) take int8 on its
    # two big inputs (x, y) at their calibrated scales — dequant-
    # accumulate in f32 registers, requantize in the epilogue; the tiny
    # SE gate stays float.  Restores ResNet-style int8 residual edges in
    # SE nets.
    int8_axpy: bool = True

    # Detection heads: blocked/tiled greedy NMS (kernels/nms.py
    # greedy_nms_blocked) — streams (block, K) IoU strips exactly once,
    # each fused into its consuming reduction, instead of materializing
    # a K x K matrix and re-reading it every fixpoint sweep.  Exact
    # greedy either way.  Proposal uses block=1024 on its 6000-candidate
    # set; DetectionOutput uses block=128 on its C'-way-batched
    # per-class sets (the fixpoint form's (N, C', 400, 400) matrices
    # were ~1.6 GB at SSD b128 — the zoo's largest measured headroom).
    # Off = always the fixpoint form (A/B via batch_sweep --variants
    # no-nms_blocked).
    nms_blocked: bool = True

    # DetectionOutput candidate-box gather via the gather engine
    # (jnp.take) instead of the one-hot MXU matmul.  The one-hot dot
    # wins at MobileNet-SSD scale (P=1917: take measured 1.4x worse)
    # but scales with P while take scales with K — at VGG16-SSD300's
    # P=8732 the live driver measured take ~5% better whole-head.
    # A/B per model; only used on the approx (non-radix) path.
    det_take_gather: bool = False

    # Windowed AVE pooling lowered as a depthwise conv with a ones
    # kernel (+ the same clipped-window denominators) instead of
    # reduce_window — exact (identical sums), and routes the op through
    # XLA's conv emitter whose in-context fusion differs.  Probe flag
    # for pool-dominated segments (ShuffleNet-v1 transitions measure
    # 2-4% SoL on the reduce_window form while the isolated kernel is
    # fast — the cost is contextual).  A/B per model before baking.
    avepool_dwconv: bool = False

    # Non-overlapping AVE pools (stride == kernel, no pad — PSPNet's
    # pyramid bins, SPP levels) lowered as a reshape + axis sum instead
    # of a big-window reduce_window: the k=60 "global" bin measured
    # 1.49 ms at 2.4% SoL through reduce_window in context
    # (bench/results/ceiling_pspnet50_b4_ppm.json) while the same sum
    # as a plain reduction reads the int8 tensor once.  i32 accumulation
    # keeps the requant path bit-exact (integer sums are associative).
    # In-context A/B on pspnet50 b4: a WASH (the cost is contextual) —
    # kept as the probe handle; see avepool_matmul for the form that
    # actually moves the segment.
    avepool_reshape: bool = False

    # Windowed AVE pools as a pair of ones-band matrix contractions
    # riding the MXU ("oh,nhwc->nowc" then "pw,nowc->nopc", int8 x int8
    # -> i32) — the same banded-matmul insight as lrn_band.  Exact: the
    # band sums are precisely reduce_window's window sums (pad cells
    # contribute zero on both forms; the clipped-count denominators are
    # shared), i32 accumulation is order-free.  bench/ppm_ctx_micro.py
    # at the PSPNet PPM fan-out: pools via matmul +0.32 ms over the
    # no-pool base vs reduce_window's +0.84 ms, and reduce_window k10
    # isolated is 0.62 ms vs 0.19 matmul / 0.05 dwconv.  A/B per model
    # (bench/batch_sweep.py --variants avepool_matmul) before baking.
    avepool_matmul: bool = False

    # Graph pass: sibling non-overlapping AVE pools over one input
    # (PSPNet's pyramid bins) derive the coarser bins from the finest
    # bin's grid — ONE read of the big map instead of four (each pool
    # consumer pays a contextual tax; the k=60 bin measured 1.04 ms at
    # 3.4% SoL in context).  fp exact to f32 rounding; under w8a8 the
    # derived bins re-round the base bin's int8 grid (+-0.5 LSB on the
    # block means) — per-model bake, accuracy-gate checked.
    nested_pools: bool = False

    # MAX pools (k<=5) as separable shifted-slice maxima instead of
    # reduce_window — kh+kw strided slices and (kh-1)+(kw-1) elementwise
    # maxima that fuse into neighbors.  Bit-exact (max is order-free,
    # same -inf padding).  GoogLeNet's nine in-block 3x3 s1 pools run at
    # 9.5% SoL through reduce_window in context
    # (bench/results/ceiling_googlenet_4e_layer.json).  A/B per model.
    maxpool_shift: bool = False

    # DetectionOutput per-class candidate selection via exact radix
    # select on the f32 score bits (31 counting passes find the K-th
    # largest value exactly; membership compacts by INDEX, no sort) —
    # approx_max_k degenerates when K is a large fraction of the row
    # (SSD's K=400 of P=1917: measured 5.7 -> 3.2 ms for the whole head,
    # bench/det_head_ablate.py b128).  Index-ordered candidates then
    # take the score-ranked bitpack NMS (kernels/nms.py scores= mode) —
    # exact greedy, ties by prior index (Caffe's unstable sort resolves
    # ties arbitrarily too).  Off = the approx_max_k + sorted-NMS path.
    topk_radix: bool = True

    # DetectionOutput threshold-FIRST candidate compaction (Caffe's
    # actual order: confidence_threshold BEFORE per-class top-k).  Value
    # is the static prior budget B (0 = off): priors clearing the
    # threshold for any class compact by index into B slots (cumsum-slot
    # one-hot payload contraction — no scatter, no gather, no sort), and
    # NMS + keep_top_k run on the compacted set, so the head scales with
    # B instead of P.  A batch-level lax.cond falls back to the exact
    # full path whenever survivors overflow B or a class exceeds
    # nms_top_k survivors — trained-model thresholds (0.01) leave O(100)
    # survivors; random/uniform scores take the fallback.  share_location
    # heads only.
    det_thresh_first: int = 0

    # R-FCN: fuse PSROIPooling with its global-AVE vote pool into ONE
    # mask contraction emitting (R, 1, 1, C) — per-bin counts are
    # separable (ch*cw) so the per-bin average folds into row-normalized
    # axis masks, and the k^2 vote mean contracts the bin axes away (no
    # (R, k, k, C) intermediate).  Exact to f32 rounding (7e-7 max rel
    # on rfcn CPU).  MEASURED DEAD END at rfcn b4: -2.2% paired
    # (bench/config_ab.py 2026-08-21, 506.8 vs 495.6 img/s) — the
    # staged rijc einsum + tiny divide/reduce fuse better than the
    # single rc contraction.  Kept as an opt-in probe flag
    # (passes.fuse_psroi_ave).
    psroi_fuse_ave: bool = False

    # Proposal pre-NMS selection as ONE stable sort carrying the box
    # columns as payload (no gather, no one-hot), and the post-NMS box
    # gather through the gather engine.  K/P = 6000/17100 = 35% is
    # approx_max_k's degenerate regime: isolated b16 race
    # (bench/proposal_micro.py) approx+onehot 2.62 ms / approx+take
    # 0.90 / payload sort 0.64 / radix 3.16.  Off = legacy approx +
    # one-hot dot.
    proposal_sort_payload: bool = True

    # ROIPooling: disable the bin-length level cap on the dyadic pyramid
    # (A/B handle for the round-5 capped-build + 4-take query form;
    # bench/roi_micro.py: 33 -> 19 ms isolated at faster_rcnn b16).
    roipool_full_pyramid: bool = False

    # ROIPooling via a dyadic range-max pyramid (4 gathered rows per bin)
    # instead of full-map membership-mask reductions — exact either way
    # (bin max is a selection); the mask form costs R*bins*H*W*C VPU ops,
    # the table form O(HWC*logH*logW + R*bins*C).  Off = the mask oracle
    # (A/B via batch_sweep --variants no-roipool_table).
    roipool_table: bool = True

    # LRN channel-window sum as a banded matmul on the MXU (sq @ B with
    # B the 0/1 band of width local_size) instead of a lane-axis
    # reduce_window.  The window slides along the 128-lane minor axis,
    # where XLA's reduce_window emits per-shift lane rotations; the MXU
    # form is one (M, C) x (C, C) dot.  Exact to f32 rounding
    # (precision=HIGHEST, <=5-term sums of a 0/1 band).  Off = the
    # reduce_window oracle (A/B via batch_sweep --variants no-lrn_band).
    lrn_band: bool = True

    # ShuffleChannel as a one-hot permutation matmul (x @ P, one nonzero
    # per column — exact in every dtype) instead of the
    # reshape/transpose lane relayout.  ShuffleNet's channel counts sit
    # under 128 lanes, where sub-lane permutations are relayout-bound;
    # the MXU does the permutation as a matmul nearly for free (same
    # insight as lrn_band / the SSD one-hot gather).  A/B per model via
    # batch_sweep --variants shuffle_matmul.
    shuffle_matmul: bool = False

    # DenseNet-style concat ladders (c_i = Concat(c_{i-1}, y_i)) as ONE
    # final-width buffer + in-place dynamic_update_slice appends +
    # prefix-slice reads (passes_ladder.py) — each append writes k
    # channels instead of re-materializing the whole growing prefix
    # (O(L*k) vs O(L^2*k) copy bytes per block).  Whether XLA elides the
    # buffer copies is backend-dependent: A/B per model
    # (bench/config_ab.py) before baking.
    concat_dus: bool = False

    # Persistent compiled-executable cache directory (cuts serving restart
    # latency — SURVEY.md §5 checkpoint/resume).  None disables.
    compilation_cache_dir: Optional[str] = None

    # Region fusion: run identity-shortcut bottlenecks as single
    # VMEM-resident Pallas kernels (passes_fusion.py).  Opt-in.
    fuse_blocks: bool = False

    # Space-to-depth stem rewrite (7x7 s2 C<=4 -> 4x4 s1 C*4,
    # passes_stem.py).  Numerically exact.
    s2d_stem: bool = False

    # Chain fusion: additionally merge same-shape bottleneck runs (a whole
    # ResNet stage) into ONE pallas_call with grid (chunk, block) —
    # activations persist in VMEM across blocks, weights stream with
    # Mosaic double-buffering (kernels/fused_chain.py).  Implies
    # fuse_blocks.  Opt-in.
    fuse_chains: bool = False

    def algo_for(self, layer_name: str) -> Optional[str]:
        d = dict(self.algo_overrides)
        return d.get(layer_name, d.get("*"))

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)

    # -- JSON round trip (SURVEY.md §5 config system: one dataclass,
    # loadable from JSON/CLI; the reference's analog is CMake options +
    # Net(num_threads)) ---------------------------------------------------
    @classmethod
    def from_json(cls, src) -> "EngineConfig":
        """Build from a dict, JSON string, or path to a JSON file.
        ``algo_overrides`` may be given as a mapping; ``sharding`` as a
        dict of ShardingConfig fields."""
        import json
        import os
        if isinstance(src, (str, bytes)) and os.path.exists(src):
            with open(src) as f:
                src = json.load(f)
        elif isinstance(src, (str, bytes)):
            src = json.loads(src)
        d = dict(src)
        if "fp_act_layers" in d:
            v = d["fp_act_layers"]
            if isinstance(v, str):
                v = (v,)
            d["fp_act_layers"] = tuple(v or ())
        for fld in ("algo_overrides", "quant_overrides"):
            if isinstance(d.get(fld), dict):
                d[fld] = tuple(d[fld].items())
            elif d.get(fld):
                d[fld] = tuple(tuple(kv) for kv in d[fld])
        if isinstance(d.get("sharding"), dict):
            from .parallel.mesh import ShardingConfig
            s = dict(d["sharding"])
            for k in ("mesh_shape", "axis_names"):
                if k in s:
                    s[k] = tuple(s[k])
            d["sharding"] = ShardingConfig(**s)
        return cls(**d)

    def to_json(self) -> str:
        import dataclasses as dc
        import json
        d = dc.asdict(self)
        d["algo_overrides"] = dict(self.algo_overrides)
        d["quant_overrides"] = dict(self.quant_overrides)
        if self.sharding is not None:
            d["sharding"] = dc.asdict(self.sharding)
        return json.dumps(d, indent=1)
