"""The inference engine: graph -> optimization passes -> one jitted function.

The reference's ``feather::Net`` ([pub] src/net.h/.cpp) has a two-phase
lifecycle: an expensive ``InitFromBuffer`` (parse -> build layers -> fuse ->
pick algorithms -> pre-transform weights -> size mempool) and a cheap
``Forward`` that walks the layer list.  The TPU-native analog:

  Init   -> IR passes (passes.optimize) + quant rewrite + trace + XLA
            compile (Engine.compile);
  Forward-> run the compiled executable (Engine.run / __call__);
  ExtractBlob -> name any intermediate value as an extra jit output
            (Engine.extract) — like the reference, extracting a value that
            fusion removed forces a different (less-fused) executable.

Scratch memory (the CommonMemPool analog, [pub] src/mempool.h) is XLA's
buffer assignment; input buffers are donated.
"""

from __future__ import annotations

import copy
import functools
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig
from .ir import Graph, infer_shapes
from .passes import optimize
from .ops.lowering import LoweringCtx, lower_node

__all__ = ["Engine"]


class Engine:
    def __init__(self, graph: Graph, config: Optional[EngineConfig] = None,
                 optimize_graph: bool = True):
        self.config = config or EngineConfig()
        self.graph = copy.deepcopy(graph)
        # Auto-tuned per-layer algo choices baked into the model artifact
        # (tools/autotune.py) apply unless the config overrides them.
        baked = self.graph.meta.get("algo_overrides")
        if baked and not self.config.algo_overrides:
            self.config = self.config.replace(
                algo_overrides=tuple(baked.items()))
        # Per-model measured config defaults (e.g. GoogLeNet serves faster
        # with int8_requant_ops off — BASELINE.md).
        from .config import apply_baked_overrides
        self.config = apply_baked_overrides(self.config, self.graph.meta)
        if optimize_graph:
            optimize(self.graph,
                     merge_siblings=self.config.merge_siblings,
                     merge_concats=self.config.merge_concats,
                     fold_scale_chains=self.config.fold_scale_chains,
                     nested_pools=self.config.nested_pools)
            if self.config.psroi_fuse_ave:
                from .passes import fuse_psroi_ave
                fuse_psroi_ave(self.graph)
        if self.config.quant:
            from .quant.rewrite import quantize_graph
            quantize_graph(self.graph, self.config.quant,
                           int8_grouped=self.config.int8_grouped,
                           requant_ops=self.config.int8_requant_ops,
                           int8_axpy=self.config.int8_axpy,
                           fp_act_layers=self.config.fp_act_layers,
                           quant_overrides=dict(
                               self.config.quant_overrides))
        if self.config.concat_dus:
            # after the quant rewrite: the ladder pass reads the concat
            # int8 marks to unify the chain onto one buffer scale
            from .passes_ladder import dus_concat_ladders
            dus_concat_ladders(self.graph)
        if self.config.fuse_blocks or self.config.fuse_chains:
            from .passes_fusion import fuse_bottlenecks, fuse_chains
            infer_shapes(self.graph)  # fresh specs for the VMEM gate
            act_item = jnp.dtype(self.config.compute_dtype).itemsize
            fuse_bottlenecks(self.graph, act_itemsize=act_item)
            if self.config.fuse_chains:
                fuse_chains(self.graph, act_itemsize=act_item)
        if self.config.s2d_stem:
            from .passes_stem import space_to_depth_stem
            infer_shapes(self.graph)
            space_to_depth_stem(self.graph)
        infer_shapes(self.graph)
        self.graph.validate()
        self._device_params: Optional[Dict[str, jax.Array]] = None
        self._jitted: Dict[tuple, Any] = {}
        if self.config.compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir",
                              self.config.compilation_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        self._mesh = None
        if self.config.sharding is not None:
            from .parallel.mesh import build_mesh
            self._mesh = build_mesh(self.config.sharding)

    # ------------------------------------------------------------------
    @classmethod
    def from_optimized(cls, graph: Graph,
                       config: Optional[EngineConfig] = None) -> "Engine":
        """Engine over an ALREADY-optimized/quantized graph, running NO
        passes.

        Bench tooling (bench/ceiling.py) truncates the post-pass graph of
        a fully built Engine so prefix timings difference exactly against
        the headline executable; re-running the passes on the truncated
        copy would re-quantize (a second int8 rewrite corrupts scales) or
        fuse differently.  Shapes are re-inferred, nothing else changes.
        """
        self = object.__new__(cls)
        self.config = config or EngineConfig()
        self.graph = copy.deepcopy(graph)
        infer_shapes(self.graph)
        self.graph.validate()
        self._device_params = None
        self._jitted = {}
        self._mesh = None
        return self

    @classmethod
    def from_path(cls, path: str, config: Optional[EngineConfig] = None,
                  prefer_native: bool = True, **kw) -> "Engine":
        """Net::InitFromPath analog: load a .ftpu model and build the
        engine.  Uses the C++ mmap loader when built, else pure Python."""
        graph = None
        if prefer_native:
            from . import native
            if native.available():
                graph = native.load_ftpu_native(path)
        if graph is None:
            from .model_format import load_ftpu
            graph = load_ftpu(path)
        return cls(graph, config, **kw)

    # ------------------------------------------------------------------
    @property
    def input_names(self) -> List[str]:
        return list(self.graph.inputs)

    @property
    def output_names(self) -> List[str]:
        return list(self.graph.outputs)

    def blob_shape(self, name: str):
        """GetBlobDataSize analog ([pub] src/net.cpp)."""
        return self.graph.specs[name].shape

    def summary(self, top: int = None) -> str:
        """Per-layer table of the OPTIMIZED graph (post-fusion): output
        shape, params, FLOPs/img, activation MB/img.  ``top`` keeps only
        the N most FLOP-heavy layers."""
        from .utils.summary import summarize
        act_bytes = 1 if self.config.quant == "w8a8" else \
            jnp.dtype(self.config.compute_dtype).itemsize
        return summarize(self.graph, act_bytes=act_bytes, top=top)

    # ------------------------------------------------------------------
    def _prepare_params(self) -> Dict[str, jax.Array]:
        """Move weights to device once, pre-cast to the compute dtype.

        The analog of the reference's one-time weight pre-transform at
        ``Init`` ([pub] src/booster/arm/booster.cpp): big multiplicand
        weights go to the compute dtype (bf16 keeps MXU throughput high),
        biases/scales stay f32 for the epilogue accumulation.
        """
        if self._device_params is not None:
            return self._device_params
        cdtype = jnp.dtype(self.config.compute_dtype)
        shardings = None
        if self._mesh is not None:
            from .parallel.mesh import param_shardings
            shardings = param_shardings(self.graph, self._mesh,
                                        self.config.sharding)
        out: Dict[str, jax.Array] = {}
        weight_names = set()
        for n in self.graph.nodes:
            if n.op in ("Convolution", "InnerProduct") and n.params:
                weight_names.add(n.params[0])
        for k, v in self.graph.params.items():
            arr = np.asarray(v)
            if (k in weight_names and arr.dtype == np.float32
                    and cdtype != jnp.float32):
                arr = arr.astype(cdtype)
            if shardings is not None:
                out[k] = jax.device_put(arr, shardings[k])
            else:
                out[k] = jax.device_put(arr)
        self._device_params = out
        return out

    # ------------------------------------------------------------------
    def _build_forward(self, extra_outputs: Sequence[str] = ()):
        graph = self.graph
        ctx = LoweringCtx(graph, self.config, mesh=self._mesh)
        wanted = list(dict.fromkeys(list(graph.outputs) + list(extra_outputs)))
        for w in wanted:
            if w not in graph.specs:
                raise KeyError(f"unknown blob {w!r}")

        def forward(params: Dict[str, jax.Array],
                    inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
            cdtype = jnp.dtype(self.config.compute_dtype)
            env: Dict[str, jax.Array] = {}
            for name in graph.inputs:
                x = inputs[name]
                # Only rank-4 feature maps take the compute dtype;
                # metadata inputs (im_info's [h, w, scale]) must keep
                # full precision — bf16 rounds 599 to 600 and corrupts
                # clip bounds before any lowering can undo it.
                env[name] = x.astype(cdtype) if (
                    jnp.issubdtype(x.dtype, jnp.floating)
                    and x.ndim == 4) else x
            for node in graph.nodes:
                ins = [env[i] for i in node.inputs]
                ps = [params[p] for p in node.params]
                outs = lower_node(node, ins, ps, ctx)
                for name, val in zip(node.outputs, outs):
                    env[name] = val
            return {w: env[w] for w in wanted}

        return forward

    def _get_jitted(self, extra_outputs: Sequence[str] = ()):
        key = tuple(extra_outputs)
        if key not in self._jitted:
            fwd = self._build_forward(extra_outputs)
            self._jitted[key] = jax.jit(fwd)
        return self._jitted[key]

    # ------------------------------------------------------------------
    def compile(self, batch: Optional[int] = None) -> None:
        """Ahead-of-time compile for the declared input shapes (Init phase).

        Populates the jit cache so the first ``run`` is cheap; mirrors the
        reference doing all expensive work in ``InitFromBuffer``.
        """
        inputs = {}
        for name, spec in self.graph.inputs.items():
            shape = list(spec.shape)
            if batch is not None:
                shape[0] = batch
            inputs[name] = jnp.zeros(shape, jnp.dtype(spec.dtype))
        self.run(inputs)

    def run(self, inputs: Union[np.ndarray, jax.Array, Dict[str, Any]],
            extract: Sequence[str] = ()) -> Dict[str, jax.Array]:
        """Forward pass.  ``inputs`` is an array (single-input nets) or a
        name->array dict.  Returns name->jax.Array for every graph output
        plus anything in ``extract``."""
        if not isinstance(inputs, dict):
            (name,) = self.graph.inputs
            inputs = {name: inputs}
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        if self._mesh is not None:
            from .parallel.mesh import input_shardings
            ishard = input_shardings(self.graph, self._mesh,
                                     self.config.sharding)
            inputs = {k: jax.device_put(v, ishard.get(k))
                      if k in ishard else v for k, v in inputs.items()}
        for name, x in inputs.items():
            spec = self.graph.inputs.get(name)
            if spec is None:
                raise KeyError(f"unknown graph input {name!r}")
            # Batch and spatial dims may differ from the declared spec
            # (ForwardReshape analog, [pub] src/layer.h — triggers a
            # recompile); rank and channel count must match.
            if x.ndim != len(spec.shape) or (
                    x.ndim == 4 and x.shape[-1] != spec.shape[-1]):
                raise ValueError(
                    f"input {name!r} has shape {x.shape}, expected "
                    f"{spec.shape} (batch/spatial may vary, channels/rank "
                    f"may not)")
        params = self._prepare_params()
        fn = self._get_jitted(tuple(extract))
        return fn(params, inputs)

    def __call__(self, x) -> jax.Array:
        """Forward returning the primary output (Net::Forward analog)."""
        out = self.run(x)
        return out[self.graph.outputs[0]]

    def extract(self, x, names: Sequence[str]) -> Dict[str, jax.Array]:
        """ExtractBlob analog: fetch named intermediate activations.

        Note the same caveat as the reference: values consumed by fusion
        (folded BN outputs etc.) no longer exist; asking for a live
        intermediate builds a second executable with extra outputs.
        """
        return self.run(x, extract=names)
