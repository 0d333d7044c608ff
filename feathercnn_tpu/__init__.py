"""feathercnn_tpu — a TPU-native quantized CNN inference engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
Tencent/FeatherCNN (Caffe-model CNN inference), re-designed TPU-first:
typed IR + fusion passes ahead of XLA, Pallas MXU/VPU kernels with fused
dequant/bias/BN/ReLU epilogues, int8 quantization, and pod-slice scaling
via jax.sharding — see SURVEY.md for the reference map.
"""

from .config import EngineConfig
from .engine import Engine
from .ir import Graph, Node, TensorSpec, infer_shapes
from .passes import optimize

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "EngineConfig",
    "Graph",
    "Node",
    "TensorSpec",
    "infer_shapes",
    "optimize",
]
