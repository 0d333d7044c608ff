"""ctypes bindings for the native runtime (native/libfeatherio.so).

The compute path is Pallas/XLA; the runtime around it — model IO and the
serving ingest queue — is C++ like the reference's
([pub] src/net.cpp loader, plus the serving layer the rebuild adds).
Everything here degrades gracefully: if the library isn't built, callers
fall back to the pure-Python implementations (model_format.load_ftpu,
serve.batcher.PyBatchQueue).

Build: ``make -C native`` (done automatically on first use when a
toolchain is available).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfeatherio.so")
_lib = None
_build_attempted = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _build_attempted:
        # always invoke make (a no-op when the .so is fresh): sources
        # added after an old build would otherwise never be picked up
        _build_attempted = True
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.ftpu_open.restype = ctypes.c_void_p
    lib.ftpu_open.argtypes = [ctypes.c_char_p]
    lib.ftpu_header_json.restype = ctypes.c_char_p
    lib.ftpu_header_json.argtypes = [ctypes.c_void_p]
    lib.ftpu_tensor_data.restype = ctypes.c_void_p
    lib.ftpu_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64)]
    lib.ftpu_prefetch.argtypes = [ctypes.c_void_p]
    lib.ftpu_close.argtypes = [ctypes.c_void_p]

    lib.bq_create.restype = ctypes.c_void_p
    lib.bq_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.bq_destroy.argtypes = [ctypes.c_void_p]
    lib.bq_close.argtypes = [ctypes.c_void_p]
    lib.bq_submit.restype = ctypes.c_uint64
    lib.bq_submit.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.bq_collect.restype = ctypes.c_int64
    lib.bq_collect.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_uint64),
                               ctypes.c_int64, ctypes.c_int64]
    lib.bq_post_results.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint64),
                                    ctypes.c_void_p, ctypes.c_int64]
    lib.bq_wait_result.restype = ctypes.c_int
    lib.bq_wait_result.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_void_p, ctypes.c_int64]
    lib.bq_depth.restype = ctypes.c_int64
    lib.bq_depth.argtypes = [ctypes.c_void_p]
    lib.bq_stats.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_uint64)] * 4

    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


# ----------------------------------------------------------------------
def load_ftpu_native(path: str):
    """Load a .ftpu model through the C++ mmap loader (zero-copy weights).
    Returns a Graph like model_format.load_ftpu; raises if unavailable."""
    from .ir import Graph, Node, TensorSpec

    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built (make -C native)")
    handle = lib.ftpu_open(path.encode())
    if not handle:
        raise IOError(f"ftpu_open failed for {path}")
    try:
        header = json.loads(lib.ftpu_header_json(handle).decode())
        lib.ftpu_prefetch(handle)
        params: Dict[str, np.ndarray] = {}
        for name, t in header["tensors"].items():
            nbytes = ctypes.c_int64()
            ptr = lib.ftpu_tensor_data(handle, name.encode(),
                                       ctypes.byref(nbytes))
            if not ptr:
                raise IOError(f"tensor {name!r} missing/out of bounds")
            buf = (ctypes.c_char * nbytes.value).from_address(ptr)
            # Copy out so the Graph outlives the handle.
            arr = np.frombuffer(bytearray(buf), dtype=np.dtype(t["dtype"]))
            params[name] = arr.reshape(t["shape"])
        from .model_format import _json_restore
        return Graph(
            name=header["name"],
            inputs={k: TensorSpec(tuple(v["shape"]), v["dtype"])
                    for k, v in header["inputs"].items()},
            outputs=list(header["outputs"]),
            nodes=[Node(name=n["name"], op=n["op"], inputs=list(n["inputs"]),
                        outputs=list(n["outputs"]), attrs=dict(n["attrs"]),
                        params=list(n["params"])) for n in header["nodes"]],
            params=params,
            meta=_json_restore(header.get("meta", {})),
        )
    finally:
        lib.ftpu_close(handle)


# ----------------------------------------------------------------------
class NativeBatchQueue:
    """The C++ continuous-batching queue (native/batch_queue.cc)."""

    def __init__(self, item_shape, item_dtype, result_shape, result_dtype):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native queue not built (make -C native)")
        self._lib = lib
        self.item_shape = tuple(item_shape)
        self.item_dtype = np.dtype(item_dtype)
        self.result_shape = tuple(result_shape)
        self.result_dtype = np.dtype(result_dtype)
        self._item_bytes = int(np.prod(item_shape)) * self.item_dtype.itemsize
        self._result_bytes = (int(np.prod(result_shape))
                              * self.result_dtype.itemsize)
        self._q = lib.bq_create(self._item_bytes, self._result_bytes)

    def submit(self, item: np.ndarray) -> int:
        item = np.ascontiguousarray(item, self.item_dtype)
        assert item.shape == self.item_shape, (item.shape, self.item_shape)
        return int(self._lib.bq_submit(
            self._q, item.ctypes.data_as(ctypes.c_void_p)))

    def collect(self, max_batch: int, timeout_us: int = 2000):
        batch = np.empty((max_batch,) + self.item_shape, self.item_dtype)
        tickets = (ctypes.c_uint64 * max_batch)()
        n = self._lib.bq_collect(
            self._q, batch.ctypes.data_as(ctypes.c_void_p), tickets,
            max_batch, timeout_us)
        n = int(n)
        return batch[:n], [int(tickets[i]) for i in range(n)]

    def post_results(self, tickets, results: np.ndarray) -> None:
        results = np.ascontiguousarray(results, self.result_dtype)
        arr = (ctypes.c_uint64 * len(tickets))(*tickets)
        self._lib.bq_post_results(
            self._q, arr, results.ctypes.data_as(ctypes.c_void_p),
            len(tickets))

    def wait_result(self, ticket: int, timeout_us: int = 10_000_000
                    ) -> Optional[np.ndarray]:
        out = np.empty(self.result_shape, self.result_dtype)
        rc = self._lib.bq_wait_result(
            self._q, ticket, out.ctypes.data_as(ctypes.c_void_p), timeout_us)
        return out if rc == 0 else None

    def depth(self) -> int:
        return int(self._lib.bq_depth(self._q))

    def stats(self):
        vals = [ctypes.c_uint64() for _ in range(4)]
        self._lib.bq_stats(self._q, *[ctypes.byref(v) for v in vals])
        return {"submitted": vals[0].value, "completed": vals[1].value,
                "batches": vals[2].value, "max_depth": vals[3].value}

    def close(self) -> None:
        self._lib.bq_close(self._q)

    def __del__(self):
        try:
            self._lib.bq_close(self._q)
            self._lib.bq_destroy(self._q)
        except Exception:
            pass
