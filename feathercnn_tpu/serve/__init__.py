from .batcher import PyBatchQueue, make_queue
from .server import InferenceServer

__all__ = ["InferenceServer", "PyBatchQueue", "make_queue"]
