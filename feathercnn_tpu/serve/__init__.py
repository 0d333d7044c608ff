from .batcher import PyBatchQueue, make_queue
from .preprocess import native_available, preprocess
from .server import InferenceServer

__all__ = ["InferenceServer", "PyBatchQueue", "make_queue",
           "preprocess", "native_available"]
