from .kmeans import construct_index, kmeans
from .topk import chunked_topk, streaming_topk, xla_topk

__all__ = ["kmeans", "construct_index", "chunked_topk", "streaming_topk", "xla_topk"]
