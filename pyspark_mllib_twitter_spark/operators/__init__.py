from . import dedup, multimodal, similarity, topk

__all__ = ["dedup", "multimodal", "similarity", "topk"]
