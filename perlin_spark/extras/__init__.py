"""Training-data pipeline operators: dedup, similarity, text stats, multimodal."""

from . import dedup, multimodal, similarity, textstats

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
