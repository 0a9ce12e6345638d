"""Training-data pipeline operators: dedup, similarity, text stats, multimodal."""

from . import dedup, events, fusion, multimodal, similarity, textstats

__all__ = ["dedup", "events", "fusion", "multimodal", "similarity", "textstats"]
