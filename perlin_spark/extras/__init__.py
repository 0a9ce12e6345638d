"""Training-data pipeline operators: dedup, similarity, text stats, multimodal."""

from . import dedup, events, multimodal, similarity, textstats

__all__ = ["dedup", "events", "multimodal", "similarity", "textstats"]
