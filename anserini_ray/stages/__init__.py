from . import ann, dedup, model_scoring, multimodal, text_stats

__all__ = ["ann", "dedup", "model_scoring", "multimodal", "text_stats"]
