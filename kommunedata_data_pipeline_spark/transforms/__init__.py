from . import documents, multimodal

__all__ = ["documents", "multimodal"]
