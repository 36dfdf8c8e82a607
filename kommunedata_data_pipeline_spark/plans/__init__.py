from .pipeline import PipelineSpec, flagship_meetings_to_fetch

__all__ = ["PipelineSpec", "flagship_meetings_to_fetch"]
