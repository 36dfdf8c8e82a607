from . import dates, strings, text

__all__ = ["dates", "strings", "text"]
