from . import aggregates, dedup, joins, relational, similarity

__all__ = ["aggregates", "dedup", "joins", "relational", "similarity"]
