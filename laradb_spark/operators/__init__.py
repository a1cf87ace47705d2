from .joins import asof_join, range_self_join

__all__ = ["asof_join", "range_self_join"]
