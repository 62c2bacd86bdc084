from .intervals import interval_union_length

__all__ = ["interval_union_length"]
