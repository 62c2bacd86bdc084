from .joins import as_of_join, interval_overlap_join
from .graph import transitive_closure

__all__ = ["as_of_join", "interval_overlap_join", "transitive_closure"]
