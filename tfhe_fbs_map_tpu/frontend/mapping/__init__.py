from .basic import BasicMapper
from .heuristic import HeuristicMapper

__all__ = ["BasicMapper", "HeuristicMapper"]
