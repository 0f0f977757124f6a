from .executor import CircuitExecutor

__all__ = ["CircuitExecutor"]
