from .dsl import Bit, CircuitBuilder
from .generators import BENCH_GENERATORS, EPFL_GENERATORS, build_bench

__all__ = ["Bit", "CircuitBuilder", "BENCH_GENERATORS", "EPFL_GENERATORS",
           "build_bench"]
