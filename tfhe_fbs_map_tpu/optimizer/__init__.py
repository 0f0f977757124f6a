from .noise import P_ERROR_4_SIGMA, p_error_atomic
from .optimizer import Solution, bootstrap_cost_us, optimize

__all__ = ["P_ERROR_4_SIGMA", "p_error_atomic", "Solution",
           "bootstrap_cost_us", "optimize"]
