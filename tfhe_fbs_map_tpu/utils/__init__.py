from .profiling import device_timer, force_completion, jax_trace

__all__ = ["device_timer", "force_completion", "jax_trace"]
