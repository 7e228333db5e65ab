from .telemetry import Telemetry, jax_trace

__all__ = ["Telemetry", "jax_trace"]
