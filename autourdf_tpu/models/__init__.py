from .regmlp import MODES, PoseRegressor, init_params, sin_encoding

__all__ = ["PoseRegressor", "init_params", "sin_encoding", "MODES"]
