from intrepppid_tpu.optim.factory import OPTIMIZER_TYPES, make_optimizer
from intrepppid_tpu.optim.ranger21 import (
    adaptive_gradient_clip,
    centralize_gradient,
    ranger21,
)
from intrepppid_tpu.optim.schedules import cosine_warm_restarts, onecycle
from intrepppid_tpu.optim.swa import SWAConfig, SWAState

__all__ = [
    "OPTIMIZER_TYPES",
    "make_optimizer",
    "ranger21",
    "adaptive_gradient_clip",
    "centralize_gradient",
    "onecycle",
    "cosine_warm_restarts",
    "SWAConfig",
    "SWAState",
]
