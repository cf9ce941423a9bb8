from intrepppid_tpu.models.awd_lstm import (
    EncoderConfig,
    apply_encoder,
    init_encoder,
)
from intrepppid_tpu.models.mlp_head import apply_mlp_head, init_mlp_head
from intrepppid_tpu.models.triplet import (
    TripletE2EConfig,
    forward,
    init_triplet_e2e,
    step,
)
from intrepppid_tpu.models.factory import IntrepppidNetwork, intrepppid_network

__all__ = [
    "EncoderConfig",
    "apply_encoder",
    "init_encoder",
    "apply_mlp_head",
    "init_mlp_head",
    "TripletE2EConfig",
    "forward",
    "init_triplet_e2e",
    "step",
    "IntrepppidNetwork",
    "intrepppid_network",
]
