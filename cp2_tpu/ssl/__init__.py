"""Self-supervised pretraining core: functional states, variant objectives."""

from cp2_tpu.ssl.hparams import SSLHyperParams
from cp2_tpu.ssl.model import SSLEncoder, output_stride_of
from cp2_tpu.ssl.state import PretrainState, create_pretrain_state
from cp2_tpu.ssl.queue import queue_enqueue

__all__ = [
    "SSLHyperParams",
    "SSLEncoder",
    "output_stride_of",
    "PretrainState",
    "create_pretrain_state",
    "queue_enqueue",
]
