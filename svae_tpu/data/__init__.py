"""Synthetic datasets for the example experiments and tests.

(reference: experiments/gmm_svae_synth.py:make_pinwheel_data,
experiments/lds_svae_synth.py:make_dot_data, svae/lds/synthetic_data.py.)
"""

from svae_tpu.data.synthetic import (
    make_pinwheel,
    make_dot_data,
    rand_lds,
    lds_rollout,
)
from svae_tpu.data.loader import (
    epoch_batches,
    ragged_epoch_batches,
    prefetch_to_device,
    make_loader,
)

__all__ = [
    "make_pinwheel", "make_dot_data", "rand_lds", "lds_rollout",
    "epoch_batches", "ragged_epoch_batches", "prefetch_to_device",
    "make_loader",
]
