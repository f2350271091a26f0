"""Missing-data helpers: NaN-marked frames -> (clean_batch, mask).

Greenfield vs the reference (upstream mattjj/svae assumes dense evidence).
The TPU-native contract for irregular data is STATIC shapes + masks, never
dynamic shapes: a frame is "missing" when any of its observation dims is
non-finite, and the pipeline (recognition potentials, chain inference,
decoder log-likelihood) drops it via multiplicative {0,1} masks so every
kernel keeps its compiled shape. See models/lds.run_inference(mask=,
lengths=) and train/elbo.make_objective(mask_fn=).
"""

import jax.numpy as jnp


def nan_mask(batch):
    """``batch (..., T, d_obs)`` with NaN/inf marking missing frames ->
    ``(clean_batch, mask)`` where ``mask (..., T)`` is 1.0 for fully-finite
    frames and ``clean_batch`` replaces non-finite entries with zeros (so
    the recognition net sees benign values; its output at those frames is
    discarded by the mask anyway). Use as ``make_objective(mask_fn=...)``.
    """
    finite = jnp.isfinite(batch)
    mask = jnp.all(finite, axis=-1).astype(batch.dtype)
    clean = jnp.where(finite, batch, jnp.zeros((), batch.dtype))
    return clean, mask


def pad_batch(sequences, T=None, dtype=None):
    """Host-side helper: a list of (T_i, d) arrays -> (batch (B, T, d),
    lengths (B,)) padded with zeros to the longest (or given) T. Feed
    ``lengths`` to run_inference for exact ragged-batch training."""
    import numpy as np

    Tmax = T if T is not None else max(int(s.shape[0]) for s in sequences)
    d = sequences[0].shape[-1]
    B = len(sequences)
    out = np.zeros((B, Tmax, d),
                   dtype or np.asarray(sequences[0]).dtype)
    lengths = np.zeros((B,), np.int32)
    for i, s in enumerate(sequences):
        t = int(s.shape[0])
        if t > Tmax:
            raise ValueError(f"sequence {i} longer ({t}) than T={Tmax}")
        out[i, :t] = np.asarray(s)
        lengths[i] = t
    return out, lengths
