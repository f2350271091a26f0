from svae_tpu.utils.pytree import (
    tree_add,
    tree_sub,
    tree_scale,
    tree_dot,
    tree_zeros_like,
    flat,
    unflat,
)
from svae_tpu.utils.psd import (
    symmetrize,
    solve_psd,
    cho_solve_psd,
    logdet_psd,
    inv_psd,
    mvn_logZ_info,
)

__all__ = [
    "tree_add",
    "tree_sub",
    "tree_scale",
    "tree_dot",
    "tree_zeros_like",
    "flat",
    "unflat",
    "symmetrize",
    "solve_psd",
    "cho_solve_psd",
    "logdet_psd",
    "inv_psd",
    "mvn_logZ_info",
]
