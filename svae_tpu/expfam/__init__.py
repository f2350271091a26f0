"""Exponential-family distribution library (reference: svae/distributions/).

Every module exposes the conjugate quartet over *natural parameters*:

  * ``standard_to_natural(...) -> natparam``
  * ``natural_to_standard(natparam) -> standard params``
  * ``logZ(natparam) -> scalar`` log-partition
  * ``expectedstats(natparam) -> stats`` expected sufficient statistics,
    closed form, satisfying the identity ``expectedstats == jax.grad(logZ)``
    (tested property; the reference uses the grad as the implementation,
    we use closed forms for speed and keep the grad as the oracle).

Natural parameters are plain pytrees (tuples of arrays) so conjugacy is
literally addition: posterior natparam = prior natparam + summed stats.
"""

from svae_tpu.expfam import gaussian, niw, mniw, dirichlet, categorical

__all__ = ["gaussian", "niw", "mniw", "dirichlet", "categorical"]
