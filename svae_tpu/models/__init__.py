"""SVAE model families (reference: svae/models/{gmm,lds,slds}.py).

Every model module satisfies the reference's 4-tuple contract (the most
important API in the framework -- SURVEY.md section 1, L3a):

  ``run_inference(prior_natparam, global_natparam, nn_potentials, key,
                  num_samples) -> (samples, expected_stats, global_kl,
                                   local_kl)``

plus ``init_pgm_param(key, ...) -> global_natparam`` and
``pgm_expectedstats(global_natparam)``. ``expected_stats`` is congruent with
``global_natparam`` so the conjugate natural-gradient update is literal
pytree arithmetic: ``natgrad = prior + scale * stats - global``.
"""

from svae_tpu.models import gmm, lds, slds, streaming

__all__ = ["gmm", "lds", "slds", "streaming"]
