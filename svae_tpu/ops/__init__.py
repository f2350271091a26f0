"""Message-passing inference kernels.

Two implementations of each kernel, mirroring the reference's dual
autograd/Cython strategy (reference: svae/lds/lds_inference.py vs
svae/lds/cython_lds_inference.pyx; svae/hmm/*):

  * ``oracles``  - float64 sequential NumPy implementations. These are the
                   correctness oracles for the TPU kernels AND the measured
                   CPU performance denominators (BASELINE.md measurement
                   plan, bullet 2).
  * ``kalman``   - O(log T)-span associative-scan Kalman filter / two-filter
                   smoother / parallel backward sampler in JAX
                   (Sarkka & Garcia-Fernandez, arXiv:1905.13002).
  * ``hmm``      - associative-scan HMM forward/backward with
                   ``expectedstats = grad(logZ)`` (arXiv:2102.05743).

The production TPU fast paths live beside them (docs/DESIGN.md):

  * ``pallas_vjp``    - fused differentiable Pallas kernels with
                        hand-derived adjoints (generic per-sequence pair
                        layout; ``fb_pass`` auto-routes layouts).
  * ``pallas_bidir``  - bidirectional lane packing: both information
                        filters on one 128-lane set, one chain step per
                        grid step (round 4).
  * ``pallas_estep``  - the fully packed stationary-diagonal E-step /
                        moments pipeline (round 4; the flagship LDS path).
  * ``pallas_hmm``    - fused HMM forward-backward + softmax-weight
                        adjoint (the SLDS z-step path).
  * ``pallas_kalman``, ``pallas_chunked`` - forward-only fused kernels
                        and the measured-and-rejected chunks-on-lanes
                        flavor.

Shared natural-parameter convention for a length-T linear-Gaussian chain
over x_1..x_T (all kernels and oracles):

  potential(x) =   <x_1 x_1^T, I1> + <x_1, I2> + Ic                 (init)
    + sum_{t=1}^{T-1} [ <x_{t+1} x_{t+1}^T, P1_t> + <x_{t+1} x_t^T, P2_t>
                        + <x_t x_t^T, P3_t> + Pc_t ]                (pairs)
    + sum_{t=1}^{T}   [ <x_t x_t^T, N1_t> + <x_t, N2_t> ]           (nodes)

  logZ = log integral exp(potential) dx_{1:T}

``init = (I1, I2, Ic)``, ``pairs = (P1, P2, P3, Pc)`` with leading (T-1)
axes, ``nodes = (N1, N2)`` with leading T axes. P1/P3/N1 are symmetric
negative-definite contributions; built from ``mniw.expected_pair_potential``
/ ``niw.expected_gaussian_natparam`` / recognition-net outputs.
"""
