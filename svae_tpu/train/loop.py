"""Training loop: one jitted SVI step + a host-side epoch loop with
callbacks (the reference's optimizer-callback design kept deliberately --
reference: svae/optimizers.py callback param; SURVEY.md section 5).
"""


from functools import partial

import jax
import jax.numpy as jnp

from svae_tpu.train.elbo import make_gradfun
from svae_tpu.train.optim import make_optimizer


def make_train_step(run_inference, recognize, loglike, pgm_prior, N,
                    num_samples=1, natgrad_scale=1.0, pgm_step_size=1.0,
                    net_optimizer=None, net_step_size=1e-3, donate=True,
                    mask_fn=None, ragged=False):
    """Build ``(init_state, train_step)``:

      init_state(pgm_params, net_params) -> opt_state
      train_step(pgm_params, net_params, opt_state, batch, key)
          -> (pgm_params, net_params, opt_state, elbo, terms)

    ``terms`` carries the ELBO components and net-grad norm for metrics
    (SURVEY.md section 5 observability). ``train_step`` is jitted with
    donated param/state buffers (in-place update on device, no host
    round-trips -- the whole SVI step is one XLA program). ``mask_fn``
    enables missing-data training; ``ragged`` makes ``batch`` a
    ``(frames, lengths)`` pair from a length-bucketed loader (see
    elbo.make_objective; one XLA program per padded T, bounded by the
    loader's pad_multiple).
    """
    gradfun = make_gradfun(run_inference, recognize, loglike, pgm_prior, N,
                           num_samples, natgrad_scale, mask_fn=mask_fn,
                           ragged=ragged)
    opt_init, opt_update = make_optimizer(net_optimizer, pgm_step_size,
                                          net_step_size)

    def step(pgm_params, net_params, opt_state, batch, key):
        elbo, natgrad, net_grads, terms = gradfun(pgm_params, net_params,
                                                  batch, key)
        pgm_params, net_params, opt_state = opt_update(
            opt_state, pgm_params, net_params, natgrad, net_grads
        )
        return pgm_params, net_params, opt_state, elbo, terms

    donate_argnums = (0, 1, 2) if donate else ()
    return opt_init, jax.jit(step, donate_argnums=donate_argnums)


def make_fused_train_step(run_inference, recognize, loglike, pgm_prior, N,
                          k_steps, num_samples=1, natgrad_scale=1.0,
                          pgm_step_size=1.0, net_optimizer=None,
                          net_step_size=1e-3, donate=True, mask_fn=None,
                          stacked_batch=False):
    """Like :func:`make_train_step`, but ONE dispatch runs ``k_steps``
    SVI steps via ``lax.scan`` with the PRNG key threaded on device --
    the TPU-idiomatic shape for full-batch training (GMM coordinate
    ascent: no per-step data feeding, so per-dispatch host/tunnel latency
    would otherwise dominate a sub-millisecond device step; measured
    2026-08-20: the B=1000 GMM step is ~6x dispatch overhead).

      fused_step(pgm_params, net_params, opt_state, batch, key)
          -> (pgm_params, net_params, opt_state, elbo, terms, elbos)

    ``batch`` is reused by every inner step (full-batch training), or --
    with ``stacked_batch=True`` -- a ``(k_steps, B, ...)`` pytree of
    per-step minibatches. ``elbo``/``terms`` are the LAST inner step's;
    ``elbos`` is the (k_steps,) per-step history."""
    gradfun = make_gradfun(run_inference, recognize, loglike, pgm_prior, N,
                           num_samples, natgrad_scale, mask_fn=mask_fn)
    opt_init, opt_update = make_optimizer(net_optimizer, pgm_step_size,
                                          net_step_size)

    def fused(pgm_params, net_params, opt_state, batch, key):
        def body(carry, xs):
            pgm, net, st, k = carry
            b = xs if stacked_batch else batch
            k, ks = jax.random.split(k)
            elbo, natgrad, grads, terms = gradfun(pgm, net, b, ks)
            pgm, net, st = opt_update(st, pgm, net, natgrad, grads)
            return (pgm, net, st, k), (elbo, terms)

        (pgm, net, st, _), (elbos, terms_h) = jax.lax.scan(
            body, (pgm_params, net_params, opt_state, key),
            xs=batch if stacked_batch else None,
            length=None if stacked_batch else k_steps)
        terms = jax.tree.map(lambda x: x[-1], terms_h)
        return pgm, net, st, elbos[-1], terms, elbos

    donate_argnums = (0, 1, 2) if donate else ()
    return opt_init, jax.jit(fused, donate_argnums=donate_argnums)


_FUSED_GROUP_CACHE = {}
_FUSED_GROUP_CACHE_MAX = 8  # bounded: entries hold train-step closures
                            # and compiled executables alive


def _fused_group_for(train_step, k_grp, donate=True):
    """Jitted k-step scan group for ``loop.run(steps_per_dispatch=k)``,
    cached per (train_step, k, donate) -- a fresh closure per run() call
    would recompile every time (the scan body inlines the jitted step).
    The cache is FIFO-bounded (jitted step fns do not reliably support
    weak references) so long-lived processes cycling through many train
    steps do not leak closures/executables."""
    cache_key = (id(train_step), k_grp, donate)
    hit = _FUSED_GROUP_CACHE.get(cache_key)
    if hit is not None and hit[0] is train_step:  # id() can be recycled
        return hit[1]

    # donate params/opt-state/key like the per-step path does: run()/
    # run_loader() always rebind the returned state, and without donation
    # each grouped dispatch holds a second copy of params + optimizer
    # state in HBM (the inner train_step's own donation is a no-op inside
    # the scan trace). Callers that keep references to the INITIAL
    # params/state past the loop call pass donate=False (run/run_loader's
    # ``donate_groups``) -- on TPU a donated buffer is dead after the
    # first grouped dispatch.
    @partial(jax.jit, donate_argnums=(0, 1, 2, 4) if donate else ())
    def fused_group(pgm, net, st, batches, key):
        def body(c, b):
            pgm, net, st, key = c
            key, ks = jax.random.split(key)
            pgm, net, st, elbo, terms = train_step(pgm, net, st, b, ks)
            return (pgm, net, st, key), (elbo, terms)

        (pgm, net, st, key), (elbos, terms_h) = jax.lax.scan(
            body, (pgm, net, st, key), batches)
        terms = jax.tree.map(lambda x: x[-1], terms_h)
        return pgm, net, st, key, elbos, terms

    while len(_FUSED_GROUP_CACHE) >= _FUSED_GROUP_CACHE_MAX:
        _FUSED_GROUP_CACHE.pop(next(iter(_FUSED_GROUP_CACHE)))
    _FUSED_GROUP_CACHE[cache_key] = (train_step, fused_group)
    return fused_group


def run(train_step, pgm_params, net_params, opt_state, data, key, num_epochs,
        batch_size, callback=None, callback_every=1, shuffle=True,
        steps_per_dispatch=1, donate_groups=True):
    """Host-side epoch loop (reference: svae/optimizers.py:adam loop).

    ``data`` is a single array with leading datapoint/sequence axis; batches
    are static-shaped slices (the tail remainder is dropped so every step
    hits the same compiled program). ``callback(step, elbo, (pgm_params,
    net_params, opt_state), terms, key)`` runs every ``callback_every``
    steps and on the final step if given (``terms`` is the device-side
    metrics dict from the train step; ``key`` is the PRNG key advanced past
    the step, so checkpoints can continue the randomness stream on resume).

    The loop never fences the device between callback firings: ``elbo``
    history is kept as device scalars and fetched once at the end, so with
    ``callback_every > 1`` steps dispatch back-to-back and the measured
    throughput matches the chained-dispatch benchmark (bench.py).

    ``steps_per_dispatch > 1`` runs groups of that many consecutive steps
    inside ONE jitted ``lax.scan`` dispatch (the device-resident loop
    shape): per-step host work -- the PRNG split round-trip and the batch
    gather -- moves on device, which matters wherever dispatch latency is
    non-trivial (measured on this setup: the per-step loop reaches only
    ~23% of the chained-dispatch throughput,
    benchmarks/loop_throughput.py). The PRNG split pattern is identical,
    so trajectories are bit-for-bit those of the per-step loop (tested);
    callbacks fire at group boundaries (their per-step cadence is rounded
    up to the group), and a trailing partial group falls back to per-step
    dispatches. Grouped dispatches DONATE the incoming params/opt-state/
    key buffers (no second HBM copy) -- on TPU the ``pgm_params``/
    ``net_params``/``opt_state``/``key`` you pass in are consumed; pass
    ``donate_groups=False`` if you keep references to them past this
    call.

    Returns (pgm_params, net_params, opt_state, elbo_history, key).
    """
    N = data.shape[0]
    num_batches = N // batch_size
    history = []
    step_idx = 0
    total_steps = num_epochs * num_batches
    k_grp = max(int(steps_per_dispatch), 1)
    fused_group = (_fused_group_for(train_step, k_grp, donate_groups)
                   if k_grp > 1 else None)

    for epoch in range(num_epochs):
        key, kperm = jax.random.split(key)
        if shuffle:
            perm = jax.random.permutation(kperm, N)
        else:
            perm = jnp.arange(N)
        b = 0
        while b < num_batches:
            if k_grp > 1 and b + k_grp <= num_batches:
                grp = data[perm[b * batch_size:(b + k_grp) * batch_size]]
                grp = grp.reshape((k_grp, batch_size) + data.shape[1:])
                (pgm_params, net_params, opt_state, key, elbos,
                 terms) = fused_group(pgm_params, net_params, opt_state,
                                      grp, key)
                history.extend(list(elbos))
                advanced = k_grp
                elbo = elbos[-1]
            else:
                batch = data[perm[b * batch_size:(b + 1) * batch_size]]
                key, kstep = jax.random.split(key)
                pgm_params, net_params, opt_state, elbo, terms = train_step(
                    pgm_params, net_params, opt_state, batch, kstep
                )
                history.append(elbo)  # device scalar -- no host sync
                advanced = 1
            step_idx += advanced
            b += advanced
            # fire when a cadence multiple fell within the steps just
            # executed (for advanced == 1 this is the classic
            # step_idx % every == 0 condition)
            if callback is not None and (
                    step_idx % callback_every < advanced
                    or step_idx == total_steps):
                callback(step_idx - 1, float(elbo),
                         (pgm_params, net_params, opt_state), terms, key)
    history = [float(v) for v in jax.device_get(history)]
    return pgm_params, net_params, opt_state, history, key


def _batch_signature(batch):
    """Compile-relevant identity of a loader batch: tree structure plus
    per-leaf (shape, dtype). Batches sharing a signature hit the same XLA
    program and can ride one grouped-scan dispatch."""
    leaves, treedef = jax.tree.flatten(batch)
    return treedef, tuple(
        (tuple(x.shape), jnp.result_type(x).name) for x in leaves)


def run_loader(train_step, pgm_params, net_params, opt_state, get_batches,
               key, num_epochs, callback=None, callback_every=1,
               steps_per_dispatch=1, donate_groups=True):
    """Epoch loop driven by a loader factory (``data/loader.make_loader``):
    each epoch iterates ``get_batches(epoch)`` -- already shuffled,
    length-bucketed, and device-prefetched by the loader -- so ragged
    corpora and out-of-HBM datasets train through the same callback/metrics
    contract as :func:`run`. Batches may be ``(frames, lengths)`` pairs
    (pair with ``make_train_step(ragged=True)``).

    ``steps_per_dispatch > 1`` extends :func:`run`'s device-resident loop
    shape to the loader path: CONSECUTIVE same-shape batches (one length
    bucket's padded shape = one XLA program) are stacked and scanned inside
    one jitted dispatch, so the per-step dispatch tax -- measured 3-4x on
    this setup (benchmarks/loop_throughput.py) -- is paid once per group.
    The PRNG split pattern is identical to the per-step loop, and batches
    are consumed strictly in loader order, so trajectories are bit-for-bit
    those of ``steps_per_dispatch=1`` (tested). A shape change or epoch end
    flushes the partial group as per-step dispatches; pass
    ``group_by_shape=True`` to ``make_loader`` so ragged epochs emit each
    bucket's batches consecutively and groups fill. As in :func:`run`,
    grouped dispatches donate the incoming state buffers -- pass
    ``donate_groups=False`` to keep the caller's initial pytrees alive on
    TPU.

    Unlike :func:`run`, the total step count is not known up front (bucket
    sizes vary per epoch), so the callback fires on the cadence only
    (rounded to group boundaries, as in :func:`run`); the caller flushes
    final state itself. Returns
    (pgm_params, net_params, opt_state, elbo_history, key).
    """
    k_grp = max(int(steps_per_dispatch), 1)
    fused_group = (_fused_group_for(train_step, k_grp, donate_groups)
                   if k_grp > 1 else None)
    history = []
    step_idx = 0
    state = [pgm_params, net_params, opt_state, key]
    pending = []          # buffered same-signature batches, loader order
    pending_sig = [None]

    def fire(elbo, terms, advanced):
        nonlocal step_idx
        step_idx += advanced
        # cadence multiple fell within the steps just executed (advanced
        # == 1 reduces to the classic step_idx % every == 0 condition)
        if callback is not None and step_idx % callback_every < advanced:
            callback(step_idx - 1, float(elbo),
                     (state[0], state[1], state[2]), terms, state[3])

    def step_one(batch):
        pgm, net, st, k = state
        k, kstep = jax.random.split(k)
        pgm, net, st, elbo, terms = train_step(pgm, net, st, batch, kstep)
        state[:] = [pgm, net, st, k]
        history.append(elbo)  # device scalar -- no host sync
        fire(elbo, terms, 1)

    def flush():
        for b in pending:
            step_one(b)
        pending.clear()

    def step_group():
        pgm, net, st, k = state
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pending)
        pending.clear()
        pgm, net, st, k, elbos, terms = fused_group(pgm, net, st, stacked, k)
        state[:] = [pgm, net, st, k]
        history.extend(list(elbos))
        fire(elbos[-1], terms, k_grp)

    for epoch in range(num_epochs):
        for batch in get_batches(epoch):
            if fused_group is None:
                step_one(batch)
                continue
            sig = _batch_signature(batch)
            if pending and sig != pending_sig[0]:
                flush()
            pending.append(batch)
            pending_sig[0] = sig
            if len(pending) == k_grp:
                step_group()
        flush()  # trailing partial group: per-step dispatches
    history = [float(v) for v in jax.device_get(history)]
    return state[0], state[1], state[2], history, state[3]
