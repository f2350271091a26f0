"""Input pipeline: shuffled epochs, length-bucketed ragged batches, and
device prefetch.

Greenfield vs the reference (upstream mattjj/svae slices a dense in-memory
array inside the optimizer loop -- svae/util.py:split_into_batches; there is
no loader subsystem). The TPU-shaped concerns a real pipeline must own:

* **Static shapes.** XLA compiles one program per input shape, so ragged
  corpora must be padded -- but padding is wasted FLOPs. Length bucketing
  sorts each (shuffled) epoch by length, batches neighbors, and pads every
  batch up to a rounded boundary (``pad_multiple``), so a corpus with a
  length spread costs only a handful of distinct compiled shapes AND keeps
  per-batch padding small. Batches carry ``lengths`` for the exact
  ragged-batch semantics of ``models/*.run_inference(lengths=)``.
* **H2D latency hiding.** ``prefetch_to_device`` keeps the next batches'
  host->device copies in flight while the current step runs -- JAX's async
  dispatch overlaps them with compute, which matters when the host link is
  slow (the axon tunnel here adds ~25 ms per synchronous transfer).
* **Reproducibility.** Shuffling derives from a single integer seed folded
  with the epoch index; iteration order is a pure function of (seed, epoch).

Host-side work is NumPy (cheap index permutations); everything device-side
is a `jax.device_put` the caller's jit step consumes.
"""

import collections

import numpy as np

import jax


def _rng(seed, epoch):
    return np.random.RandomState((int(seed) * 1_000_003 + int(epoch))
                                 % (2 ** 31 - 1))


def epoch_batches(data, batch_size, seed=0, epoch=0, drop_remainder=True):
    """Yield shuffled minibatches of a dense array (or pytree of arrays
    with a shared leading axis). Order is a pure function of
    ``(seed, epoch)``.
    """
    # convert leaves ONCE per epoch (for device-resident inputs this is one
    # D2H fetch, not one per batch), then index host-side
    data_np = jax.tree.map(np.asarray, data)
    n = int(jax.tree.leaves(data_np)[0].shape[0])
    perm = _rng(seed, epoch).permutation(n)
    stop = (n - batch_size + 1) if drop_remainder else n
    for lo in range(0, max(stop, 0), batch_size):
        idx = perm[lo:lo + batch_size]
        yield jax.tree.map(lambda a: a[idx], data_np)


def _round_up(t, m):
    return -(-int(t) // int(m)) * int(m)


def ragged_epoch_batches(sequences, batch_size, seed=0, epoch=0,
                         pad_multiple=8, drop_remainder=False,
                         dtype=None, group_by_shape=False):
    """Length-bucketed epoch over a ragged corpus.

    ``sequences`` is a list of (T_i, d) arrays. Each epoch: shuffle the
    corpus, stable-sort by length (the shuffle randomizes composition
    among equal/close lengths), batch consecutive sequences, pad each
    batch to ``round_up(max_len_in_batch, pad_multiple)``, and shuffle
    the BATCH order. Yields ``(batch (B, Tpad, d), lengths (B,))`` ready
    for ``run_inference(lengths=)``.

    ``pad_multiple`` trades padding waste against compile count: every
    batch's padded T is a multiple of it, so an epoch produces at most
    ``max_T / pad_multiple`` distinct XLA programs (in practice a
    handful), instead of one per distinct length (pad_multiple=1) or
    maximal padding (pad_multiple=max_T -- the pad-everything strategy).
    With ``drop_remainder=False`` a non-divisible corpus adds one more
    program for the smaller tail batch (see make_loader on when to drop).

    ``group_by_shape=True`` orders the epoch so batches sharing a padded T
    are CONSECUTIVE (group order shuffled, composition within a group
    already shuffled): grouped-dispatch training loops
    (``train.loop.run_loader(steps_per_dispatch=k)``) can then scan long
    same-shape runs instead of flushing on every shape change. The
    multiset of batches is identical to ``group_by_shape=False`` at the
    same (seed, epoch) -- only the emission order differs.
    """
    from svae_tpu.data.masking import pad_batch

    n = len(sequences)
    rng = _rng(seed, epoch)
    perm = rng.permutation(n)
    order = sorted(perm, key=lambda i: int(sequences[i].shape[0]))
    spans = []
    stop = (n - batch_size + 1) if drop_remainder else n
    for lo in range(0, max(stop, 0), batch_size):
        spans.append(order[lo:lo + batch_size])
    rng.shuffle(spans)
    if group_by_shape:
        groups = collections.OrderedDict()  # padded T -> spans, epoch order
        tail = None  # the one smaller remainder batch: its batch-dim
        for idx in spans:  # signature differs, so emit it LAST -- mid-
            if len(idx) < batch_size:  # bucket it would split a same-
                tail = idx             # shape run into two flushes
                continue
            Tp = _round_up(max(int(sequences[i].shape[0]) for i in idx),
                           pad_multiple)
            groups.setdefault(Tp, []).append(idx)
        keys = list(groups)
        rng.shuffle(keys)
        spans = [s for Tp in keys for s in groups[Tp]]
        if tail is not None:
            spans.append(tail)
    for idx in spans:
        group = [sequences[i] for i in idx]
        Tmax = max(int(s.shape[0]) for s in group)
        batch, lengths = pad_batch(group, T=_round_up(Tmax, pad_multiple),
                                   dtype=dtype)
        yield batch, lengths


def prefetch_to_device(iterator, size=2, sharding=None):
    """Wrap a host batch iterator so ``size`` batches are always in flight
    on device (``jax.device_put`` is async: the copy overlaps the consumer's
    current step). ``sharding`` may be a Sharding / device for placement
    (e.g. a NamedSharding over the mesh's data axis for the DP step);
    default is the backend's default device.
    """
    queue = collections.deque()

    def put(batch):
        queue.append(jax.tree.map(
            lambda x: jax.device_put(x, sharding), batch))

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out


def make_loader(data_or_sequences, batch_size, seed=0, *, ragged=None,
                pad_multiple=8, drop_remainder=None, prefetch=2,
                sharding=None, group_by_shape=False):
    """Epoch-loader factory: ``loader(epoch) -> iterator of device batches``.

    Dense corpus (array / pytree): yields shuffled (batch,) minibatches.
    Ragged corpus (list of (T_i, d) arrays; autodetected, or force with
    ``ragged=``): yields length-bucketed ``(batch, lengths)`` pairs.
    ``prefetch=0`` disables device prefetch (host arrays come out as-is).

    Ragged default is ``drop_remainder=False`` (every sequence seen each
    epoch; the single-device objective scales by the actual batch size, so
    a smaller tail batch is exact -- at the cost of one extra compiled
    program). For the shard_map DP step (``make_dp_train_step``, which is
    built for a FIXED global batch) pass ``drop_remainder=True`` so every
    batch divides the data axis and carries the assumed size.

    ``group_by_shape=True`` (ragged only) emits each length bucket's
    batches consecutively so ``run_loader(steps_per_dispatch=k)`` groups
    fill -- see ragged_epoch_batches.
    """
    if ragged is None:
        ragged = isinstance(data_or_sequences, (list, tuple))
    if drop_remainder is None:
        drop_remainder = not ragged

    def loader(epoch):
        if ragged:
            it = ragged_epoch_batches(
                data_or_sequences, batch_size, seed, epoch,
                pad_multiple=pad_multiple, drop_remainder=drop_remainder,
                group_by_shape=group_by_shape)
        else:
            it = epoch_batches(data_or_sequences, batch_size, seed, epoch,
                               drop_remainder=drop_remainder)
        if prefetch:
            return prefetch_to_device(it, size=prefetch, sharding=sharding)
        return it

    return loader
