"""Input-pipeline tests: reproducible shuffles, length bucketing with
bounded padding/compile count, device prefetch equivalence, and the
end-to-end ragged-corpus path into run_inference(lengths=)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svae_tpu.data import loader


def _corpus(seed=0, n=23, d=3, tmin=4, tmax=37):
    rng = np.random.RandomState(seed)
    return [rng.randn(rng.randint(tmin, tmax + 1), d).astype(np.float32)
            for _ in range(n)]


def test_epoch_batches_reproducible_and_complete():
    data = np.arange(40).reshape(20, 2).astype(np.float32)
    b1 = [b.copy() for b in loader.epoch_batches(data, 8, seed=7, epoch=3)]
    b2 = list(loader.epoch_batches(data, 8, seed=7, epoch=3))
    b3 = list(loader.epoch_batches(data, 8, seed=7, epoch=4))
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)  # same (seed, epoch) -> same
    assert any(not np.array_equal(x, y) for x, y in zip(b1, b3))
    # drop_remainder: 20 // 8 = 2 full batches
    assert len(b1) == 2 and all(b.shape == (8, 2) for b in b1)
    # without dropping, every row appears exactly once
    rows = np.concatenate(
        list(loader.epoch_batches(data, 8, seed=7, epoch=0,
                                  drop_remainder=False)))
    np.testing.assert_array_equal(np.sort(rows[:, 0]), data[:, 0])


def test_epoch_batches_pytree():
    data = {"x": np.arange(12).reshape(6, 2), "y": np.arange(6)}
    batches = list(loader.epoch_batches(data, 3, seed=0))
    assert len(batches) == 2
    for b in batches:
        assert b["x"].shape == (3, 2) and b["y"].shape == (3,)
        np.testing.assert_array_equal(b["x"][:, 0] // 2, b["y"])


def test_ragged_bucketing_padding_and_lengths():
    seqs = _corpus()
    out = list(loader.ragged_epoch_batches(seqs, 4, seed=1, epoch=0,
                                           pad_multiple=8))
    # every sequence exactly once
    total = sum(len(l) for _, l in out)
    assert total == len(seqs)
    seen_rows = []
    shapes = set()
    for batch, lengths in out:
        B, Tpad, d = batch.shape
        shapes.add(Tpad)
        assert Tpad % 8 == 0
        assert Tpad - lengths.max() < 8  # tight rounding, no over-padding
        for i in range(len(lengths)):
            t = int(lengths[i])
            # pad region zero, real region preserved
            np.testing.assert_array_equal(batch[i, t:], 0.0)
            seen_rows.append(batch[i, :t])
    # bucketing bounds compile count: padded shapes <= ceil(37/8) distinct
    assert len(shapes) <= 5
    # the corpus is reproduced exactly (as a multiset of sequences)
    key = sorted((s.shape[0], float(np.sum(s))) for s in seqs)
    key2 = sorted((s.shape[0], float(np.sum(s))) for s in seen_rows)
    for (t1, v1), (t2, v2) in zip(key, key2):
        assert t1 == t2 and v1 == pytest.approx(v2, rel=1e-6)


def test_ragged_bucketing_minimizes_padding_vs_naive():
    seqs = _corpus(seed=2, n=32, tmin=4, tmax=64)
    bucketed = list(loader.ragged_epoch_batches(seqs, 8, pad_multiple=8))
    pad_bucketed = sum(b.shape[0] * b.shape[1] - int(l.sum())
                       for b, l in bucketed)
    Tmax = max(s.shape[0] for s in seqs)
    pad_naive = sum(Tmax - s.shape[0] for s in seqs)
    assert pad_bucketed < 0.5 * pad_naive  # bucketing cuts padding >2x


def test_prefetch_matches_plain_iteration():
    data = np.random.RandomState(3).randn(16, 5).astype(np.float32)
    plain = [b.copy() for b in loader.epoch_batches(data, 4, seed=5)]
    fetched = list(loader.prefetch_to_device(
        loader.epoch_batches(data, 4, seed=5), size=3))
    assert len(plain) == len(fetched)
    for p, f in zip(plain, fetched):
        assert isinstance(f, jax.Array)
        np.testing.assert_allclose(np.asarray(f), p)


def test_make_loader_ragged_end_to_end_inference():
    from svae_tpu.models import lds

    d = 2
    rng = np.random.RandomState(4)
    seqs = [rng.randn(rng.randint(3, 12), d).astype(np.float64)
            for _ in range(9)]
    gnp = lds.init_pgm_param(jax.random.PRNGKey(5), d, dtype=jnp.float64)
    ld = loader.make_loader(seqs, 4, seed=6, pad_multiple=4)
    n_seen = 0
    for batch, lengths in ld(epoch=0):
        J = jax.nn.softplus(batch) + 0.3
        _, stats, _, lkl = lds.run_inference(
            gnp, gnp, (J, batch), jax.random.PRNGKey(7),
            lengths=jnp.asarray(lengths))
        assert np.isfinite(float(lkl))
        # transition count excludes pads exactly
        assert float(stats[1][3]) == pytest.approx(
            float((np.asarray(lengths) - 1).sum()))
        n_seen += len(lengths)
    assert n_seen == 9


def test_ragged_group_by_shape_orders_buckets_consecutively():
    """group_by_shape=True emits each padded-T bucket's batches
    consecutively (grouped-dispatch loops then scan long same-shape runs)
    and is a pure REORDERING: the multiset of (batch, lengths) pairs is
    identical to group_by_shape=False at the same (seed, epoch)."""
    rng = np.random.RandomState(3)
    seqs = [rng.randn(rng.randint(3, 20), 2) for _ in range(30)]

    def collect(**kw):
        return list(loader.ragged_epoch_batches(seqs, 4, seed=9, epoch=2,
                                                pad_multiple=8, **kw))

    plain = collect()
    grouped = collect(group_by_shape=True)
    assert len(plain) == len(grouped) == 8  # 7 full + 1 tail batch

    # the smaller tail batch (distinct batch-dim signature) is emitted
    # LAST so it cannot split a same-shape run mid-bucket
    assert grouped[-1][0].shape[0] < 4
    assert all(b.shape[0] == 4 for b, _ in grouped[:-1])

    # consecutive-run property among the full batches: each padded T
    # appears in ONE run
    tpads = [b.shape[1] for b, _ in grouped[:-1]]
    runs = [t for i, t in enumerate(tpads) if i == 0 or t != tpads[i - 1]]
    assert len(runs) == len(set(tpads))

    def key_of(item):
        b, l = item
        return (b.shape, b.tobytes(), np.asarray(l).tobytes())

    assert sorted(map(key_of, plain)) == sorted(map(key_of, grouped))
