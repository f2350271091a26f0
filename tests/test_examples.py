"""Smoke-run every example script (the BASELINE.json configs) end-to-end
on CPU with the *_smoke presets; asserts finite, improving-or-stable ELBO.
These are the integration tests the reference only had as eyeball-the-gif
experiments (SURVEY.md section 4)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import gmm_pinwheel
import lds_dots
import lds_missing
import lds_ragged
import slds_synth
import conv_lds
import bigdata_dp


def _check(hist):
    assert len(hist) > 0
    assert all(np.isfinite(hist))


def test_gmm_pinwheel_smoke(tmp_path):
    hist = gmm_pinwheel.main([
        "--preset", "gmm_pinwheel_smoke",
        "--train.metrics_path", str(tmp_path / "m.jsonl"),
    ])
    _check(hist)
    assert np.mean(hist[-2:]) >= np.mean(hist[:2])
    assert (tmp_path / "m.jsonl").exists()


def test_lds_dots_smoke():
    _check(lds_dots.main(["--preset", "lds_dots_smoke"]))


def test_lds_ragged_smoke():
    hist, shapes = lds_ragged.main(["--preset", "lds_ragged_smoke"])
    _check(hist)
    # bucketing bounds the compile count: padded T's are pad_multiple
    # multiples, at most ceil(T / pad_multiple) distinct
    assert all(s % 8 == 0 for s in shapes)
    assert len(shapes) <= 3
    assert np.mean(hist[-3:]) >= np.mean(hist[:3])


def test_lds_missing_smoke():
    rmse, rmse_ffill = lds_missing.main(["--preset", "lds_missing_smoke"])
    assert np.isfinite(rmse) and np.isfinite(rmse_ffill)


def test_slds_synth_smoke():
    _check(slds_synth.main(["--preset", "slds_synth_smoke"]))


def test_conv_lds_smoke():
    _check(conv_lds.main(["--preset", "conv_lds_smoke"]))


def test_bigdata_dp_smoke(tmp_path):
    hist = bigdata_dp.main([
        "--preset", "bigdata_dp_smoke",
        "--train.metrics_path", str(tmp_path / "dp.jsonl"),
    ])
    _check(hist)


def test_checkpoint_resume_via_experiment(tmp_path):
    ckdir = str(tmp_path / "ck")
    hist1 = gmm_pinwheel.main([
        "--preset", "gmm_pinwheel_smoke",
        "--train.checkpoint_dir", ckdir,
        "--train.num_epochs", "2",
    ])
    from svae_tpu.train import checkpoint as ckpt_lib
    latest = ckpt_lib.latest(ckdir)
    assert latest is not None and latest.endswith("_4.npz")
    # resume toward a larger TOTAL epoch target: the 2 completed epochs are
    # skipped and 2 more run from the saved state (epoch-granular resume)
    hist2 = gmm_pinwheel.main([
        "--preset", "gmm_pinwheel_smoke",
        "--train.checkpoint_dir", ckdir,
        "--train.num_epochs", "4",
    ])
    assert ckpt_lib.latest(ckdir).endswith("_8.npz")
    _check(hist1)
    _check(hist2)
