"""bench.py is the driver's measurement interface -- smoke it on CPU with
tiny shapes so a refactor can't silently break the headline metric."""

import json
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def test_cpu_oracle_measures():
    v = bench.measure_cpu_oracle(T=20, d_latent=4, reps=2)
    assert np.isfinite(v) and v > 0


def test_real_small_estep_runs():
    """The actual device-measurement function with tiny shapes (runs on
    whatever backend the test session uses -- CPU here)."""
    val = bench.measure_tpu_estep(B=2, T=8, d_obs=4, d_latent=2,
                                  num_samples=1, iters=2)
    assert np.isfinite(val) and val > 0


def test_main_emits_schema(monkeypatch, capsys):
    # stub the measurements (covered individually above); this test pins
    # the output contract the driver parses
    monkeypatch.setattr(bench, "measure_tpu_estep", lambda: 123.0)
    monkeypatch.setattr(bench, "measure_tpu_steps", lambda: (45.0, 0.1))
    monkeypatch.setattr(bench, "measure_tpu_pallas_estep", lambda: 200.0)
    monkeypatch.setattr(bench, "measure_cpu_oracle", lambda: 10.0)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "lds_svae_T100_estep_seqs_per_sec_per_chip"
    for k in ("value", "unit", "vs_baseline", "train_step_seqs_per_sec",
              "cpu_estep_seqs_per_sec", "pallas_estep_seqs_per_sec"):
        assert k in rec
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
