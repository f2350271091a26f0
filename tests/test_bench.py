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
    """The actual device-measurement function with tiny shapes on both
    backends (runs on whatever backend the test session uses -- CPU here;
    the pallas backend lowers via the interpreter fallback is NOT used:
    pallas_call(interpret=False) works on CPU via the XLA CPU emulation
    path in recent jax, exercised implicitly in test_pallas on-chip)."""
    val = bench.measure_tpu_estep("xla", B=2, T=8, d_latent=2,
                                  num_samples=1, iters=2, k_fused=2)
    assert np.isfinite(val) and val > 0


def test_slds_hmm_cpu_twins_measure():
    t, x, c = bench.measure_hmm(B=2, T=10, K=3, iters=2)
    assert all(np.isfinite(v) and v > 0 for v in (t, x, c))


def test_speed_of_light_fields():
    sol = bench.speed_of_light(0.005)
    assert set(sol) == {"pallas_step_gflops", "vpu_peak_frac", "hbm_gbps",
                        "hbm_peak_frac"}
    assert all(np.isfinite(v) and v > 0 for v in sol.values())


def test_gmm_measures_tiny():
    steps, cpu, unfused, k = bench.measure_gmm(N=10, K=3, d_latent=2,
                                               num_iters=3, S=1, iters=2,
                                               k_fused=2)
    assert np.isfinite(steps) and steps > 0
    assert np.isfinite(cpu) and cpu > 0
    assert np.isfinite(unfused) and unfused > 0 and k == 2


def test_conv_lds_measures_tiny():
    seqs, cpu, dt = bench.measure_conv_lds(B=2, T=8, hw=(4, 4),
                                           d_latent=2, S=1, iters=2)
    assert np.isfinite(seqs) and seqs > 0
    assert np.isfinite(cpu) and cpu > 0


def test_main_emits_schema(monkeypatch, capsys):
    # stub the measurements (covered individually above); this test pins
    # the output contract the driver parses
    monkeypatch.setattr(bench, "measure_tpu_estep", lambda backend: 123.0)
    monkeypatch.setattr(bench, "measure_tpu_steps",
                        lambda backend: (45.0, 0.1))
    monkeypatch.setattr(bench, "measure_cpu_oracle", lambda: 10.0)
    monkeypatch.setattr(bench, "measure_slds",
                        lambda: (30.0, 8.0, 2.0, 0.02))
    monkeypatch.setattr(bench, "measure_hmm", lambda: (500.0, 400.0, 100.0))
    monkeypatch.setattr(bench, "measure_gmm",
                        lambda: (600.0, 40.0, 80.0, 10))
    monkeypatch.setattr(bench, "measure_conv_lds",
                        lambda: (90.0, 5.0, 0.09))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "lds_svae_T100_estep_seqs_per_sec_per_chip"
    for k in ("value", "unit", "vs_baseline", "train_step_seqs_per_sec",
              "cpu_estep_seqs_per_sec", "train_step_xla_seqs_per_sec",
              "slds_estep_seqs_per_sec", "slds_vs_cpu",
              "hmm_posterior_seqs_per_sec", "hmm_vs_cpu",
              "gmm_steps_per_sec", "gmm_vs_cpu",
              "conv_lds_train_seqs_per_sec", "conv_lds_vs_cpu_estep",
              "pallas_step_gflops", "vpu_peak_frac", "hbm_peak_frac"):
        assert k in rec
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["gmm_steps_per_sec"] == 600.0
    assert rec["conv_lds_vs_cpu_estep"] == 18.0


def test_main_records_row_error_diagnosis(monkeypatch, capsys):
    """A failed row must null its metric AND record a one-line diagnosis
    (r05: a conv row nulled in a driver-style capture because a second
    process shared the chip; the bare null was undiagnosable)."""
    monkeypatch.setattr(bench, "measure_tpu_estep", lambda backend: 123.0)
    monkeypatch.setattr(bench, "measure_tpu_steps",
                        lambda backend: (45.0, 0.1))
    monkeypatch.setattr(bench, "measure_cpu_oracle", lambda: 10.0)
    monkeypatch.setattr(bench, "measure_slds",
                        lambda: (30.0, 8.0, 2.0, 0.02))
    monkeypatch.setattr(bench, "measure_hmm", lambda: (500.0, 400.0, 100.0))
    monkeypatch.setattr(bench, "measure_gmm",
                        lambda: (600.0, 40.0, 80.0, 10))

    def boom():
        raise RuntimeError("chip busy:\n   second process")

    monkeypatch.setattr(bench, "measure_conv_lds", boom)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["conv_lds_train_seqs_per_sec"] is None
    assert "chip busy" in rec["conv_lds_error"]
    assert "\n" not in rec["conv_lds_error"]
    # the b256 stub above cannot accept B=/k_fused= kwargs -> that row
    # nulls too and must carry its own diagnosis
    assert rec["train_step_b256_seqs_per_sec"] is None
    assert "b256_error" in rec


def test_row_error_compact():
    msg = bench._row_error(ValueError("x\n" + "y" * 500))
    assert "\n" not in msg and len(msg) <= 300
