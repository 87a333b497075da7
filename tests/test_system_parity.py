"""System-level convergence parity: the torch reference vs floodseg_tpu.

The per-step f64 trajectory oracles (test_*_trajectory.py) prove each
mechanism matches; this gate proves the SYSTEMS converge to the same place.
It runs scripts/verify_parity.py end-to-end — the reference's own modules
(model/pspnet.py, util/dataset.py, u2pl loss_helper, util/util.py metrics)
against the floodseg_tpu CLI Runner on the same synthetic dataset files —
and gates the converged mIoU.

Calibration (PARITY_r04.json, 5 jax + 8 torch seeds, 30 epochs):
floodseg_tpu best-val 0.492±0.044 vs torch 0.343±0.080 — floodseg's WORST
seed (0.405) beats the torch mean. A single-seed gate must absorb BOTH seed
spreads: the delta's std is sqrt(std_t^2 + std_j^2) = 0.092 (best-val) /
0.153 (test mIoU — torch alone spans 0.155-0.536 across 8 seeds), so the
margins here are ~2 sigma: 0.19 / 0.31. The tighter regression tripwire is
the ABSOLUTE floor on the floodseg side (every calibrated jax seed reached
>= 0.405 best-val / 0.34 test); see PARITY.md 'System-level convergence
parity'.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_system_parity_supervised(tmp_path):
    out = tmp_path / "parity.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single CPU device is the calibrated setup
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_parity.py"),
         "--seeds", "1", "--epochs", "30", "--out", str(out),
         "--workdir", str(tmp_path / "w"),
         "--gate", "best_val_miou=0.19,test_miou1=0.31"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "parity gate passed" in proc.stdout
    summary = json.loads(out.read_text())
    ours = {r["impl"]: r for r in summary["results"]}["floodseg_tpu"]
    # absolute floor from calibration: every jax seed reached >= 0.405
    # best-val; 0.34 test. Guards against a silent regression even when
    # the live torch seed lands in its stuck basin.
    assert ours["best_val_miou"] >= 0.38
    assert ours["test_miou1"] >= 0.30


@pytest.mark.slow
def test_system_parity_flow(tmp_path):
    """flow_supervised (the paper's headline path) converged-system parity.

    Calibration (PARITY_r05_flow.json, 3 seeds/side, 30 epochs): floodseg
    best-val 0.209±0.006 / test 0.195 vs torch 0.250±0.066 / 0.172. The
    interp task at this synthetic scale is a weak-signal regime (val is a
    center-crop of a 96x128 frame, labels live on interpolated frames), so
    the regime discriminates catastrophic semantics breaks (warp chains,
    grid renorm, OHEM — a break collapses to <0.1), not fine tuning.
    torch's single-seed spread is 0.178-0.338 (the same aug-stream variance
    PARITY.md's dissection certified), floodseg's is 0.201-0.214; margins
    are ~2 sigma of the delta spread (sigma_t 0.066 dominates).
    """
    out = tmp_path / "parity_flow.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_parity.py"),
         "--method", "flow_supervised",
         "--seeds", "1", "--epochs", "30", "--out", str(out),
         "--workdir", str(tmp_path / "w"),
         "--gate", "best_val_miou=0.16,test_miou1=0.12"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=5400)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "parity gate passed" in proc.stdout
    summary = json.loads(out.read_text())
    ours = {r["impl"]: r for r in summary["results"]}["floodseg_tpu"]
    # absolute floors: every calibrated jax seed reached >= 0.200 best-val
    # and >= 0.152 test; a semantics break lands far below
    assert ours["best_val_miou"] >= 0.17
    assert ours["test_miou1"] >= 0.12


@pytest.mark.slow
def test_system_parity_gan(tmp_path):
    """s4GAN semi-supervised converged-system parity (gan.py:135-240: the
    4-phase G/D step, find_good_maps self-training, feature matching, the
    image_gt max(image_l) normalization quirk, SGD(G)+Adam(D) poly LRs).

    Calibration (PARITY_r05_gan.json, 3 seeds/side, 30 epochs, 60-frame/
    10-label synthetic set): floodseg best-val 0.592±0.010 / test 0.497 vs
    torch 0.325±0.076 / 0.257±0.126. Same signature as the supervised and
    flow studies: the torch stack spans 0.226-0.412 on its global aug
    stream (adversarial training amplifies the early-draw sensitivity the
    dissection in PARITY.md certified), floodseg's three seeds sit within
    ±0.013 of 0.59 val. Margins are ~2 sigma of the per-seed delta spread
    (sqrt(0.076^2+0.010^2)=0.077 val, sqrt(0.126^2+0.109^2)=0.167 test).
    """
    out = tmp_path / "parity_gan.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_parity.py"),
         "--method", "gan",
         "--seeds", "1", "--epochs", "30", "--out", str(out),
         "--workdir", str(tmp_path / "w"),
         "--gate", "best_val_miou=0.16,test_miou1=0.34"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=5400)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "parity gate passed" in proc.stdout
    summary = json.loads(out.read_text())
    ours = {r["impl"]: r for r in summary["results"]}["floodseg_tpu"]
    # absolute floors: calibrated jax seeds reached >= 0.579 best-val and
    # >= 0.343 test; a semantics break in the G/D step lands far below
    assert ours["best_val_miou"] >= 0.50
    assert ours["test_miou1"] >= 0.28
