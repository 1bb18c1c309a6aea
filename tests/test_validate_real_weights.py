"""scripts/validate_real_weights.py — real-weight parity readiness (VERDICT #4).

The real IMAGENET1K_V1 checkpoint can't be downloaded here (zero egress), so
the script is exercised with a *random* torchvision-shaped vit_b_16 .pth: it
must load all 150 ViT tensors, run full-model JAX-vs-oracle parity, and pass
the BASELINE acceptance criteria.  The moment real weights are mounted
(MONODEPTH_TPU_VIT_WEIGHTS) the same command validates real-weight parity.
"""

import json
import os
import subprocess
import sys

import pytest
import torch

from tests import torch_oracle as oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "validate_real_weights.py")


def _env_without_checkpoint():
    env = dict(os.environ)
    env.pop("MONODEPTH_TPU_VIT_WEIGHTS", None)
    env["TORCH_HOME"] = "/tmp/definitely-missing-torch-home"
    return env


def test_exits_2_and_hints_when_no_checkpoint():
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--cpu"], capture_output=True, text=True,
        env=_env_without_checkpoint(), timeout=300,
    )
    assert proc.returncode == 2, proc.stderr
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["status"] == "no_checkpoint"
    assert "MONODEPTH_TPU_VIT_WEIGHTS" in payload["hint"]


def test_rejects_non_vit_state_dict(tmp_path):
    bogus = tmp_path / "not_vit.pth"
    torch.save({"some.unknown.key": torch.zeros(3)}, str(bogus))
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--cpu", "--weights", str(bogus)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode != 0
    assert "unexpected checkpoint key" in proc.stderr


@pytest.mark.slow
def test_passes_with_random_torchvision_checkpoint(tmp_path):
    gen = torch.Generator().manual_seed(7)
    sd = oracle.make_vit_state_dict(gen)
    # the real checkpoint also carries the classification head (removed by
    # the reference, encoder.py:38) — the script must skip it
    sd["heads.head.weight"] = torch.randn(1000, 768, generator=gen)
    sd["heads.head.bias"] = torch.randn(1000, generator=gen)
    path = tmp_path / "fake_vit_b_16.pth"
    torch.save(sd, str(path))

    proc = subprocess.run(
        [sys.executable, SCRIPT, "--cpu", "--weights", str(path),
         "--images", "1"],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["status"] == "pass"
    assert payload["vit_tensors_loaded"] == 150
    assert payload["abs_rel_vs_oracle"] < 1e-3
    assert payload["delta1_vs_oracle"] > 1 - 1e-3
