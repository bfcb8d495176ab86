"""Torch-free checkpoint reader: parity with torch on both zip layouts,
and a subprocess proof that the load path needs no torch import."""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

pytestmark = pytest.mark.quick  # fast oracle tests (-m quick inner loop)

from distillclip_tpu.models.torch_reader import UnsupportedTorchFile, read_torch_file


class SubBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.lin = nn.Linear(6, 4)
        self.register_buffer("scale", torch.arange(4, dtype=torch.float32))

    def forward(self, x):
        return self.lin(x) * self.scale


class TinyModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.block = SubBlock()
        self.emb = nn.Parameter(torch.randn(5, 6).half())

    def forward(self, x):
        return self.block(x)


@pytest.fixture(scope="module")
def jit_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("tr") / "tiny_jit.pt"
    torch.jit.save(torch.jit.script(TinyModel()), str(p))
    return str(p)


@pytest.fixture(scope="module")
def save_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("tr") / "tiny_sd.pt"
    torch.save(TinyModel().state_dict(), str(p))
    return str(p)


def _assert_matches_torch(sd, ref_sd):
    assert sorted(sd) == sorted(ref_sd)
    for k, v in ref_sd.items():
        got = sd[k]
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.float32), v.detach().float().numpy(), err_msg=k
        )


def test_jit_archive(jit_path):
    sd = read_torch_file(jit_path)
    _assert_matches_torch(sd, torch.jit.load(jit_path).state_dict())
    assert sd["emb"].dtype == np.float16  # fp16 storage preserved


def test_plain_save_zip(save_path):
    sd = read_torch_file(save_path)
    _assert_matches_torch(sd, torch.load(save_path))


def test_non_zip_rejected(tmp_path):
    p = tmp_path / "not_a_zip.pt"
    p.write_bytes(b"\x80\x02not a torch zip")
    with pytest.raises(UnsupportedTorchFile):
        read_torch_file(str(p))


def test_load_path_needs_no_torch(save_path, jit_path):
    """load_torch_state_dict works with torch imports BLOCKED (VERDICT r1
    next-step #8: torch only as a test oracle / legacy fallback)."""
    code = f"""
import sys
class Block:
    def find_module(self, name, path=None):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch blocked by test")
sys.meta_path.insert(0, Block())
import jax
jax.config.update("jax_platforms", "cpu")
from distillclip_tpu.models.teacher import load_torch_state_dict
for p in ({save_path!r}, {jit_path!r}):
    sd = load_torch_state_dict(p)
    assert "block.lin.weight" in sd and sd["emb"].dtype.name == "float32", sorted(sd)
print("TORCH-FREE-OK")
"""
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0 and "TORCH-FREE-OK" in r.stdout, r.stdout + r.stderr
