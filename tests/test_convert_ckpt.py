"""Torch-checkpoint conversion + numerical forward parity vs torch."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import convert_ckpt  # noqa: E402


def _build_torch_nerf_model(position_dim=10, direction_dim=4):
    """A torch module with the reference's exact architecture
    (``nerf_model.py:318-360``) for parity testing."""
    import torch.nn as nn

    class TorchNeRFModel(nn.Module):
        def __init__(self):
            super().__init__()
            act = nn.ReLU()
            self.mlp = nn.Sequential(
                nn.Linear(position_dim * 2 * 3, 256), act,
                nn.Linear(256, 256), act,
                nn.Linear(256, 256), act,
                nn.Linear(256, 256), act,
            )
            self.feature_fn = nn.Sequential(
                nn.Linear(256 + position_dim * 2 * 3, 256), act,
                nn.Linear(256, 256), act,
                nn.Linear(256, 256),
            )
            self.density_fn = nn.Sequential(nn.Linear(256, 1), nn.ReLU())
            self.rgb_fn = nn.Sequential(
                nn.Linear(256 + direction_dim * 2 * 3, 128), act,
                nn.Linear(128, 3), nn.Sigmoid(),
            )

        def forward(self, samples, direc):
            import math

            direc = direc / torch.linalg.norm(direc, dim=1, keepdim=True)
            direc = torch.broadcast_to(direc[:, None, :], samples.shape)
            samples = samples / math.pi

            def enc(x, dim):
                outs = []
                for i in range(dim):
                    outs.append(torch.cos(2**i * torch.pi * x))
                    outs.append(torch.sin(2**i * torch.pi * x))
                return torch.cat(outs, dim=-1)

            pe = enc(samples, position_dim)
            de = enc(direc, direction_dim)
            x = self.mlp(pe)
            x = self.feature_fn(torch.cat((x, pe), dim=-1))
            density = self.density_fn(x)
            rgb = self.rgb_fn(torch.cat((x, de), dim=-1))
            return density, rgb

    return TorchNeRFModel()


def test_convert_and_forward_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from minimal_nerf_tpu.models import nerf_mlp_apply

    torch.manual_seed(0)
    coarse = _build_torch_nerf_model()
    fine = _build_torch_nerf_model()
    state_dict = {}
    for name, mod in [("coarse_network", coarse), ("fine_network", fine)]:
        for k, v in mod.state_dict().items():
            state_dict[f"{name}.{k}"] = v
    ckpt = {
        "state_dict": state_dict,
        "global_step": 1234,
        "hyper_parameters": {
            "position_dim": 10, "direction_dim": 4,
            "coarse_samples": 64, "fine_samples": 128,
            "near": 2.0, "far": 6.0,
        },
    }
    torch_path = tmp_path / "model=lego-epoch=12-step=1234.ckpt"
    torch.save(ckpt, torch_path)

    out_path = tmp_path / "converted-epoch=12-step=1234.ckpt"
    convert_ckpt.convert_checkpoint(str(torch_path), str(out_path))

    from minimal_nerf_tpu.training.trainer import load_model_for_inference

    params, nerf_cfg, _ = load_model_for_inference(out_path)
    assert nerf_cfg.coarse_samples == 64

    # forward parity: same samples/directions through torch and JAX
    rng = np.random.default_rng(0)
    samples = rng.uniform(-3, 3, (16, 8, 3)).astype(np.float32)
    direc = rng.normal(size=(16, 3)).astype(np.float32)

    with torch.no_grad():
        t_density, t_rgb = coarse(
            torch.from_numpy(samples), torch.from_numpy(direc)
        )
    j_density, j_rgb = nerf_mlp_apply(
        params["coarse"], jnp.asarray(samples), jnp.asarray(direc)
    )
    np.testing.assert_allclose(
        np.asarray(j_density), t_density.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_rgb), t_rgb.numpy(), rtol=1e-4, atol=1e-5
    )
