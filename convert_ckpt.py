"""Convert a reference pytorch-lightning checkpoint to this framework's format.

The reference ships PL checkpoints (``model={name}-epoch={E}-step={S}.ckpt``,
``.MISSING_LARGE_BLOBS:4-6``) whose ``state_dict`` holds the two MLPs as
``{coarse,fine}_network.{mlp,feature_fn,density_fn,rgb_fn}.{i}.{weight,bias}``
(module tree at reference ``nerf_model.py:331-360``). This converter maps that
layout onto our plain-pytree params — transposing every Linear weight from
torch's ``[out, in]`` to our input-major ``[in, out]`` — and writes a native
checkpoint usable by ``render.py`` / ``score.py`` for numerical parity
validation against the reference outputs.

Usage:
    python convert_ckpt.py -i torch.ckpt -o converted.ckpt
"""

import argparse
from typing import Any, Dict

import numpy as np


def _linear_from_torch(state: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # np.array (not asarray): torch's .numpy() views SHARE memory with the
    # live module, so a non-copying conversion aliases weights that a
    # subsequent optimizer step would silently mutate
    w = np.array(state[f"{prefix}.weight"], dtype=np.float32)
    b = np.array(state[f"{prefix}.bias"], dtype=np.float32)
    return {"w": np.ascontiguousarray(w.T), "b": b}


def convert_mlp_state(state: Dict[str, Any], net_prefix: str) -> Dict[str, Any]:
    """Map one ``NeRFModel``'s torch state_dict subtree to our MLP pytree.

    Torch Sequential indices (reference ``nerf_model.py:331-360``):
    mlp: Linear at 0,2,4,6; feature_fn: Linear at 0,2,4;
    density_fn: Linear at 0; rgb_fn: Linear at 0,2.
    """
    p = net_prefix
    return {
        "trunk": [
            _linear_from_torch(state, f"{p}.mlp.{i}") for i in (0, 2, 4, 6)
        ],
        "feature": [
            _linear_from_torch(state, f"{p}.feature_fn.{i}") for i in (0, 2, 4)
        ],
        "density": _linear_from_torch(state, f"{p}.density_fn.0"),
        "rgb": [
            _linear_from_torch(state, f"{p}.rgb_fn.{i}") for i in (0, 2)
        ],
    }


def convert_checkpoint(in_path: str, out_path: str) -> None:
    import torch

    from minimal_nerf_tpu.models.nerf import NeRFConfig, init_nerf_network
    from minimal_nerf_tpu.training.config import TrainConfig
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib
    from minimal_nerf_tpu.training.loop import make_optimizer

    import jax

    raw = torch.load(in_path, map_location="cpu", weights_only=False)
    state = raw["state_dict"] if "state_dict" in raw else raw
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}

    hparams = raw.get("hyper_parameters", {}) or {}
    nerf_cfg = NeRFConfig(
        position_dim=int(hparams.get("position_dim", 10)),
        direction_dim=int(hparams.get("direction_dim", 4)),
        coarse_samples=int(hparams.get("coarse_samples", 64)),
        fine_samples=int(hparams.get("fine_samples", 128)),
        near=float(hparams.get("near", 2.0)),
        far=float(hparams.get("far", 6.0)),
    )
    params = {
        "coarse": convert_mlp_state(state, "coarse_network"),
        "fine": convert_mlp_state(state, "fine_network"),
    }

    # validate structure against a fresh init
    template = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    for (kt, t), (kp, p) in zip(
        jax.tree_util.tree_leaves_with_path(template),
        jax.tree_util.tree_leaves_with_path(params),
    ):
        assert jax.tree_util.keystr(kt) == jax.tree_util.keystr(kp)
        assert tuple(np.asarray(t).shape) == tuple(np.asarray(p).shape), (
            jax.tree_util.keystr(kt), np.asarray(t).shape, np.asarray(p).shape
        )

    train_cfg = TrainConfig()
    tx = make_optimizer(train_cfg, 100)
    opt_state = tx.init(jax.tree_util.tree_map(lambda x: np.asarray(x), params))
    step = int(raw.get("global_step", 0))
    ckpt_lib.save_checkpoint(
        out_path, params, opt_state, step,
        nerf_cfg.to_dict(), train_cfg.to_dict(),
        extra={"converted_from": str(in_path)},
    )
    print(f"wrote {out_path} (step {step})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-i", "--input", required=True, help="torch .ckpt path")
    parser.add_argument("-o", "--output", required=True, help="output .ckpt path")
    args = parser.parse_args()
    convert_checkpoint(args.input, args.output)
