"""Convert checkpoints between the reference's PL format and this framework's.

Forward direction (default): the reference ships PL checkpoints
(``model={name}-epoch={E}-step={S}.ckpt``, ``.MISSING_LARGE_BLOBS:4-6``)
whose ``state_dict`` holds the two MLPs as
``{coarse,fine}_network.{mlp,feature_fn,density_fn,rgb_fn}.{i}.{weight,bias}``
(module tree at reference ``nerf_model.py:331-360``). This converter maps that
layout onto our plain-pytree params — transposing every Linear weight from
torch's ``[out, in]`` to our input-major ``[in, out]`` — and writes a native
checkpoint usable by ``render.py`` / ``score.py`` for numerical parity
validation against the reference outputs.

Reverse direction (``--reverse``): exports a native checkpoint as a
pytorch-lightning-compatible ``.ckpt`` (``state_dict`` +
``hyper_parameters`` matching reference ``NeRFNetwork.__init__``
``nerf_model.py:63-64``, plus ``epoch``/``global_step``), so checkpoints
trained here load back into the reference's tooling via
``NeRFNetwork.load_from_checkpoint`` (reference ``render.py:17``,
``score.py:21``).

Usage:
    python convert_ckpt.py -i torch.ckpt -o converted.ckpt
    python convert_ckpt.py --reverse -i native.ckpt -o pl.ckpt
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


def _linear_to_torch(state: Dict[str, Any], prefix: str, leaf: Dict[str, Any]) -> None:
    import torch

    # np.array copies: jax device arrays export as non-writable numpy views,
    # which torch.as_tensor would alias (and warn about)
    state[f"{prefix}.weight"] = torch.as_tensor(
        np.array(np.asarray(leaf["w"], dtype=np.float32).T, order="C")
    )
    state[f"{prefix}.bias"] = torch.as_tensor(
        np.array(leaf["b"], dtype=np.float32)
    )


def export_mlp_state(state: Dict[str, Any], net_prefix: str,
                     mlp_params: Dict[str, Any]) -> None:
    """Map one MLP pytree back onto the reference's torch Sequential indices
    (inverse of :func:`convert_mlp_state`; reference ``nerf_model.py:331-360``)."""
    p = net_prefix
    for i, leaf in zip((0, 2, 4, 6), mlp_params["trunk"]):
        _linear_to_torch(state, f"{p}.mlp.{i}", leaf)
    for i, leaf in zip((0, 2, 4), mlp_params["feature"]):
        _linear_to_torch(state, f"{p}.feature_fn.{i}", leaf)
    _linear_to_torch(state, f"{p}.density_fn.0", mlp_params["density"])
    for i, leaf in zip((0, 2), mlp_params["rgb"]):
        _linear_to_torch(state, f"{p}.rgb_fn.{i}", leaf)


def export_checkpoint(in_path: str, out_path: str) -> None:
    """Native checkpoint -> reference-loadable pytorch-lightning .ckpt."""
    import torch

    from minimal_nerf_tpu.training import checkpoint as ckpt_lib
    from minimal_nerf_tpu.training.trainer import load_state_for_inference

    header, _ = ckpt_lib.load_checkpoint(in_path)
    mode = (header.get("extra") or {}).get("mode", "full")
    if mode != "full":
        raise ValueError(
            f"only full NeRFNetwork checkpoints export to the reference "
            f"format (got mode={mode!r})"
        )
    params, nerf_cfg, train_cfg, _occ, _ = load_state_for_inference(in_path)

    state: Dict[str, Any] = {}
    export_mlp_state(state, "coarse_network", params["coarse"])
    export_mlp_state(state, "fine_network", params["fine"])

    step = int(header.get("step", 0))
    steps_per_epoch = train_cfg.steps_per_epoch or 100
    payload = {
        "state_dict": state,
        # reference NeRFNetwork.__init__ kwargs (nerf_model.py:63-64) — PL
        # re-instantiates the module from these on load_from_checkpoint
        "hyper_parameters": {
            "position_dim": nerf_cfg.position_dim,
            "direction_dim": nerf_cfg.direction_dim,
            "coarse_samples": nerf_cfg.coarse_samples,
            "fine_samples": nerf_cfg.fine_samples,
            "near": nerf_cfg.near,
            "far": nerf_cfg.far,
        },
        "epoch": step // steps_per_epoch,
        "global_step": step,
        # PL refuses ckpts without a version stamp; 1.5.10 = requirements.txt:5
        "pytorch-lightning_version": "1.5.10",
        "exported_from": str(in_path),
    }
    torch.save(payload, out_path)
    print(f"wrote {out_path} (PL format, step {step})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-i", "--input", required=True, help="input .ckpt path")
    parser.add_argument("-o", "--output", required=True, help="output .ckpt path")
    parser.add_argument("--reverse", action="store_true",
                        help="export native -> pytorch-lightning instead")
    args = parser.parse_args()
    if args.reverse:
        export_checkpoint(args.input, args.output)
    else:
        convert_checkpoint(args.input, args.output)
