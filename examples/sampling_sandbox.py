"""Sampling & geometry sandbox — the runnable equivalent of the reference's
dev notebooks (``notebooks/Inverse Transform Sampling.ipynb`` and
``notebooks/Synthetic Dataset Sandbox.ipynb``).

Produces PNGs instead of notebook cells:

- ``inverse_cdf_hist.png``: fine-sample histograms against the coarse weight
  profile, for both ``fine_sampling`` modes (the notebook's histogram cells).
- ``stratified_bins.png``: stratified coarse samples vs their bins (the
  notebook's bin-bounds sanity plot).
- ``rays_3d.png``: 3-D ray fan for one pose + the 360-degree orbit camera
  positions (the notebook's pose/ray scatter).

The NDC-vs-bmild numerical validation that lived in the notebook is a proper
test here (``tests/test_reference_parity.py::test_ndc_rays_match_reference``).

Usage:
    python examples/sampling_sandbox.py --out /tmp/sandbox
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def plot_inverse_cdf(out: Path) -> None:
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from minimal_nerf_tpu.ops import rendering

    n, c, s = 4000, 8, 64
    near, far = 2.0, 6.0
    w = np.array([0.05, 0.1, 0.3, 0.05, 0.2, 0.1, 0.15, 0.05], np.float32)
    weights = jnp.asarray(np.tile(w[None, :, None], (n, 1, 1)))
    ts = near + (far - near) * (np.arange(c) + 0.5) / c
    ts_j = jnp.asarray(np.tile(ts.astype(np.float32)[None, :, None], (n, 1, 1)))
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))

    fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
    for ax, mode, fn in [
        (axes[0], "reference (in-bin jitter)", rendering.inverse_transform_sampling),
        (axes[1], "linterp (linear CDF inverse)",
         rendering.inverse_transform_sampling_linterp),
    ]:
        _, fine_ts = fn(
            jax.random.PRNGKey(0), o, d, weights, ts_j, s, near, far
        )
        ax.hist(np.asarray(fine_ts).ravel(), bins=80, density=True,
                alpha=0.75, label="fine samples")
        edges = np.concatenate([[near], ts, [far]])
        # bin i = [edge_i, edge_{i+1}) carries weight w_i; the last interval
        # (ts[-1], far] has ~zero mass since u < 1 = cdf[-1]
        wpad = np.concatenate([w, [0.0]])
        density = wpad / wpad.sum() / np.diff(edges)
        ax.step(edges[:-1], density, where="post", color="crimson",
                label="coarse weight pdf")
        ax.set_title(mode)
        ax.set_xlabel("t")
        ax.legend()
    fig.suptitle("Inverse-CDF hierarchical sampling follows the coarse weights")
    fig.tight_layout()
    fig.savefig(out / "inverse_cdf_hist.png", dpi=110)
    plt.close(fig)


def plot_stratified(out: Path) -> None:
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from minimal_nerf_tpu.ops import rendering

    n, s = 64, 16
    near, far = 2.0, 6.0
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    _, ts = rendering.generate_coarse_samples(
        jax.random.PRNGKey(0), o, d, s, near, far
    )
    ts = np.asarray(ts)[..., 0]

    fig, ax = plt.subplots(figsize=(9, 4))
    for i in range(n):
        ax.scatter(ts[i], np.full(s, i), s=4, c="steelblue")
    step = (far - near) / s
    for k in range(s + 1):
        ax.axvline(near + k * step, color="gray", lw=0.5, alpha=0.6)
    ax.set_xlabel("t")
    ax.set_ylabel("ray index")
    ax.set_title("Stratified coarse samples: exactly one per bin, jittered")
    fig.tight_layout()
    fig.savefig(out / "stratified_bins.png", dpi=110)
    plt.close(fig)


def plot_rays(out: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from minimal_nerf_tpu.ops import cameras

    fig = plt.figure(figsize=(10, 5))

    ax = fig.add_subplot(121, projection="3d")
    pose = cameras.pose_spherical(30.0, -30.0, 4.0)
    o, d = cameras.get_rays(9, 9, 10.0, pose)
    o = np.asarray(o).reshape(-1, 3)
    d = np.asarray(d).reshape(-1, 3)
    ax.quiver(o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
              length=1.5, normalize=True, lw=0.5, color="steelblue")
    ax.scatter([0], [0], [0], c="crimson", s=40, label="origin")
    ax.set_title("pinhole ray fan (pose_spherical(30, -30, 4))")
    ax.legend()

    ax2 = fig.add_subplot(122, projection="3d")
    poses = cameras.spherical_poses(num_poses=40, radius=4.0)
    cams = np.stack([np.asarray(p)[:3, 3] for p in poses])
    ax2.plot(cams[:, 0], cams[:, 1], cams[:, 2], "o-", ms=3, lw=0.8)
    ax2.scatter([0], [0], [0], c="crimson", s=40)
    ax2.set_title("360-degree orbit camera positions (render.py)")

    fig.tight_layout()
    fig.savefig(out / "rays_3d.png", dpi=110)
    plt.close(fig)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/sandbox")
    args = parser.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    plot_inverse_cdf(out)
    plot_stratified(out)
    plot_rays(out)
    for f in sorted(out.glob("*.png")):
        print(f"wrote {f}")


if __name__ == "__main__":
    main()
