"""The full hierarchical NeRF network (coarse + fine) and its render function.

Functional equivalent of reference ``nerf_model.NeRFNetwork`` (``nerf_model.py:
56-205``): two independent MLPs, a stratified coarse pass, inverse-CDF fine
sampling, sorted union of 64+128 sample times, and transmittance compositing
for both passes. Here the whole render is one pure function (``render_rays``)
over a params pytree with an explicit PRNG key — a single XLA computation
under jit, no chunk loop, no module state.

A thin ``NeRFNetwork`` class wraps config + params for CLI/checkpoint
ergonomics; all compute goes through the pure functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from minimal_nerf_tpu.models.mlp import init_nerf_mlp, nerf_mlp_apply
from minimal_nerf_tpu.ops import rendering

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Hyperparameters of the hierarchical NeRF (reference ``nerf_model.py:63-64``)."""

    position_dim: int = 10
    direction_dim: int = 4
    coarse_samples: int = 64
    fine_samples: int = 128
    near: float = 2.0
    far: float = 6.0
    # "reference": independent uniform jitter inside the selected coarse bin
    # (reference nerf_helpers.py:154) + full sort of the 192-sample union.
    # "linterp": bmild-style linear inverse-CDF interpolation — fine ts come
    # out sorted, so the union is an O(n) merge instead of a sort.
    # A/B at production config (PERFORMANCE.md "Fine-sampling A/B"): the
    # reference mode is BOTH faster on TPU (the 192-wide sort is a cheap
    # bitonic network; the merge's scatters cost ~4.3ms/step) and
    # statistically equivalent in quality — so it is the default.
    fine_sampling: str = "reference"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "NeRFConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def init_nerf_network(key: jax.Array, config: NeRFConfig) -> Params:
    """Initialize independent coarse and fine MLPs (reference ``nerf_model.py:83-84``)."""
    k_coarse, k_fine = jax.random.split(key)
    return {
        "coarse": init_nerf_mlp(k_coarse, config.position_dim, config.direction_dim),
        "fine": init_nerf_mlp(k_fine, config.position_dim, config.direction_dim),
    }


def render_rays(
    params: Params,
    config: NeRFConfig,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    key: jax.Array,
    compute_dtype=None,
    mlp_apply=None,
    return_stats: bool = False,
    coarse_sampler=None,
) -> Dict[str, jnp.ndarray]:
    """Hierarchical volume render of a ray batch (reference ``nerf_model.py:89-132``).

    Args:
        params: ``{"coarse": mlp_params, "fine": mlp_params}``.
        o_rays/d_rays: ``[N, 3]`` ray origins/directions (directions NOT
            normalized; sample times are in units of ``||d||``).
        key: PRNG key driving stratified jitter, the shared CDF eps, and the
            in-bin fine jitter (three independent subkeys).
        compute_dtype: optional matmul dtype (bf16 for the TPU fast path).
        mlp_apply: override for the MLP evaluation (e.g. the fused Pallas
            kernel); signature of ``models.mlp.nerf_mlp_apply``.
        return_stats: also return the reference's per-forward density
            diagnostics (``nerf_model.py:105-106,124-125``) as
            ``{coarse,fine}_density_sumsq`` (sum of squares — callers take
            ``sqrt`` AFTER any cross-shard reduction so the norm matches the
            reference's whole-batch ``torch.linalg.norm``) and
            ``{coarse,fine}_density_non_zeros`` counts.
        coarse_sampler: override for the coarse sample placement (e.g. the
            occupancy-guided sampler, ``ops.occupancy.make_occupancy_sampler``);
            signature of ``rendering.generate_coarse_samples``'s
            ``(key, o, d, num_samples, near, far)`` tail. Default = the
            reference's uniform stratified sweep.

    Returns:
        dict with ``fine_rgb_rays [N, 3]`` and ``coarse_rgb_rays [N, 3]``
        (plus the four scalar stats when ``return_stats``).
    """
    apply_fn = mlp_apply if mlp_apply is not None else nerf_mlp_apply
    sample_coarse = (
        coarse_sampler if coarse_sampler is not None
        else rendering.generate_coarse_samples
    )
    k_coarse, k_cdf = jax.random.split(key)

    # Coarse pass.
    coarse_samples, coarse_ts = sample_coarse(
        k_coarse, o_rays, d_rays, config.coarse_samples, config.near, config.far
    )
    coarse_density, coarse_rgb = apply_fn(
        params["coarse"],
        coarse_samples,
        d_rays,
        config.position_dim,
        config.direction_dim,
        compute_dtype=compute_dtype,
    )
    coarse_deltas = rendering.generate_deltas(coarse_ts)
    coarse_weights = rendering.calculate_unnormalized_weights(
        coarse_density, coarse_deltas
    )
    coarse_rgb_ray = rendering.estimate_ray_color(coarse_weights, coarse_rgb)

    # Fine sampling: inverse-CDF over the coarse weights. The fine weights are
    # a function of the coarse net's output but gradients should not couple
    # the two nets through the sample positions (torch's searchsorted/gather
    # chain is likewise non-differentiable w.r.t. weights in the bin-index
    # path; we cut the whole thing explicitly).
    if config.fine_sampling == "linterp":
        fine_samples, fine_ts = rendering.inverse_transform_sampling_linterp(
            k_cdf,
            o_rays,
            d_rays,
            jax.lax.stop_gradient(coarse_weights),
            jax.lax.stop_gradient(coarse_ts),
            config.fine_samples,
            config.near,
            config.far,
        )
        all_samples, all_ts = rendering.merge_sorted_ts(
            o_rays, d_rays, fine_ts, jax.lax.stop_gradient(coarse_ts)
        )
    else:
        fine_samples, fine_ts = rendering.inverse_transform_sampling(
            k_cdf,
            o_rays,
            d_rays,
            jax.lax.stop_gradient(coarse_weights),
            jax.lax.stop_gradient(coarse_ts),
            config.fine_samples,
            config.near,
            config.far,
        )
        all_samples, all_ts = rendering.union_and_sort_ts(
            o_rays, d_rays, fine_ts, jax.lax.stop_gradient(coarse_ts)
        )

    # Fine pass over the sorted 64+128-point union.
    fine_density, fine_rgb = apply_fn(
        params["fine"],
        all_samples,
        d_rays,
        config.position_dim,
        config.direction_dim,
        compute_dtype=compute_dtype,
    )
    fine_deltas = rendering.generate_deltas(all_ts)
    fine_weights = rendering.calculate_unnormalized_weights(fine_density, fine_deltas)
    fine_rgb_ray = rendering.estimate_ray_color(fine_weights, fine_rgb)

    out = {"fine_rgb_rays": fine_rgb_ray, "coarse_rgb_rays": coarse_rgb_ray}
    if return_stats:
        for name, density in (("coarse", coarse_density), ("fine", fine_density)):
            d32 = jax.lax.stop_gradient(density).astype(jnp.float32)
            out[f"{name}_density_sumsq"] = jnp.sum(d32 * d32)
            out[f"{name}_density_non_zeros"] = jnp.sum(d32 != 0).astype(jnp.float32)
    return out


def render_single(
    params: Params,
    config: NeRFConfig,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    key: jax.Array,
    num_samples: Optional[int] = None,
    compute_dtype=None,
    mlp_apply=None,
) -> Dict[str, jnp.ndarray]:
    """Coarse-only render (reference ``SingleNeRF.forward``, ``nerf_model.py:234-256``).

    Args:
        params: a single MLP params pytree (``init_nerf_mlp``).
        num_samples: samples per ray; defaults to ``config.coarse_samples``.

    Returns:
        dict with ``pred_rgbs [N, 3]``, ``density``, ``ts``, ``samples``, ``deltas``.
    """
    apply_fn = mlp_apply if mlp_apply is not None else nerf_mlp_apply
    s = num_samples if num_samples is not None else config.coarse_samples
    samples, ts = rendering.generate_coarse_samples(
        key, o_rays, d_rays, s, config.near, config.far
    )
    density, rgb = apply_fn(
        params,
        samples,
        d_rays,
        config.position_dim,
        config.direction_dim,
        compute_dtype=compute_dtype,
    )
    deltas = rendering.generate_deltas(ts)
    weights = rendering.calculate_unnormalized_weights(density, deltas)
    pred_rgbs = rendering.estimate_ray_color(weights, rgb)
    return {
        "pred_rgbs": pred_rgbs,
        "density": density,
        "ts": ts,
        "samples": samples,
        "deltas": deltas,
    }


class SingleNeRF:
    """Coarse-only NeRF wrapper (reference ``SingleNeRF``, ``nerf_model.py:208-305``).

    Debug/ablation model: one MLP, stratified sampling only. Training uses
    ``Trainer(mode="single")``; this class provides the forward surface.
    """

    def __init__(
        self,
        position_dim: int = 10,
        direction_dim: int = 4,
        num_samples: int = 128,
        near: float = 2.0,
        far: float = 6.0,
        params: Optional[Params] = None,
        seed: int = 0,
        compute_dtype=None,
    ):
        from minimal_nerf_tpu.models.mlp import init_nerf_mlp

        self.config = NeRFConfig(
            position_dim=position_dim,
            direction_dim=direction_dim,
            coarse_samples=num_samples,
            near=near,
            far=far,
        )
        self.num_samples = num_samples
        self.compute_dtype = compute_dtype
        self._base_key = jax.random.PRNGKey(seed)
        self._call_count = 0
        self.params = (
            params
            if params is not None
            else init_nerf_mlp(
                jax.random.fold_in(self._base_key, 1), position_dim, direction_dim
            )
        )

    def forward(self, o_rays, d_rays, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.fold_in(self._base_key, self._call_count)
            self._call_count += 1
        return render_single(
            self.params,
            self.config,
            jnp.asarray(o_rays),
            jnp.asarray(d_rays),
            key,
            num_samples=self.num_samples,
            compute_dtype=self.compute_dtype,
        )

    __call__ = forward


class NeRFNetwork:
    """Thin config+params wrapper mirroring the reference's public surface.

    ``forward(o_rays, d_rays)`` returns ``{"fine_rgb_rays", "coarse_rgb_rays"}``
    like reference ``NeRFNetwork.forward`` (``nerf_model.py:89-132``), using an
    internal step-folded PRNG key.
    """

    def __init__(
        self,
        position_dim: int = 10,
        direction_dim: int = 4,
        coarse_samples: int = 64,
        fine_samples: int = 128,
        near: float = 2.0,
        far: float = 6.0,
        params: Optional[Params] = None,
        seed: int = 0,
        compute_dtype=None,
    ):
        self.config = NeRFConfig(
            position_dim=position_dim,
            direction_dim=direction_dim,
            coarse_samples=coarse_samples,
            fine_samples=fine_samples,
            near=near,
            far=far,
        )
        self.compute_dtype = compute_dtype
        self._base_key = jax.random.PRNGKey(seed)
        self._call_count = 0
        self.params = (
            params
            if params is not None
            else init_nerf_network(jax.random.fold_in(self._base_key, 1), self.config)
        )

    def forward(self, o_rays, d_rays, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.fold_in(self._base_key, self._call_count)
            self._call_count += 1
        return render_rays(
            self.params,
            self.config,
            jnp.asarray(o_rays),
            jnp.asarray(d_rays),
            key,
            compute_dtype=self.compute_dtype,
        )

    __call__ = forward
