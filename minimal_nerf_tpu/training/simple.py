"""Training loop for the toy 2-D image NeRF (``train_nerf.py simple``).

Parity with reference ``train_simple_image`` (``train_nerf.py:50-60``) +
``ImageNeRFModel`` hooks (``nerf_model.py:447-471``): per-pixel batches, Adam
5e-4, periodic full-image reconstruction as validation (also fixing the
reference's latent ``Image``-NameError bug at ``nerf_model.py:469``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from minimal_nerf_tpu import views
from minimal_nerf_tpu.data.photo import PhotoDataset
from minimal_nerf_tpu.models.image_nerf import image_nerf_apply, init_image_nerf
from minimal_nerf_tpu.training.metrics import MetricsLogger


def train_simple_image(
    im_path,
    root_dir,
    name: str,
    max_steps: int,
    position_dim: int = 10,
    batch_size: int = 4096,
    lr: float = 5e-4,
    seed: int = 0,
    val_every: int = 1000,
    log_every: int = 100,
    logger: Optional[MetricsLogger] = None,
):
    """Overfit the toy MLP to one photo; returns final params."""
    ds = PhotoDataset(im_path)
    run_dir = Path(root_dir) / name
    logger = logger or MetricsLogger(run_dir, name=name)
    key = jax.random.PRNGKey(seed)
    params = init_image_nerf(jax.random.fold_in(key, 1), position_dim)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    coords_all = jnp.asarray(ds.coords)
    rgb_all = jnp.asarray(ds.rgb)
    n = coords_all.shape[0]

    @jax.jit
    def step_fn(params, opt_state, step):
        k = jax.random.fold_in(key, step)
        idx = jax.random.randint(k, (batch_size,), 0, n)
        coords = coords_all[idx]
        rgb = rgb_all[idx]

        def loss_fn(p):
            pred = image_nerf_apply(p, coords, position_dim)
            return jnp.mean((pred - rgb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for step in range(max_steps):
        params, opt_state, loss = step_fn(params, opt_state, step)
        if (step + 1) % log_every == 0 or step + 1 == max_steps:
            logger.log_scalars(step + 1, {"train_loss": float(loss)})
        if (step + 1) % val_every == 0 or step + 1 == max_steps:
            im = views.photo_nerf_to_image(
                lambda c: image_nerf_apply(params, c, position_dim), ds.H, ds.W
            )
            logger.log_image(
                "recon", (np.clip(im, 0, 1) * 255).astype(np.uint8), step=step + 1
            )
    return params
