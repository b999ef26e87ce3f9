"""In-run A/B: occupancy bin-probe lowering (gather vs onehot vs the new
VMEM-resident pallas kernel) at fast-recipe production shapes (VERDICT r3
#7). Same harness as bench.py's measure(): steady-state multi-step timing,
scalar fetch only, THREE independent windows per arm with the best reported
(the axon tunnel stalls can only make a window slower, never faster)."""
import sys; sys.path.insert(0, '/root/repo')
import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu.data.synthetic import pack_images
from minimal_nerf_tpu.kernels.fused_raymarch import make_fused_render_fn
from minimal_nerf_tpu.models.nerf import NeRFConfig, init_nerf_network
from minimal_nerf_tpu.training import TrainConfig, make_multi_step
from minimal_nerf_tpu.training.loop import SceneStatic, nerf_loss

num_frames, height, width = 100, 800, 800
train_cfg = TrainConfig(num_rays=4096, cropping_epochs=0, precision="bf16")
static = SceneStatic(height=height, width=width, focal=1111.111,
                     num_frames=num_frames)
rng = np.random.default_rng(0)
images = pack_images(
    rng.integers(0, 256, (num_frames, height, width, 3), dtype=np.uint8))
poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
poses[:, 2, 3] = 4.0
poses = jnp.asarray(poses)
num_inner = 20
base_key = jax.random.PRNGKey(0)
nerf_cfg = NeRFConfig(coarse_samples=16, fine_samples=48)

from minimal_nerf_tpu.ops import occupancy as occ_lib

for method in ("onehot", "pallas", "gather", "onehot", "pallas"):
    occ_cfg = dataclasses.replace(
        TrainConfig(occupancy=True).occupancy_config, probe_method=method)
    multi_fn, tx = make_multi_step(
        nerf_cfg, train_cfg, static, num_inner=num_inner,
        mlp_apply=None, occupancy_cfg=occ_cfg,
        loss_fn=functools.partial(nerf_loss, render_fn=make_fused_render_fn()),
    )
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    opt_state = tx.init(params)
    grid = occ_lib.init_grid(occ_cfg)
    t0 = time.perf_counter()
    params, opt_state, grid, m = multi_fn(
        params, opt_state, grid, images, poses, 0, base_key)
    float(m["train_loss"])
    print(f"[{method}] compile+warmup {time.perf_counter()-t0:.1f}s "
          f"loss {float(m['train_loss']):.6f}", flush=True)
    start = 1000
    windows = []
    for w in range(3):
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, grid, m = multi_fn(
                params, opt_state, grid, images, poses, start, base_key)
            start += num_inner
        float(m["train_loss"])
        el = time.perf_counter() - t0
        windows.append(reps * num_inner / el * 4096)
    best = max(windows)
    print(f"[{method}] windows {', '.join(f'{x:,.0f}' for x in windows)} "
          f"rays/s -> best {best:,.0f} ({4096/best*1000:.2f} ms/step) "
          f"loss {float(m['train_loss']):.6f}", flush=True)
