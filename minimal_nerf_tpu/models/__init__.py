"""Model layer: NeRF MLPs as plain parameter pytrees + pure apply functions."""

from minimal_nerf_tpu.models.mlp import (  # noqa: F401
    init_linear,
    init_nerf_mlp,
    nerf_mlp_apply,
)
from minimal_nerf_tpu.models.nerf import (  # noqa: F401
    NeRFConfig,
    NeRFNetwork,
    SingleNeRF,
    init_nerf_network,
    render_rays,
    render_single,
)
from minimal_nerf_tpu.models.image_nerf import (  # noqa: F401
    ImageNeRFModel,
    image_nerf_apply,
    init_image_nerf,
)
