from .harmonics import harmonic_embedding, harmonic_embedding_dim, harmonic_frequencies
from .metrics import (
    calc_mse,
    calc_psnr,
    eval_depth,
    huber,
    mse2psnr,
    rgb_metrics,
    safe_sqrt,
    view_metrics,
)
from .raymarch import emission_absorption, emission_absorption_weights
from .rays import (
    get_min_max_depth_bounds,
    get_xy_grid,
    jiggle_within_stratas,
    ndc_ray_bundle,
    ray_bundle_to_ray_points,
    xy_to_ray_bundle,
)
from .sample_pdf import sample_pdf
from .sampling import sample_grid, scatter_rays_to_image, weighted_sample_without_replacement
from .structures import EvaluationMode, RayBundle, RendererOutput, RenderSamplingMode

__all__ = [
    "harmonic_embedding",
    "harmonic_embedding_dim",
    "harmonic_frequencies",
    "calc_mse",
    "calc_psnr",
    "eval_depth",
    "huber",
    "mse2psnr",
    "rgb_metrics",
    "safe_sqrt",
    "view_metrics",
    "emission_absorption",
    "emission_absorption_weights",
    "get_min_max_depth_bounds",
    "get_xy_grid",
    "jiggle_within_stratas",
    "ndc_ray_bundle",
    "ray_bundle_to_ray_points",
    "xy_to_ray_bundle",
    "sample_pdf",
    "sample_grid",
    "scatter_rays_to_image",
    "weighted_sample_without_replacement",
    "EvaluationMode",
    "RayBundle",
    "RendererOutput",
    "RenderSamplingMode",
]
