_base_ = [
    "{{fileDirname}}/../models/nerf_mlp.yml",
    "{{fileDirname}}/../ray_samplers/ray_sampler.yml",
    "{{fileDirname}}/../renderers/renderer.yml",
]
pipeline = dict(
    type="NeRFPipeline",
    chunk_size_grid=40,
    num_passes=2,
    output_rasterized_mc=True,
    loss_weights=dict(loss_rgb_mse=1.0, loss_prev_stage_rgb_mse=1.0),
    model="{{_base_.model}}",
    ray_sampler="{{_base_.ray_sampler}}",
    renderer="{{_base_.renderer}}",
    feature_extractor=[],
)
