_base_ = [
    "{{fileDirname}}/../ray_samplers/ray_sampler.yml",
]
pipeline = dict(
    type="NeRFPipeline",
    chunk_size_grid=40,
    num_passes=1,
    output_rasterized_mc=True,
    loss_weights=dict(loss_rgb_mse=1.0),
    model=dict(type="ZeroOutputer"),
    ray_sampler="{{_base_.ray_sampler}}",
    # Analytic renderer: no train-time density noise and no background
    # density bias, so zero densities render exactly the background.
    renderer=dict(
        type="MultipassEmissionAbsorpsionRenderer",
        n_pts_per_ray_fine_training=6,
        n_pts_per_ray_fine_evaluation=6,
        bg_color=[0.0, 0.0, 0.0],
        density_noise_std_train=0.0,
        blend_output=False,
        background_density_bias=0.0,
    ),
    feature_extractor=[],
)
