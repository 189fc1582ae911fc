"""Train/eval/test entry point.

Behavioural reference: /root/reference/scripts/run.py (flags at :425-463,
flow at :59-235). Same CLI contract — ``--config --output_dir --checkpoint
--test_only --device --seed --debug --cfg_options`` — driving the TPU-native
stack: a jitted train step over a (data x rays) device mesh instead of DDP,
orbax checkpoints with the reference's ``ckpts_{epoch:04d}`` naming, the
``loss_rgb_psnr``-HIGH best-model monitor, versioned output dirs, stats JSONL
and visualization dumps.
"""

import argparse
import datetime
import json
import logging
import os.path as osp
import random
import sys
from enum import Enum
from math import ceil, floor
from pathlib import Path

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402

MONITOR_METRIC_NAME = "loss_rgb_psnr"


class MonitorMetricType(Enum):
    HIGH = "high"
    LOW = "low"


def get_version(path: Path) -> int:
    return len(list(path.glob("version_*")))


def setup_output_dir_for_training(output_dir, barrier_fn) -> Path:
    output_dir = Path(output_dir)
    if output_dir.stem.startswith("version_"):
        output_dir = output_dir.parent
    output_dir = output_dir / f"version_{get_version(output_dir)}"
    barrier_fn()
    return output_dir


def setup_iter_based_runner(runner_config, dataloader, world_size: int, logger) -> None:
    """Convert the iteration-based config to epochs over the actual loader.

    Mirrors reference scripts/run.py:243-271, including the rescaling of every
    other ``*iters*`` key by the per-process iteration ratio.
    """
    iters_per_epoch = len(dataloader) * world_size * dataloader.batch_size

    runner_config["num_iters_on_one_gpu"] = runner_config["num_iters"]
    runner_config["num_epochs"] = ceil(runner_config["num_iters"] / iters_per_epoch)
    runner_config["num_iters"] = runner_config["num_epochs"] * len(dataloader)

    runner_config["val_per_epoch"] = max(1, floor(runner_config["val_per_iter"] / iters_per_epoch))
    runner_config["save_per_epoch"] = max(1, floor(runner_config["save_per_iter"] / iters_per_epoch))

    logger.info("Iter-based runner converted to epoch-based:")
    for old_key, new_key in (
        ("val_per_iter", "val_per_epoch"),
        ("save_per_iter", "save_per_epoch"),
        ("num_iters_on_one_gpu", "num_iters"),
    ):
        logger.info(f"\t{old_key}: {runner_config[old_key]} -> {new_key}: {runner_config[new_key]}")
    logger.info(f"\tnum_epochs: {runner_config['num_epochs']}")

    ratio = runner_config["num_iters"] / runner_config["num_iters_on_one_gpu"]
    for key in list(runner_config.keys()):
        if key != "num_iters" and "iters" in key and isinstance(runner_config[key], (int, float)):
            old = runner_config[key]
            runner_config[key] = ceil(old * ratio)
            logger.info(f"\t{key}: {old} -> {runner_config[key]}")


def setup_debug_env(runner_config, datasets, logger):
    from yanerf_tpu.datasets import Subset

    logger.warning("In DEBUG mode, some hyperparameters have been changed.")
    runner_config["val_per_epoch"] = 1
    runner_config["save_per_epoch"] = 1
    for index in (0, 1, 2):
        datasets[index] = Subset(datasets[index], list(range(runner_config["batch_size_list"][index] + 1)))
    runner_config["num_iters"] = 1
    runner_config["print_per_iter"] = 1
    runner_config["save_per_iter"] = 1
    runner_config["val_per_iter"] = 1
    runner_config["num_workers_list"] = [0 for _ in runner_config["num_workers_list"]]
    return datasets


def get_compare_func(monitor_metric_type: MonitorMetricType):
    def func(base, new):
        if monitor_metric_type == MonitorMetricType.HIGH:
            return base < new
        if monitor_metric_type == MonitorMetricType.LOW:
            return base > new
        raise ValueError(f"Invalid MonitorMetricType: {monitor_metric_type}.")

    return func


def main(args, config):
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from yanerf_tpu.datasets import DATASETS, create_loader, create_sampler
    from yanerf_tpu.parallel import (
        barrier,
        create_mesh,
        get_rank,
        get_world_size,
        init_distributed_mode,
        is_main_process,
    )
    from yanerf_tpu.pipelines import PIPELINES
    from yanerf_tpu.runners import (
        HOOKS,
        PreemptionGuard,
        RunType,
        create_lr_schedule,
        create_optimizer,
        create_train_state,
        eval_one_epoch,
        find_best_checkpoint,
        find_latest_checkpoint,
        load_checkpoint,
        make_eval_step,
        make_train_step,
        make_train_step_fused,
        save_checkpoint,
        train_one_epoch,
        wait_for_async_saves,
    )
    from yanerf_tpu.utils.logging import get_logger
    from yanerf_tpu.utils.timer import Timer

    init_distributed_mode()
    rank = get_rank()
    world_size = get_world_size()

    if "seed" not in config.runner:
        config.runner.seed = 42
    if args.seed is not None:
        config.runner.seed = args.seed
    seed = config.runner.seed + rank
    np.random.seed(seed)
    random.seed(seed)
    base_rng = jax.random.PRNGKey(seed)

    # Output directory (versioned for training runs).
    if args.output_dir is not None:
        config.runner.output_dir = args.output_dir
    output_dir = Path(config.runner.output_dir)
    if not args.test_only:
        # --auto_resume: reuse the newest version dir + checkpoint instead of
        # starting a fresh version_N (completes the preemption-recovery loop:
        # a rescheduled job resumes losslessly with the same command line).
        resumed = None
        if getattr(args, "auto_resume", False) and args.checkpoint is None:
            resumed = find_latest_checkpoint(output_dir)
        if resumed is not None:
            output_dir, ckpt = resumed
            args.checkpoint = str(ckpt)
            barrier("mkdir")
        else:
            output_dir = setup_output_dir_for_training(output_dir, lambda: barrier("mkdir"))
        config.runner.output_dir = str(output_dir)
    if is_main_process():
        output_dir.mkdir(parents=True, exist_ok=True)
        config.dump(osp.join(output_dir, "config.yml"))
        (output_dir / "visualization").mkdir(parents=True, exist_ok=True)
        if not args.test_only:
            (output_dir / "ckpts").mkdir(parents=True, exist_ok=True)

    log_level = logging.DEBUG if config.runner.get("debug", False) else logging.INFO
    logger = get_logger(
        "yanerf_tpu", log_file=osp.join(config.runner.output_dir, "run.log"), log_level=log_level, file_mode="a"
    )
    logger.info(f"Output Directory: {output_dir}")
    logger.info(f"World Size: {world_size}; devices: {jax.device_count()} ({jax.devices()[0].platform})")

    # Data
    datasets = [DATASETS.build(dataset_cfg) for dataset_cfg in config.datasets]
    if config.runner.get("debug", False):
        datasets = setup_debug_env(config.runner, datasets, logger)

    samplers = [
        create_sampler(dataset, shuffle=(dataset_cfg.split == "train"), seed=config.runner.seed)
        for dataset, dataset_cfg in zip(datasets, config.datasets)
    ]
    dataloaders = [
        create_loader(
            dataset=dataset,
            sampler=sampler,
            batch_size=batch_size,
            num_workers=num_workers,
            is_train=(dataset_cfg.split == "train"),
        )
        for dataset, sampler, batch_size, num_workers, dataset_cfg in zip(
            datasets, samplers, config.runner.batch_size_list, config.runner.num_workers_list, config.datasets
        )
    ]
    if config.runner.get("cache_dataset_on_device", False):
        from yanerf_tpu.datasets import DeviceCachedLoader

        quantize = bool(config.runner.get("cache_quantize_images", False))
        logger.info(
            "Caching datasets on device (zero per-step host transfers"
            + (", lossless uint8 images" if quantize else "")
            + ")."
        )
        dataloaders = [
            DeviceCachedLoader(loader, quantize_images=quantize) for loader in dataloaders
        ]

    for i, loader in enumerate(dataloaders):
        logger.info(f"Data: dataset No.{i}: {len(loader.dataset)} items, {len(loader)} batches")
        if len(loader) == 0:
            raise ValueError(f"The dataloader No.{i} is empty at rank {rank}")

    setup_iter_based_runner(config.runner, dataloaders[0], world_size, logger)

    # Mesh over local devices: data x rays (default: all chips on rays).
    mesh_cfg = config.runner.get("mesh", {}) or {}
    mesh = create_mesh(
        data_parallel=mesh_cfg.get("data_parallel"),
        ray_parallel=mesh_cfg.get("ray_parallel"),
    )
    logger.info(f"Mesh: {dict(mesh.shape)}")

    # Model + optimizer
    pipeline = PIPELINES.build(config.pipeline)
    params = pipeline.init(jax.random.PRNGKey(config.runner.seed))

    if world_size > 1 and config.runner.get("linear_scale", False):
        for key in ("init_lr", "min_lr"):
            logger.info(f"Linear scale lr: {config.runner[key]} -> {config.runner[key] * world_size}")
            config.runner[key] = config.runner[key] * world_size

    optimizer = create_optimizer(config.runner, params)
    state = create_train_state(params, optimizer)
    lr_schedule = create_lr_schedule(config.runner)

    start_epoch = 0
    if args.checkpoint:
        if str(args.checkpoint).endswith(".pth"):
            # the reference's released torch checkpoints load directly:
            # weights are mapped onto the param pytree (no optimizer state)
            from yanerf_tpu.runners import TrainState, import_torch_checkpoint

            imported, n_missing = import_torch_checkpoint(args.checkpoint, state.params)
            state = TrainState(params=imported, opt_state=state.opt_state, step=state.step)
            logger.info(
                f"Imported reference .pth weights from: {args.checkpoint} "
                f"({n_missing} unmapped tensors)"
            )
        else:
            restored = load_checkpoint(args.checkpoint, state)
            state = restored["state"]
            start_epoch = restored["epoch"] + 1
            logger.info(f"Resumed checkpoint from: {args.checkpoint} (epoch {restored['epoch']})")

    config.runner["hooks"] = [HOOKS.build(hook_cfg) for hook_cfg in (config.runner.get("hooks", []) or [])]
    logger.info(f"Hooks: {[type(h).__name__ for h in config.runner['hooks']]}")

    train_step = make_train_step(pipeline, optimizer, mesh=mesh, rasterize_mc=False)
    # runner.train_vis: false skips the periodic MC-rasterized sanity dump
    # (and its separate jitted program). Besides the compile/ckpt-size
    # savings, this environment's remote XLA compile helper crashes
    # nondeterministically on some scatter lowerings and the client then
    # hangs in a silent ~25-min native retry — observed twice on the
    # multiscene configs' vis step (round-5 log); the knob is the opt-out.
    train_step_vis = (
        make_train_step(pipeline, optimizer, mesh=mesh, rasterize_mc=True, donate=False)
        if config.runner.get("train_vis", True)
        else None
    )
    eval_step = make_eval_step(pipeline, mesh=mesh)
    # Fused K-step dispatches (runner.steps_per_call > 1): amortizes host
    # dispatch latency over K on-device train steps; requires the device
    # dataset cache. Numerically identical to the per-step loop.
    train_step_fused = None
    if int(config.runner.get("steps_per_call", 1) or 1) > 1:
        train_step_fused = make_train_step_fused(
            pipeline, optimizer, dataloaders[0].data_wrapper, mesh=mesh
        )

    if not args.test_only:
        # Preemption safety (beyond the reference, which has none): SIGTERM /
        # SIGINT request a graceful stop; the loop drains the current step and
        # an emergency resumable checkpoint is written before exiting cleanly.
        guard = PreemptionGuard().install()
        state = train(
            config.runner,
            logger,
            dataloaders[0],
            dataloaders[1],
            state,
            train_step,
            train_step_vis,
            eval_step,
            lr_schedule,
            base_rng,
            mesh,
            start_epoch,
            save_checkpoint,
            eval_one_epoch,
            train_one_epoch,
            RunType,
            is_main_process,
            barrier,
            preemption_guard=guard,
            train_step_fused=train_step_fused,
        )
        guard.uninstall()
        if guard.preempted:
            wait_for_async_saves()
            logger.info("Preempted: resumable checkpoint saved; skipping final test.")
            barrier("preempted")
            return

        wait_for_async_saves()
        if config.runner.get("eval_last_epoch_model", True) is False:
            best = find_best_checkpoint(config.runner.output_dir)
            if best is not None:
                state = load_checkpoint(best, state)["state"]
                logger.info(f"Loaded best checkpoint: {best}")
            else:
                logger.info("Best checkpoint not found; using last-epoch model.")
        else:
            logger.info("eval last epoch model")

    test(config.runner, dataloaders[2], state, eval_step, base_rng, logger, eval_one_epoch, RunType, is_main_process)
    barrier("end")


def train(
    runner_config,
    logger,
    train_loader,
    val_loader,
    state,
    train_step,
    train_step_vis,
    eval_step,
    lr_schedule,
    base_rng,
    mesh,
    start_epoch,
    save_checkpoint,
    eval_one_epoch,
    train_one_epoch,
    RunType,
    is_main_process,
    barrier,
    preemption_guard=None,
    train_step_fused=None,
):
    logger.info(f"Start Training. Epoch range: {start_epoch} -> {runner_config['num_epochs']}")
    monitor_type = MonitorMetricType.HIGH
    best_metric = -1e10
    compare_metric = get_compare_func(monitor_type)

    from yanerf_tpu.utils.timer import Timer

    timer = Timer()
    for epoch in range(start_epoch, runner_config["num_epochs"]):
        state, train_stats = train_one_epoch(
            RunType.TRAIN, runner_config, epoch, state, train_loader, train_step, base_rng,
            train_step_vis=train_step_vis, mesh=mesh, lr_schedule=lr_schedule,
            preemption_guard=preemption_guard, train_step_fused=train_step_fused,
        )
        if preemption_guard is not None and preemption_guard.preempted:
            # Emergency resumable checkpoint: saved as epoch-1 so resume
            # re-enters the interrupted epoch with the mid-epoch TrainState
            # (params/opt_state/step all continue exactly).
            # ALL ranks call save: orbax's save starts with a global
            # process sync, so a main-only call deadlocks multi-host runs
            path = save_checkpoint(
                runner_config["output_dir"], state, epoch=epoch - 1, name="ckpts_preempt"
            )
            if is_main_process():
                logger.info(
                    f"Preemption: saved emergency checkpoint to {path} (mid-epoch {epoch}); "
                    "re-run the same command with --auto_resume to continue losslessly"
                )
            barrier("preempt-save")
            return state
        if is_main_process():
            with open(osp.join(runner_config["output_dir"], "train_stats.json"), "a") as f:
                f.write(json.dumps({"epoch": epoch, **{f"train_{k}": v for k, v in train_stats.items()}}) + "\n")

        if (epoch + 1) % runner_config["val_per_epoch"] == 0:
            logger.info(f"Start val at epoch: {epoch}")
            timer.since_last_check()
            val_stats = eval_one_epoch(
                RunType.VAL, runner_config, epoch, state.params, val_loader, eval_step, base_rng
            )
            logger.info(f"Validating One Epoch time: {datetime.timedelta(seconds=int(timer.since_last_check()))}")

            if is_main_process():
                with open(osp.join(runner_config["output_dir"], "val_stats.json"), "a") as f:
                    f.write(json.dumps({"epoch": epoch, **{f"val_{k}": v for k, v in val_stats.items()}}) + "\n")
            # the best-model decision runs on EVERY rank (val_stats are
            # globally gathered, so it is identical everywhere) because the
            # orbax save below must be entered by all hosts — a main-only
            # save deadlocks in its opening global sync
            current_metric = val_stats.get(MONITOR_METRIC_NAME, None)
            if current_metric is None:
                if is_main_process():
                    logger.warning(f'Monitor metric "{MONITOR_METRIC_NAME}" not found in {list(val_stats)}')
            elif compare_metric(best_metric, current_metric):
                if is_main_process():
                    logger.info(f"Monitor Metric: {best_metric} -> {current_metric}.")
                best_metric = current_metric
                save_checkpoint(runner_config["output_dir"], state, epoch=-1, async_save=True)
                if is_main_process():
                    logger.info("Save Best Model to Epoch: -1")
            barrier("val")

        if (epoch + 1) % runner_config["save_per_epoch"] == 0:
            save_checkpoint(runner_config["output_dir"], state, epoch=epoch, async_save=True)
            if is_main_process():
                logger.info(f"Save Model at Epoch: {epoch}")
        barrier("epoch")

    if is_main_process():
        logger.info(f"Training time: {datetime.timedelta(seconds=int(timer.since_start()))}")
    save_checkpoint(runner_config["output_dir"], state, epoch=runner_config["num_epochs"] - 1)
    return state


def test(runner_config, dataloader, state, eval_step, base_rng, logger, eval_one_epoch, RunType, is_main_process):
    from yanerf_tpu.utils.timer import Timer

    timer = Timer()
    logger.info("Start Testing.")
    test_stats = eval_one_epoch(RunType.TEST, runner_config, -1, state.params, dataloader, eval_step, base_rng)
    logger.info(f"Testing time: {datetime.timedelta(seconds=int(timer.since_last_check()))}")
    if is_main_process():
        with open(osp.join(runner_config["output_dir"], "test_stats.json"), "a") as f:
            f.write(json.dumps({f"test_{k}": v for k, v in test_stats.items()}) + "\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    # CLI-compat with the reference launcher: multi-process topology is
    # discovered from RANK/WORLD_SIZE/SLURM env by jax.distributed; these
    # flags are accepted but informational only.
    parser.add_argument("--world_size", default=1, type=int, help="(compat) discovered from env")
    parser.add_argument("--dist_url", default="env://", help="(compat) jax.distributed uses env discovery")
    parser.add_argument("--config", default="./configs/nerf/lego.yml")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument(
        "--auto_resume", action="store_true",
        help="resume from the newest checkpoint under output_dir (preempt-safe restart)",
    )
    parser.add_argument("--test_only", action="store_true")
    parser.add_argument("--device", default="tpu", choices=["tpu", "cuda", "cpu"],
                        help="'cpu' forces the CPU backend; otherwise the default accelerator is used")
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument(
        "--cfg_options",
        nargs="+",
        action=DictAction,
        help="override settings in the config; key-value pairs xxx=yyy merged into the "
        'config. Lists: key="[a,b]" or key=a,b; nested: key="[(a,b),(c,d)]". '
        "No whitespace allowed.",
    )
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)
    if args.debug:
        cfg.runner.debug = args.debug

    main(args, cfg)
