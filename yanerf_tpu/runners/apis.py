"""Train / eval loops driving jitted pipeline steps.

Behavioural reference: reference runners/apis.py:30-236. Differences are the
TPU-native mechanics, not semantics:
  * instead of ``loss.backward(); optimizer.step()`` with DDP's implicit
    all-reduce, the whole step — forward, per-sample losses, mean objective,
    grads, Adam update — is ONE jitted XLA program (``make_train_step``);
    under a mesh context, GSPMD shards it over data/ray axes and inserts the
    ICI collectives;
  * randomness is a per-run base key folded with the global step;
  * the per-iter data/inference timing split survives in the periodic log
    line (device sync only on log iterations, so timing doesn't serialize
    the pipeline);
  * eval keeps the distributed contract: per-sample losses all-gathered
    across processes, concatenated, truncated to dataset length, then meaned.
"""

from __future__ import annotations

import logging
import os.path as osp
from collections import defaultdict, deque
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yanerf_tpu.datasets.loader import decode_cached_field
from yanerf_tpu.ops.structures import EvaluationMode
from yanerf_tpu.parallel.distributed import concat_all_gather, get_rank, get_world_size, is_dist_avail_and_initialized
from yanerf_tpu.parallel.mesh import DATA_AXIS
from yanerf_tpu.parallel.sharding import mesh_context
from yanerf_tpu.utils.logging import get_logger
from yanerf_tpu.utils.profiling import annotate
from yanerf_tpu.utils.timer import Timer

from .hooks import EvalDataHook, EvalOutputsHook, TrainDataHook, TrainOutputsHook
from .optim import TrainState
from .stats import create_stats
from .vis import AsyncVisWriter, RunType, vis_batch_img

LOG_HEADER = "{}\tEpoch:\t[{}]"


def _sync_fetch(x) -> None:
    """Device sync via a VALUE FETCH: block_until_ready does not
    synchronize through the axon device tunnel (CLAUDE.md), which would
    truncate profiler traces and corrupt step timings. Fetching one
    element forces completion of everything ``x`` depends on."""
    if x is None:
        return
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _get_logger(config):
    log_level = logging.DEBUG if config.get("debug", None) else logging.INFO
    log_file = osp.join(config["output_dir"], "run.log") if config.get("output_dir") else None
    return get_logger("yanerf_tpu.runner", log_file=log_file, log_level=log_level, file_mode="a")


def prepare_batch(data: Tuple, data_wrapper: Callable, mesh=None) -> Dict[str, Any]:
    """Wrap a loader tuple into pipeline kwargs and place arrays on device.

    With a mesh, arrays are committed with their batch dim over DATA_AXIS so
    jit's input shardings match the step's expectations.
    """
    batch = data_wrapper(*data)._asdict()
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None))
    out: Dict[str, Any] = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray):
            out[key] = jax.device_put(value, sharding) if sharding is not None else jax.device_put(value)
        else:
            out[key] = value
    return out


def make_train_step(
    pipeline,
    optimizer: optax.GradientTransformation,
    mesh=None,
    rasterize_mc: bool = False,
    donate: bool = True,
):
    """Build the jitted train step: (state, batch, rng) -> (state, preds)."""

    def step_fn(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            preds = pipeline.forward(
                params,
                step_rng,
                evaluation_mode=EvaluationMode.TRAINING,
                output_rasterized_mc=rasterize_mc,
                **batch,
            )
            if "objective" not in preds:
                raise KeyError("In train mode, but no loss (`objective`) is found.")
            return jnp.mean(preds["objective"]), preds

        (_, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt_state, step=state.step + 1)
        return new_state, preds

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def wrapped(state, batch, rng):
        with mesh_context(mesh):
            return jitted(state, batch, rng)

    return wrapped


def make_train_step_fused(pipeline, optimizer, data_wrapper, mesh=None, donate=True):
    """Multi-step fused trainer: K optimizer steps per dispatch via ``lax.scan``.

    Once device step times drop below host dispatch latency (the proposal
    estimator trains at ~10 ms/step while each dispatch through the device
    tunnel costs tens of ms), the per-iteration Python loop becomes the
    bottleneck — the TPU sits idle between steps. This builds a jitted
    ``(state, dataset_arrays, idx (K, B), rng) -> (state, loss_history)``
    program that scans K complete train steps on-device against the
    device-resident dataset cache (``DeviceCachedLoader``): batch selection
    is an on-device gather, and there are zero host round-trips between
    steps. Each step's RNG folds the base key with the global step counter
    (exactly as ``make_train_step`` does), so the resulting TrainState is
    identical to K sequential single-step calls regardless of grouping.

    ``loss_history`` maps each per-sample loss key to a ``(K, B)`` array
    (per-sample semantics preserved; reductions stay in the runner).
    """

    def fused_fn(state: TrainState, arrays, idx: jax.Array, rng: jax.Array):
        def body(state, idx_row):
            step_rng = jax.random.fold_in(rng, state.step)
            batch = data_wrapper(
                *[
                    decode_cached_field(a[idx_row]) if hasattr(a, "ndim") and a.ndim > 0 else a
                    for a in arrays
                ]
            )._asdict()

            def loss_fn(params):
                preds = pipeline.forward(
                    params,
                    step_rng,
                    evaluation_mode=EvaluationMode.TRAINING,
                    output_rasterized_mc=False,
                    **batch,
                )
                if "objective" not in preds:
                    raise KeyError("In train mode, but no loss (`objective`) is found.")
                return jnp.mean(preds["objective"]), preds

            (_, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            losses = {k: v for k, v in preds.items() if k.startswith("loss_") or k == "objective"}
            new_state = TrainState(params=new_params, opt_state=new_opt_state, step=state.step + 1)
            return new_state, losses

        return jax.lax.scan(body, state, idx)

    jitted = jax.jit(fused_fn, donate_argnums=(0,) if donate else ())

    def wrapped(state, arrays, idx, rng):
        with mesh_context(mesh):
            return jitted(state, arrays, idx, rng)

    return wrapped


def make_eval_step(pipeline, mesh=None):
    """Build the jitted eval step: (params, batch, rng) -> preds (FULL_GRID)."""

    def step_fn(params, batch: Dict[str, Any], rng: jax.Array):
        return pipeline.forward(params, rng, evaluation_mode=EvaluationMode.EVALUATION, **batch)

    jitted = jax.jit(step_fn)

    def wrapped(params, batch, rng):
        with mesh_context(mesh):
            return jitted(params, batch, rng)

    return wrapped


def inference(
    pipeline,
    params,
    data: Dict[str, Any],
    rng: jax.Array,
    evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
    compute_metrics: bool = True,
) -> Dict[str, Any]:
    """One un-jitted pipeline call merging inputs into preds (reference apis.py:221-236)."""
    data = dict(data)
    if compute_metrics is False and data.get("image_rgb", None) is not None:
        data.pop("image_rgb")
    preds = pipeline.forward(params, rng, evaluation_mode=evaluation_mode, **data)
    preds.update(data)
    return preds


def _fused_eligible(config, dataloader, train_step_fused) -> bool:
    """The fused multi-step path needs: a steps_per_call > 1 config, a
    device-cached dataset that fits, no per-iter hooks, and all cached
    fields indexable on device (arrays / scalars / None)."""
    if train_step_fused is None or int(config.get("steps_per_call", 1) or 1) <= 1:
        return False
    if config.get("hooks", []):
        return False
    if not hasattr(dataloader, "_ensure_cache") or not dataloader._ensure_cache():
        return False
    # a ragged final batch (no drop_last, dataset % batch != 0) can't stack
    # into the (K, B) index matrix — such loaders take the per-step path
    if not dataloader.drop_last and len(dataloader.dataset) % dataloader.batch_size != 0:
        return False
    return all(
        hasattr(a, "ndim") or np.isscalar(a) or a is None for a in dataloader._arrays
    )


def _train_one_epoch_fused(
    run_type: RunType,
    config,
    epoch: int,
    state: TrainState,
    dataloader,
    train_step_fused: Callable,
    rng: jax.Array,
    train_step_vis: Optional[Callable] = None,
    lr_schedule: Optional[Callable] = None,
    preemption_guard=None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Epoch loop over fused K-step dispatches (see ``make_train_step_fused``).

    Semantics match the per-step loop exactly — same sampler indices, same
    per-step RNG (folded by global step), same periodic vis steps (run
    unfused at val_per_iter boundaries so rasterized outputs exist) — only
    the host-dispatch granularity changes. Preemption is checked between
    dispatches, so a SIGTERM drains at most steps_per_call steps.
    """
    logger = _get_logger(config)
    steps_per_call = int(config["steps_per_call"])
    passed_iter = epoch * len(dataloader)
    header = LOG_HEADER.format(run_type.value, epoch)
    print_per_iter = config.get("print_per_iter", 100)
    val_per_iter = config.get("val_per_iter")

    if dataloader.sampler is not None:
        dataloader.sampler.set_epoch(epoch)

    arrays = dataloader._arrays
    data_wrapper = dataloader.data_wrapper
    if dataloader.sampler is not None:
        indices = dataloader.sampler.indices()
    else:
        indices = np.arange(len(dataloader.dataset))
    batch_size = dataloader.batch_size
    rows = [
        indices[s : s + batch_size]
        for s in range(0, len(indices), batch_size)
        if len(indices[s : s + batch_size]) == batch_size or not dataloader.drop_last
    ]
    n = len(rows)

    def is_vis_iter(it: int) -> bool:
        return bool(train_step_vis is not None and val_per_iter and it % val_per_iter == 0)

    # the fused program specializes on K = group length; epoch tails and
    # val_per_iter-truncated segments produce new K's, each a fresh compile.
    # The jit cache lives on train_step_fused and outlives this per-epoch
    # call, so the seen-set must too (else every epoch re-logs "K is new"
    # for sizes that were compiled long ago).
    if not hasattr(train_step_fused, "_seen_group_sizes"):
        train_step_fused._seen_group_sizes = set()
    seen_group_sizes: set = train_step_fused._seen_group_sizes

    # XLA trace capture (cfg: profile_dir / profile_start_iter /
    # profile_num_iters), same contract as the per-step loop
    profile_dir = config.get("profile_dir") if epoch == 0 else None
    _ps = config.get("profile_start_iter")
    profile_start = 5 if _ps is None else int(_ps)
    _pl = config.get("profile_num_iters")
    profile_len = 5 if _pl is None else int(_pl)
    profiling = False
    profiled_steps = 0

    def sync_losses():
        # device sync before stop_trace/timing: a VALUE FETCH, because
        # block_until_ready does not synchronize through the axon device
        # tunnel (CLAUDE.md) and would truncate traces / corrupt timings
        obj = last_losses.get("objective")
        if obj is not None:
            np.asarray(obj)

    timer = Timer()
    last_losses: Dict[str, Any] = {}
    i = 0
    while i < n:
        if preemption_guard is not None and preemption_guard.preempted:
            logger.info(f"{header}: preemption requested, stopping at iter {passed_iter + i}")
            break
        timer.since_last_check()
        if profile_dir and not profiling and i >= profile_start:
            jax.profiler.start_trace(str(profile_dir))
            profiling = True
        if is_vis_iter(passed_iter + i):
            # single unfused step with MC rasterization for the sanity dump
            idx_row = jnp.asarray(rows[i])
            batch = data_wrapper(
                *[
                    decode_cached_field(a[idx_row]) if hasattr(a, "ndim") and a.ndim > 0 else a
                    for a in arrays
                ]
            )._asdict()
            state, preds = train_step_vis(state, batch, rng)
            last_losses = {k: v for k, v in preds.items() if k.startswith("loss_") or k == "objective"}
            if config.get("output_dir"):
                logger.info("save training image to check sanity.")
                vis_batch_img(preds, run_type, config["output_dir"], 0, batch_size, f"{epoch:05d}/")
            j = i + 1
        else:
            j = i + 1
            while j < n and j - i < steps_per_call and not is_vis_iter(passed_iter + j):
                if profile_dir and not profiling and j == profile_start:
                    # split the group so the next dispatch begins exactly at
                    # profile_start — otherwise a group spanning it would
                    # defer (or, when steps_per_call >= epoch length,
                    # silently skip) the trace capture
                    break
                j += 1
            if j - i not in seen_group_sizes:
                seen_group_sizes.add(j - i)
                if len(seen_group_sizes) > 1:
                    logger.info(
                        f"{header}: fused dispatch group size K={j - i} is new "
                        f"(seen: {sorted(seen_group_sizes)}) — compiling a fresh K-step program"
                    )
            idx = jnp.asarray(np.stack(rows[i:j]))
            with annotate(f"fused_dispatch_K{j - i}"):
                state, hist = train_step_fused(state, arrays, idx, rng)
            last_losses = {k: v[-1] for k, v in hist.items()}

        if profiling:
            # count steps actually executed (vis iters run 1, truncated
            # groups run j - i < steps_per_call), not dispatch calls
            profiled_steps += j - i
            if profiled_steps >= profile_len:
                sync_losses()
                jax.profiler.stop_trace()
                profiling = False
                profile_dir = None
                logger.info(f"Wrote profiler trace to {config.get('profile_dir')}")

        crossed_print = any((passed_iter + t) % print_per_iter == 0 for t in range(i, j))
        if crossed_print:
            sync_losses()
            span_s = timer.since_last_check()
            if lr_schedule is not None:
                logger.info(f"{header}\tlr: {float(lr_schedule(passed_iter + j - 1)):.3e}.")
            stats = create_stats(last_losses)
            log_string = "\t".join(
                [f"iter: {passed_iter + j - 1}\tsampler: [{i * batch_size}/{n * batch_size}]"]
                + [f"step: {span_s / (j - i):.4f}"]
                + [f"{k}: {v:.3f}" for k, v in stats.items()]
            )
            logger.info(f"{header}: {log_string}")
        i = j

    if profiling:
        sync_losses()
        jax.profiler.stop_trace()
        logger.info(f"Wrote profiler trace to {config.get('profile_dir')}")

    return state, create_stats(last_losses)


def train_one_epoch(
    run_type: RunType,
    config,
    epoch: int,
    state: TrainState,
    dataloader,
    train_step: Callable,
    rng: jax.Array,
    train_step_vis: Optional[Callable] = None,
    mesh=None,
    lr_schedule: Optional[Callable] = None,
    preemption_guard=None,
    train_step_fused: Optional[Callable] = None,
) -> Tuple[TrainState, Dict[str, float]]:
    if train_step_fused is not None and int(config.get("steps_per_call", 1) or 1) > 1:
        if _fused_eligible(config, dataloader, train_step_fused):
            return _train_one_epoch_fused(
                run_type,
                config,
                epoch,
                state,
                dataloader,
                train_step_fused,
                rng,
                train_step_vis=train_step_vis,
                lr_schedule=lr_schedule,
                preemption_guard=preemption_guard,
            )
        if epoch == 0:
            _get_logger(config).info(
                "steps_per_call requested but the fused path is ineligible "
                "(needs a fitting device dataset cache, no hooks, no ragged "
                "final batch) — using the per-step loop."
            )
    logger = _get_logger(config)
    passed_iter = epoch * len(dataloader)
    header = LOG_HEADER.format(run_type.value, epoch)
    print_per_iter = config.get("print_per_iter", 100)
    hooks = config.get("hooks", []) or []

    if dataloader.sampler is not None:
        dataloader.sampler.set_epoch(epoch)

    # Optional XLA trace capture of a few early steps (cfg: profile_dir /
    # profile_start_iter / profile_num_iters) — the jax.profiler upgrade of
    # the reference's wall-clock-only timing.
    profile_dir = config.get("profile_dir") if epoch == 0 else None
    profile_start = int(config.get("profile_start_iter", 5) or 5)
    profile_len = int(config.get("profile_num_iters", 5) or 5)
    profiling = False

    timer = Timer()
    preds: Dict[str, Any] = {}
    for i, data in enumerate(dataloader):
        if preemption_guard is not None and preemption_guard.preempted:
            logger.info(f"{header}: preemption requested, stopping at iter {passed_iter}")
            break
        times = {}
        batch = prepare_batch(data, dataloader.data_wrapper, mesh)
        for hook in hooks:
            if isinstance(hook, TrainDataHook):
                batch = hook(data=batch, iter=passed_iter, epoch=epoch, config=config)
        times["data"] = timer.since_last_check()

        if profile_dir and not profiling and i == profile_start:
            jax.profiler.start_trace(str(profile_dir))
            profiling = True

        want_vis = (
            train_step_vis is not None
            and config.get("val_per_iter")
            and passed_iter % config["val_per_iter"] == 0
        )
        step_fn = train_step_vis if want_vis else train_step
        with annotate("train_step_dispatch"):
            state, preds = step_fn(state, batch, rng)

        if profiling and i >= profile_start + profile_len - 1:
            _sync_fetch(preds.get("objective"))
            jax.profiler.stop_trace()
            profiling = False
            profile_dir = None
            logger.info(f"Wrote profiler trace to {config.get('profile_dir')}")
        for hook in hooks:
            if isinstance(hook, TrainOutputsHook):
                preds = hook(outputs=preds, config=config, iter=passed_iter, epoch=epoch)

        if passed_iter % print_per_iter == 0:
            _sync_fetch(preds.get("objective"))
            times["inference"] = timer.since_last_check()
            if lr_schedule is not None:
                logger.info(f"{header}\tlr: {float(lr_schedule(passed_iter)):.3e}.")
            stats = create_stats(preds)
            batch_size = dataloader.batch_size
            log_string = "\t".join(
                [f"iter: {passed_iter}\tsampler: [{i * batch_size}/{len(dataloader) * batch_size}]"]
                + [f"{k}: {v:.3f}" for k, v in times.items()]
                + [f"{k}: {v:.3f}" for k, v in stats.items()]
            )
            logger.info(f"{header}: {log_string}")

        if want_vis and config.get("output_dir"):
            logger.info("save training image to check sanity.")
            vis_batch_img(preds, run_type, config["output_dir"], 0, dataloader.batch_size, f"{epoch:05d}/")

        passed_iter += 1
        timer.since_last_check()

    if profiling:
        # epoch ended (or preemption broke the loop) inside the profiled
        # window: close the trace so it is written and a later start_trace
        # cannot raise on an already-active session
        _sync_fetch(preds.get("objective"))
        jax.profiler.stop_trace()
        logger.info(f"Wrote profiler trace to {config.get('profile_dir')} (epoch-end stop)")

    return state, create_stats(preds)


def eval_one_epoch(
    run_type: RunType,
    config,
    epoch: int,
    params,
    dataloader,
    eval_step: Callable,
    rng: jax.Array,
    save_image: bool = True,
) -> Dict[str, float]:
    if dataloader.drop_last:
        raise ValueError("Incomplete eval due to `drop_last`.")

    logger = _get_logger(config)
    print_per_iter = config.get("print_per_iter", 50)
    header = LOG_HEADER.format(run_type.value, epoch)
    rank, world_size = get_rank(), get_world_size()
    hooks = config.get("hooks", []) or []

    timer = Timer()
    metric_stats: Dict[str, list] = defaultdict(list)
    preds: Dict[str, Any] = {}
    vis_writer = AsyncVisWriter() if (save_image and config.get("output_dir")) else None
    batch_size = dataloader.batch_size

    def process_frame(preds: Dict[str, Any], i: int, times: Dict[str, float]) -> Dict[str, Any]:
        """Host-side consumption of a dispatched frame (fetch + log + vis)."""
        for hook in hooks:
            if isinstance(hook, EvalOutputsHook):
                preds = hook(outputs=preds, config=config, iter=i, epoch=epoch)
        _sync_fetch(preds.get("objective", preds.get("rendered_images")))
        times["inference"] = timer.since_last_check()

        for key, value in preds.items():
            if key.startswith("loss_") or key.startswith("objective"):
                value = np.asarray(value)
                metric_stats[key].append(concat_all_gather(value) if is_dist_avail_and_initialized() else value)

        if i % print_per_iter == 0:
            stats = create_stats(preds)
            log_string = "\t".join(
                [f"sampler: [{i * batch_size}/{len(dataloader.dataset)}]"]
                + [f"{k}: {v:.3f}" for k, v in times.items()]
                + [f"{k}: {v:.3f}" for k, v in stats.items()]
            )
            logger.info(f"{header}: {log_string}")

        if vis_writer is not None:
            start_idx = (i * world_size + rank) * batch_size
            end_idx = min(len(dataloader.dataset), start_idx + batch_size)
            # async: the 7.7MB-per-frame device fetch + PNG write overlap
            # with the next frame's render on the device
            vis_writer.submit(
                preds,
                run_type,
                config["output_dir"],
                start_idx,
                end_idx,
                "" if run_type == RunType.TEST else f"{epoch:05d}/",
            )
        # discard the host-consumption span (metric fetches, logging, vis
        # submit) so the NEXT frame's "data" field times only loading/prep
        timer.since_last_check()
        return preds

    # Frames stay in flight: frame i+K is dispatched BEFORE frame i's value
    # fetch, so the device renders while the host fetches/writes — measured
    # 2.1x full-budget eval fps at depth 1 on the proposal config (serial
    # 0.71 -> pipelined 1.48 fps, benchmarks/r3_proposal_profile.py), and
    # depth 2 recovers another ~1.5x at mid point-budgets where the frame
    # fetch rivals the render (5.14 vs 3.5 fps at 32-32-16,
    # results/r5_bisect.json fetch probe). Results are identical: this only
    # reorders host-side consumption. Cost: K frames' prediction buffers
    # stay live on device (a few MB each at 800x800).
    depth = max(1, int(config.get("eval_frames_in_flight", 2)))
    pending: deque = deque()  # each: (preds, index, times)
    for i, data in enumerate(dataloader):
        times: Dict[str, float] = {}
        batch = prepare_batch(data, dataloader.data_wrapper)
        for hook in hooks:
            if isinstance(hook, EvalDataHook):
                batch = hook(data=batch, config=config, iter=i, epoch=epoch)
        times["data"] = timer.since_last_check()

        new_preds = eval_step(params, batch, jax.random.fold_in(rng, i))
        new_preds.update(batch)
        if len(pending) >= depth:
            preds = process_frame(*pending.popleft())
        pending.append((new_preds, i, times))

    while pending:
        preds = process_frame(*pending.popleft())

    if vis_writer is not None:
        vis_writer.close()

    final_preds: Dict[str, Any] = dict(preds)
    for key, chunks in metric_stats.items():
        # concat across iterations, truncate the distributed wraparound
        # padding to the true dataset length, THEN mean (reference apis.py:202-204).
        final_preds[key] = float(np.mean(np.concatenate(chunks, axis=0)[: len(dataloader.dataset)]))

    stats = create_stats(final_preds)
    log_string = "\t".join(
        [f"[{len(dataloader.dataset)}/{len(dataloader.dataset)}]"] + [f"{k}: {v:.3f}" for k, v in stats.items()]
    )
    logger.info(f"{header}: {log_string}")
    return stats
