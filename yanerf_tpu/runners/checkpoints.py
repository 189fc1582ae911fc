"""Checkpoint save/restore with the reference's logical contract.

Behavioural reference: ``save_model`` / resume at reference
scripts/run.py:170-178,416-422. The contract preserved:
  * payload = model params + optimizer state + epoch;
  * files live under ``{output_dir}/ckpts/ckpts_{epoch:04d}`` — the best
    model is saved as epoch -1 -> ``ckpts_-001``;
  * resuming restores params + opt state and continues at ``epoch + 1``.

Storage is orbax (async-capable, multi-host-safe) instead of ``torch.save``;
``import_torch_checkpoint`` converts the reference's released ``.pth``
weights into this framework's param pytree for parity evaluation.
"""

from __future__ import annotations

import re
import signal
import threading
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np
import orbax.checkpoint as ocp

from yanerf_tpu.runners.optim import TrainState

_ASYNC_CHECKPOINTER: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CHECKPOINTER
    if _ASYNC_CHECKPOINTER is None:
        _ASYNC_CHECKPOINTER = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CHECKPOINTER


def wait_for_async_saves() -> None:
    """Block until every in-flight async checkpoint save has committed.

    Must be called before reading a checkpoint that may still be writing
    (best-model reload) and before process exit.
    """
    if _ASYNC_CHECKPOINTER is not None:
        _ASYNC_CHECKPOINTER.wait_until_finished()


def ckpt_name(epoch: int) -> str:
    return f"ckpts_{epoch:04d}"


def save_checkpoint(
    output_dir: Union[str, Path],
    state: TrainState,
    epoch: int,
    async_save: bool = False,
    name: Optional[str] = None,
) -> Path:
    """Save params/opt_state/epoch under ``{output_dir}/ckpts/ckpts_{epoch:04d}``.

    MULTI-HOST CONTRACT: when ``jax.process_count() > 1`` this must be
    called by EVERY process (orbax's save opens with a global process
    sync; a main-only call deadlocks the pod). Orbax coordinates who
    writes what internally.

    With ``async_save`` the device->host fetch happens now but the disk
    commit overlaps with subsequent training steps (orbax AsyncCheckpointer);
    call :func:`wait_for_async_saves` before reading it back or exiting.
    ``name`` overrides the directory name (used by the emergency preemption
    save, which must not collide with the best-model ``ckpts_-001``).
    """
    path = Path(output_dir).resolve() / "ckpts" / (name or ckpt_name(epoch))
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
        "epoch": int(epoch),
    }
    if async_save:
        checkpointer = _async_checkpointer()
        checkpointer.save(path, payload, force=True)
    else:
        # A sync save may target a path an async save is still writing (e.g.
        # the final epoch coincides with a periodic save); force=True would
        # delete its tmp dir mid-write. Drain in-flight saves first.
        wait_for_async_saves()
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, payload, force=True)
    return path


class PreemptionGuard:
    """Preemption-safe training (the reference has no fault tolerance).

    Installing the guard makes SIGTERM/SIGINT *request* a stop instead of
    killing the process: the handler only sets a flag (signal-safe), the
    train loop polls :attr:`preempted` at iteration boundaries, drains, and
    the runner saves a resumable emergency checkpoint before exiting
    cleanly. Restore the previous handlers with :meth:`uninstall`.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)) -> None:
        self._event = threading.Event()
        self._signals = tuple(signals)
        self._previous: Dict[int, Any] = {}
        self._installed = False

    def install(self) -> "PreemptionGuard":
        if threading.current_thread() is not threading.main_thread():
            return self  # signal handlers can only be installed on the main thread
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handle)
        self._installed = True
        return self

    def uninstall(self) -> None:
        if not self._installed:
            return
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
        self._installed = False

    def _handle(self, signum, frame) -> None:
        self._event.set()

    @property
    def preempted(self) -> bool:
        return self._event.is_set()


def load_checkpoint(path: Union[str, Path], state: Optional[TrainState] = None) -> Dict[str, Any]:
    """Restore a checkpoint; with ``state`` given, restores into its structure.

    MULTI-HOST CONTRACT: like :func:`save_checkpoint`, every process must
    call this when ``jax.process_count() > 1`` (orbax's restore opens with
    a global process sync). Checkpoint paths must resolve identically on
    every host (shared filesystem or mirrored copies).

    Returns ``{"state": TrainState, "epoch": int}``.
    """
    path = Path(path).resolve()
    wait_for_async_saves()  # the target may still be committing
    checkpointer = ocp.PyTreeCheckpointer()
    if state is not None:
        import jax.numpy as jnp

        template = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": 0,
            "epoch": 0,
        }
        restored = checkpointer.restore(path, item=template)
        new_state = TrainState(
            params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
            opt_state=jax.tree_util.tree_map(jnp.asarray, restored["opt_state"]),
            step=jnp.asarray(restored["step"], dtype=jnp.int32),
        )
    else:
        restored = checkpointer.restore(path)
        new_state = None
    return {"state": new_state, "restored": restored, "epoch": int(restored["epoch"])}


# -- torch .pth importer -------------------------------------------------------


def _assign(tree: Any, dotted: str, value: np.ndarray) -> bool:
    """Assign ``value`` at a dotted path into a nested dict/list pytree."""
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        if isinstance(node, (list, tuple)):
            node = node[int(part)]
        elif part in node:
            node = node[part]
        else:
            return False
    leaf = parts[-1]
    if isinstance(node, dict) and leaf in node:
        if node[leaf].shape != value.shape:
            raise ValueError(f"shape mismatch at {dotted}: {node[leaf].shape} vs {value.shape}")
        node[leaf] = value
        return True
    return False


def import_torch_checkpoint(pth_path: Union[str, Path], params: Any) -> Any:
    """Convert a reference ``.pth`` checkpoint into this framework's params.

    Maps the reference module names (e.g.
    ``implicit_functions.0._fn.xyz_encoder.mlp.3.0.weight``) onto the param
    pytree, transposing torch's ``(out, in)`` Linear weights to ``(in, out)``.
    """
    import torch

    blob = torch.load(str(pth_path), map_location="cpu")
    state_dict = blob["model"] if isinstance(blob, dict) and "model" in blob else blob

    params = jax.tree_util.tree_map(lambda x: np.array(x), params)

    n_missing = 0
    for name, tensor in state_dict.items():
        value = tensor.detach().cpu().numpy().astype(np.float32)
        path = name
        # strip the PartialFunctionWrapper indirection
        path = path.replace("._fn.", ".")
        # torch Sequential index inside xyz_encoder layers: mlp.{i}.0.weight
        path = re.sub(r"\.mlp\.(\d+)\.0\.(weight|bias)", r".mlp.\1.\2", path)
        # color head: Sequential [Linear/LWR, ReLU, (Linear, ReLU)*, Linear, Sigmoid]
        match = re.search(r"color_layer\.(\d+)\.(weight|bias)$", path)
        if match:
            seq_idx = int(match.group(1))
            layer_idx = seq_idx // 2  # ReLU/Sigmoid occupy odd slots
            path = re.sub(r"color_layer\.\d+\.", f"color_layer.{layer_idx}.", path)
        if path.endswith(".weight"):
            path = path[: -len(".weight")] + ".w"
            if value.ndim == 2:
                value = value.T  # (out, in) -> (in, out)
        elif path.endswith(".bias"):
            path = path[: -len(".bias")] + ".b"
        if not _assign(params, path, value):
            n_missing += 1

    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, params), n_missing


def export_torch_checkpoint(params: Any, pth_path: Union[str, Path], epoch: int = -1) -> int:
    """Write NeRFMLP params as a reference-layout ``.pth`` (importer inverse).

    Produces the exact ``torch.save({"model": state_dict, "optimizer": {},
    "epoch": e})`` layout the reference's ``save_model`` emits (ref
    scripts/run.py:416-422), with module names as in its NeRFPipeline
    (``implicit_functions.{i}._fn.xyz_encoder.mlp.{li}.0.weight`` etc.) and
    weights transposed back to torch's ``(out, in)``. Covers the NeRFMLP
    family (the only family with a reference analog); used to cross-validate
    trained weights in the actual reference package and to smoke-test the
    parity runbook without the released checkpoints.

    Returns the number of tensors written.
    """
    import torch

    sd = {}

    def put(name: str, arr: np.ndarray) -> None:
        arr = np.asarray(arr, dtype=np.float32)
        if arr.ndim == 2:
            arr = arr.T  # (in, out) -> torch Linear's (out, in)
        sd[name] = torch.from_numpy(np.ascontiguousarray(arr))

    for i, fn_params in enumerate(params["implicit_functions"]):
        prefix = f"implicit_functions.{i}._fn."
        if not (isinstance(fn_params, dict) and "xyz_encoder" in fn_params):
            raise ValueError(
                f"implicit function {i} is not a NeRFMLP param tree; only the "
                "reference-analog family can be exported to .pth"
            )
        for li, layer in enumerate(fn_params["xyz_encoder"]["mlp"]):
            put(f"{prefix}xyz_encoder.mlp.{li}.0.weight", layer["w"])
            put(f"{prefix}xyz_encoder.mlp.{li}.0.bias", layer["b"])
        for flat in ("intermediate_linear", "density_layer"):
            put(f"{prefix}{flat}.weight", fn_params[flat]["w"])
            put(f"{prefix}{flat}.bias", fn_params[flat]["b"])
        # color Sequential: Linear layers at even slots (odd = activations)
        for j, layer in enumerate(fn_params["color_layer"]):
            put(f"{prefix}color_layer.{2 * j}.weight", layer["w"])
            put(f"{prefix}color_layer.{2 * j}.bias", layer["b"])

    torch.save({"model": sd, "optimizer": {}, "epoch": int(epoch)}, str(pth_path))
    return len(sd)


def find_best_checkpoint(output_dir: Union[str, Path]) -> Optional[Path]:
    best = Path(output_dir) / "ckpts" / ckpt_name(-1)
    return best if best.exists() else None


def find_latest_checkpoint(output_dir: Union[str, Path]):
    """Newest resumable checkpoint for ``--auto_resume``.

    Scans ``version_*`` subdirs of ``output_dir`` (or ``output_dir`` itself
    if it already contains ``ckpts/``) and returns the most-recently-written
    ``ckpts_*`` entry — by mtime, so an emergency ``ckpts_preempt`` wins
    right after a preemption but loses to any later periodic save. The
    best-model alias ``ckpts_-001`` is excluded (best is not latest).

    Returns ``(version_dir, ckpt_path)`` or ``None``.
    """
    root = Path(output_dir)
    version_dirs = sorted(root.glob("version_*"))
    if not version_dirs and (root / "ckpts").exists():
        version_dirs = [root]
    candidates = []
    for vd in version_dirs:
        for c in (vd / "ckpts").glob("ckpts_*"):
            # skip the best-model alias (best != latest) and half-written
            # orbax temp dirs a crash mid-save can leave behind
            if c.name == ckpt_name(-1) or ".orbax-checkpoint-tmp" in c.name:
                continue
            candidates.append((c.stat().st_mtime, str(c), vd, c))
    if not candidates:
        return None
    _, _, vd, c = max(candidates)
    return vd, c
