"""Fused NeRF-MLP forward as a single Pallas TPU kernel.

The hot op of the whole framework: evaluating the 8x256 skip-MLP (+ heads)
over ~10^6 ray points per step. The XLA path round-trips (N, 256)
activations through HBM between layers (~2 GB per forward at N=10^6); this
kernel keeps an entire point tile's activations resident in VMEM:

    HBM -> VMEM:  one (TILE, 3) point tile + one (TILE, 3) direction tile
                  + the full weight set (~300 KB bf16, grid-invariant)
    VMEM:         harmonic embeddings computed in-register, 8 MLP layers,
                  density + color heads, all on the MXU in bf16 with f32
                  accumulation
    VMEM -> HBM:  one (TILE, 4) output tile (density | rgb)

i.e. ~25 MB of HBM traffic per 10^6 points instead of gigabytes — the
forward becomes MXU-bound.

Weight layout matches ``models/nerf_mlp.py`` init exactly (including the
harmonic frequency-major embedding layout and the fused LinearWithRepeat
color weight), so the kernel is a drop-in for ``NeRFMLP.apply``'s inner
compute; equivalence is tested against the jnp path in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _embed_in_kernel(x, sel, freqs_tiled, append_input: bool):
    """Harmonic embedding with the reference's frequency-major layout.

    x: (T, D); sel: (D, D*F) one-hot coordinate-selection matrix;
    freqs_tiled: (1, D*F) frequencies repeated per coordinate. The
    per-coordinate broadcast runs as one tiny MXU matmul followed by wide
    VPU ops — per-coordinate column slicing starves the lanes and costs
    ~10 ms/1M pts (measured), this formulation is ~free.
    Output: (T, D*2F [+ D]) as [sin(d0 f0..), sin(d1 ..), cos(..), x].
    """
    # Precision.HIGHEST: the default f32 MXU path decomposes into bf16
    # passes; the resulting ~1e-3 relative error on x gets multiplied by
    # frequencies up to 2^9 and wrecks the sin/cos phases. HIGHEST keeps the
    # pass-through exact (the matmul is (T,3)x(3,D*F) — cost is negligible).
    inner = (
        jnp.dot(x, sel, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        * freqs_tiled
    )
    parts = [jnp.sin(inner), jnp.cos(inner)]
    if append_input:
        parts.append(x)
    return jnp.concatenate(parts, axis=-1)


def embedding_constants(n_harmonic: int, omega_0: float = 1.0, logspace: bool = True, dims: int = 3):
    """Host-side (sel, freqs_tiled) inputs for :func:`_embed_in_kernel`."""
    from yanerf_tpu.ops.harmonics import harmonic_frequencies

    freqs = harmonic_frequencies(n_harmonic, omega_0, logspace)
    n_f = len(freqs)
    sel = np.zeros((dims, dims * n_f), dtype=np.float32)
    for d in range(dims):
        sel[d, d * n_f : (d + 1) * n_f] = 1.0
    freqs_tiled = np.tile(freqs, dims)[None, :]
    return jnp.asarray(sel), jnp.asarray(freqs_tiled)


def _nerf_mlp_kernel(
    # inputs
    points_ref,
    dirs_ref,
    sel_xyz_ref,
    ftile_xyz_ref,
    sel_dir_ref,
    ftile_dir_ref,
    *refs,
    # static
    n_layers: int,
    input_skips: Tuple[int, ...],
    append_xyz: bool,
    append_dir: bool,
    n_extra_color: int,
    compute_dtype,
):
    # refs = [w/b for mlp layers..., intermediate w/b, density w/b,
    #         color layers w/b..., out_ref]
    out_ref = refs[-1]
    weight_refs = refs[:-1]

    def take_pair(i):
        return weight_refs[2 * i], weight_refs[2 * i + 1]

    points = points_ref[:]
    dirs = dirs_ref[:]

    embeds = _embed_in_kernel(points, sel_xyz_ref[:], ftile_xyz_ref[:], append_xyz).astype(compute_dtype)

    def matmul(x, w_ref, b_ref):
        return (
            jnp.dot(x, w_ref[:].astype(compute_dtype), preferred_element_type=jnp.float32)
            + b_ref[:].astype(jnp.float32)
        )

    # xyz encoder with input skips
    y = embeds
    idx = 0
    for li in range(n_layers):
        w_ref, b_ref = take_pair(idx)
        idx += 1
        if li in input_skips and li > 0:
            # concat(y, embeds) @ W == y @ W[:H] + embeds @ W[H:]
            h = y.shape[-1]
            acc = jnp.dot(y, w_ref[:h].astype(compute_dtype), preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(embeds, w_ref[h:].astype(compute_dtype), preferred_element_type=jnp.float32)
            y = jax.nn.relu(acc + b_ref[:].astype(jnp.float32)).astype(compute_dtype)
        else:
            y = jax.nn.relu(matmul(y, w_ref, b_ref)).astype(compute_dtype)

    features = y  # (T, H) in compute dtype

    w_int, b_int = take_pair(idx); idx += 1
    w_den, b_den = take_pair(idx); idx += 1

    density = matmul(features, w_den, b_den)  # (T, 1) f32

    inter = matmul(features, w_int, b_int).astype(compute_dtype)  # (T, H)

    # direction embedding of normalized dirs
    norm = jnp.sqrt(jnp.maximum(jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-24))
    dirs_n = dirs / norm
    dir_embeds = _embed_in_kernel(dirs_n, sel_dir_ref[:], ftile_dir_ref[:], append_dir).astype(compute_dtype)

    # first color layer: fused LinearWithRepeat (split weight)
    w_c0, b_c0 = take_pair(idx); idx += 1
    h = inter.shape[-1]
    color = jnp.dot(inter, w_c0[:h].astype(compute_dtype), preferred_element_type=jnp.float32)
    color = color + jnp.dot(dir_embeds, w_c0[h:].astype(compute_dtype), preferred_element_type=jnp.float32)
    color = jax.nn.relu(color + b_c0[:].astype(jnp.float32)).astype(compute_dtype)

    for _ in range(n_extra_color):
        w_ce, b_ce = take_pair(idx); idx += 1
        color = jax.nn.relu(matmul(color, w_ce, b_ce)).astype(compute_dtype)

    w_cl, b_cl = take_pair(idx); idx += 1
    color = jax.nn.sigmoid(matmul(color, w_cl, b_cl))  # (T, C) f32

    out_ref[:] = jnp.concatenate([density, color], axis=-1)


def _default_interpret() -> bool:
    # run the kernel in interpreter mode off-TPU (CPU tests / debugging)
    return jax.default_backend() not in ("tpu", "axon")


def nerf_mlp_forward_pallas(
    model,
    params: Dict[str, Any],
    points: jax.Array,
    directions: jax.Array,
    tile: int = DEFAULT_TILE,
    interpret: bool = None,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Fused forward over arbitrary-shaped ray points.

    Args:
        model: the NeRFMLP instance (static architecture source).
        params: its param pytree.
        points: ``(..., P, 3)`` world-space ray points.
        directions: ``(..., 3)`` per-ray directions (unnormalized).

    Returns:
        ``(densities (..., P, 1), colors (..., P, color_dim))``.
    """
    if model.latent_dim != 0 or not model.input_xyz or not model.input_dir:
        raise NotImplementedError("pallas kernel covers the standard xyz+dir NeRFMLP")
    if interpret is None:
        interpret = _default_interpret()


    *lead, n_pts, _ = points.shape
    n_total = int(np.prod(lead)) * n_pts

    flat_points = points.reshape(n_total, 3)
    flat_dirs = jnp.broadcast_to(directions[..., None, :], (*lead, n_pts, 3)).reshape(n_total, 3)

    n_padded = _round_up(max(n_total, tile), tile)
    if n_padded != n_total:
        flat_points = jnp.pad(flat_points, ((0, n_padded - n_total), (0, 0)))
        flat_dirs = jnp.pad(flat_dirs, ((0, n_padded - n_total), (0, 0)), constant_values=1.0)

    compute_dtype = model.compute_dtype if model.compute_dtype != jnp.float32 else jnp.float32

    # flatten weights in deterministic kernel order
    weights = []
    for layer in params["xyz_encoder"]["mlp"]:
        weights += [layer["w"], layer["b"]]
    weights += [params["intermediate_linear"]["w"], params["intermediate_linear"]["b"]]
    weights += [params["density_layer"]["w"], params["density_layer"]["b"]]
    for layer in params["color_layer"]:
        weights += [layer["w"], layer["b"]]

    sel_xyz, ftile_xyz = embedding_constants(model.n_harmonic_functions_xyz)
    sel_dir, ftile_dir = embedding_constants(model.n_harmonic_functions_dir)

    kernel = functools.partial(
        _nerf_mlp_kernel,
        n_layers=model.n_layers,
        input_skips=tuple(model.input_skips),
        append_xyz=model.harmonic_functions_xyz_append_intput,
        append_dir=model.harmonic_functions_dir_append_intput,
        n_extra_color=model.n_extra_color_layers,
        compute_dtype=compute_dtype,
    )

    grid = (n_padded // tile,)
    out_dim = 1 + model.color_dim

    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),  # points
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),  # dirs
        pl.BlockSpec(sel_xyz.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(ftile_xyz.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(sel_dir.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(ftile_dir.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    # weights: full arrays, grid-invariant (bind ndim now — late closure!)
    for w in weights:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: tuple([0] * _nd), memory_space=pltpu.VMEM)
        )

    flops_per_pt = 2 * (
        model.input_dim * model.n_hidden_neurons_xyz
        + (model.n_layers - 1) * model.n_hidden_neurons_xyz * model.n_hidden_neurons_xyz
        + len([s for s in model.input_skips if s > 0]) * model.input_dim * model.n_hidden_neurons_xyz
        + model.n_hidden_neurons_xyz * (model.n_hidden_neurons_xyz + 1)
        + (model.n_hidden_neurons_xyz + model.embedding_dim_dir) * model.n_hidden_neurons_dir
        + model.n_hidden_neurons_dir * model.color_dim
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_padded, out_dim), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * n_padded,
            bytes_accessed=n_padded * (3 + 3 + out_dim) * 4,
            transcendentals=n_padded * (model.embedding_dim_xyz + model.embedding_dim_dir + 4),
        ),
        # v5e has 128MB physical VMEM; the default scoped limit (16MB) blocks
        # tiles >= 4096 — raise it so large tiles amortize per-matmul overhead.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes) if not interpret else None,
        interpret=interpret,
    )(flat_points, flat_dirs, sel_xyz, ftile_xyz, sel_dir, ftile_dir, *weights)

    out = out[:n_total]
    densities = out[:, :1].reshape(*lead, n_pts, 1)
    colors = out[:, 1:].reshape(*lead, n_pts, model.color_dim)
    return densities, colors
