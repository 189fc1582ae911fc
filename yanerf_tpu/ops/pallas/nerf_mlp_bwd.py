"""Fused NeRF-MLP backward as a Pallas TPU kernel (custom VJP).

Measured on v5e: the XLA backward of the lego MLP costs ~3.2x its forward —
every layer's dW = x^T @ g streams (N, 256) activations AND cotangents from
HBM (~10 GB per step at N=10^6). This kernel eliminates that traffic:

  per point tile (grid-sequential):
    recompute the forward (activations live in VMEM only),
    backprop the heads + 8 layers in VMEM,
    accumulate dW/db into VMEM-resident output blocks (f32),
  HBM traffic: points + dirs + head cotangents in, weight grads out once.

Weight-gradient outputs use constant index maps, so Pallas keeps them
resident across grid steps; the first program zero-initializes them.

All weights arrive lane-aligned (see nerf_mlp_kernel.padded_weights): the
embedding buffers are 128-wide, so the skip-layer concat, every matmul and
every row slice in here is tile-aligned. The padded embedding columns are
zeros, so the corresponding dW rows are exactly zero and the caller slices
gradients back to the true shapes losslessly.

Input gradients (points/dirs) are returned as zeros: in every pipeline
configuration eligible for this kernel (latent_dim == 0), ray geometry is a
function of camera data, never of parameters, so those cotangent paths are
dead — XLA prunes the identical paths in the jnp formulation. The custom-VJP
wrapper is therefore exact for parameter gradients and must not be used to
differentiate w.r.t. ray geometry (asserted in NeRFMLP: kernel off when
latent conditioning is active).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nerf_mlp_kernel import (
    _default_interpret,
    _embed_padded,
    _round_up,
    embedding_inputs,
    nerf_mlp_forward_pallas,
    padded_weights,
)

BWD_TILE = 1024


def _unflatten_grads(model, params, flat) -> Dict[str, Any]:
    it = iter(flat)

    def pair():
        return {"w": next(it), "b": next(it)}

    out: Dict[str, Any] = {"xyz_encoder": {"mlp": [pair() for _ in params["xyz_encoder"]["mlp"]]}}
    out["intermediate_linear"] = pair()
    out["density_layer"] = pair()
    out["color_layer"] = [pair() for _ in params["color_layer"]]
    return out


def _nerf_mlp_bwd_kernel(
    points_ref,
    dirs_ref,
    g_ref,
    proj_xyz_ref,
    phase_xyz_ref,
    mtrig_xyz_ref,
    mid_xyz_ref,
    proj_dir_ref,
    phase_dir_ref,
    mtrig_dir_ref,
    mid_dir_ref,
    *refs,
    n_layers: int,
    input_skips: Tuple[int, ...],
    n_extra_color: int,
    n_weights: int,
    compute_dtype,
):
    weight_refs = refs[:n_weights]
    grad_refs = refs[n_weights:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gr in grad_refs:
            gr[:] = jnp.zeros_like(gr)

    def w_pair(i):
        return weight_refs[2 * i], weight_refs[2 * i + 1]

    def acc_dw(i, a, g):
        """grad_W[i] += a^T @ g ; grad_b[i] += sum(g)  (f32 accumulation)."""
        dw = jax.lax.dot_general(a, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        grad_refs[2 * i][:] = grad_refs[2 * i][:] + dw
        grad_refs[2 * i + 1][:] = grad_refs[2 * i + 1][:] + jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    def relu_mask(g, act):
        # NOTE: comparisons/selects on bf16 operands crash the Mosaic remote
        # compile; compare in f32, materialize the mask f32, cast to multiply.
        mask = (act.astype(jnp.float32) > 0).astype(jnp.float32)
        return g * mask.astype(g.dtype)

    def mm(x, w_ref, b_ref):
        return (
            jnp.dot(x, w_ref[:].astype(compute_dtype), preferred_element_type=jnp.float32)
            + b_ref[:].astype(jnp.float32)
        )

    def gmm_t(g, w):
        """g @ w^T in compute dtype."""
        return jax.lax.dot_general(
            g, w.astype(compute_dtype), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(compute_dtype)

    points = points_ref[:]
    dirs = dirs_ref[:]

    # ---- recompute forward, stashing per-layer inputs/outputs in VMEM -----
    embeds = _embed_padded(points, proj_xyz_ref, phase_xyz_ref, mtrig_xyz_ref, mid_xyz_ref).astype(
        compute_dtype
    )
    layer_inputs = []
    layer_outputs = []
    y = embeds
    idx = 0
    for li in range(n_layers):
        w_ref, b_ref = w_pair(idx)
        idx += 1
        if li in input_skips and li > 0:
            # 256 + 128 lanes: the concat is tile-aligned (no relayout)
            y = jnp.concatenate([y, embeds], axis=-1)
        layer_inputs.append(y)
        y = jax.nn.relu(mm(y, w_ref, b_ref)).astype(compute_dtype)
        layer_outputs.append(y)
    features = y

    int_idx = idx
    w_int, b_int = w_pair(idx); idx += 1
    den_idx = idx
    w_den, b_den = w_pair(idx); idx += 1

    inter = mm(features, w_int, b_int).astype(compute_dtype)

    norm = jnp.sqrt(jnp.maximum(jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-24))
    dir_embeds = _embed_padded(
        dirs / norm, proj_dir_ref, phase_dir_ref, mtrig_dir_ref, mid_dir_ref
    ).astype(compute_dtype)

    c0_idx = idx
    w_c0, b_c0 = w_pair(idx); idx += 1
    h = inter.shape[-1]
    pre0 = jnp.dot(inter, w_c0[:h].astype(compute_dtype), preferred_element_type=jnp.float32)
    pre0 = pre0 + jnp.dot(dir_embeds, w_c0[h:].astype(compute_dtype), preferred_element_type=jnp.float32)
    act = jax.nn.relu(pre0 + b_c0[:].astype(jnp.float32)).astype(compute_dtype)

    extra_inputs = []
    extra_indices = []
    for _ in range(n_extra_color):
        w_ce, b_ce = w_pair(idx)
        extra_inputs.append(act)
        extra_indices.append(idx)
        idx += 1
        act = jax.nn.relu(mm(act, w_ce, b_ce)).astype(compute_dtype)

    last_idx = idx
    w_cl, b_cl = w_pair(idx); idx += 1
    color = jax.nn.sigmoid(mm(act, w_cl, b_cl))  # f32

    # ---- backward ----------------------------------------------------------
    g = g_ref[:]  # (T, 1 + C) f32
    g_density = g[:, :1].astype(compute_dtype)
    g_color = g[:, 1:]

    gz = (g_color * color * (1.0 - color)).astype(compute_dtype)  # sigmoid'
    acc_dw(last_idx, act, gz)
    gc = gmm_t(gz, w_cl[:])

    for back in range(n_extra_color - 1, -1, -1):
        # relu mask of this extra layer's OUTPUT (= input of the next stage)
        mask_src = extra_inputs[back + 1] if back + 1 < len(extra_inputs) else act
        gc = relu_mask(gc, mask_src)
        acc_dw(extra_indices[back], extra_inputs[back], gc)
        gc = gmm_t(gc, weight_refs[2 * extra_indices[back]][:])

    # relu mask of the first color layer's output
    act0 = extra_inputs[0] if n_extra_color > 0 else act
    gc = relu_mask(gc, act0)
    # (T, 256) ++ (T, 128): lane-aligned concat
    acc_dw(c0_idx, jnp.concatenate([inter, dir_embeds], axis=-1), gc)
    g_inter = gmm_t(gc, w_c0[:h])

    acc_dw(int_idx, features, g_inter)
    acc_dw(den_idx, features, g_density)
    g_feat = gmm_t(g_inter, w_int[:]) + gmm_t(g_density, w_den[:])

    g_back = g_feat
    for li in range(n_layers - 1, -1, -1):
        g_back = relu_mask(g_back, layer_outputs[li])
        acc_dw(li, layer_inputs[li], g_back)
        if li > 0:
            g_full = gmm_t(g_back, weight_refs[2 * li][:])
            if li in input_skips:
                g_back = g_full[:, : layer_outputs[li - 1].shape[-1]]
            else:
                g_back = g_full


def nerf_mlp_backward_pallas(
    model,
    params: Dict[str, Any],
    points: jax.Array,
    directions: jax.Array,
    g_density: jax.Array,
    g_colors: jax.Array,
    tile: int = BWD_TILE,
    interpret: bool = None,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> Dict[str, Any]:
    """Weight gradients of the fused forward given head cotangents."""
    if interpret is None:
        interpret = _default_interpret()

    *lead, n_pts, _ = points.shape
    n_total = int(np.prod(lead)) * n_pts

    flat_points = points.reshape(n_total, 3)
    flat_dirs = jnp.broadcast_to(directions[..., None, :], (*lead, n_pts, 3)).reshape(n_total, 3)
    flat_g = jnp.concatenate(
        [g_density.reshape(n_total, 1), g_colors.reshape(n_total, model.color_dim)], axis=-1
    ).astype(jnp.float32)

    n_padded = _round_up(max(n_total, tile), tile)
    if n_padded != n_total:
        pad = n_padded - n_total
        flat_points = jnp.pad(flat_points, ((0, pad), (0, 0)))
        flat_dirs = jnp.pad(flat_dirs, ((0, pad), (0, 0)), constant_values=1.0)
        flat_g = jnp.pad(flat_g, ((0, pad), (0, 0)))  # zero cotangents: no grad contribution

    weights, orig_shapes = padded_weights(model, params)
    embed_consts = embedding_inputs(model)

    compute_dtype = model.compute_dtype if model.compute_dtype != jnp.float32 else jnp.float32

    kernel = functools.partial(
        _nerf_mlp_bwd_kernel,
        n_layers=model.n_layers,
        input_skips=tuple(model.input_skips),
        n_extra_color=model.n_extra_color_layers,
        n_weights=len(weights),
        compute_dtype=compute_dtype,
    )

    grid = (n_padded // tile,)
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1 + model.color_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for c in embed_consts:
        in_specs.append(pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: tuple([0] * _nd), memory_space=pltpu.VMEM))

    # grad outputs: padded weight shapes, biases as (1, dim) rows
    out_shapes = []
    out_specs = []
    for w in weights:
        shape = w.shape if w.ndim == 2 else (1, w.shape[0])
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
        out_specs.append(pl.BlockSpec(shape, lambda i, _nd=len(shape): tuple([0] * _nd), memory_space=pltpu.VMEM))

    flops_per_pt = 6 * (
        model.input_dim * model.n_hidden_neurons_xyz
        + (model.n_layers - 1) * model.n_hidden_neurons_xyz * model.n_hidden_neurons_xyz
        + model.n_hidden_neurons_xyz * (model.n_hidden_neurons_xyz + 1)
        + (model.n_hidden_neurons_xyz + model.embedding_dim_dir) * model.n_hidden_neurons_dir
        + model.n_hidden_neurons_dir * model.color_dim
    )

    grads_flat = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * n_padded,
            bytes_accessed=n_padded * (3 + 3 + 1 + model.color_dim) * 4,
            transcendentals=n_padded * (model.embedding_dim_xyz + model.embedding_dim_dir + 4),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes) if not interpret else None,
        interpret=interpret,
    )(flat_points, flat_dirs, flat_g, *embed_consts, *weights)

    # slice padded rows off and biases back to (dim,); padded embedding
    # columns are zeros, so the sliced-off dW rows are exactly zero
    fixed = []
    for orig, g in zip(orig_shapes, grads_flat):
        if len(orig) == 2:
            fixed.append(g[: orig[0], : orig[1]])
        else:
            fixed.append(g[0, : orig[0]])
    return _unflatten_grads(model, params, fixed)


@functools.lru_cache(maxsize=None)
def make_fused_mlp(model) -> Any:
    """Per-model custom-VJP fused forward (Pallas fwd + Pallas bwd)."""

    @jax.custom_vjp
    def fused(params, points, directions):
        return nerf_mlp_forward_pallas(model, params, points, directions)

    def fwd(params, points, directions):
        return fused(params, points, directions), (params, points, directions)

    def bwd(residuals, cotangents):
        params, points, directions = residuals
        g_density, g_colors = cotangents
        grads = nerf_mlp_backward_pallas(model, params, points, directions, g_density, g_colors)
        # ray geometry never depends on parameters in kernel-eligible
        # configs; see module docstring.
        return grads, jnp.zeros_like(points), jnp.zeros_like(directions)

    fused.defvjp(fwd, bwd)
    return fused
