"""Instant-NGP-style multiresolution hash-grid implicit function.

A second model family beyond the reference's NeRFMLP (the reference has
exactly one implicit function, yanerf/pipelines/models/nerf_mlp.py): the
multiresolution hash encoding of Müller et al. 2022 (PAPERS.md: Instant
Neural Graphics Primitives) followed by the paper's tiny MLPs. Same
registry/pipeline contract as NeRFMLP — ``apply(params, origins,
directions, lengths, **kw) -> dict(rays_densities, rays_features, aux)`` —
so every sampler/renderer/runner component composes unchanged
(configs/nerf/lego_ngp.yml).

Encoding (per level l of L):
  * resolution ``N_l = floor(N_min * b**l)`` with growth
    ``b = exp((ln N_max - ln N_min) / (L - 1))``;
  * coarse levels with ``(N_l + 1)^3 <= table_size`` index a DENSE grid
    (collision-free); finer levels use the iNGP spatial hash
    ``x0 XOR x1*2654435761 XOR x2*805459861 mod T``;
  * trilinear interpolation of the 8 corner feature rows, features
    concatenated across levels -> (N, L*F).

TPU notes: the table lookups are XLA gathers along the major axis of
(T, F) tables — the one op family where this model is less TPU-natural
than the dense MLP — but the encoding replaces the 8x256 MLP with a 1+2
layer 64-wide head, cutting per-point FLOPs ~60x; the gathers are the
price of the asymptotic win. Tables are f32 (tiny); the MLPs honor
``compute_dtype``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yanerf_tpu.ops.harmonics import harmonic_embedding, harmonic_embedding_dim

from .builder import MODELS
from .layers import init_linear_default, linear

_PRIMES = (1, 2654435761, 805459861)


@jax.custom_vjp
def table_lookup(table: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Row gather with a TPU-tuned backward.

    Forward is a plain row gather. The default autodiff backward would be a
    row scatter-add into ``(T, F)`` — measured at ~520 ms for 12.6M updates
    on v5e, ~6x slower than F independent FLAT scatter-adds into ``(T,)``
    (~90 ms each; see docs/performance.md "Hash-grid encodings on TPU").
    The custom VJP takes the flat path.
    """
    return jnp.take(table, flat_idx, axis=0)


def _table_lookup_fwd(table, flat_idx):
    # the table rides along only for its shape/dtype (zero runtime cost:
    # params are live anyway and the value is never read in the backward)
    return table_lookup(table, flat_idx), (flat_idx, table)


# Above this many updates the backward switches from the one-shot flat
# scatters to a lax.scan over fixed-size scatter chunks. The one-shot
# lowering's size grows with the update count and crashes this
# environment's remote XLA compile helper at flagship shapes (apparent
# compiler OOM, docs/performance.md "Hash-grid encodings on TPU"); the scan
# body compiles ONCE at (_BWD_SCAN_CHUNK,) regardless of how many updates
# stream through it, so compile cost is shape-independent. Override via
# YANERF_HASHGRID_BWD_SCAN_THRESHOLD (0 = always scan). The chunk size
# trades scan trip count (serial scatters) against per-scatter lowering
# size (what crashes the remote compile helper) — sweepable via
# YANERF_HASHGRID_BWD_SCAN_CHUNK.
_BWD_SCAN_CHUNK = int(os.environ.get("YANERF_HASHGRID_BWD_SCAN_CHUNK", str(1 << 15)))
_BWD_SCAN_THRESHOLD = int(os.environ.get("YANERF_HASHGRID_BWD_SCAN_THRESHOLD", str(1 << 18)))
# Backward formulation override: "auto" (threshold-based scatter/scan, the
# round-4 default), "scatter"/"scan" (force one path), or "sort" — the
# round-5 SCATTER-FREE formulation. Rationale: the round-4 chunk sweep
# (results/ngp_scan_sweep.json) measured one-shot scatter == every scan
# chunk size == ~2.9-3.0 s/step at the 4096-ray flagship, i.e. the cost is
# the ~100M scatter-add updates/step themselves (TPU scatters are
# issue-rate-bound, docs/performance.md) — no scatter-based reformulation
# can beat it. "sort" replaces the scatter entirely: sort updates by row,
# segmented tree-reduce within equal-row runs (Hillis-Steele doubling over
# the SORTED stream — sidx[i] == sidx[i+s] implies the whole window is one
# run), then ONE (n_rows,) searchsorted + gather of each run's total.
# Sort + elementwise passes + gathers, zero scatters.
_BWD_MODE = os.environ.get("YANERF_HASHGRID_BWD", "auto")


def _shift_up(a: jax.Array, s: int, fill) -> jax.Array:
    return jnp.concatenate([a[s:], jnp.full((s, *a.shape[1:]), fill, a.dtype)])


def _bwd_sort(idx: jax.Array, ct: jax.Array, n_rows: int) -> jax.Array:
    """Scatter-free table gradient: sort by row + segmented tree-reduce.

    Exact (each row's cotangents are summed in a tree order over ONLY that
    row's terms — no prefix-sum cancellation across rows). Cost: one
    ``lax.sort`` of the updates keyed by row index, ``ceil(log2 N)``
    elementwise doubling passes, and one gather per table row.
    """
    n, n_feats = ct.shape
    arrs = jax.lax.sort((idx,) + tuple(ct[:, f] for f in range(n_feats)), num_keys=1)
    sidx, svals = arrs[0], list(arrs[1:])
    s = 1
    while s < n:
        # -1 never equals a real row index, so tail padding breaks runs
        same = sidx == _shift_up(sidx, s, -1)
        svals = [v + jnp.where(same, _shift_up(v, s, 0.0), 0.0) for v in svals]
        s <<= 1
    rows = jnp.arange(n_rows, dtype=sidx.dtype)
    start = jnp.searchsorted(sidx, rows, side="left")
    start_c = jnp.minimum(start, n - 1)
    present = jnp.take(sidx, start_c) == rows
    return jnp.stack(
        [jnp.where(present, jnp.take(v, start_c), 0.0) for v in svals], axis=-1
    )


def _table_lookup_bwd(res, ct):
    flat_idx, table = res
    n_rows, n_feats = table.shape
    ct = ct.astype(jnp.float32).reshape(-1, n_feats)
    idx = flat_idx.reshape(-1)
    n = idx.shape[0]
    if _BWD_MODE == "sort":
        return _bwd_sort(idx, ct, n_rows).astype(table.dtype), None
    if _BWD_MODE == "scatter":
        grad = jnp.stack(
            [jnp.zeros((n_rows,), jnp.float32).at[idx].add(ct[:, f]) for f in range(n_feats)],
            axis=-1,
        )
        return grad.astype(table.dtype), None
    # honor the documented override: threshold 0 forces the scan path even
    # below one chunk (a single-iteration scan — same numerics, lets the
    # scan lowering be validated on-device at any shape)
    if n <= _BWD_SCAN_THRESHOLD and _BWD_MODE != "scan":
        # F independent FLAT scatter-adds into (T,) — measured ~6x faster
        # than one row scatter-add into (T, F) (12.6M updates, v5e)
        grad = jnp.stack(
            [jnp.zeros((n_rows,), jnp.float32).at[idx].add(ct[:, f]) for f in range(n_feats)],
            axis=-1,
        )
        return grad.astype(table.dtype), None
    n_chunks = -(-n // _BWD_SCAN_CHUNK)
    pad = n_chunks * _BWD_SCAN_CHUNK - n
    # padding rows carry zero cotangent: they scatter-add nothing (row 0
    # receives +0.0), so the gradient is exact
    idx_p = jnp.pad(idx, (0, pad)).reshape(n_chunks, _BWD_SCAN_CHUNK)
    ct_p = jnp.pad(ct, ((0, pad), (0, 0))).reshape(n_chunks, _BWD_SCAN_CHUNK, n_feats)

    def body(acc, xs):
        i, c = xs
        # keep the fast flat formulation inside the scan body too
        acc = tuple(a.at[i].add(c[:, f]) for f, a in enumerate(acc))
        return acc, None

    acc0 = tuple(jnp.zeros((n_rows,), jnp.float32) for _ in range(n_feats))
    acc, _ = jax.lax.scan(body, acc0, (idx_p, ct_p))
    grad = jnp.stack(acc, axis=-1)
    return grad.astype(table.dtype), None


table_lookup.defvjp(_table_lookup_fwd, _table_lookup_bwd)


def _level_resolutions(n_levels: int, base_resolution: int, max_resolution: int) -> List[int]:
    if n_levels == 1:
        return [base_resolution]
    growth = float(np.exp((np.log(max_resolution) - np.log(base_resolution)) / (n_levels - 1)))
    return [int(np.floor(base_resolution * growth**level)) for level in range(n_levels)]


@MODELS.register_module()
class HashGridNeRF:
    """Multiresolution hash encoding + tiny density/color MLPs."""

    def __init__(
        self,
        n_levels: int = 16,
        table_size_log2: int = 19,
        n_features_per_level: int = 2,
        base_resolution: int = 16,
        max_resolution: int = 2048,
        hidden_dim: int = 64,
        geo_feature_dim: int = 15,
        n_color_layers: int = 2,
        n_harmonic_functions_dir: int = 4,
        harmonic_functions_dir_append_intput: bool = True,
        color_dim: int = 3,
        scene_bound: float = 1.5,
        input_dir: bool = True,
        compute_dtype: str = "float32",
        contract_coords: bool = False,
        encode_chunk: int = 1 << 17,
    ) -> None:
        self.n_levels = n_levels
        self.table_size = 1 << table_size_log2
        self.n_features_per_level = n_features_per_level
        self.resolutions = _level_resolutions(n_levels, base_resolution, max_resolution)
        self.hidden_dim = hidden_dim
        self.geo_feature_dim = geo_feature_dim
        self.n_color_layers = n_color_layers
        self.n_harmonic_functions_dir = n_harmonic_functions_dir
        self.harmonic_functions_dir_append_intput = harmonic_functions_dir_append_intput
        self.color_dim = color_dim
        self.scene_bound = float(scene_bound)
        # unbounded scenes: contraction maps everything into |x| < 2, so a
        # scene_bound of 2.0 covers the whole contracted domain — anything
        # smaller silently clips the contracted shell onto the boundary
        # cells (the entire background would alias into one cell layer)
        self.contract_coords = contract_coords
        if contract_coords and self.scene_bound < 2.0:
            raise ValueError(
                f"contract_coords=True requires scene_bound >= 2.0 (the contraction's "
                f"codomain is |x| < 2), got {self.scene_bound}"
            )
        self.input_dir = input_dir
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.latent_dim = 0  # pipeline contract parity with NeRFMLP
        # Cap the POINT count any single gather/scatter lowering sees: the
        # remote XLA compile helper crashes (apparent OOM) on the huge
        # one-shot scatter lowerings some train/eval shapes produce
        # (docs/performance.md "Hash-grid encodings on TPU"). Chunking the
        # encode through lax.map means every shape compiles the SAME small
        # fixed-size body. 2^17 points puts every flagship shape (train
        # 4096 rays x 64/192 pts, 800px eval chunks) above the threshold —
        # a 4096x192-ray train step measured the 786k-point one-shot
        # lowering crashing while the chunked body compiled (r3_ngp logs).
        # 0 disables chunking.
        self.encode_chunk = int(encode_chunk)

        # dense (collision-free) below the hash threshold, hashed above
        self.level_table_sizes = [
            min((res + 1) ** 3, self.table_size) for res in self.resolutions
        ]
        self.encoding_dim = n_levels * n_features_per_level
        self.embedding_dim_dir = (
            harmonic_embedding_dim(3, n_harmonic_functions_dir, harmonic_functions_dir_append_intput)
            if input_dir
            else 0
        )

    # -- init -----------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        keys = jax.random.split(rng, self.n_levels + 2 + self.n_color_layers)
        # iNGP: tables start U(-1e-4, 1e-4)
        tables = [
            jax.random.uniform(
                keys[level],
                (self.level_table_sizes[level], self.n_features_per_level),
                minval=-1e-4,
                maxval=1e-4,
                dtype=jnp.float32,
            )
            for level in range(self.n_levels)
        ]
        density_mlp = [
            init_linear_default(keys[self.n_levels], self.encoding_dim, self.hidden_dim),
            init_linear_default(keys[self.n_levels + 1], self.hidden_dim, 1 + self.geo_feature_dim),
        ]
        color_in = self.geo_feature_dim + self.embedding_dim_dir
        color_mlp = []
        dim = color_in
        for i in range(self.n_color_layers):
            color_mlp.append(init_linear_default(keys[self.n_levels + 2 + i], dim, self.hidden_dim))
            dim = self.hidden_dim
        color_mlp.append(
            init_linear_default(jax.random.fold_in(rng, 12345), dim, self.color_dim)
        )
        return {"tables": tables, "density_mlp": density_mlp, "color_mlp": color_mlp}

    # -- encoding ---------------------------------------------------------------
    def _corner_indices(self, cells: jax.Array, offsets: jax.Array, level: int) -> jax.Array:
        """Map integer corner coords (N, 8, 3) to table rows (N, 8)."""
        res = self.resolutions[level]
        corners = cells[:, None, :] + offsets  # (N, 8, 3) int32
        corners = jnp.clip(corners, 0, res)
        if self.level_table_sizes[level] == (res + 1) ** 3:
            stride = res + 1
            return (corners[..., 0] * stride + corners[..., 1]) * stride + corners[..., 2]
        # iNGP spatial hash (uint32 wraparound multiply + xor)
        c = corners.astype(jnp.uint32)
        h = c[..., 0] * np.uint32(_PRIMES[0])
        h = h ^ (c[..., 1] * np.uint32(_PRIMES[1]))
        h = h ^ (c[..., 2] * np.uint32(_PRIMES[2]))
        return (h % np.uint32(self.level_table_sizes[level])).astype(jnp.int32)

    def encode(self, tables: List[jax.Array], points: jax.Array) -> jax.Array:
        """Points (..., 3) in world space -> (..., L*F) interpolated features.

        Large point sets run through ``lax.map`` over fixed
        ``encode_chunk``-point chunks (see ``__init__``): one compiled
        gather/scatter body shape for every ray-count/eval shape, with the
        table cotangents accumulated across chunks by the scan transpose.
        """
        lead = points.shape[:-1]
        flat = points.reshape(-1, 3)
        n = flat.shape[0]
        chunk = self.encode_chunk
        if chunk and n > chunk:
            n_chunks = -(-n // chunk)
            pad = n_chunks * chunk - n
            padded = jnp.pad(flat, ((0, pad), (0, 0)))
            out = jax.lax.map(
                lambda x: self._encode_flat(tables, x),
                padded.reshape(n_chunks, chunk, 3),
            ).reshape(n_chunks * chunk, self.encoding_dim)[:n]
        else:
            out = self._encode_flat(tables, flat)
        return out.reshape(*lead, self.encoding_dim)

    def _encode_flat(self, tables: List[jax.Array], flat: jax.Array) -> jax.Array:
        """The unchunked encode body over (N, 3) points -> (N, L*F)."""
        # normalize into [0, 1]^3 over the scene AABB
        x01 = jnp.clip((flat + self.scene_bound) / (2.0 * self.scene_bound), 0.0, 1.0)

        # the 8 cube-corner offsets and their trilinear weight signs
        offsets = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=jnp.int32
        )  # (8, 3)

        feats = []
        for level in range(self.n_levels):
            scaled = x01 * self.resolutions[level]
            cell = jnp.floor(scaled)
            frac = scaled - cell  # (N, 3)
            idx = self._corner_indices(cell.astype(jnp.int32), offsets, level)  # (N, 8)
            rows = table_lookup(tables[level], idx.reshape(-1)).reshape(
                *idx.shape, self.n_features_per_level
            )  # (N, 8, F)
            # trilinear weights: prod over dims of (1-frac) or frac per corner bit
            w = jnp.where(offsets[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
            w = w[..., 0] * w[..., 1] * w[..., 2]  # (N, 8)
            feats.append(jnp.sum(rows * w[..., None], axis=1))  # (N, F)
        return jnp.concatenate(feats, axis=-1)

    # -- apply ------------------------------------------------------------------
    def apply(
        self,
        params: Dict[str, Any],
        origins: jax.Array,
        directions: jax.Array,
        lengths: jax.Array,
        global_codes: Optional[jax.Array] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        if global_codes is not None:
            raise ValueError("HashGridNeRF does not support latent conditioning")
        from yanerf_tpu.ops.rays import contract_points, ray_bundle_to_ray_points

        points = ray_bundle_to_ray_points(origins, directions, lengths)
        if self.contract_coords:
            points = contract_points(points)
        enc = self.encode(params["tables"], points).astype(self.compute_dtype)

        h = jax.nn.relu(linear(params["density_mlp"][0], enc, self.compute_dtype))
        geo = linear(params["density_mlp"][1], h, self.compute_dtype).astype(jnp.float32)
        raw_density = geo[..., :1]  # raw: the raymarcher applies relu + bias
        geo_feat = geo[..., 1:].astype(self.compute_dtype)

        if self.input_dir:
            dir_norm = directions / jnp.clip(
                jnp.linalg.norm(directions, axis=-1, keepdims=True), min=1e-12
            )
            dir_emb = harmonic_embedding(
                dir_norm,
                self.n_harmonic_functions_dir,
                append_input=self.harmonic_functions_dir_append_intput,
            ).astype(self.compute_dtype)
            dir_emb = jnp.broadcast_to(
                dir_emb[..., None, :], (*points.shape[:-1], dir_emb.shape[-1])
            )
            x = jnp.concatenate([geo_feat, dir_emb], axis=-1)
        else:
            x = geo_feat
        for layer in params["color_mlp"][:-1]:
            x = jax.nn.relu(linear(layer, x, self.compute_dtype))
        color = jax.nn.sigmoid(
            linear(params["color_mlp"][-1], x, self.compute_dtype).astype(jnp.float32)
        )
        return dict(rays_densities=raw_density, rays_features=color, aux={})
