"""Bird's-eye-view rasterization: velodyne points -> 608x608x3 pseudo-image.

Behavioral contract (reference: src/data_process/kitti_bev_utils.py:18-76):
crop to the front boundary (x in [0,50], y in [-25,25], z in [-2.73,1.27]),
shift z by -minZ, discretize to a 609x609 grid (cell = 50/608 m, y offset
+304), then per cell:

  channel 0 = intensity of the highest point,
  channel 1 = max height / 4 m,
  channel 2 = min(1, log(count+1)/log 64)   (density),

cropped to 608x608. Output is HWC (rows = x cells, cols = y cells) — the
transpose-free NHWC layout for the TPU conv stack; channel order matches the
reference's CHW index order so imported weights see identical inputs.

The reference builds this with lexsort + np.unique per frame (its data-loader
hot loop, SURVEY.md §3.4). Here there are two implementations:

- `make_bev_map`: vectorized numpy scatter (np.maximum.at / bincount) for the
  host input pipeline — BIT-IDENTICAL to the reference algorithm (and to the
  native C++ rasterizer);
- `make_bev_map_jax`: a jit-able, batched segment-max/sum scatter over padded
  point sets, so the whole inference path (raster -> net -> NMS) runs as one
  XLA program on device.

Host-vs-device parity caveats (measured, not hypothetical):
- XLA lowers `x / disc` to reciprocal-multiply (the terminal pins
  --xla_allow_excess_precision), which differs from IEEE f32 division by
  1 ulp; a point whose coordinate sits exactly on a cell boundary in one
  rounding can land in the adjacent cell (~1 point in 10^6 on real data).
- Device density math runs in f32 vs the host's f64 (diffs ~1e-5).
The DEVICE path is the default everywhere hot (training steps, evaluation,
test/demo, bench/entry: compact points cross the link, the raster runs
inside the jitted program), and `make_bev_map_jax` additionally defaults to
the packed single-scatter mode ((z top-23-bits | intensity 8-bit) in one
int32 key — exact for KITTI's 8-bit intensities; pass packed=False for the
exact 2-scatter form). The host/native path remains for mosaic assembly, drawing,
calibration, and --host_raster opt-outs, and is the bit-exactness anchor.
A one-cell raster shift on a knife-edge point and the packed mode's
sub-half-ulp quantization are far below detection noise; tests/test_data.py
checks the device path with a mismatched-cell budget instead of exact
equality.

Tie semantics: when several points in a cell share the exact max z, the
reference keeps the first in (x, y, -z)-lexsort order; these kernels keep the
max intensity among them. Identical on real float data (exact z ties don't
occur), documented for completeness.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import kitti as cnf

_GRID = cnf.BEV_HEIGHT + 1  # 609: raster grid before the final crop
_LOG64 = np.log(64.0)


def remove_points_outside(points: np.ndarray, boundary: Optional[Dict[str, float]] = None) -> np.ndarray:
    """Crop (N, 4) points to the boundary (inclusive) and shift z by -minZ
    (reference: kitti_bev_utils.py:18-34)."""
    bc = boundary or cnf.BOUNDARY
    m = (
        (points[:, 0] >= bc["minX"]) & (points[:, 0] <= bc["maxX"])
        & (points[:, 1] >= bc["minY"]) & (points[:, 1] <= bc["maxY"])
        & (points[:, 2] >= bc["minZ"]) & (points[:, 2] <= bc["maxZ"])
    )
    out = points[m].copy()
    out[:, 2] -= bc["minZ"]
    return out


def _cell_indices_np(points: np.ndarray, discretization: float) -> Tuple[np.ndarray, np.ndarray]:
    ix = np.floor(points[:, 0] / discretization).astype(np.int64)
    # int(floor(y/d) + 609/2) truncates the .5 -> floor(y/d) + 304.
    iy = (np.floor(points[:, 1] / discretization) + _GRID / 2).astype(np.int64)
    return ix, iy


def make_bev_map(points: np.ndarray, discretization: float = cnf.DISCRETIZATION,
                 boundary: Optional[Dict[str, float]] = None) -> np.ndarray:
    """Cropped/shifted (N, 4) points -> (608, 608, 3) float32 HWC BEV map."""
    bc = boundary or cnf.BOUNDARY
    max_height = float(abs(bc["maxZ"] - bc["minZ"]))
    ix, iy = _cell_indices_np(points, discretization)
    cells = ix * _GRID + iy

    n_cells = _GRID * _GRID
    height = np.zeros(n_cells, np.float64)
    np.maximum.at(height, cells, points[:, 2])
    counts = np.bincount(cells, minlength=n_cells)

    # Intensity of the top point: max intensity among points at the cell max z.
    intensity = np.zeros(n_cells, np.float64)
    is_top = points[:, 2] >= height[cells]
    np.maximum.at(intensity, cells[is_top], points[is_top, 3])

    density = np.minimum(1.0, np.log(counts + 1.0) / _LOG64)
    occupied = counts > 0
    out = np.zeros((n_cells, 3), np.float32)
    out[occupied, 0] = intensity[occupied]
    out[occupied, 1] = height[occupied] / max_height
    out[occupied, 2] = density[occupied]
    out = out.reshape(_GRID, _GRID, 3)
    return np.ascontiguousarray(out[: cnf.BEV_HEIGHT, : cnf.BEV_WIDTH, :])


def pad_points(points: np.ndarray, max_points: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/truncate cropped points to a static (max_points, 4) + mask for the
    device rasterizer. Truncation keeps the first points (arbitrary subset,
    ~120k crop covers every KITTI frame, SURVEY.md §7)."""
    n = min(points.shape[0], max_points)
    out = np.zeros((max_points, 4), np.float32)
    out[:n] = points[:n]
    mask = np.zeros((max_points,), np.float32)
    mask[:n] = 1.0
    return out, mask


@partial(jax.jit, static_argnames=("bev_size", "packed"))
def make_bev_map_jax(points: jnp.ndarray, mask: jnp.ndarray,
                     bev_size: int = cnf.BEV_HEIGHT, *,
                     packed: bool = True) -> jnp.ndarray:
    """Device rasterizer: (..., N, 4) padded points + (..., N) mask ->
    (..., S, S, 3) BEV maps.

    Points must already be cropped/z-shifted (`remove_points_outside`).
    The whole batch is flattened into ONE global scatter per channel
    (cell id = frame * grid^2 + cell): measurably faster on TPU than a
    vmapped per-frame scatter (~20% at batch 16) and identical in output.

    packed=True (the default — it is what bench.py measures, so every
    serving surface runs the measured config) selects the fast
    single-scatter variant: the (height,
    intensity) pair is packed into one int32 key — the top 23 bits of the
    positive-f32 bit pattern of z (monotone in z) and 8 bits of intensity
    quantized to 1/255 — so one scatter-max replaces the height scatter,
    the top-point gather, and the intensity scatter. Accuracy contract:
    intensity is EXACT for KITTI velodyne data (sensor reflectances are
    8-bit, stored as i/255, which round-trips through the quantizer);
    synthetic full-precision intensities quantize with error <= 1/510.
    Height is truncated to 15 mantissa bits: error <= z * 2^-15, i.e.
    <= 3.1e-5 on the normalized channel — below the existing 5e-5
    device-parity budget (and far below the bf16 resolution the network
    reads the channel at). Tie semantics: cells where several points share
    the same truncated-z get the max intensity among them (the exact path
    ties on exact z; identical on real float data).
    """
    single = points.ndim == 2
    if single:
        points, mask = points[None], mask[None]
    flat_pts = points.reshape((-1,) + points.shape[-2:])
    flat_msk = mask.reshape((-1,) + mask.shape[-1:])
    out = _bev_flat(flat_pts, flat_msk, bev_size, packed)
    if single:
        return out[0]
    return out.reshape(points.shape[:-2] + out.shape[-3:])


@partial(jax.jit, static_argnames=("batch", "bev_size", "packed"))
def make_bev_map_jax_flat(points: jnp.ndarray, frame_id: jnp.ndarray,
                          mask: jnp.ndarray, batch: int,
                          bev_size: int = cnf.BEV_HEIGHT, *,
                          packed: bool = True) -> jnp.ndarray:
    """Flat-packed device rasterizer: (P, 4) points + (P,) frame ids +
    (P,) mask -> (batch, S, S, 3).

    Same output as `make_bev_map_jax` on the equivalent padded layout, but
    the batch shares ONE point buffer packed by `pack_points_flat`, so the
    scatter pays for the batch's TOTAL live points (~13k/frame average)
    instead of batch x per-frame worst case (20480) — scatter cost is
    ~10 ns/update regardless of content (PERF.md), so fewer lanes is the
    only raster lever. Serving configs size `capacity` to their workload's
    mean + headroom rather than the max frame.
    """
    return _bev_from_cells(points, frame_id, mask > 0.5, batch, bev_size,
                           packed)


def pack_points_flat(point_arrays, capacity: int):
    """Host packer for `make_bev_map_jax_flat`: per-frame cropped/z-shifted
    clouds -> (points (capacity, 4), frame_id (capacity,), mask (capacity,)).

    Frames are laid out contiguously; if the batch's total live points exceed
    `capacity` the tail frames truncate (same policy as `pad_points`, applied
    globally — size capacity generously for the workload's batch total)."""
    points = np.zeros((capacity, 4), np.float32)
    frame_id = np.zeros((capacity,), np.int32)
    mask = np.zeros((capacity,), np.float32)
    at = 0
    for fid, pts in enumerate(point_arrays):
        n = min(pts.shape[0], capacity - at)
        points[at:at + n] = pts[:n]
        frame_id[at:at + n] = fid
        mask[at:at + n] = 1.0
        at += n
        if at >= capacity:
            break
    return points, frame_id, mask


# --- COO (pre-aggregated cells) raster path -------------------------------
#
# The raw-points device raster above needs TWO conflict-resolving scatter
# passes (count add + packed (z|intensity) max) over every live POINT lane,
# and scatter costs ~10 ns/lane regardless of content (PERF.md). Host
# pre-aggregation reduces that to ONE conflict-free scatter-set over the
# OCCUPIED CELLS: the host walks the points once (it already does, in the
# loader), resolves max-z/top-intensity/count per cell, and packs all three
# channels into one int32 per cell:
#
#   bits [31:14] height  = round(z_max / 4m * (2^18-1))   (error <= 1.9e-6)
#   bits [13: 8] count   = min(count, 63)                 (density EXACT: the
#                          log curve saturates at 63 by definition)
#   bits [ 7: 0] intensity = round(r_top * 255)           (exact for KITTI's
#                          8-bit reflectances; <= 1/510 otherwise)
#
# Because the cell index (floor division) is computed on HOST numpy, this
# path also eliminates the XLA reciprocal-multiply knife-edge cell shifts —
# it is parity-wise STRICTER than the raw-points device raster.
# Dead/padded lanes carry cell id = n_cells (the dump slot), so no mask
# array crosses the link; H2D is 8 bytes per occupied cell.

_HQ_MAX = (1 << 18) - 1  # 18-bit height quantizer
_DENSITY_TABLE = np.minimum(
    1.0, np.log(np.arange(64, dtype=np.float64) + 1.0) / _LOG64
).astype(np.float32)  # f64 curve cast to f32: bit-identical to the host path


def aggregate_bev_cells(points: np.ndarray,
                        boundary: Optional[Dict[str, float]] = None,
                        bev_size: int = cnf.BEV_HEIGHT
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Cropped/z-shifted (N, 4) points -> (cells (M,) int32, keys (M,) int32)
    per occupied cell, aggregated with EXACTLY `make_bev_map`'s semantics
    (max z; max intensity among points at the cell max; saturating count).
    `bev_size` must match the downstream `pack_cells_flat` /
    `make_bev_map_from_cells` calls (they share the bev_size+1 grid)."""
    bc = boundary or cnf.BOUNDARY
    grid = bev_size + 1
    discretization = (bc["maxX"] - bc["minX"]) / bev_size
    max_height = float(abs(bc["maxZ"] - bc["minZ"]))
    ix = np.floor(points[:, 0] / np.float32(discretization)).astype(np.int64)
    iy = (np.floor(points[:, 1] / np.float32(discretization))
          + grid / 2).astype(np.int64)
    cells = ix * grid + iy

    n_cells = grid * grid
    height = np.zeros(n_cells, np.float64)
    np.maximum.at(height, cells, points[:, 2])
    counts = np.bincount(cells, minlength=n_cells)
    intensity = np.zeros(n_cells, np.float64)
    is_top = points[:, 2] >= height[cells]
    np.maximum.at(intensity, cells[is_top], points[is_top, 3])

    occ = np.flatnonzero(counts)
    hq = np.rint(np.clip(height[occ] / max_height, 0.0, 1.0) * _HQ_MAX
                 ).astype(np.int64)
    cq = np.minimum(counts[occ], 63).astype(np.int64)
    rq = np.rint(np.clip(intensity[occ], 0.0, 1.0) * 255.0).astype(np.int64)
    keys = ((hq << 14) | (cq << 8) | rq).astype(np.uint32).view(np.int32)
    return occ.astype(np.int32), keys


def density_from_keys(keys: np.ndarray) -> np.ndarray:
    """Packed cell keys -> exact f32 density channel values (host side).

    The density is a pure function of the 6-bit saturating count packed in
    the key, but evaluating it ON DEVICE means a table gather (or a log) over
    every cell of the batch grid — batch 16 x 609^2 = 5.9M lanes at XLA's
    ~10 ns/gather-lane measured 47 ms/batch, 6x the whole point-scatter
    raster (r3 batch-2 sweep, stages_coo). Host-side it's a 64-entry lookup
    over only the OCCUPIED cells, bit-identical to `make_bev_map`'s f64
    curve, and ships as one extra f32 per cell."""
    cq = (keys.view(np.uint32) >> 8) & 0x3F
    return _DENSITY_TABLE[cq]


def pack_cells_flat(cell_arrays, key_arrays, capacity: int,
                    bev_size: int = cnf.BEV_HEIGHT,
                    total_frames: Optional[int] = None,
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-frame (cells, keys) from `aggregate_bev_cells` -> flat (capacity,)
    (cells int32, keys int32, density f32) for `make_bev_map_from_cells`.
    Cell ids become frame-global (fid * grid^2 + cell); unused lanes point at
    the dump slot so the device needs no mask. Tail frames truncate past
    `capacity` (same policy as `pack_points_flat`).

    total_frames: frame count the downstream `make_bev_map_from_cells` will
    raster at (>= len(cell_arrays)); the dump slot sits past THAT grid, so a
    tail batch packed with the full batch size serves through the already-
    compiled full-batch program (no per-remainder recompile) — the pad
    frames raster as empty and are sliced off by the caller."""
    grid = bev_size + 1
    if total_frames is None:
        total_frames = len(cell_arrays)
    assert total_frames >= len(cell_arrays)
    n_cells_total = total_frames * grid * grid
    cells = np.full((capacity,), n_cells_total, np.int32)
    keys = np.zeros((capacity,), np.int32)
    at = 0
    for fid, (c, k) in enumerate(zip(cell_arrays, key_arrays)):
        n = min(c.shape[0], capacity - at)
        cells[at:at + n] = c[:n] + fid * grid * grid
        keys[at:at + n] = k[:n]
        at += n
        if at >= capacity:
            break
    return cells, keys, density_from_keys(keys)


def pack_cells_batched(cell_arrays, key_arrays, per_frame_capacity: int,
                       bev_size: int = cnf.BEV_HEIGHT,
                       total_frames: Optional[int] = None,
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched COO layout for `make_bev_map_from_cells_batched`: per-frame
    (cells, keys) -> ((B, C) cells int32, (B, C) keys int32, (B, C) dens f32)
    with frame-LOCAL cell ids. Unlike the flat layout this has a batch axis,
    so it shards over a data mesh (the DP serving path); the cost is lanes =
    B x per-frame capacity instead of the batch total. Dead lanes carry
    key == 0 (impossible for an occupied cell: count >= 1 sets bit 8+), which
    the device routes to the dump slot — zero-padded pad FRAMES are therefore
    also valid, which is what the mesh path pads remainder batches with.
    Frames with more than `per_frame_capacity` cells truncate."""
    if total_frames is None:
        total_frames = len(cell_arrays)
    assert total_frames >= len(cell_arrays)
    cells = np.zeros((total_frames, per_frame_capacity), np.int32)
    keys = np.zeros((total_frames, per_frame_capacity), np.int32)
    for fid, (c, k) in enumerate(zip(cell_arrays, key_arrays)):
        n = min(c.shape[0], per_frame_capacity)
        cells[fid, :n] = c[:n]
        keys[fid, :n] = k[:n]
    return cells, keys, density_from_keys(keys)


@partial(jax.jit, static_argnames=("batch", "bev_size"))
def make_bev_map_from_cells(cells: jnp.ndarray, keys: jnp.ndarray,
                            dens: jnp.ndarray, batch: int,
                            bev_size: int = cnf.BEV_HEIGHT) -> jnp.ndarray:
    """Device tail of the COO raster: flat (M,) frame-global cell ids +
    (M,) packed cell keys + (M,) host-computed density -> (batch, S, S, 3).
    Two conflict-free scatters over occupied-cell lanes only (host
    guarantees unique live cell ids; dead lanes hit the dump slot); the rest
    is elementwise unpacking. No per-grid-cell gather — see
    `density_from_keys` for why density arrives precomputed."""
    grid = bev_size + 1
    n_cells = batch * grid * grid
    buf = jnp.zeros((n_cells + 1,), jnp.int32).at[cells].set(
        keys, mode="drop", unique_indices=True)
    dbuf = jnp.zeros((n_cells + 1,), jnp.float32).at[cells].set(
        dens, mode="drop", unique_indices=True)
    u = buf[:n_cells].astype(jnp.uint32).reshape(batch, grid, grid)
    intensity = (u & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    height = ((u >> 14).astype(jnp.float32)) * (1.0 / _HQ_MAX)
    density = dbuf[:n_cells].reshape(batch, grid, grid)
    # key == 0 <=> empty cell (any occupied cell has count >= 1).
    full = jnp.stack([intensity, height, density], axis=-1)
    return full[:, :bev_size, :bev_size, :]


@partial(jax.jit, static_argnames=("bev_size",))
def make_bev_map_from_cells_batched(cells: jnp.ndarray, keys: jnp.ndarray,
                                    dens: jnp.ndarray,
                                    bev_size: int = cnf.BEV_HEIGHT
                                    ) -> jnp.ndarray:
    """Shardable COO raster: (B, C) frame-LOCAL cell ids + packed keys +
    host density (`pack_cells_batched`) -> (B, S, S, 3).

    Same math as `make_bev_map_from_cells` but vmapped over the batch axis,
    so under a data mesh each device scatters only its own frames' lanes —
    the DP serving form of the COO path (the flat layout has no batch axis
    to shard). Liveness comes from the key itself: an occupied cell always
    has count >= 1 (bit 8+), so key == 0 marks a dead lane (or a zero-padded
    pad frame) and routes to the dump slot."""
    grid = bev_size + 1
    n_cells = grid * grid

    def one(c, k, d):
        c_eff = jnp.where(k != 0, c, n_cells)
        buf = jnp.zeros((n_cells + 1,), jnp.int32).at[c_eff].set(
            k, mode="drop", unique_indices=True)
        dbuf = jnp.zeros((n_cells + 1,), jnp.float32).at[c_eff].set(
            d, mode="drop", unique_indices=True)
        u = buf[:n_cells].astype(jnp.uint32).reshape(grid, grid)
        intensity = (u & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        height = (u >> 14).astype(jnp.float32) * (1.0 / _HQ_MAX)
        density = dbuf[:n_cells].reshape(grid, grid)
        return jnp.stack([intensity, height, density], axis=-1)

    full = jax.vmap(one)(cells, keys, dens)
    return full[:, :bev_size, :bev_size, :]


def _bev_flat(points: jnp.ndarray, mask: jnp.ndarray, bev_size: int,
              packed: bool = False) -> jnp.ndarray:
    b = points.shape[0]
    grid = bev_size + 1
    live = mask > 0.5  # (B, N)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, live.shape, 0)
    return _bev_from_cells(points.reshape(-1, points.shape[-1]),
                           b_idx.ravel(), live.ravel(), b, bev_size, packed)


def _bev_from_cells(points: jnp.ndarray, frame_id: jnp.ndarray,
                    live: jnp.ndarray, b: int, bev_size: int,
                    packed: bool = False) -> jnp.ndarray:
    """Scatter core shared by the padded-per-frame and flat-packed layouts:
    flat (P, 4) points + (P,) frame ids + (P,) liveness -> (b, S, S, 3)."""
    grid = bev_size + 1
    disc = (cnf.BOUNDARY["maxX"] - cnf.BOUNDARY["minX"]) / bev_size
    max_height = jnp.float32(cnf.MAX_HEIGHT)
    n_cells = b * grid * grid

    ix = jnp.clip(jnp.floor(points[:, 0] / disc).astype(jnp.int32), 0, grid - 1)
    iy = jnp.clip((jnp.floor(points[:, 1] / disc) + grid / 2).astype(jnp.int32),
                  0, grid - 1)
    # Dead points route to a dump slot past every frame's grid.
    cells = jnp.where(live, (frame_id * grid + ix) * grid + iy, n_cells)

    z = jnp.where(live, points[:, 2], -1.0)
    r = jnp.where(live, points[:, 3], 0.0)
    live_f = live

    counts = jnp.zeros((n_cells + 1,), jnp.float32).at[cells].add(
        live.astype(jnp.float32), mode="drop")

    if packed:
        # One scatter-max of (z | intensity) packed into int32 — see
        # make_bev_map_jax docstring for the accuracy contract.
        z_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(z, 0.0).astype(jnp.float32), jnp.int32)
        r8 = jnp.round(jnp.clip(r, 0.0, 1.0) * 255.0).astype(jnp.int32)
        key = ((z_bits >> 8) << 8) | r8
        pk = jnp.zeros((n_cells + 1,), jnp.int32).at[cells].max(key, mode="drop")
        height = jax.lax.bitcast_convert_type(
            (pk >> 8) << 8, jnp.float32)
        intensity = (pk & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        height = height[:n_cells].reshape(b, grid, grid)
        intensity = intensity[:n_cells].reshape(b, grid, grid)
    else:
        height = jnp.zeros((n_cells + 1,), jnp.float32).at[cells].max(
            z, mode="drop")
        is_top = live_f & (z >= height[cells])
        intensity = (
            jnp.zeros((n_cells + 1,), jnp.float32)
            .at[jnp.where(is_top, cells, n_cells)]
            .max(jnp.where(is_top, r, 0.0), mode="drop")
        )
        height = height[:n_cells].reshape(b, grid, grid)
        intensity = intensity[:n_cells].reshape(b, grid, grid)
    counts = counts[:n_cells].reshape(b, grid, grid)

    density = jnp.minimum(1.0, jnp.log(counts + 1.0) / _LOG64)
    occupied = counts > 0
    height = jnp.where(occupied, jnp.maximum(height, 0.0) / max_height, 0.0)
    intensity = jnp.where(occupied, intensity, 0.0)
    density = jnp.where(occupied, density, 0.0)

    full = jnp.stack([intensity, height, density], axis=-1)
    return full[:, :bev_size, :bev_size, :]


def images_from_deferred_batch(batch, out_size: int,
                               bev_size: int = cnf.BEV_HEIGHT) -> jnp.ndarray:
    """Device-side tail of the deferred-raster training pipeline: padded
    points + recorded augmentation decisions -> (B, out_size, out_size, 3).

    Mirrors the host path exactly in order and semantics
    (dataset.load_sample + HorizontalFlip/Cutout + the loader's multiscale
    resize, reference: kitti_dataset.py:87-121 / transformation.py:376-437 /
    kitti_dataset.py:224-230): rasterize at the native 608, flip width,
    punch cutout holes, then resize. Traceable — call inside the jitted
    train step.
    """
    img = make_bev_map_jax(batch["points"], batch["point_mask"], bev_size)
    flip = batch["flip"] > 0.5                                 # (B,)
    img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
    holes = batch["holes"]                                     # (B, H, 5)
    hole_mask = batch["hole_mask"]                             # (B, H)
    if holes.shape[1]:
        rows = jnp.arange(bev_size, dtype=jnp.float32)[None, :, None]
        cols = jnp.arange(bev_size, dtype=jnp.float32)[None, None, :]
        for h in range(holes.shape[1]):
            y1, y2 = holes[:, h, 0, None, None], holes[:, h, 1, None, None]
            x1, x2 = holes[:, h, 2, None, None], holes[:, h, 3, None, None]
            fill = holes[:, h, 4, None, None]
            inside = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
                      & (hole_mask[:, h, None, None] > 0.5))
            img = jnp.where(inside[..., None], fill[..., None], img)
    if out_size != bev_size:
        img = jax.image.resize(
            img, (img.shape[0], out_size, out_size, img.shape[3]),
            method="linear", antialias=False)  # cv2 INTER_LINEAR semantics
    return img
