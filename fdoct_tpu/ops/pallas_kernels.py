"""Pallas TPU kernels for the reconstruction hot path.

The fused-operator path (pipeline.ascan_mags_fused) is two real MXU matmuls
plus a magnitude.  XLA already schedules those well; this kernel goes one
step further and fuses **matmul-pair → magnitude → frame accumulation** so
the complex intermediate (re, im) never round-trips HBM and the
per-frame-group accumulation (the reference's accumulate loop,
BscanFFT.cpp:1193-1209) happens in the output block while it is resident in
VMEM.

Grid layout (row-major execution order):
    (row_tiles, depth_tiles, batch)
with the output block indexed by (row_tile, depth_tile) only — consecutive
batch steps revisit the same output block, giving the accumulate-in-VMEM
pattern (initialize at b == 0).  Operator tiles re/im are indexed by
depth_tile only and frames by (batch, row_tile), so operator tiles are
reused across the batch and row sweeps.

Operands may be bfloat16 (halved HBM traffic, full-rate MXU) with float32
accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _recon_kernel(yr_ref, mr_ref, mi_ref, out_ref):
    b = pl.program_id(2)
    re = jnp.dot(yr_ref[0], mr_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(yr_ref[0], mi_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)

    @pl.when(b == 0)
    def _init():
        out_ref[...] = mag

    @pl.when(b > 0)
    def _accum():
        out_ref[...] += mag


def _recon_raw_kernel(raw_ref, pi_ref, invb_ref, mr_ref, mi_ref, out_ref):
    """Ratio-in-VMEM variant: raw uint8 frames enter the kernel; the
    apodization ratio (y − y_p)·(1/y_b) happens on the tile in VMEM, so the
    f32 ``yr`` intermediate never touches HBM (the plain-XLA broadcasted
    elementwise was the pipeline's dominant cost — see BENCH.md)."""
    b = pl.program_id(2)
    # Mosaic has no direct uint8->float32 cast; widen through int32
    y = raw_ref[0].astype(jnp.int32).astype(jnp.float32)
    yr = (y - pi_ref[...]) * invb_ref[...]
    re = jnp.dot(yr, mr_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(yr, mi_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)

    @pl.when(b == 0)
    def _init():
        out_ref[...] = mag

    @pl.when(b > 0)
    def _accum():
        out_ref[...] += mag


def _recon_resident_kernel(raw_ref, pi_ref, invb_ref, mr_ref, mi_ref, out_ref):
    """Operator-resident variant: the full bf16 operator stays in VMEM for
    the whole grid (index map constant), frames stream through; ratio in
    VMEM; f32 accumulation."""
    b = pl.program_id(1)
    y = raw_ref[0].astype(jnp.int32).astype(jnp.float32)
    yr = ((y - pi_ref[...]) * invb_ref[...]).astype(jnp.bfloat16)
    re = jnp.dot(yr, mr_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(yr, mi_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)

    @pl.when(b == 0)
    def _init():
        out_ref[...] = mag

    @pl.when(b > 0)
    def _accum():
        out_ref[...] += mag


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_recon_resident(
    raw: jnp.ndarray,            # (B, rows, n_in) raw uint8
    pi_frame: jnp.ndarray,       # (rows, n_in) f32
    inv_background: jnp.ndarray, # (rows, n_in) f32
    op_re: jnp.ndarray,          # (n_in, ndisp) bf16
    op_im: jnp.ndarray,          # (n_in, ndisp) bf16
    tile_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ_b |ratio(raw[b]) @ M| with the whole bf16 operator VMEM-resident
    (no re-fetch across the grid) and only frames streaming from HBM —
    the data-movement-minimal schedule.  Requires
    2·n_in·ndisp·2B (operator) + tiles to fit VMEM (~10 MB at 2048×512)."""
    B, rows, n_in = raw.shape
    ndisp = op_re.shape[1]
    tr = min(tile_rows, rows)
    assert rows % tr == 0
    grid = (rows // tr, B)
    return pl.pallas_call(
        _recon_resident_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, n_in), lambda r, b: (b, r, 0)),
            pl.BlockSpec((tr, n_in), lambda r, b: (r, 0)),
            pl.BlockSpec((tr, n_in), lambda r, b: (r, 0)),
            pl.BlockSpec((n_in, ndisp), lambda r, b: (0, 0)),
            pl.BlockSpec((n_in, ndisp), lambda r, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tr, ndisp), lambda r, b: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, ndisp), jnp.float32),
        interpret=interpret,
    )(raw, pi_frame, inv_background, op_re.astype(jnp.bfloat16),
      op_im.astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("tile_rows", "tile_depth", "interpret"))
def fused_recon_raw_accumulate(
    raw: jnp.ndarray,      # (B, rows, n_in) raw uint8/uint16 frames
    pi_frame: jnp.ndarray,  # (rows, n_in) float32
    inv_background: jnp.ndarray,  # (rows, n_in) float32, 1/y_b precomputed
    op_re: jnp.ndarray,    # (n_in, ndisp)
    op_im: jnp.ndarray,    # (n_in, ndisp)
    tile_rows: int = 256,
    tile_depth: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ_b |((raw[b] − y_p)⊘y_b) @ (op_re + i·op_im)| with the ratio fused
    into the matmul kernel.  Applicable when preprocess is identity
    (mediann = 0, binvalue = 1, movavgn = 0 — the flagship configs)."""
    B, rows, n_in = raw.shape
    ndisp = op_re.shape[1]
    tr = min(tile_rows, rows)
    td = min(tile_depth, ndisp)
    assert rows % tr == 0 and ndisp % td == 0, (rows, ndisp, tr, td)

    grid = (rows // tr, ndisp // td, B)
    return pl.pallas_call(
        _recon_raw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, n_in), lambda r, d, b: (b, r, 0)),
            pl.BlockSpec((tr, n_in), lambda r, d, b: (r, 0)),
            pl.BlockSpec((tr, n_in), lambda r, d, b: (r, 0)),
            pl.BlockSpec((n_in, td), lambda r, d, b: (0, d)),
            pl.BlockSpec((n_in, td), lambda r, d, b: (0, d)),
        ],
        out_specs=pl.BlockSpec((tr, td), lambda r, d, b: (r, d)),
        out_shape=jax.ShapeDtypeStruct((rows, ndisp), jnp.float32),
        interpret=interpret,
    )(raw, pi_frame, inv_background, op_re, op_im)


def _int8_bscan_kernel(fr_ref, oqr_ref, oqi_ref, sr_ref, si_ref, g_ref,
                       cr_ref, ci_ref, th_ref, db_ref, mn_ref, mx_ref, *,
                       nbatch, averages, eps, denom):
    """int8-direct group step + display epilogue in ONE kernel.

    Per (row_tile, b) grid step: s8 x s8 -> s32 matmul pair against the
    VMEM-resident quantized operator, dequant + magnitude, accumulate in
    the output block; on the LAST batch step the accumulated tile is
    transformed in place through the display chain (÷N, +eps, dB, DC-column
    mask, threshold floor) and the tile's min/max are emitted — so the
    whole epilogue that cost ~3 XLA launches after the matmuls
    (BENCH.md display-epilogue sections) happens while the tile is still
    resident in VMEM.  db comes out UNTRANSPOSED (rows, ndisp); the tiny
    XLA tail does normalize+transpose+u8 (one fused kernel).
    """
    b = pl.program_id(1)
    acc_re = jnp.dot(fr_ref[0], oqr_ref[...],
                     preferred_element_type=jnp.int32)
    acc_im = jnp.dot(fr_ref[0], oqi_ref[...],
                     preferred_element_type=jnp.int32)
    re = acc_re.astype(jnp.float32) * sr_ref[...] * g_ref[...] + cr_ref[...]
    im = acc_im.astype(jnp.float32) * si_ref[...] * g_ref[...] + ci_ref[...]
    mag = jnp.sqrt(re * re + im * im)

    @pl.when(b == 0)
    def _init():
        db_ref[...] = mag

    @pl.when(b > 0)
    def _accum():
        db_ref[...] += mag

    @pl.when(b == nbatch - 1)
    def _finish():
        m = db_ref[...]
        bs = m / averages + eps                      # ÷N + log guard
        db = 20.0 * jnp.log(bs) / denom              # dB (compat 2.303)
        col = jax.lax.broadcasted_iota(jnp.int32, db.shape, 1)
        db = jnp.where(col < 2, db[:, 4:5], db)      # DC cols ← col 4
        db_ref[...] = db
        disp = jnp.maximum(db, th_ref[0, 0])         # display floor
        mn_ref[...] = jnp.full(mn_ref.shape, jnp.min(disp), jnp.float32)
        mx_ref[...] = jnp.full(mx_ref.shape, jnp.max(disp), jnp.float32)
        # (blocks are (1, 8, 128) — Mosaic's minimum f32 tile; the tiny
        # XLA tail reduces them to the global lo/hi)


@functools.partial(jax.jit, static_argnames=(
    "averages", "eps", "denom", "tile_rows", "interpret"))
def int8_bscan_display_fused(
    frames_s8: jnp.ndarray,      # (B, rows, n_in) s8 (bias-shifted counts)
    oq_re: jnp.ndarray,          # (n_in, ndisp) s8 quantized operator
    oq_im: jnp.ndarray,
    s_re: jnp.ndarray,           # (ndisp,) f32 dequant scales
    s_im: jnp.ndarray,
    row_gain: jnp.ndarray,       # (rows, 1) f32
    const_re: jnp.ndarray,       # (rows, ndisp) f32
    const_im: jnp.ndarray,
    thresh: jnp.ndarray,         # () or (1,) f32 — display floor (traced)
    averages: int,
    eps: float = 1e-5,
    denom: float = 2.303,
    tile_rows: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One averaged int8-direct B-scan with the display epilogue fused
    into the matmul kernel (see _int8_bscan_kernel).  Returns
    (db_untransposed (rows, ndisp), mn (tiles, 128), mx (tiles, 128));
    the caller finishes with lo = mn.min(), hi = mx.max() and ONE
    elementwise normalize+transpose+u8 kernel.  clampupper is NOT
    supported here — callers gate on it and use the XLA chain."""
    B, rows, n_in = frames_s8.shape
    ndisp = oq_re.shape[1]
    tr = min(tile_rows, rows)
    assert rows % tr == 0, (rows, tr)
    grid = (rows // tr, B)
    th = jnp.broadcast_to(jnp.asarray(thresh, jnp.float32).reshape(1, 1),
                          (1, 128))
    kernel = functools.partial(_int8_bscan_kernel, nbatch=B,
                               averages=float(averages), eps=float(eps),
                               denom=float(denom))
    db, mn, mx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, n_in), lambda r, b: (b, r, 0)),
            pl.BlockSpec((n_in, ndisp), lambda r, b: (0, 0)),
            pl.BlockSpec((n_in, ndisp), lambda r, b: (0, 0)),
            pl.BlockSpec((1, ndisp), lambda r, b: (0, 0)),
            pl.BlockSpec((1, ndisp), lambda r, b: (0, 0)),
            pl.BlockSpec((tr, 1), lambda r, b: (r, 0)),
            pl.BlockSpec((tr, ndisp), lambda r, b: (r, 0)),
            pl.BlockSpec((tr, ndisp), lambda r, b: (r, 0)),
            pl.BlockSpec((1, 128), lambda r, b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tr, ndisp), lambda r, b: (r, 0)),
            pl.BlockSpec((1, 8, 128), lambda r, b: (r, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda r, b: (r, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, ndisp), jnp.float32),
            jax.ShapeDtypeStruct((rows // tr, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows // tr, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(frames_s8, oq_re, oq_im,
      s_re.reshape(1, ndisp), s_im.reshape(1, ndisp),
      row_gain, const_re, const_im, th)
    return db, mn, mx


@functools.partial(jax.jit, static_argnames=("tile_rows", "tile_depth", "interpret"))
def fused_recon_accumulate(
    yr: jnp.ndarray,       # (B, rows, n_in) apodization-ratio frames
    op_re: jnp.ndarray,    # (n_in, ndisp)
    op_im: jnp.ndarray,    # (n_in, ndisp)
    tile_rows: int = 256,
    tile_depth: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ_b |yr[b] @ (op_re + i·op_im)| — a full averaging group in one
    kernel.  Returns (rows, ndisp) float32.

    Shapes must tile evenly (pad rows/ndisp to multiples of the tile sizes;
    the flagship configs are already 128-aligned).
    """
    B, rows, n_in = yr.shape
    ndisp = op_re.shape[1]
    tr = min(tile_rows, rows)
    td = min(tile_depth, ndisp)
    assert rows % tr == 0 and ndisp % td == 0, (rows, ndisp, tr, td)

    grid = (rows // tr, ndisp // td, B)
    return pl.pallas_call(
        _recon_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, n_in), lambda r, d, b: (b, r, 0)),
            pl.BlockSpec((n_in, td), lambda r, d, b: (0, d)),
            pl.BlockSpec((n_in, td), lambda r, d, b: (0, d)),
        ],
        out_specs=pl.BlockSpec((tr, td), lambda r, d, b: (r, d)),
        out_shape=jax.ShapeDtypeStruct((rows, ndisp), jnp.float32),
        interpret=interpret,
    )(yr, op_re, op_im)
