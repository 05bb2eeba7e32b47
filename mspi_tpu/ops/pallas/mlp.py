"""Pallas fused transformer MLP: y = gelu(x W1 + b1) W2 + b2 — fwd + bwd.

XLA cannot fuse two matmuls into one kernel, so the 4x-wide hidden
activation h = gelu(x W1 + b1) round-trips HBM between fc1 and fc2 in
every transformer MLP (at MViT stage 1 that is a [8*43008, 384] tensor per
block; the ConvNeXt prior runs 18 such blocks per frame batch).  This
kernel keeps h entirely in VMEM: one grid step = one row tile computing
both matmuls with the erf-exact GELU (torch parity, ops.layers.gelu)
between them.

Backward is the same tiling with recompute: u and h are rebuilt per row
tile, dW/db accumulate across the whole grid in resident fp32 blocks
(constant index map -> the accumulator never leaves VMEM).

Weights must fit VMEM (fwd: W1+W2; bwd: + fp32 dW1+dW2), so callers gate
on C*H — `fits_vmem(C, H)`.  Used by the MViT / SyncBlock / UniFormer /
ConvNeXt MLPs via their Mlp modules when pallas_enabled().
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def fits_vmem(c: int, h: int) -> bool:
    """Conservative gate: weights + grad accumulators + tiles below ~12 MB."""
    return c * h * (4 + 4) * 2 <= 10 * 1024 * 1024  # bf16/f32 W + fp32 dW, x2 mats


def fits_vmem_fwd(c: int, h: int, itemsize: int = 2) -> bool:
    """Forward-only budget: just the two resident weight blocks — no fp32
    dW accumulators.  Admits the big-C MLPs (MViT/Swin stage 4 and the
    ConvNeXt prior stage 3 at 768x3072, SyncBlock at 512x2048) that the
    training gate rejects; callers use it only with deterministic=True, so
    the backward (which would blow VMEM) is never built.  itemsize is the
    COMPUTE dtype's: at fp32 the 768x3072 weights alone are 18.9 MB and
    Mosaic's 16 MB scoped limit rejects the kernel (hit by the r4 fp32
    northstar run) — those blocks stay unfused on the fp32 path."""
    return c * h * itemsize * 2 <= 10 * 1024 * 1024


# degree-16 Chebyshev fit of erf(z)/z over z in [-4, 4], Horner in the
# shifted variable u = (z^2 - 8)/8 in [-1, 1] (monomials in z^2 would lose
# ~4 digits to cancellation in fp32)
_ERF_COEF = (
    3.535309975350e-01, -1.765761846074e-01, 1.316748393912e-01,
    -1.077128407766e-01, 9.021568368589e-02, -7.469362173441e-02,
    5.982504407076e-02, -4.598314808437e-02, 3.334546889909e-02,
    -2.174387528189e-02, 1.361992465041e-02, -9.972879042824e-03,
    5.934167554927e-03, -1.156541100318e-03, 3.873904780020e-04,
    -1.350484219801e-03, 6.560723747351e-04,
)


# degree-8 fit of the same function — |erf err| <= 7.7e-4, an order of
# magnitude below bf16 rounding (eps 2^-8 ~ 3.9e-3), at half the FMA chain.
# The GELU polynomial is the measured bound of the fused LN+MLP kernel
# (tools/bench_lnmlp.py r3: matmul floor 1.54 ms, +LN 1.82 ms, +deg-16
# GELU 3.53 ms at the ConvNeXt stage-0 shape), so bf16 pipelines take the
# cheap fit; fp32 keeps the 2e-7 one.
_ERF_COEF_FAST = (
    3.536022699613e-01, -1.745360228158e-01, 1.282262975445e-01,
    -1.335568183591e-01, 1.164849409594e-01, 1.073632742169e-02,
    -7.948334927669e-03, -1.415578021638e-01, 9.874117476355e-02,
)


def _erf(x, fast: bool = False):
    """erf as a pure-FMA odd polynomial: z*P((z^2-8)/8) on |z|<=4, clamped
    beyond (erf(4) = 1 - 1.5e-8).  |err| <= 2e-7 in fp32 Horner — same
    accuracy class as the Abramowitz-Stegun 7.1.26 rational it replaces
    (torch-parity GELU needs erf, not the tanh approximation; Pallas TPU
    has no erf lowering), but with no divide and no exp: the A-S divide
    alone cost ~1.6 ms per ConvNeXt stage-0 call on the VPU (measured
    r2 — transcendentals, not DMA or MXU, bounded this kernel).  With
    fast=True the degree-8 fit is used (bf16-precision pipelines)."""
    coef = _ERF_COEF_FAST if fast else _ERF_COEF
    z = jnp.clip(x, -4.0, 4.0)
    u = z * z * 0.125 - 1.0
    r = coef[-1]
    for c in coef[-2::-1]:
        r = r * u + c
    return z * r


def _gelu_f32(u, fast: bool = False):
    return 0.5 * u * (1.0 + _erf(u * _INV_SQRT2, fast))


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[0]                      # [TR, C] storage dtype
    u = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    h = _gelu_f32(u, fast=x.dtype == jnp.bfloat16).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    x = x_ref[0]
    dy = dy_ref[0].astype(jnp.float32)

    u = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    fast = x.dtype == jnp.bfloat16
    h = _gelu_f32(u, fast)
    # d/du gelu(u) = Phi(u) + u * phi(u)
    dgelu = 0.5 * (1.0 + _erf(u * _INV_SQRT2, fast)) \
        + u * _INV_SQRT2PI * jnp.exp(-0.5 * u * u)

    dy_c = dy.astype(x.dtype)
    h_c = h.astype(x.dtype)
    dh = jax.lax.dot_general(  # dy W2^T
        dy_c, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    du = dh * dgelu
    du_c = du.astype(x.dtype)
    dx = jax.lax.dot_general(  # du W1^T
        du_c, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dw1 = jax.lax.dot_general(  # x^T du
        x, du_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(  # h^T dy
        h_c, dy_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(du, axis=0, keepdims=True)
    db2 = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1
        dw2_ref[...] = dw2
        db1_ref[...] = db1
        db2_ref[...] = db2

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] = dw1_ref[...] + dw1
        dw2_ref[...] = dw2_ref[...] + dw2
        db1_ref[...] = db1_ref[...] + db1
        db2_ref[...] = db2_ref[...] + db2


def _tile_rows(n: int, h: int, hidden_bytes: int) -> int:
    """Largest row tile that divides N (multiples of 128 preferred) while the
    hidden-sized VMEM intermediates (TR x H x hidden_bytes) stay in budget.
    Small tiles are the enemy here: at [128, 5376, 96] a 256-row tile means
    2688 grid steps of ~50 KB DMAs and the kernel runs ~9x off the HBM
    roofline on per-step overhead (profiled r2: 2.95 ms vs 0.33 ms SOL).
    hidden_bytes ~= live score-sized buffers: 6 fwd (f32 u + bf16 h),
    24 bwd (u, h, dgelu, dh, du in f32 + casts)."""
    import os

    budget = int(os.environ.get("MSPI_MLP_VMEM_BUDGET", 8 * 1024 * 1024))
    cap = max(128, budget // max(h * hidden_bytes, 1) // 128 * 128)
    best = 0
    t = 128
    while t <= min(n, cap):
        if n % t == 0:
            best = t
        t += 128
    if best:
        return best
    for t in (512, 256, 128):
        if t <= cap and n % t == 0:
            return t
    # no divisor in range: caller pads N up to a multiple of the tile
    return min(cap, -(-n // 128) * 128)


# Tile contract: N is padded to a multiple of the BACKWARD tile (the larger
# 24 B/hidden-element footprint), and the forward runs a tile that is a
# multiple of it (6 B footprint -> usually bigger), so both grids exactly
# cover the padded N.  Independent fwd/bwd tile choices silently truncated
# the bwd grid when they diverged (e.g. N=200, H=2048: fwd TR=200,
# bwd TR=128 -> rows 128-199 uninitialized).
_BWD_HIDDEN_BYTES = 24
_FWD_HIDDEN_BYTES = 6


def _fwd_tile(n: int, h: int, tr_bwd: int) -> int:
    """Largest multiple of the bwd tile that divides (padded) n and fits the
    forward VMEM budget."""
    import os

    budget = int(os.environ.get("MSPI_MLP_VMEM_BUDGET", 8 * 1024 * 1024))
    cap = max(tr_bwd, budget // max(h * _FWD_HIDDEN_BYTES, 1))
    best = tr_bwd
    t = tr_bwd
    while t <= min(n, cap):
        if n % t == 0:
            best = t
        t += tr_bwd
    return best


def _fwd_impl(x, w1, b1, w2, b2, tr, interpret):
    B, N, C = x.shape
    H = w1.shape[1]
    TR = _fwd_tile(N, H, tr)
    assert N % TR == 0, (N, TR)
    grid = (B, N // TR)
    x_spec = pl.BlockSpec((1, TR, C), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda b, t: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[x_spec, w_spec(C, H), w_spec(1, H), w_spec(H, C), w_spec(1, C)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(x, w1, b1.reshape(1, H), w2, b2.reshape(1, C))


def _bwd_impl(x, w1, b1, w2, b2, dy, tr, interpret):
    B, N, C = x.shape
    H = w1.shape[1]
    TR = tr
    assert N % TR == 0, (N, TR)
    grid = (B, N // TR)
    x_spec = pl.BlockSpec((1, TR, C), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda b, t: (0, 0),
                                        memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[x_spec, w_spec(C, H), w_spec(1, H), w_spec(H, C),
                  w_spec(1, C), x_spec],
        out_specs=[x_spec, w_spec(C, H), w_spec(1, H), w_spec(H, C),
                   w_spec(1, C)],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, w1, b1.reshape(1, H), w2, b2.reshape(1, C), dy)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mlp(x, w1, b1, w2, b2, tr, interpret):
    return _fwd_impl(x, w1, b1, w2, b2, tr, interpret)


def _mlp_fwd(x, w1, b1, w2, b2, tr, interpret):
    return _fwd_impl(x, w1, b1, w2, b2, tr, interpret), (x, w1, b1, w2, b2)


def _mlp_bwd(tr, interpret, res, dy):
    x, w1, b1, w2, b2 = res
    return _bwd_impl(x, w1, b1, w2, b2, dy, tr, interpret)


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mlp(
    x: jnp.ndarray,   # [B, N, C] (flatten leading dims before the call)
    w1: jnp.ndarray,  # [C, H]
    b1: jnp.ndarray,  # [H]
    w2: jnp.ndarray,  # [H, C]
    b2: jnp.ndarray,  # [C]
    interpret: bool = False,
) -> jnp.ndarray:
    B, N, C = x.shape
    TR = _tile_rows(N, w1.shape[1], _BWD_HIDDEN_BYTES)
    pad = -N % TR
    if pad:  # outside the custom_vjp: padded rows carry zero cotangent
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out = _mlp(x, w1, b1, w2, b2, TR, interpret)
    return out[:, :N] if pad else out


def maybe_fused_mlp(mlp_module, x):
    """Drop-in accelerator for an Mlp module with `fc1`/`fc2` dense fields:
    returns the fused-kernel result, or None when the caller should take
    the plain dense path (initialisation, Pallas disabled, weights too big
    for VMEM, or bias-less layers)."""
    from mspi_tpu.ops.pallas import pallas_enabled, pallas_interpret

    if mlp_module.is_initializing() or not pallas_enabled():
        return None
    p1 = mlp_module.fc1.variables["params"]
    p2 = mlp_module.fc2.variables["params"]
    if "bias" not in p1 or "bias" not in p2:
        return None
    C, H = p1["kernel"].shape
    if p2["kernel"].shape != (H, C):  # kernel assumes dim_out == dim_in
        return None
    if not fits_vmem(C, H):
        return None
    dt = getattr(mlp_module.fc1, "dtype", None) or x.dtype
    shape = x.shape
    x3 = x.reshape(shape[0], -1, C) if x.ndim != 3 else x
    out = fused_mlp(x3.astype(dt), p1["kernel"].astype(dt),
                    p1["bias"].astype(dt), p2["kernel"].astype(dt),
                    p2["bias"].astype(dt), interpret=pallas_interpret())
    return out.reshape(shape)


# ---------------- LayerNorm-fused variant ----------------
#
# In the pre-norm block pattern `x + drop_path(mlp(norm(x)))`, XLA cannot
# fuse the LN (a reduction) into the first matmul, so BOTH the normalised
# activation and the 4x hidden tensor round-trip HBM.  This kernel reads x
# once and writes only the MLP output: LN (fast-variance, flax semantics)
# -> fc1 -> gelu -> fc2 inside one grid step.


def _ln_f32(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xhat = (xf - mu) * jax.lax.rsqrt(var + eps)
    return xhat, mu, var, xhat * g.astype(jnp.float32) + b.astype(jnp.float32)


def _ln_fwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   out_ref, *, eps):
    x = x_ref[0]
    _, _, _, z = _ln_f32(x, g_ref[0], be_ref[0], eps)
    z = z.astype(x.dtype)
    u = jnp.dot(z, w1_ref[...], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    h = _gelu_f32(u, fast=x.dtype == jnp.bfloat16).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def _ln_bwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   dy_ref, dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref,
                   dw2_ref, db2_ref, *, eps):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    x = x_ref[0]
    dy = dy_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)

    xhat, mu, var, z = _ln_f32(x, g_ref[0], be_ref[0], eps)
    z_c = z.astype(x.dtype)
    u = jnp.dot(z_c, w1_ref[...], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    fast = x.dtype == jnp.bfloat16
    h = _gelu_f32(u, fast)
    dgelu = 0.5 * (1.0 + _erf(u * _INV_SQRT2, fast)) \
        + u * _INV_SQRT2PI * jnp.exp(-0.5 * u * u)

    dy_c = dy.astype(x.dtype)
    h_c = h.astype(x.dtype)
    dh = jax.lax.dot_general(
        dy_c, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    du = dh * dgelu
    du_c = du.astype(x.dtype)
    dz = jax.lax.dot_general(  # du W1^T -> grad at the LN-affine output
        du_c, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # LN backward (fast-variance formula, per row over C)
    dxhat = dz * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * jax.lax.rsqrt(var + eps)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dw1 = jax.lax.dot_general(
        z_c, du_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(
        h_c, dy_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(du, axis=0, keepdims=True)
    db2 = jnp.sum(dy, axis=0, keepdims=True)
    dg = jnp.sum(dz * xhat, axis=0, keepdims=True)
    dbe = jnp.sum(dz, axis=0, keepdims=True)

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1
        dw2_ref[...] = dw2
        db1_ref[...] = db1
        db2_ref[...] = db2
        dg_ref[...] = dg
        dbe_ref[...] = dbe

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] = dw1_ref[...] + dw1
        dw2_ref[...] = dw2_ref[...] + dw2
        db1_ref[...] = db1_ref[...] + db1
        db2_ref[...] = db2_ref[...] + db2
        dg_ref[...] = dg_ref[...] + dg
        dbe_ref[...] = dbe_ref[...] + dbe


def _ln_specs(B, N, C, H, TR):
    x_spec = pl.BlockSpec((1, TR, C), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda b, t: (0, 0),
                                        memory_space=pltpu.VMEM)
    return x_spec, w_spec


def _ln_fwd_impl(x, g, be, w1, b1, w2, b2, eps, tr, interpret):
    B, N, C = x.shape
    H = w1.shape[1]
    TR = _fwd_tile(N, H, tr)
    assert N % TR == 0, (N, TR)
    x_spec, w_spec = _ln_specs(B, N, C, H, TR)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(B, N // TR),
        in_specs=[x_spec, w_spec(1, C), w_spec(1, C), w_spec(C, H),
                  w_spec(1, H), w_spec(H, C), w_spec(1, C)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(x, g.reshape(1, C), be.reshape(1, C), w1, b1.reshape(1, H), w2,
      b2.reshape(1, C))


def _ln_bwd_impl(x, g, be, w1, b1, w2, b2, dy, eps, tr, interpret):
    B, N, C = x.shape
    H = w1.shape[1]
    TR = tr
    assert N % TR == 0, (N, TR)
    x_spec, w_spec = _ln_specs(B, N, C, H, TR)
    outs = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(B, N // TR),
        in_specs=[x_spec, w_spec(1, C), w_spec(1, C), w_spec(C, H),
                  w_spec(1, H), w_spec(H, C), w_spec(1, C), x_spec],
        out_specs=[x_spec, w_spec(1, C), w_spec(1, C), w_spec(C, H),
                   w_spec(1, H), w_spec(H, C), w_spec(1, C)],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, g.reshape(1, C), be.reshape(1, C), w1, b1.reshape(1, H), w2,
      b2.reshape(1, C), dy)
    dx, dg, dbe, dw1, db1, dw2, db2 = outs
    return (dx, dg[0].astype(g.dtype), dbe[0].astype(be.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_mlp(x, g, be, w1, b1, w2, b2, eps, tr, interpret):
    return _ln_fwd_impl(x, g, be, w1, b1, w2, b2, eps, tr, interpret)


def _ln_mlp_fwd(x, g, be, w1, b1, w2, b2, eps, tr, interpret):
    return (_ln_fwd_impl(x, g, be, w1, b1, w2, b2, eps, tr, interpret),
            (x, g, be, w1, b1, w2, b2))


def _ln_mlp_bwd(eps, tr, interpret, res, dy):
    x, g, be, w1, b1, w2, b2 = res
    return _ln_bwd_impl(x, g, be, w1, b1, w2, b2, dy, eps, tr, interpret)


_ln_mlp.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_mlp(x, g, be, w1, b1, w2, b2, eps: float = 1e-6,
                 interpret: bool = False) -> jnp.ndarray:
    """fc2(gelu(fc1(LN(x)))) with LN and the hidden tensor in VMEM.
    The residual add / drop-path stays with the caller."""
    B, N, C = x.shape
    TR = _tile_rows(N, w1.shape[1], _BWD_HIDDEN_BYTES)
    pad = -N % TR
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out = _ln_mlp(x, g, be, w1, b1, w2, b2, eps, TR, interpret)
    return out[:, :N] if pad else out


# ---------------- hybrid (fused fwd / XLA bwd) variant ----------------
#
# The all-resident bwd kernel needs bf16 W1+W2 AND fp32 dW1+dW2 in VMEM
# (fits_vmem) — at 768x3072 that is ~28 MB against ~16 MB/core, so the
# big-C MLPs (MViT/Swin stage 4, SyncBlock 512x2048) ran fully unfused in
# TRAINING.  This variant takes the standard remat trade instead: the
# forward runs the fused kernel (hidden tensor never leaves VMEM — the
# whole point of the fusion, and it also SHRINKS saved activations to just
# x), and the backward is XLA autodiff of the same math, recomputing
# z/u/h from x (one extra C*H*N matmul, ~25% more bwd MLP FLOPs, in
# exchange for the fwd's 2 saved hidden-tensor HBM round-trips per block).


def _ln_mlp_ref_jnp(x, g, be, w1, b1, w2, b2, eps):
    """jnp twin of the fused kernel's math (fp32 LN stats, casts at the same
    points, fast-erf GELU for bf16) — autodiffed for the hybrid bwd."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    z = (xf - mu) * jax.lax.rsqrt(var + eps)
    z = z * g.astype(jnp.float32) + be.astype(jnp.float32)
    z = z.astype(x.dtype)
    u = jnp.dot(z, w1, preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    h = _gelu_f32(u, fast=x.dtype == jnp.bfloat16).astype(x.dtype)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32) \
        + b2.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_mlp_hybrid(x, g, be, w1, b1, w2, b2, eps, tr, interpret):
    return _ln_fwd_impl(x, g, be, w1, b1, w2, b2, eps, tr, interpret)


def _ln_mlp_hybrid_fwd(x, g, be, w1, b1, w2, b2, eps, tr, interpret):
    return (_ln_fwd_impl(x, g, be, w1, b1, w2, b2, eps, tr, interpret),
            (x, g, be, w1, b1, w2, b2))


def _ln_mlp_hybrid_bwd(eps, tr, interpret, res, dy):
    x, g, be, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _ln_mlp_ref_jnp(*a, eps), x, g, be, w1, b1, w2, b2)
    return vjp(dy)


_ln_mlp_hybrid.defvjp(_ln_mlp_hybrid_fwd, _ln_mlp_hybrid_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_mlp_hybrid(x, g, be, w1, b1, w2, b2, eps: float = 1e-6,
                        interpret: bool = False) -> jnp.ndarray:
    """fused_ln_mlp with the forward-only VMEM budget and an XLA-autodiff
    backward — the trainable big-C path (see block comment above)."""
    B, N, C = x.shape
    TR = _tile_rows(N, w1.shape[1], _FWD_HIDDEN_BYTES)
    pad = -N % TR
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out = _ln_mlp_hybrid(x, g, be, w1, b1, w2, b2, eps, TR, interpret)
    return out[:, :N] if pad else out


def maybe_fused_ln_mlp(norm_module, mlp_module, x, deterministic=None):
    """Block-level accelerator for `mlp(norm(x))` where norm is a LayerNorm
    and mlp has dense fc1/fc2: returns the fused result (caller adds the
    residual / drop-path), or None for the plain path.

    `deterministic=True` (i.e. inference) additionally enables the int8
    MXU path when MSPI_QUANT=int8 and the channel width clears the
    measured win threshold (tools/bench_int8.py)."""
    from mspi_tpu.ops.pallas import (pallas_enabled, pallas_interpret,
                                     quant_int8_enabled)

    if mlp_module.is_initializing() or not pallas_enabled():
        return None
    pn = norm_module.variables["params"]
    p1 = mlp_module.fc1.variables["params"]
    p2 = mlp_module.fc2.variables["params"]
    if "scale" not in pn or "bias" not in pn:
        return None
    if "bias" not in p1 or "bias" not in p2:
        return None
    C, H = p1["kernel"].shape
    if p2["kernel"].shape != (H, C):
        return None
    dt = getattr(mlp_module.fc1, "dtype", None) or x.dtype
    if not _ln_mlp_admissible(C, H, deterministic, jnp.dtype(dt).itemsize):
        return None
    return _dispatch_ln_mlp(pn, p1["kernel"], p1["bias"], p2["kernel"],
                            p2["bias"], float(norm_module.epsilon), x, dt,
                            deterministic)


def maybe_fused_ln_mlp_pw(norm_module, pw1, pw2, x, deterministic=None):
    """ConvNextBlock3d-style accelerator: `pwconv2(gelu(pwconv1(LN(x))))`
    where pwconv1/pwconv2 are 1x1x1 convs (kernel [1,1,1,C,H]) — the same
    token-MLP math as maybe_fused_ln_mlp with the conv kernels viewed
    [C, H].  Kills the decoder's pathological EmitAllBatchInSublanes conv
    fusions AND the unfused LN stat reductions (r3 HLO/profile)."""
    from mspi_tpu.ops.pallas import pallas_enabled

    if pw1.is_initializing() or not pallas_enabled():
        return None
    pn = norm_module.variables["params"]
    p1 = pw1.variables["params"]
    p2 = pw2.variables["params"]
    if "scale" not in pn or "bias" not in pn:
        return None
    if "bias" not in p1 or "bias" not in p2:
        return None
    k1 = p1["kernel"].reshape(p1["kernel"].shape[-2:])
    k2 = p2["kernel"].reshape(p2["kernel"].shape[-2:])
    C, H = k1.shape
    if k2.shape != (H, C):
        return None
    dt = getattr(pw1, "dtype", None) or x.dtype
    if not _ln_mlp_admissible(C, H, deterministic, jnp.dtype(dt).itemsize):
        return None
    return _dispatch_ln_mlp(pn, k1, p1["bias"], k2, p2["bias"],
                            float(norm_module.epsilon), x, dt, deterministic)


def _ln_mlp_admissible(C, H, deterministic, itemsize: int = 2) -> bool:
    from mspi_tpu.ops.pallas import mlp_hybrid_enabled

    if fits_vmem(C, H):
        return True
    if not fits_vmem_fwd(C, H, itemsize):
        return False
    # big-C: fwd-only budget.  Inference always; training via the hybrid
    # fused-fwd/XLA-bwd route (gated MSPI_MLP_HYBRID).
    return bool(deterministic) or mlp_hybrid_enabled()


def _dispatch_ln_mlp(pn, k1, b1, k2, b2, eps, x, dt, deterministic):
    from mspi_tpu.ops.pallas import pallas_interpret, quant_int8_enabled

    C, H = k1.shape
    shape = x.shape
    x3 = x.reshape(shape[0], -1, C) if x.ndim != 3 else x
    if deterministic and quant_int8_enabled() and C >= QUANT_MIN_C:
        out = fused_ln_mlp_int8(
            x3.astype(dt), pn["scale"], pn["bias"], k1, b1, k2, b2,
            eps=eps, interpret=pallas_interpret())
        return out.reshape(shape)
    fn = fused_ln_mlp
    if not fits_vmem(C, H) and not deterministic:
        fn = fused_ln_mlp_hybrid  # big-C in training: fused fwd, XLA bwd
    out = fn(x3.astype(dt), pn["scale"].astype(dt),
             pn["bias"].astype(dt), k1.astype(dt), b1.astype(dt),
             k2.astype(dt), b2.astype(dt), eps=eps,
             interpret=pallas_interpret())
    return out.reshape(shape)


# ---------------- transposed-layout variant ----------------
#
# XLA lays the ConvNeXt prior's conv stack out batch-minor (B*T=128 in
# lanes, C in sublanes — C=96 is too narrow for lanes), so the token-major
# fused_ln_mlp pays a relayout copy pair per block (~1 ms/block at stage 0,
# r3 profile) at the XLA<->Pallas boundary.  This variant consumes the conv
# layout AS IS: logical [N, C, BT] where the trailing two dims match the
# physical (sublane=C, lane=BT) order, so `transpose(x,(1,2,3,0))` into it
# is a layout-only bitcast.  LN is a sublane reduction; the matmuls are
# per-position [H,C]x[C,BT] MXU dots with TRANSPOSED resident weights,
# unrolled over a position tile (Mosaic has no batched dot).
#
# Forward-only (the prior is the always-frozen image encoder; the fwd-only
# VMEM budget applies) — callers gate on deterministic=True.


def _ln_fwd_kernel_t(x_ref, g_ref, be_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                     out_ref, *, eps, tn):
    fast = x_ref.dtype == jnp.bfloat16
    g = g_ref[...].astype(jnp.float32)    # [C, 1]
    be = be_ref[...].astype(jnp.float32)  # [C, 1]
    b1 = b1_ref[...].astype(jnp.float32)  # [H, 1]
    b2 = b2_ref[...].astype(jnp.float32)  # [C, 1]
    for i in range(tn):
        z = x_ref[i]                      # [C, BT] storage dtype
        zf = z.astype(jnp.float32)
        mu = jnp.mean(zf, axis=0, keepdims=True)
        var = jnp.mean(zf * zf, axis=0, keepdims=True) - mu * mu
        zn = (zf - mu) * jax.lax.rsqrt(var + eps) * g + be
        zc = zn.astype(z.dtype)
        u = jnp.dot(w1t_ref[...], zc, preferred_element_type=jnp.float32)
        u = u + b1
        h = _gelu_f32(u, fast).astype(z.dtype)
        y = jnp.dot(w2t_ref[...], h, preferred_element_type=jnp.float32)
        y = y + b2
        out_ref[i] = y.astype(out_ref.dtype)


def _ln_fwd_kernel_t_res(x_ref, s_ref, g_ref, be_ref, w1t_ref, b1_ref,
                         w2t_ref, b2_ref, gam_ref, out_ref, *, eps, tn):
    """Residual-folded twin of _ln_fwd_kernel_t: emits
    shortcut + gamma * mlp(LN(x)) directly, so the MLP output never
    round-trips HBM and XLA's residual fusion (read y + read shortcut +
    write out, ~3 extra passes per block) disappears."""
    fast = x_ref.dtype == jnp.bfloat16
    g = g_ref[...].astype(jnp.float32)    # [C, 1]
    be = be_ref[...].astype(jnp.float32)  # [C, 1]
    b1 = b1_ref[...].astype(jnp.float32)  # [H, 1]
    b2 = b2_ref[...].astype(jnp.float32)  # [C, 1]
    gam = gam_ref[...].astype(jnp.float32)  # [C, 1]
    for i in range(tn):
        z = x_ref[i]                      # [C, BT] storage dtype
        zf = z.astype(jnp.float32)
        mu = jnp.mean(zf, axis=0, keepdims=True)
        var = jnp.mean(zf * zf, axis=0, keepdims=True) - mu * mu
        zn = (zf - mu) * jax.lax.rsqrt(var + eps) * g + be
        zc = zn.astype(z.dtype)
        u = jnp.dot(w1t_ref[...], zc, preferred_element_type=jnp.float32)
        u = u + b1
        h = _gelu_f32(u, fast).astype(z.dtype)
        y = jnp.dot(w2t_ref[...], h, preferred_element_type=jnp.float32)
        y = y + b2
        out_ref[i] = (s_ref[i].astype(jnp.float32) + gam * y
                      ).astype(out_ref.dtype)


def _tile_pos(n: int, c: int, bt: int, dsize: int,
              blocks: int = 2) -> int | None:
    """Largest divisor of N (positions) such that the activation blocks
    (`blocks` = in+out, +1 with a resident shortcut) stay within budget;
    capped at 32 (the kernel unrolls the position loop).  Returns None when
    only degenerate tiling exists (huge C*BT) — callers fall back to the
    token-major kernel rather than pad (padding [N,C,BT] on the major axis
    would copy the whole tensor, the very cost this kernel exists to
    avoid)."""
    import os

    budget = int(os.environ.get("MSPI_MLPT_VMEM_BUDGET", 3 * 1024 * 1024))
    cap = min(32, max(1, budget // max(c * bt * dsize * blocks, 1)))
    for t in range(min(n, cap), 0, -1):
        if n % t == 0:
            return t
    return None


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_mlp_t(xt, g, be, w1, b1, w2, b2, eps: float = 1e-6,
                   interpret: bool = False) -> jnp.ndarray:
    """fc2(gelu(fc1(LN(x)))) on channel-sublane/batch-lane activations:
    xt is [N, C, BT] (N spatial positions, BT examples in lanes).  Weights
    come in the usual [C, H]/[H, C] orientation and are transposed once at
    trace time.  Forward only — no VJP."""
    N, C, BT = xt.shape
    H = w1.shape[1]
    TN = _tile_pos(N, C, BT, xt.dtype.itemsize)
    assert TN is not None and N % TN == 0, (N, TN)
    x_spec = pl.BlockSpec((TN, C, BT), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda t: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel_t, eps=eps, tn=TN),
        grid=(N // TN,),
        in_specs=[x_spec, w_spec(C, 1), w_spec(C, 1), w_spec(H, C),
                  w_spec(H, 1), w_spec(C, H), w_spec(C, 1)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((N, C, BT), xt.dtype),
        interpret=interpret,
    )(xt, g.reshape(C, 1), be.reshape(C, 1), w1.T, b1.reshape(H, 1),
      w2.T, b2.reshape(C, 1))


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_mlp_t_res(xt, st, gamma, g, be, w1, b1, w2, b2,
                       eps: float = 1e-6,
                       interpret: bool = False) -> jnp.ndarray:
    """Residual-folded transposed block: st + gamma * mlp(LN(xt)), all in
    [N, C, BT].  Saves the y write + y re-read + XLA residual fusion that
    the unfolded form pays per block.  Forward only — no VJP."""
    N, C, BT = xt.shape
    H = w1.shape[1]
    TN = _tile_pos(N, C, BT, xt.dtype.itemsize, blocks=3)
    assert TN is not None and N % TN == 0, (N, TN)
    x_spec = pl.BlockSpec((TN, C, BT), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda t: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel_t_res, eps=eps, tn=TN),
        grid=(N // TN,),
        in_specs=[x_spec, x_spec, w_spec(C, 1), w_spec(C, 1), w_spec(H, C),
                  w_spec(H, 1), w_spec(C, H), w_spec(C, 1), w_spec(C, 1)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((N, C, BT), xt.dtype),
        interpret=interpret,
    )(xt, st, g.reshape(C, 1), be.reshape(C, 1), w1.T, b1.reshape(H, 1),
      w2.T, b2.reshape(C, 1), gamma.reshape(C, 1))


def maybe_fused_ln_mlp_t(norm_module, mlp_module, x, deterministic=None,
                         shortcut=None, gamma=None):
    """Transposed-layout block accelerator for conv-stack blocks:
    `mlp(norm(x))` on x = [B, H, W, C] activations that XLA keeps
    batch-minor.  Returns the fused result in the SAME [B, H, W, C]
    logical orientation (both boundary transposes are layout-only), or
    None for the plain / token-major path.  Inference-only (no VJP):
    callers gate on deterministic=True; lanes want BT % 128 == 0, smaller
    batches fall back (75%+ lane waste would eat the copy win).

    With `shortcut` (same shape as x) and `gamma` ([C]) the whole
    ConvNeXt-block tail `shortcut + gamma * mlp(norm(x))` is computed
    in-kernel — the MLP output never round-trips HBM."""
    from mspi_tpu.ops.pallas import pallas_enabled, pallas_interpret

    if mlp_module.is_initializing() or not pallas_enabled():
        return None
    if not deterministic or x.ndim != 4:
        return None
    B, Hh, Ww, C = x.shape
    if B % 128 != 0 and not pallas_interpret():
        return None
    pn = norm_module.variables["params"]
    p1 = mlp_module.fc1.variables["params"]
    p2 = mlp_module.fc2.variables["params"]
    if "scale" not in pn or "bias" not in pn:
        return None
    if "bias" not in p1 or "bias" not in p2:
        return None
    if p1["kernel"].shape[0] != C:
        return None
    H = p1["kernel"].shape[1]
    if p2["kernel"].shape != (H, C):
        return None
    dt = getattr(mlp_module.fc1, "dtype", None) or x.dtype
    # dtype-aware weight-residency budget: both transposed mats live in
    # VMEM for the whole grid.  In fp32 (the parity-certification path)
    # stage 3 (768x3072) is 18.9 MB — over the 16 MB scoped-vmem limit
    # (northstar hit this) — so wide-C fp32 falls back to token-major.
    if 2 * C * H * jnp.dtype(dt).itemsize > 10 * 1024 * 1024:
        return None
    fold_res = shortcut is not None and gamma is not None \
        and shortcut.shape == x.shape
    blocks = 3 if fold_res else 2
    if _tile_pos(Hh * Ww, C, B, jnp.dtype(dt).itemsize, blocks) is None:
        return None
    xt = jnp.transpose(x, (1, 2, 3, 0)).reshape(Hh * Ww, C, B)
    if fold_res:
        st = jnp.transpose(shortcut, (1, 2, 3, 0)).reshape(Hh * Ww, C, B)
        out = fused_ln_mlp_t_res(
            xt.astype(dt), st.astype(dt), gamma.astype(dt),
            pn["scale"].astype(dt), pn["bias"].astype(dt),
            p1["kernel"].astype(dt), p1["bias"].astype(dt),
            p2["kernel"].astype(dt), p2["bias"].astype(dt),
            eps=float(norm_module.epsilon), interpret=pallas_interpret())
    else:
        out = fused_ln_mlp_t(
            xt.astype(dt), pn["scale"].astype(dt), pn["bias"].astype(dt),
            p1["kernel"].astype(dt), p1["bias"].astype(dt),
            p2["kernel"].astype(dt), p2["bias"].astype(dt),
            eps=float(norm_module.epsilon), interpret=pallas_interpret())
    return jnp.transpose(out.reshape(Hh, Ww, C, B), (3, 0, 1, 2))


def _ln_only_kernel_t(x_ref, g_ref, be_ref, out_ref, *, eps, tn):
    g = g_ref[...].astype(jnp.float32)    # [C, 1]
    be = be_ref[...].astype(jnp.float32)  # [C, 1]
    for i in range(tn):
        zf = x_ref[i].astype(jnp.float32)
        mu = jnp.mean(zf, axis=0, keepdims=True)
        var = jnp.mean(zf * zf, axis=0, keepdims=True) - mu * mu
        out_ref[i] = ((zf - mu) * jax.lax.rsqrt(var + eps) * g + be
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_t(xt, g, be, eps: float = 1e-6,
               interpret: bool = False) -> jnp.ndarray:
    """Transposed-layout standalone LayerNorm: normalizes the C (sublane)
    axis of [N, C, BT].  Two HBM passes (read x, write out) vs XLA's
    convert/reduce/normalize chain on the same batch-minor layout."""
    N, C, BT = xt.shape
    TN = _tile_pos(N, C, BT, xt.dtype.itemsize, blocks=2)
    assert TN is not None and N % TN == 0, (N, TN)
    x_spec = pl.BlockSpec((TN, C, BT), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((C, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_only_kernel_t, eps=eps, tn=TN),
        grid=(N // TN,),
        in_specs=[x_spec, w_spec, w_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((N, C, BT), xt.dtype),
        interpret=interpret,
    )(xt, g.reshape(C, 1), be.reshape(C, 1))


def maybe_fused_ln_t(norm_module, x, deterministic=None):
    """Transposed-layout LN for the conv-stack stem/downsample LayerNorms
    (ConvNeXt prior stem.1 / downsample.0 — the only LNs outside the fused
    block kernels, `convert_reduce_fusion` in the r3 profile).  Consumes
    XLA's batch-minor layout directly — both boundary transposes are
    layout-only.  Inference-only (no VJP): callers gate on
    deterministic=True (the prior is the always-frozen image encoder)."""
    from mspi_tpu.ops.pallas import pallas_enabled, pallas_interpret

    if norm_module.is_initializing() or not pallas_enabled():
        return None
    if not deterministic or x.ndim != 4:
        return None
    B, Hh, Ww, C = x.shape
    if B % 128 != 0 and not pallas_interpret():
        return None
    if C % 8 != 0:
        return None
    pn = norm_module.variables["params"]
    if "scale" not in pn or "bias" not in pn:
        return None
    dt = x.dtype
    if _tile_pos(Hh * Ww, C, B, jnp.dtype(dt).itemsize, 2) is None:
        return None
    xt = jnp.transpose(x, (1, 2, 3, 0)).reshape(Hh * Ww, C, B)
    out = fused_ln_t(xt, pn["scale"].astype(dt), pn["bias"].astype(dt),
                     eps=float(norm_module.epsilon),
                     interpret=pallas_interpret())
    return jnp.transpose(out.reshape(Hh, Ww, C, B), (3, 0, 1, 2))


# ---------------- int8 inference variant ----------------
#
# Inference-only forward: weights are quantized per-output-channel at trace
# time (params stay fp32 — checkpoints/converter untouched), activations are
# quantized per row in-kernel (abs-max symmetric), and both matmuls run
# int8 x int8 -> int32 on the MXU (v5e peak 2x bf16; measured 1.82x at the
# MViT stage-3 MLP shape, tools/bench_int8.py).  Below C=256 the per-row
# quantization VPU work outweighs the matmul saving (measured at the
# ConvNeXt prior shape) — callers gate on QUANT_MIN_C.

QUANT_MIN_C = 256
# live per-hidden-element VMEM in the int8 fwd: u f32 + h f32 + hq int8
_Q_HIDDEN_BYTES = 9


def _quant_rows(xf):
    """Per-row abs-max symmetric int8 quantization of an f32 tile.
    One divide per ROW (not per element — VPU divides are the expensive
    transcendental here, see _erf)."""
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
    inv = 127.0 / amax
    q = jnp.round(xf * inv).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def _ln_fwd_kernel_q(x_ref, g_ref, be_ref, w1_ref, s1_ref, b1_ref,
                     w2_ref, s2_ref, b2_ref, out_ref, *, eps):
    x = x_ref[0]
    _, _, _, z = _ln_f32(x, g_ref[0], be_ref[0], eps)
    zq, sz = _quant_rows(z)
    u = jax.lax.dot_general(
        zq, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    u = u.astype(jnp.float32) * (sz * s1_ref[0]) + b1_ref[0]
    h = _gelu_f32(u, fast=True)
    hq, sh = _quant_rows(h)
    y = jax.lax.dot_general(
        hq, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sh * s2_ref[0]) + b2_ref[0]
    out_ref[0] = y.astype(out_ref.dtype)


def quantize_weight(w):
    """Per-output-channel (last axis) symmetric int8: w ~= w_q * scale.
    Returns (w_q int8, scale f32 [1, out])."""
    wf = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12)
    wq = jnp.round(wf * (127.0 / amax)).astype(jnp.int8)
    return wq, amax * (1.0 / 127.0)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_mlp_int8(x, g, be, w1, b1, w2, b2, eps: float = 1e-6,
                      interpret: bool = False) -> jnp.ndarray:
    """Int8 forward of fc2(gelu(fc1(LN(x)))); fp32 params in, x in the
    storage dtype.  No VJP — inference only."""
    B, N, C = x.shape
    H = w1.shape[1]
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    TR = _tile_rows(N, H, _Q_HIDDEN_BYTES)
    pad = -N % TR
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Np = N + pad
    x_spec = pl.BlockSpec((1, TR, C), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda b, t: (0, 0),
                                        memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel_q, eps=eps),
        grid=(B, Np // TR),
        in_specs=[x_spec, w_spec(1, C), w_spec(1, C), w_spec(C, H),
                  w_spec(1, H), w_spec(1, H), w_spec(H, C), w_spec(1, C),
                  w_spec(1, C)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
        interpret=interpret,
    )(x, g.astype(f32).reshape(1, C), be.astype(f32).reshape(1, C), w1q, s1,
      b1.astype(f32).reshape(1, H), w2q, s2, b2.astype(f32).reshape(1, C))
    return out[:, :N] if pad else out
