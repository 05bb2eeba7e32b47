"""Pallas fused attention for pooled (cross-shape) attention — fwd + bwd.

Used by the MViT pooled attention (the flagship hot loop, reference
backbones/MViT.py:905-1014 rel-pos + :1066-1136 attention) and the
SyncBlock cross-modal attention.  XLA materialises the [B, H, Nq, Nk]
score tensor in HBM between the two attention matmuls; at 224x384 MViT-S
stage 1 that is a [B, 1, 43008, 672] fp32 round-trip per block.  This
kernel keeps each q-tile's scores entirely in VMEM: K/V after MViT's kv
pooling are small (Nk = 672 at every stage at the reference resolution),
so one grid step = (batch, head, q-tile) computing softmax(q k^T) v with
fp32 softmax, writing only the [TQ, Dv] output.

The decomposed relative-position bias is NOT an argument: callers fold it
into the contraction by augmenting q with the per-query rel-pos
projections (q . Rt | q . Rh | q . Rw) and k with the matching static 0/1
expansion matrix (see mspi_tpu/models/mvit.py::_augment_for_fused_attn) —
bias addition becomes part of the single MXU matmul (head_dim 96 + 27
bias lanes = 123 ≈ one 128 lane tile), and the bias gradient falls out of
dq/dk automatically, so the custom_vjp below stays bias-free.

Backward is a Pallas kernel on the same tiling: recompute probs per
q-tile, then dv += P^T dO, dS = P*(dO V^T - rowsum), dq = dS K,
dk += dS^T Q, with dk/dv accumulated across q-tiles inside the grid
(q-tile axis fastest so the accumulator block stays resident).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax(scores):
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def _probs(q_ref, k_ref):
    # operands stay in their storage dtype (bf16 on the bf16 path — native
    # MXU rate, 2x fp32); accumulation is fp32 via preferred_element_type
    q = q_ref[0, 0]  # [TQ, Da]
    k = k_ref[0, 0]  # [Nk, Da]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [TQ, Nk] fp32
    return _softmax(scores)


def _fwd_kernel(q_ref, k_ref, v_ref, out_ref):
    probs = _probs(q_ref, k_ref)
    v = v_ref[0, 0]
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    t = pl.program_id(2)  # q-tile axis, fastest: dk/dv blocks stay resident
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    probs = _probs(q_ref, k_ref)  # [TQ, Nk] fp32
    p = probs.astype(v.dtype)

    dv = jax.lax.dot_general(  # P^T dO
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # dO V^T
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds_c = ds.astype(q.dtype)
    dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(  # dS^T Q
        ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(t == 0)
    def _init():
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(t != 0)
    def _acc():
        dk_ref[0, 0] = (dk_ref[0, 0].astype(jnp.float32) + dk).astype(dk_ref.dtype)
        dv_ref[0, 0] = (dv_ref[0, 0].astype(jnp.float32) + dv).astype(dv_ref.dtype)


def _tile(nq: int, nk: int, score_bytes: int) -> int:
    """Largest q-tile that (a) divides Nq and (b) keeps the score-sized
    VMEM intermediates (TQ x Nk x score_bytes) under budget.  score_bytes
    is the per-element footprint of all score-shaped buffers live at once:
    ~8 B in forward (fp32 scores + cast probs), ~20 B in backward (probs,
    dp, ds + casts).  An explicit MSPI_ATTN_TILE wins uncapped."""
    import os

    env = os.environ.get("MSPI_ATTN_TILE")
    if env:
        pref = int(env)
        for t in [pref, 512, 256, 128]:
            if nq % t == 0:
                return t
        # no divisor: caller pads Nq up to a multiple of the tile
        return min(pref, -(-nq // 128) * 128)
    budget = int(os.environ.get("MSPI_ATTN_VMEM_BUDGET", 8 * 1024 * 1024))
    fits = [t for t in (512, 256, 128) if t * nk * score_bytes <= budget]
    for t in fits or [128]:
        if nq % t == 0:
            return t
    return min((fits or [128])[0], -(-nq // 128) * 128)


# Tile contract: Nq is padded to a multiple of the BACKWARD tile (the
# larger ~20 B/score footprint), and the forward runs a tile that is a
# multiple of it (its ~8 B footprint usually affords a bigger one), so both
# grids exactly cover the padded Nq.  Independent fwd/bwd tile choices
# silently truncated the bwd grid when they diverged (e.g. Nq=200, Nk=2000:
# fwd TQ=200, bwd TQ=128 -> tail dq rows uninitialized).
_BWD_SCORE_BYTES = 20
_FWD_SCORE_BYTES = 8
_EXT_DEFAULT = 32 * 1024 * 1024  # see _attention_bwd


def _fwd_tile(nq: int, nk: int, tq_bwd: int) -> int:
    """Largest multiple of the bwd tile that divides (padded) nq and fits
    the forward VMEM budget.  Cap 1024 (r5: the big stage-1 grids amortize
    per-step overhead; the budget check keeps small-VMEM shapes at 512-)."""
    import os

    budget = int(os.environ.get("MSPI_ATTN_VMEM_BUDGET", 8 * 1024 * 1024))
    cap = int(os.environ.get("MSPI_ATTN_FWD_TILE_CAP", 1024))
    best = tq_bwd
    t = tq_bwd
    while t <= min(nq, cap):
        if nq % t == 0 and t * nk * _FWD_SCORE_BYTES <= budget:
            best = t
        t += tq_bwd
    return best


def _fwd_impl(q, k, v, tq, interpret):
    B, H, Nq, Da = q.shape
    Nk, Dv = k.shape[2], v.shape[3]
    TQ = _fwd_tile(Nq, Nk, tq)
    assert Nq % TQ == 0, (Nq, TQ)
    grid = (B, H, Nq // TQ)
    q_spec = pl.BlockSpec((1, 1, TQ, Da), lambda b, h, t: (b, h, t, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = lambda d: pl.BlockSpec((1, 1, Nk, d), lambda b, h, t: (b, h, 0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec(Da), kv_spec(Dv)],
        out_specs=pl.BlockSpec((1, 1, TQ, Dv), lambda b, h, t: (b, h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, Dv), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _bwd_impl(q, k, v, do, tq, interpret, vmem_limit=None):
    B, H, Nq, Da = q.shape
    Nk, Dv = k.shape[2], v.shape[3]
    TQ = tq
    assert Nq % TQ == 0, (Nq, TQ)
    grid = (B, H, Nq // TQ)
    q_spec = pl.BlockSpec((1, 1, TQ, Da), lambda b, h, t: (b, h, t, 0),
                          memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, 1, TQ, Dv), lambda b, h, t: (b, h, t, 0),
                           memory_space=pltpu.VMEM)
    kv_spec = lambda d: pl.BlockSpec((1, 1, Nk, d), lambda b, h, t: (b, h, 0, 0),
                                     memory_space=pltpu.VMEM)
    params = (pltpu.CompilerParams(vmem_limit_bytes=int(vmem_limit))
              if vmem_limit else None)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec(Da), kv_spec(Dv), do_spec],
        out_specs=[q_spec, kv_spec(Da), kv_spec(Dv)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Nq, Da), q.dtype),
            # dk/dv accumulate across all q-tiles — keep the running sum in
            # fp32 (bf16 storage would round the partial sum every step;
            # ~336 sequential roundings at flagship stage 1) and cast once.
            jax.ShapeDtypeStruct((B, H, Nk, Da), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Nk, Dv), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=params,
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, tq, interpret):
    return _fwd_impl(q, k, v, tq, interpret)


def _attention_fwd(q, k, v, tq, interpret):
    return _fwd_impl(q, k, v, tq, interpret), (q, k, v)


def _bwd_vmem_bytes(tq: int, nk: int, da: int, dv: int) -> int:
    """Trace-time estimate of the backward kernel's per-step VMEM footprint.
    k/v in-blocks and dk/dv fp32 accumulator out-blocks are lane-padded to
    128 and double-buffered by Mosaic; score-shaped temporaries cost
    ~_BWD_SCORE_BYTES per element."""
    pad = lambda d: -(-d // 128) * 128
    kv_in = nk * (pad(da) + pad(dv)) * 2 * 2
    acc_out = nk * (pad(da) + pad(dv)) * 4 * 2
    scores = tq * nk * _BWD_SCORE_BYTES
    rows = tq * (2 * pad(da) + 2 * pad(dv)) * 4
    return kv_in + acc_out + scores + rows


def _jnp_reference(q, k, v):
    """Same math as the forward kernel (fp32 scores/softmax, bf16 matmul
    operands) in plain jnp — used only to derive gradients for shapes whose
    Pallas backward cannot fit VMEM."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _attention_bwd(tq, interpret, res, do):
    q, k, v = res
    # Cross-shape blocks with huge Nk (e.g. MViT stage-transition blocks:
    # Nq=10752, Nk=2688, Da=142 at stage 2) can exceed the ~16 MB
    # scoped-VMEM limit even at the minimum 128-row q-tile, because the
    # resident k/v blocks + fp32 dk/dv accumulators dominate.  The forward
    # still fits (smaller score footprint, no accumulators).  For those
    # shapes we retry the kernel with an explicit raised Mosaic
    # vmem_limit_bytes up to MSPI_ATTN_BWD_VMEM_EXT (the r4 train profile
    # measured the jnp fallback at ~10% of the whole train step: it
    # materialises f32 [Nq, Nk] score tensors in HBM); only beyond the
    # extended cap does the XLA recompute-and-differentiate fallback run.
    need = _bwd_vmem_bytes(tq, k.shape[2], q.shape[3], v.shape[3])
    limit = int(os.environ.get("MSPI_ATTN_BWD_VMEM_LIMIT", 14 * 1024 * 1024))
    # Default 32 MB: the r4 lab (tools/bench_attn_bwd.py) measured Mosaic
    # compiling + running all three flagship transition shapes with an
    # explicit raised vmem_limit (up to 41.5 MB accepted) orders of
    # magnitude faster than the jnp fallback, which was ~10% of the whole
    # train step (docs/PROFILE_TRAIN_r4.txt); 32 MB admits the tq=256
    # tiles the sweep preferred while staying well under what Mosaic took.
    ext = int(os.environ.get("MSPI_ATTN_BWD_VMEM_EXT", _EXT_DEFAULT))
    if need > limit:
        if ext and need <= ext:
            return _bwd_impl(q, k, v, do, tq, interpret,
                             vmem_limit=need + (1 << 20))
        _, vjp = jax.vjp(_jnp_reference, q, k, v)
        return vjp(do)
    return _bwd_impl(q, k, v, do, tq, interpret)


_attention.defvjp(_attention_fwd, _attention_bwd)


# --------------------------------------------------------------------------
# rel-pos-aware cross attention: scores = scale*(q k^T) + rel E^T in-kernel
# --------------------------------------------------------------------------
#
# r5: the augmented-lane scheme above (q_aug = [q*scale | rel], k_aug =
# [k | E broadcast]) materialises a full-width q_aug copy per block in HBM
# ([B,H,Nq,123-148] bf16 — the r5 profile put the augmentation region at
# ~8 ms/iter of the 105 ms flagship step: mvit.py:168/180/182/186 concat +
# scale fusions).  Here the bias contraction moves INTO the kernel as a
# second small matmul against the static 0/1 expansion E [Nk, R], so only
# the narrow rel projections [B,H,Nq,R] (R = k_t+k_h+k_w, 27-46 lanes) ever
# exist in HBM and q/k stream in their natural unscaled layouts.  The
# gradient of the bias falls out as drel = dS E; E is a constant (dE = 0).


def _aug_operands(q_ref, k_ref, r_ref, e_ref, scale):
    """Rebuild the augmented operands IN VMEM: qa = [q*scale | rel],
    ka = [k | E].  D + R <= 128 + R lanes, so the score contraction stays
    the same single MXU matmul as the materialized-q_aug scheme — but the
    wide operands never exist in HBM (only the narrow [.., R] rel does)."""
    q = q_ref[0, 0]  # [TQ, D]
    k = k_ref[0, 0]  # [Nk, D]
    qa = jnp.concatenate([q * q.dtype.type(scale), r_ref[0, 0]], axis=-1)
    ka = jnp.concatenate([k, e_ref[:].astype(k.dtype)], axis=-1)
    return qa, ka


def _probs_rel(q_ref, k_ref, r_ref, e_ref, scale):
    qa, ka = _aug_operands(q_ref, k_ref, r_ref, e_ref, scale)
    scores = jax.lax.dot_general(
        qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [TQ, Nk] fp32
    return _softmax(scores)


def _fwd_kernel_rel(q_ref, k_ref, v_ref, r_ref, e_ref, out_ref, *, scale):
    probs = _probs_rel(q_ref, k_ref, r_ref, e_ref, scale)
    v = v_ref[0, 0]
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _bwd_kernel_rel(q_ref, k_ref, v_ref, r_ref, e_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, dr_ref, *, scale):
    t = pl.program_id(2)
    D = q_ref.shape[-1]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    qa, ka = _aug_operands(q_ref, k_ref, r_ref, e_ref, scale)
    scores = jax.lax.dot_general(
        qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    probs = _softmax(scores)
    p = probs.astype(v.dtype)

    dv = jax.lax.dot_general(  # P^T dO
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # dO V^T
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds_c = ds.astype(v.dtype)
    # single augmented-width matmuls, split on the lane axis afterwards:
    # d(qa) = dS ka -> [dq*1/scale-part | dr];  d(ka) = dS^T qa -> dk lanes
    dqa = jnp.dot(ds_c, ka, preferred_element_type=jnp.float32)
    dka = jax.lax.dot_general(  # dS^T QA
        ds_c, qa, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # qa's first D lanes are q*scale: dq chains through the scale; dka's
    # first D lanes contracted against ds ALREADY carry it (ka's k lanes
    # are unscaled, dk = dS^T (q*scale) = dka[:, :D] as-is)
    dq_ref[0, 0] = (dqa[:, :D] * jnp.float32(scale)).astype(dq_ref.dtype)
    dr_ref[0, 0] = dqa[:, D:].astype(dr_ref.dtype)
    dk = dka[:, :D]

    @pl.when(t == 0)
    def _init():
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(t != 0)
    def _acc():
        dk_ref[0, 0] = (dk_ref[0, 0].astype(jnp.float32) + dk).astype(dk_ref.dtype)
        dv_ref[0, 0] = (dv_ref[0, 0].astype(jnp.float32) + dv).astype(dv_ref.dtype)


def _fwd_impl_rel(q, k, v, rel, e, tq, interpret, scale):
    B, H, Nq, Da = q.shape
    Nk, Dv = k.shape[2], v.shape[3]
    R = rel.shape[3]
    TQ = _fwd_tile(Nq, Nk, tq)
    assert Nq % TQ == 0, (Nq, TQ)
    grid = (B, H, Nq // TQ)
    tile_spec = lambda d: pl.BlockSpec((1, 1, TQ, d), lambda b, h, t: (b, h, t, 0),
                                       memory_space=pltpu.VMEM)
    kv_spec = lambda d: pl.BlockSpec((1, 1, Nk, d), lambda b, h, t: (b, h, 0, 0),
                                     memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((Nk, R), lambda b, h, t: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_rel, scale=scale),
        grid=grid,
        in_specs=[tile_spec(Da), kv_spec(Da), kv_spec(Dv), tile_spec(R), e_spec],
        out_specs=tile_spec(Dv),
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, Dv), q.dtype),
        interpret=interpret,
    )(q, k, v, rel, e)


def _bwd_impl_rel(q, k, v, rel, e, do, tq, interpret, scale, vmem_limit=None):
    B, H, Nq, Da = q.shape
    Nk, Dv = k.shape[2], v.shape[3]
    R = rel.shape[3]
    TQ = tq
    assert Nq % TQ == 0, (Nq, TQ)
    grid = (B, H, Nq // TQ)
    tile_spec = lambda d: pl.BlockSpec((1, 1, TQ, d), lambda b, h, t: (b, h, t, 0),
                                       memory_space=pltpu.VMEM)
    kv_spec = lambda d: pl.BlockSpec((1, 1, Nk, d), lambda b, h, t: (b, h, 0, 0),
                                     memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((Nk, R), lambda b, h, t: (0, 0),
                          memory_space=pltpu.VMEM)
    params = (pltpu.CompilerParams(vmem_limit_bytes=int(vmem_limit))
              if vmem_limit else None)
    dq, dk, dv, dr = pl.pallas_call(
        functools.partial(_bwd_kernel_rel, scale=scale),
        grid=grid,
        in_specs=[tile_spec(Da), kv_spec(Da), kv_spec(Dv), tile_spec(R),
                  e_spec, tile_spec(Dv)],
        out_specs=[tile_spec(Da), kv_spec(Da), kv_spec(Dv), tile_spec(R)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Nq, Da), q.dtype),
            jax.ShapeDtypeStruct((B, H, Nk, Da), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Nk, Dv), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Nq, R), q.dtype),
        ],
        interpret=interpret,
        compiler_params=params,
    )(q, k, v, rel, e, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), dr


def _jnp_reference_rel(q, k, v, rel, e, scale):
    """Kernel math in plain jnp — gradient fallback for shapes whose Pallas
    backward cannot fit VMEM."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * jnp.float32(scale)
    s = s + jnp.einsum("bhqr,kr->bhqk", rel, e,
                       preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attention_rel(q, k, v, rel, e, tq, interpret, scale):
    return _fwd_impl_rel(q, k, v, rel, e, tq, interpret, scale)


def _attention_rel_fwd(q, k, v, rel, e, tq, interpret, scale):
    return (_fwd_impl_rel(q, k, v, rel, e, tq, interpret, scale),
            (q, k, v, rel, e))


def _attention_rel_bwd(tq, interpret, scale, res, do):
    q, k, v, rel, e = res
    dq, dk, dv, dr = _rel_bwd_dispatch(q, k, v, rel, e, do, tq, interpret,
                                       scale)
    return dq, dk, dv, dr, jnp.zeros_like(e)


_attention_rel.defvjp(_attention_rel_fwd, _attention_rel_bwd)


def _rel_bwd_dispatch(q, k, v, rel, e, do, tq, interpret, scale):
    """Head-major rel backward with the VMEM gate + extended-limit retry +
    jnp fallback (shared by the head-major and packed custom_vjps)."""
    da_eff = q.shape[3] + rel.shape[3]
    need = _bwd_vmem_bytes(tq, k.shape[2], da_eff, v.shape[3])
    limit = int(os.environ.get("MSPI_ATTN_BWD_VMEM_LIMIT", 14 * 1024 * 1024))
    ext = int(os.environ.get("MSPI_ATTN_BWD_VMEM_EXT", _EXT_DEFAULT))
    if need > limit:
        if ext and need <= ext:
            return _bwd_impl_rel(q, k, v, rel, e, do, tq, interpret,
                                 scale, vmem_limit=need + (1 << 20))
        _, vjp = jax.vjp(
            lambda q_, k_, v_, r_: _jnp_reference_rel(q_, k_, v_, r_, e,
                                                      scale), q, k, v, rel)
        return vjp(do)
    return _bwd_impl_rel(q, k, v, rel, e, do, tq, interpret, scale)


# ---- packed-lane variant: q/k/v/rel stay [B, N, H*width] token-major ----


def _rel_packed_kernel(q_ref, k_ref, v_ref, r_ref, e_ref, out_ref, *,
                       heads, scale, residual):
    """One (batch, q-tile) grid step over ALL heads (the fused_self_attention
    scheme): operands arrive in their packed token-major lane layouts, heads
    are static lane slices unrolled in-kernel, the augmented operands are
    rebuilt in VMEM and the post-attention residual (+ pooled normed q,
    MViT.py residual_pooling) is added in-kernel — no head-major transposes
    or separate residual pass in HBM."""
    C = q_ref.shape[-1]
    D = C // heads
    R = r_ref.shape[-1] // heads
    q = q_ref[0]    # [TQ, C]
    k = k_ref[0]    # [Nk, C]
    v = v_ref[0]    # [Nk, C]
    r = r_ref[0]    # [TQ, heads*R]
    e = e_ref[:].astype(k.dtype)  # [Nk, R]
    for h in range(heads):
        qh = q[:, h * D:(h + 1) * D]
        qa = jnp.concatenate([qh * q.dtype.type(scale),
                              r[:, h * R:(h + 1) * R]], axis=-1)
        ka = jnp.concatenate([k[:, h * D:(h + 1) * D], e], axis=-1)
        scores = jax.lax.dot_general(
            qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        probs = _softmax(scores)
        vh = v[:, h * D:(h + 1) * D]
        out = jnp.dot(probs.astype(vh.dtype), vh,
                      preferred_element_type=jnp.float32).astype(out_ref.dtype)
        if residual:
            out = out + qh
        out_ref[0, :, h * D:(h + 1) * D] = out


def _rel_packed_tile(nq: int, nk: int, c: int, hr: int, itemsize: int) -> int:
    budget = _budget_bytes()
    pad = lambda d: -(-d // 128) * 128
    resident = nk * 2 * pad(c) * itemsize * 2 + nk * pad(hr) * itemsize * 2
    for t in (512, 256, 128):
        tiles = t * (2 * pad(c) + pad(hr)) * itemsize * 2  # q + out + rel, dbuf
        scores = t * pad(nk) * 12
        if resident + tiles + scores <= budget:
            return t
    return 128


def _rel_packed_fwd_impl(q, k, v, rel, e, heads, tq, interpret, scale,
                         residual):
    B, Nq, C = q.shape
    Nk = k.shape[1]
    HR = rel.shape[2]
    R = e.shape[1]
    assert Nq % tq == 0, (Nq, tq)
    return pl.pallas_call(
        functools.partial(_rel_packed_kernel, heads=heads, scale=scale,
                          residual=residual),
        grid=(B, Nq // tq),
        in_specs=[
            pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, HR), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nk, R), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nq, C), q.dtype),
        interpret=interpret,
    )(q, k, v, rel, e)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _attention_rel_packed(q, k, v, rel, e, heads, tq, interpret, scale,
                          residual):
    return _rel_packed_fwd_impl(q, k, v, rel, e, heads, tq, interpret, scale,
                                residual)


def _attention_rel_packed_fwd(q, k, v, rel, e, heads, tq, interpret, scale,
                              residual):
    return (_rel_packed_fwd_impl(q, k, v, rel, e, heads, tq, interpret,
                                 scale, residual), (q, k, v, rel, e))


def _attention_rel_packed_bwd(heads, tq, interpret, scale, residual, res, do):
    """Per-head layout conversion + the shared rel backward — the conversion
    copies exist on the (opt-in) training path only; inference keeps the
    packed layout end to end."""
    q, k, v, rel, e = res
    B, Nq, C = q.shape
    Nk = k.shape[1]
    D = C // heads
    R = rel.shape[2] // heads

    def to_heads(x, d):
        return x.reshape(B, -1, heads, d).transpose(0, 2, 1, 3)

    dqh, dkh, dvh, drh = _rel_bwd_dispatch(
        to_heads(q, D), to_heads(k, D), to_heads(v, D), to_heads(rel, R), e,
        to_heads(do, D), tq, interpret, scale)

    def to_packed(x, d):
        return x.transpose(0, 2, 1, 3).reshape(B, -1, heads * d)

    dq = to_packed(dqh, D)
    if residual:
        dq = dq + do
    return dq, to_packed(dkh, D), to_packed(dvh, D), to_packed(drh, R), \
        jnp.zeros_like(e)


_attention_rel_packed.defvjp(_attention_rel_packed_fwd,
                             _attention_rel_packed_bwd)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "residual", "interpret"))
def fused_attention_rel_packed(
    q: jnp.ndarray,    # [B, Nq, H*D] packed token-major, UNscaled (normed)
    k: jnp.ndarray,    # [B, Nk, H*D]
    v: jnp.ndarray,    # [B, Nk, H*D]
    rel: jnp.ndarray,  # [B, Nq, H*R] packed per-head rel projections
    e: jnp.ndarray,    # [Nk, R] static 0/1 expansion (shared across heads)
    *,
    heads: int,
    scale: float,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pooled cross attention with decomposed rel-pos bias on PACKED
    activations: consumes q/k/v exactly as the (fat depthwise) pools emit
    them and returns [B, Nq, H*D] exactly as the proj dense consumes it —
    no per-head transposes anywhere.  residual=True adds q in-kernel
    (MViT residual_pooling)."""
    B, Nq, C = q.shape
    TQ = _rel_packed_tile(Nq, k.shape[1], C, rel.shape[2], q.dtype.itemsize)
    pad = -Nq % TQ
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        rel = jnp.pad(rel, ((0, 0), (0, pad), (0, 0)))
    out = _attention_rel_packed(q, k, v, rel, e, heads, TQ, interpret,
                                float(scale), residual)
    return out[:, :Nq] if pad else out


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention_rel(
    q: jnp.ndarray,    # [B, H, Nq, D] — UNscaled
    k: jnp.ndarray,    # [B, H, Nk, D]
    v: jnp.ndarray,    # [B, H, Nk, Dv]
    rel: jnp.ndarray,  # [B, H, Nq, R] — per-query rel-pos projections
    e: jnp.ndarray,    # [Nk, R] static 0/1 expansion (key axis decomposition)
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(scale * q k^T + rel e^T) v with both contractions in-kernel —
    the rel-pos bias costs one narrow extra matmul per tile and no
    materialized augmented operands (see module comment)."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    da_eff = D + rel.shape[3]
    TQ = _tile(Nq, Nk, _BWD_SCORE_BYTES)
    budget = int(os.environ.get("MSPI_ATTN_VMEM_BUDGET", 8 * 1024 * 1024))
    vmem_capped = 256 * Nk * _BWD_SCORE_BYTES > budget
    if (TQ < 256 and Nq >= 256 and vmem_capped
            and not os.environ.get("MSPI_ATTN_TILE")):
        ext = int(os.environ.get("MSPI_ATTN_BWD_VMEM_EXT", _EXT_DEFAULT))
        if _bwd_vmem_bytes(256, Nk, da_eff, v.shape[3]) <= ext:
            TQ = 256
    pad = -Nq % TQ
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        rel = jnp.pad(rel, ((0, 0), (0, 0), (0, pad), (0, 0)))
    out = _attention_rel(q, k, v, rel, e, TQ, interpret, float(scale))
    return out[:, :, :Nq] if pad else out


# --------------------------------------------------------------------------
# packed self-attention (UniFormer stage-3/4 global MHSA, SyncBlock)
# --------------------------------------------------------------------------


def _self_fwd_kernel(q_ref, kv_ref, out_ref, *, heads, scale):
    """One (batch, q-tile) grid step over ALL heads: q [TQ, C] and kv
    [Nk, 2C] arrive in their natural lane layouts (no per-head transpose,
    no 128-lane padding of a 64-wide head dim); heads are static lane
    slices unrolled in-kernel."""
    C = out_ref.shape[-1]
    D = C // heads
    q = q_ref[0]    # [TQ, C]
    kv = kv_ref[0]  # [Nk, 2C]
    for h in range(heads):
        qh = q[:, h * D:(h + 1) * D] * q.dtype.type(scale)
        kh = kv[:, h * D:(h + 1) * D]
        vh = kv[:, C + h * D:C + (h + 1) * D]
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [TQ, Nk]
        probs = _softmax(scores)
        out = jnp.dot(probs.astype(vh.dtype), vh,
                      preferred_element_type=jnp.float32)
        out_ref[0, :, h * D:(h + 1) * D] = out.astype(out_ref.dtype)


def _self_fwd_impl(q, kv, heads, tq, interpret):
    B, Nq, C = q.shape
    Nk = kv.shape[1]
    D = C // heads
    scale = D ** -0.5
    assert Nq % tq == 0, (Nq, tq)
    return pl.pallas_call(
        functools.partial(_self_fwd_kernel, heads=heads, scale=scale),
        grid=(B, Nq // tq),
        in_specs=[
            pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            # kv block index depends on b only -> resident across q-tiles
            pl.BlockSpec((1, Nk, 2 * C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nq, C), q.dtype),
        interpret=interpret,
    )(q, kv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _self_attention(q, kv, heads, tq, interpret):
    return _self_fwd_impl(q, kv, heads, tq, interpret)


def _self_attention_fwd(q, kv, heads, tq, interpret):
    return _self_fwd_impl(q, kv, heads, tq, interpret), (q, kv)


def _self_attention_bwd(heads, tq, interpret, res, do):
    """Per-head layout conversion + the existing cross-shape backward (or
    its jnp fallback) — the conversion copies exist on the training path
    only; inference keeps the packed layout end to end."""
    q, kv = res
    B, Nq, C = q.shape
    Nk = kv.shape[1]
    D = C // heads
    scale = D ** -0.5
    qh = q.reshape(B, Nq, heads, D).transpose(0, 2, 1, 3) * scale
    kh = kv[:, :, :C].reshape(B, Nk, heads, D).transpose(0, 2, 1, 3)
    vh = kv[:, :, C:].reshape(B, Nk, heads, D).transpose(0, 2, 1, 3)
    doh = do.reshape(B, Nq, heads, D).transpose(0, 2, 1, 3)
    limit = int(os.environ.get("MSPI_ATTN_BWD_VMEM_LIMIT", 14 * 1024 * 1024))
    if _bwd_vmem_bytes(tq, Nk, D, D) > limit:
        _, vjp = jax.vjp(_jnp_reference, qh, kh, vh)
        dqh, dkh, dvh = vjp(doh)
    else:
        dqh, dkh, dvh = _bwd_impl(qh, kh, vh, doh, tq, interpret)
    dq = (dqh * scale).transpose(0, 2, 1, 3).reshape(B, Nq, C)
    dkv = jnp.concatenate([
        dkh.transpose(0, 2, 1, 3).reshape(B, Nk, C),
        dvh.transpose(0, 2, 1, 3).reshape(B, Nk, C),
    ], axis=-1)
    return dq, dkv


_self_attention.defvjp(_self_attention_fwd, _self_attention_bwd)


def _self_tile(nq: int, nk: int, c: int, itemsize: int) -> int:
    """Largest q-tile whose fp32 score block + packed tiles fit the budget
    alongside the resident kv block (and that the backward's per-head
    tiling also accepts — keep it a multiple of the bwd-safe tile)."""
    budget = _budget_bytes()
    resident = nk * -(-2 * c // 128) * 128 * itemsize * 2
    for t in (512, 256, 128):
        tiles = t * (-(-c // 128) * 128) * itemsize * 4  # q + out, dbuf
        scores = t * (-(-nk // 128) * 128) * 12
        if resident + tiles + scores <= budget:
            return t
    return 128


def _budget_bytes() -> int:
    return int(os.environ.get("MSPI_ATTN_VMEM_BUDGET", 12 * 1024 * 1024))


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_self_attention(
    q: jnp.ndarray,   # [B, Nq, C]  — head-major lanes (h, D), unscaled
    kv: jnp.ndarray,  # [B, Nk, 2C] — k then v, each head-major
    *,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v per head on packed activations: consumes
    q / kv exactly as a (split) qkv dense emits them and returns [B, Nq, C]
    exactly as the proj dense consumes it — no per-head slice/transpose
    copies and no lane padding of small head dims around the kernel."""
    B, Nq, C = q.shape
    TQ = _self_tile(Nq, kv.shape[1], C, q.dtype.itemsize)
    pad = -Nq % TQ
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    out = _self_attention(q, kv, num_heads, TQ, interpret)
    return out[:, :Nq] if pad else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jnp.ndarray,  # [B, H, Nq, Da] — scale (and any bias lanes) pre-applied
    k: jnp.ndarray,  # [B, H, Nk, Da]
    v: jnp.ndarray,  # [B, H, Nk, Dv]
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T) v with scores kept in VMEM.  Nq is padded to the tile
    size here (outside the custom_vjp, so padded rows carry zero cotangent
    and contribute nothing to dk/dv)."""
    B, H, Nq, _ = q.shape
    Nk = k.shape[2]
    TQ = _tile(Nq, Nk, _BWD_SCORE_BYTES)
    # Big-Nk blocks whose bwd runs under the extended Mosaic limit pick the
    # biggest q-tile the limit affords: the r4 sweep (tools/bench_attn_bwd)
    # measured tq=256 at 2-40x the forced-128 bwd at the MViT
    # stage-transition shapes (128 was an artifact of the old 8 MB budget).
    # (capped at 256: the forward grid runs multiples of the bwd tile, and
    # a 512 bwd tile would push the forward's fp32 score block past ITS
    # unraised VMEM budget)
    # Only bump when the 128 tile was actually VMEM-capped (big Nk) AND the
    # rows exist: when _tile returned <256 because Nq is small or merely not
    # 256-divisible, padding Nq up to 256 does up to 2x score work on zero
    # rows (advisor r4).
    budget = int(os.environ.get("MSPI_ATTN_VMEM_BUDGET", 8 * 1024 * 1024))
    vmem_capped = 256 * Nk * _BWD_SCORE_BYTES > budget
    if (TQ < 256 and Nq >= 256 and vmem_capped
            and not os.environ.get("MSPI_ATTN_TILE")):
        ext = int(os.environ.get("MSPI_ATTN_BWD_VMEM_EXT", _EXT_DEFAULT))
        if _bwd_vmem_bytes(256, Nk, q.shape[3], v.shape[3]) <= ext:
            TQ = 256
    pad = -Nq % TQ
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    out = _attention(q, k, v, TQ, interpret)
    return out[:, :, :Nq] if pad else out
