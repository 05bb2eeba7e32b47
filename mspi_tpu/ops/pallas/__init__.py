import os


def pallas_enabled() -> bool:
    """Use Pallas kernels on TPU unless explicitly disabled.
    MSPI_PALLAS_INTERPRET=1 forces them ON anywhere, in interpret mode —
    lets CPU tests drive the real integration path (gating, augmentation,
    custom_vjp) end to end."""
    if os.environ.get("MSPI_DISABLE_PALLAS"):
        return False
    if os.environ.get("MSPI_PALLAS_INTERPRET"):
        return True
    import jax

    return jax.default_backend() in ("tpu", "axon")


def pallas_interpret() -> bool:
    return bool(os.environ.get("MSPI_PALLAS_INTERPRET"))


def mlp_hybrid_enabled() -> bool:
    """Hybrid fused-fwd/XLA-bwd routing for big-C LN+MLP blocks in TRAINING
    (MViT/Swin stage-4 768x3072, SyncBlock 512x2048 — fits_vmem_fwd but not
    fits_vmem).  Default OFF: the r4 flagship A/B measured 29.30 vs 29.74
    clips/s control (batch 2 bf16, overlapping spreads) — the big-C blocks
    sit at small N (stage-4 672 tokens, SyncBlock 372), so the fused fwd's
    saved hidden round-trips don't cover the bwd's z/u/h recompute.  Kept
    as an opt-in (MSPI_MLP_HYBRID=1): it also shrinks saved activations to
    x, which matters under remat/batch-8 memory pressure."""
    return os.environ.get("MSPI_MLP_HYBRID", "0") == "1"


def quant_int8_enabled() -> bool:
    """Int8 inference mode (MSPI_QUANT=int8): transformer matmuls with
    C >= 256 run int8 weights x dynamically-quantized int8 activations on
    the MXU (v5e int8 peak = 2x bf16; measured 1.8x at the MViT stage-3/4
    MLP shapes, tools/bench_int8.py).  Inference-only — call sites gate on
    their train/deterministic flag; params stay fp32/bf16 and are quantized
    per-output-channel at trace time, so checkpoints and the converter are
    untouched."""
    return os.environ.get("MSPI_QUANT", "") == "int8" and pallas_enabled()
