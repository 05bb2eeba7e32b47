"""Saliency training loss.

Reference: /root/reference/utils/loss.py:26-49 — SalLoss computes
KLD(exp(pred), gt) - CC(exp(pred), gt), optionally - 0.1*NSS when fixations
are provided (the reference never passes fixations during training).

Pure function — the component metrics come back in an aux dict instead of
being mutated into an AverageMeter, so the whole thing lives inside the
jitted train step and the meters are updated host-side from device scalars.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from mspi_tpu.train.metrics import cc, kldiv, nss, similarity


def sal_loss(
    log_pred: jnp.ndarray,
    targets: jnp.ndarray,
    fixations: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """log_pred: [B,H,W] log-probability map (model output); targets: [B,H,W].

    Returns (loss, aux) with aux = {kl, cc, sim[, nss]}.
    """
    pred = jnp.exp(log_pred)
    kl_loss = kldiv(pred, targets)
    cc_loss = cc(pred, targets)
    sim_loss = similarity(pred, targets)
    aux = {"kl": kl_loss, "cc": cc_loss, "sim": sim_loss}
    if fixations is None:
        loss = kl_loss - cc_loss
    else:
        nss_loss = nss(pred, fixations)
        aux["nss"] = nss_loss
        loss = kl_loss - cc_loss - 0.1 * nss_loss
    aux["loss"] = loss
    return loss, aux
