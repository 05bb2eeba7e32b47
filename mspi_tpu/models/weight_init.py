"""Weight initialisation helpers for from-scratch classifier training.

Reference: SlowFast/slowfast/utils/weight_init_helper.py — kaiming conv
init, BN (1, 0), and ZERO_INIT_FINAL_BN: the gamma of the last BN in each
residual branch starts at zero so every block begins as identity
(RESNET.ZERO_INIT_FINAL_BN in the SlowFast/X3D YAMLs).

The layer factories already give torch-default kaiming init; this module
adds the post-init transform zeroing the `transform_final_bn` scales (the
c_bn of bottleneck/x3d transforms, b_bn of basic transforms).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

def zero_init_final_bn(params: Dict[str, Any]) -> Dict[str, Any]:
    """Zero the scale of each residual branch's final BN (params tree of a
    ResStage-based backbone/classifier).  The final BN is c_bn for
    bottleneck/x3d transforms, b_bn for basic transforms (the reference tags
    these modules with transform_final_bn)."""

    def zero_scale(bn):
        if isinstance(bn, dict) and "scale" in bn:
            return {**bn, "scale": np.zeros_like(np.asarray(bn["scale"]))}
        return bn

    def visit(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k == "branch2":
                    final = "c_bn" if "c_bn" in v else ("b_bn" if "b_bn" in v else None)
                    if final:
                        v = {**v, final: zero_scale(v[final])}
                out[k] = visit(v)
            else:
                out[k] = v
        return out

    return visit(params)
