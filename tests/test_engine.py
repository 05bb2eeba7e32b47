"""Training engine tests: step-LR schedule; one full jitted train step
(fwd+bwd+AdamW) that reduces the loss and leaves frozen encoders untouched;
and the driver's multi-chip dryrun (DPxTP-sharded full train step) on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspi_tpu.config import get_config
from mspi_tpu.models.fusion import AudioVisualSaliencyModel
from mspi_tpu.train.engine import (FROZEN_TOPLEVEL, create_train_state,
                                   make_eval_step, make_optimizer,
                                   make_train_step, step_lr_schedule)

RES = (64, 96)


def test_step_lr_schedule():
    lrs = step_lr_schedule(1e-4, 120)
    assert len(lrs) == 120
    assert lrs[0] == lrs[59] == 1e-4
    assert abs(lrs[60] - 1e-5) < 1e-12
    assert abs(lrs[119] - 1e-5) < 1e-12  # x0.1 again only after 60 more epochs
    lrs_long = step_lr_schedule(1e-4, 180)
    assert abs(lrs_long[125] - 1e-6) < 1e-12


def test_train_step_updates_and_freezes():
    cfg = get_config("s3d", overrides={"data": {"resolution": RES}})
    model = AudioVisualSaliencyModel(cfg=cfg)
    rng = np.random.default_rng(0)
    batch = {
        "clips": jnp.asarray(rng.standard_normal((2, 16, *RES, 3)).astype(np.float32)),
        "audio": jnp.asarray(rng.standard_normal((2, 257, 111, 1)).astype(np.float32)),
        "gt": jnp.asarray(rng.random((2, *RES)).astype(np.float32) + 1e-3),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch["clips"][:1], batch["audio"][:1])
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    assert set(state.frozen.keys()) == set(FROZEN_TOPLEVEL)

    train_step = make_train_step(model, tx, gamma=1.0, donate=False)
    losses = []
    for _ in range(3):
        state, metrics = train_step(state, batch, 1e-4)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    # same batch re-fed: the optimizer should be reducing the loss
    assert losses[-1] < losses[0]
    # frozen encoders bit-identical
    for k in FROZEN_TOPLEVEL:
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.array(a), np.array(b)),
            variables["params"][k], state.frozen[k])

    # eval step on the trained state
    eval_step = make_eval_step(model)
    out, aux = eval_step(state, batch)
    assert out.shape == (2, *RES)
    for key in ("kl", "cc", "sim", "loss"):
        assert np.isfinite(float(aux[key]))


def test_graft_entry_dryrun_multichip():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_driver_invocation():
    """The driver's EXACT invocation shape: a fresh subprocess (no conftest
    env), pinned to one core like this 1-CPU image.  ~9 min cold / ~2 min
    with a warm /tmp compile cache, so gated behind MSPI_RUN_DRIVER_CHECK=1
    (run manually; see ROUND2_NOTES.md)."""
    import os
    import subprocess
    import sys

    if not os.environ.get("MSPI_RUN_DRIVER_CHECK"):
        import pytest

        pytest.skip("set MSPI_RUN_DRIVER_CHECK=1 to run the subprocess check")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        ["taskset", "-c", "0", sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "dryrun_multichip ok" in out.stdout
