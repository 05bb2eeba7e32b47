"""Full-model parity: reference AudioVisualSaliencyModel (torch, S3D
backbone, random-init weights) vs mspi_tpu AudioVisualSaliencyModel with the
same weights pushed through the generic converter.

The reference's heavy deps (timm/fvcore) are stubbed; the timm ConvNeXt is
replaced on *both* sides by naming-compatible implementations (flax one in
mspi_tpu.models.convnext, torch replica in tests.torch_convnext_replica), so
this exercises every real component: S3D, audio ResNet18, ConvNeXt prior,
Adapter/Inception/SA, SyncBlock attention, SimSiam heads, FPN decoder,
readout, and the final log-density normalisation.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.config import get_config
from mspi_tpu.convert import convert_state_dict, merge_converted

from tests.reference_utils import install_reference_stubs, to_nthwc, to_nhwc

RES = (64, 96)  # small spatial size; all stride/shape logic identical to 224x384


def _install_model_stubs(monkeypatch):
    install_reference_stubs()
    from tests.torch_convnext_replica import ConvNeXtTinyFeaturesTorch

    # timm.models.create_model / vision_transformer
    timm = sys.modules["timm"]
    timm.models.create_model = lambda name, **kw: ConvNeXtTinyFeaturesTorch()
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.VisionTransformer = object
    sys.modules["timm.models.vision_transformer"] = vt
    timm.models.vision_transformer = vt
    # timm.utils.AverageMeter (utils.loss)
    tu = types.ModuleType("timm.utils")

    class AverageMeter:
        def __init__(self):
            self.val = 0.0

        def update(self, v, n=1):
            self.val = v

    tu.AverageMeter = AverageMeter
    sys.modules["timm.utils"] = tu
    timm.utils = tu

    # fvcore.nn
    fvcore = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")
    fvnn.FlopCountAnalysis = object
    fvnn.flop_count_table = lambda *a, **k: ""
    fvcore.nn = fvnn
    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.nn"] = fvnn

    # avoid importing every backbone: stub the factory with S3D only
    gvb = types.ModuleType("model.get_video_backbones")
    from backbones.s3d import S3D_features_only

    def video_motion_extractor(cfg):
        assert cfg.MODEL.MOTION_ENCODER == "s3d"
        return S3D_features_only(pool=cfg.MODEL.S3D.POOL_STRIDE)

    gvb.video_motion_extractor = video_motion_extractor
    sys.modules["model.get_video_backbones"] = gvb

    # neutralise weight loading (no released weights in this image)
    monkeypatch.setattr(torch, "load", lambda *a, **k: {})
    monkeypatch.setattr(torch.nn.Module, "load_state_dict",
                        lambda self, sd, strict=True: None)
    monkeypatch.setattr(S3D_features_only, "load_weight", lambda self, p: None)


def _ref_cfg():
    from easydict import EasyDict

    cfg = EasyDict()
    cfg.DATA = EasyDict()
    cfg.DATA.NUM_FRAMES = 16
    cfg.MODEL = EasyDict()
    cfg.MODEL.MOTION_ENCODER = "s3d"
    cfg.MODEL.MOTION_ENCODER_EMBEDS = {"s3d": (192, 480, 832, 1024)}
    cfg.MODEL.NUM_VIS_TOKENS = {"s3d": 4 * (RES[0] // 32) * (RES[1] // 32)}
    cfg.MODEL.LATERAL_BOOL = [True, True, False, False]
    cfg.MODEL.LATERAL_STRIDE = [2, 2, 2, 2]
    cfg.MODEL.MOTION_ENCODER_WEIGHT = "/nonexistent"
    cfg.MODEL.AUDIO_ENCODER_WEIGHT = "/nonexistent"
    cfg.MODEL.IMAGE_SALIENCY_ENCODER_WEIGHT = "/nonexistent"
    cfg.MODEL.S3D = EasyDict()
    cfg.MODEL.S3D.POOL_STRIDE = 1
    return cfg


@pytest.fixture(scope="module")
def models(module_monkeypatch, rng_module):
    _install_model_stubs(module_monkeypatch)
    from model.model_utils import AudioVisualSaliencyModel as RefModel

    torch.manual_seed(7)
    ref = RefModel(cfg=_ref_cfg())
    ref.eval()

    from mspi_tpu.models.fusion import AudioVisualSaliencyModel

    cfg = get_config("s3d", overrides={"data": {"resolution": RES}})
    ours = AudioVisualSaliencyModel(cfg=cfg)
    shapes = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, RES[0], RES[1], 3)),
            jnp.zeros((1, 257, 111, 1)),
        )
    )
    converted = convert_state_dict(ref.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted
    )
    return ref, ours, variables


@pytest.fixture(scope="module")
def module_monkeypatch():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(2023)


def test_full_model_parity(models, rng_module):
    ref, ours, variables = models
    rng = rng_module
    clips = rng.standard_normal((1, 3, 16, RES[0], RES[1])).astype(np.float32)
    audio = rng.standard_normal((1, 1, 257, 111)).astype(np.float32)

    with torch.no_grad():
        ref_out, ref_loss = ref(torch.tensor(clips), torch.tensor(audio))

    out, loss_av = ours.apply(
        variables, jnp.array(to_nthwc(clips)), jnp.array(to_nhwc(audio))
    )

    assert out.shape == (1, RES[0], RES[1])
    np.testing.assert_allclose(np.array(out), ref_out.numpy(), atol=5e-4, rtol=1e-3)
    assert abs(float(loss_av) - float(ref_loss)) < 1e-4
    # log-density: exp sums to 1
    np.testing.assert_allclose(float(jnp.sum(jnp.exp(out))), 1.0, atol=1e-4)


def test_full_model_parity_training_mode_bn(models, rng_module):
    """Train-mode forward: trainable BNs use batch stats, frozen encoders
    keep running stats (reference frozen_encoder(), engine_train.py:19-20)."""
    ref, ours, variables = models
    rng = rng_module
    clips = rng.standard_normal((2, 3, 16, RES[0], RES[1])).astype(np.float32)
    audio = rng.standard_normal((2, 1, 257, 111)).astype(np.float32)

    ref.train()
    ref.audnet.eval()
    ref.image_encoder.eval()
    with torch.no_grad():
        ref_out, _ = ref(torch.tensor(clips), torch.tensor(audio))
    ref.eval()

    (out, _), _ = ours.apply(
        variables, jnp.array(to_nthwc(clips)), jnp.array(to_nhwc(audio)),
        train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.array(out), ref_out.numpy(), atol=1e-3, rtol=1e-2)
