"""North-star artifact: CC between this framework's inference.py saliency
maps and the ACTUAL torch reference pipeline's maps (BASELINE.json demands
>= 0.999 CC agreement).

Runs both production pipelines end-to-end over a synthetic AVAD tree:

  1. build a synthetic AVAD dataset (31 frames, 16 kHz wav so the
     reference's Resample is the identity and both pipelines see the same
     samples);
  2. construct the reference AudioVisualSaliencyModel
     (/root/reference/model/model_utils.py, S3D backbone, seeded random
     init — no released weights ship in this image) and drive the
     reference's own `inference_dataset` (/root/reference/inference.py:94)
     on torch CPU, with its unavailable deps (torchaudio/torchvision/timm/
     tqdm) stubbed to exact-semantics equivalents and `.to("cuda")`
     redirected to cpu;
  3. torch.save the state_dict and run OUR inference.py CLI on it (the
     torch->flax converter handles the load), producing PNGs through the
     batched sliding-window path;
  4. compute per-frame Pearson CC between the two uint8 map sets and write
     docs/NORTHSTAR_CC.json.

Usage: python tools/northstar_cc.py [--workdir /tmp/northstar] [--frames 31]
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import shutil
import subprocess
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RES = (224, 384)


def _ref_cfg(backbone: str = "s3d"):
    from easydict import EasyDict

    cfg = EasyDict()
    cfg.DATA = EasyDict()
    cfg.DATA.NUM_FRAMES = 16
    cfg.MODEL = EasyDict()
    cfg.MODEL.MOTION_ENCODER = backbone
    # per-backbone facts replayed from /root/reference/config.py:39-75
    cfg.MODEL.MOTION_ENCODER_EMBEDS = {"s3d": (192, 480, 832, 1024),
                                       "mvitv2s": (96, 192, 384, 768)}
    cfg.MODEL.NUM_VIS_TOKENS = {
        "s3d": 4 * (RES[0] // 32) * (RES[1] // 32),
        "mvitv2s": 8 * (RES[0] // 32) * (RES[1] // 32)}
    cfg.MODEL.LATERAL_BOOL = ([True, True, True, True] if backbone == "mvitv2s"
                              else [True, True, False, False])
    cfg.MODEL.LATERAL_STRIDE = [2, 2, 2, 2]
    cfg.MODEL.MOTION_ENCODER_WEIGHT = "/nonexistent"
    cfg.MODEL.AUDIO_ENCODER_WEIGHT = "/nonexistent"
    cfg.MODEL.IMAGE_SALIENCY_ENCODER_WEIGHT = "/nonexistent"
    cfg.MODEL.S3D = EasyDict()
    cfg.MODEL.S3D.POOL_STRIDE = 1
    cfg.MODEL.MVIT2 = EasyDict()
    cfg.MODEL.MVIT2.PATH_CFG = ["/root/reference/configs/MVITv2_S_16x4.yaml"]
    return cfg


def _install_stubs(backbone: str = "s3d"):
    import torch

    from tests.reference_utils import install_reference_stubs

    install_reference_stubs()
    from tests.torch_convnext_replica import ConvNeXtTinyFeaturesTorch

    timm = sys.modules["timm"]
    timm.models.create_model = lambda name, **kw: ConvNeXtTinyFeaturesTorch()
    tu = types.ModuleType("timm.utils")

    class AverageMeter:
        def __init__(self):
            self.val = 0.0

        def update(self, v, n=1):
            self.val = v

    tu.AverageMeter = AverageMeter
    sys.modules["timm.utils"] = tu
    timm.utils = tu
    # timm.data.constants (reference inference.py:8)
    td = types.ModuleType("timm.data")
    tdc = types.ModuleType("timm.data.constants")
    tdc.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    tdc.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    td.constants = tdc
    sys.modules["timm.data"] = td
    sys.modules["timm.data.constants"] = tdc
    timm.data = td

    # torchvision.transforms: the exact PIL-backend semantics of
    # Resize/ToTensor/Normalize used by torch_transform (inference.py:154)
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size):
            self.size = size  # (h, w)

        def __call__(self, img):
            return img.resize(self.size[::-1], Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.uint8).astype(np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    tr.Compose, tr.Resize, tr.ToTensor, tr.Normalize = (
        Compose, Resize, ToTensor, Normalize)
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr

    # torchaudio: load (wave), Resample (identity at equal rates),
    # Spectrogram (torch.stft power — torchaudio defaults: hann, center,
    # reflect, power=2) — semantics parity-tested in tests/test_audio_pipeline
    import wave as wave_mod

    ta = types.ModuleType("torchaudio")
    tat = types.ModuleType("torchaudio.transforms")

    def ta_load(path):
        with wave_mod.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            data = np.frombuffer(w.readframes(n), np.int16)
        data = data.reshape(-1, ch).T.astype(np.float32) / 32768.0
        return torch.from_numpy(data.copy()), sr

    class Resample:
        def __init__(self, orig_freq, new_freq):
            assert orig_freq == new_freq, (
                "northstar tool writes 16 kHz wavs; non-identity resample "
                "would need torchaudio's sinc kernel")

        def __call__(self, x):
            return x

    class Spectrogram:
        def __init__(self, n_fft=512, hop_length=160):
            self.n_fft, self.hop = n_fft, hop_length

        def __call__(self, x):
            spec = torch.stft(x, self.n_fft, self.hop, self.n_fft,
                              torch.hann_window(self.n_fft), center=True,
                              pad_mode="reflect", normalized=False,
                              onesided=True, return_complex=True)
            return spec.abs() ** 2

    ta.load = ta_load
    tat.Resample, tat.Spectrogram = Resample, Spectrogram
    ta.transforms = tat
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tat

    # tqdm
    tq = types.ModuleType("tqdm")
    tq.tqdm = lambda it, *a, **k: it
    sys.modules["tqdm"] = tq

    # reference `from config import cfg` -> our S3D cfg (the real reference
    # config selects mvitv2s and hard-codes weight paths)
    cfg_mod = types.ModuleType("config")
    cfg_mod.cfg = _ref_cfg(backbone)
    sys.modules["config"] = cfg_mod

    # backbone factory: S3D + the flagship MViT (avoids importing the rest
    # of the zoo)
    gvb = types.ModuleType("model.get_video_backbones")
    from backbones.s3d import S3D_features_only

    def video_motion_extractor(cfg):
        if cfg.MODEL.MOTION_ENCODER == "mvitv2s":
            from backbones.MViT import MViT

            return MViT(path_to_configs=cfg.MODEL.MVIT2.PATH_CFG)
        assert cfg.MODEL.MOTION_ENCODER == "s3d"
        return S3D_features_only(pool=cfg.MODEL.S3D.POOL_STRIDE)

    gvb.video_motion_extractor = video_motion_extractor
    sys.modules["model.get_video_backbones"] = gvb

    # neutralise weight loading (no released weights in this image).  The
    # stub dict answers the checkpoint-format keys the zoo loaders index
    # ('model_state' at MViT.py:2079, 'state_dict') with empty dicts, and
    # load_state_dict is a no-op, so every backbone keeps its seeded init.
    torch.load = lambda *a, **k: {"model_state": {}, "state_dict": {}}
    torch.nn.Module.load_state_dict = lambda self, sd, strict=True: None
    S3D_features_only.load_weight = lambda self, p: None

    # `.to(device="cuda")` at reference inference.py:132 -> cpu
    orig_to = torch.Tensor.to

    def to_cpu(self, *a, **k):
        if k.get("device") == "cuda":
            k = dict(k, device="cpu")
        a = tuple(
            "cpu" if (isinstance(x, str) and x.startswith("cuda")) or
            (isinstance(x, torch.device) and x.type == "cuda") else x
            for x in a)
        return orig_to(self, *a, **k)

    torch.Tensor.to = to_cpu


def _load_ref_inference():
    spec = importlib.util.spec_from_file_location(
        "ref_inference", "/root/reference/inference.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cc(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64).ravel()
    b = b.astype(np.float64).ravel()
    a = (a - a.mean()) / (a.std() + 1e-12)
    b = (b - b.mean()) / (b.std() + 1e-12)
    return float(np.mean(a * b))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/northstar")
    ap.add_argument("--frames", type=int, default=31)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--backbone", default="s3d", choices=["s3d", "mvitv2s"],
                    help="s3d = fast check; mvitv2s = the flagship kernel "
                         "stack end-to-end (longer torch-CPU + compile time)")
    args = ap.parse_args()

    work = args.workdir
    if os.path.exists(work):
        shutil.rmtree(work)
    data_root = os.path.join(work, "data")
    ref_out = os.path.join(work, "ref_maps")
    our_out = os.path.join(work, "our_maps")
    weights = os.path.join(work, "ref_weights.pt")
    os.makedirs(work, exist_ok=True)

    sys.path.insert(0, os.path.join(REPO))
    from tests.synthetic_data import build_avsp_tree

    build_avsp_tree(data_root, datasets=(("AVAD", "v1"),),
                    n_frames=args.frames, fps=25.0, size=(240, 320), seed=3,
                    sr=16000)

    import torch

    _install_stubs(args.backbone)
    ref_mod = _load_ref_inference()

    torch.manual_seed(7)
    ref_model = ref_mod.SalModel(cfg=_ref_cfg(args.backbone))
    ref_model.eval()
    torch.save(ref_model.state_dict(), weights)

    print("== reference pipeline (torch CPU) ==", flush=True)
    ref_args = argparse.Namespace(
        weight=weights, save_path=ref_out, split=1, path_data=data_root,
        dataset="AVAD", clip_size=16, use_sound=True)
    os.makedirs(ref_out, exist_ok=True)
    with torch.no_grad():
        ref_mod.inference_dataset(ref_model, ref_args)

    print("== mspi_tpu pipeline (inference.py) ==", flush=True)
    env = dict(os.environ)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--weight", weights, "--save_path", our_out, "--split", "1",
         "--path_data", data_root, "--dataset", "AVAD",
         "--motion_encoder", args.backbone],
        check=True, cwd=REPO, env=env)

    from PIL import Image

    ccs = {}
    for ref_png in sorted(glob.glob(os.path.join(ref_out, "v1", "*.jpg")) +
                          glob.glob(os.path.join(ref_out, "v1", "*.png"))):
        name = os.path.basename(ref_png)
        ours = os.path.join(our_out, "v1", name)
        if not os.path.exists(ours):
            base = os.path.splitext(name)[0]
            cands = glob.glob(os.path.join(our_out, "v1", base + ".*"))
            if not cands:
                print(f"MISSING our map for {name}")
                continue
            ours = cands[0]
        a = np.asarray(Image.open(ref_png).convert("L"))
        b = np.asarray(Image.open(ours).convert("L"))
        ccs[name] = _cc(a, b)

    assert ccs, "no map pairs compared"
    vals = np.array(list(ccs.values()))
    result = {
        "metric": "CC vs torch reference saliency maps (production "
                  f"inference.py pipelines, {args.backbone} backbone, seeded "
                  "random weights, synthetic AVAD)",
        "n_maps": len(ccs),
        "cc_mean": float(vals.mean()),
        "cc_min": float(vals.min()),
        "target": ">=0.999 (BASELINE.json north_star)",
    }
    # per-backbone entries: the s3d artifact is the fast check, mvitv2s
    # certifies the flagship kernel stack end-to-end (VERDICT r3 item 5)
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    path = os.path.join(REPO, "docs", "NORTHSTAR_CC.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    if "entries" not in data:
        data = {"entries": ({"s3d": data} if data else {})}
    data["entries"][args.backbone] = result
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
