"""Hand-rolled TensorBoard event writer: files must be readable by the real
TensorBoard reader installed in this image (the 'tensorboard --inspect'
acceptance bar from VERDICT.md item 7)."""

import glob

import numpy as np
import pytest

from mspi_tpu.utils.tensorboard import SummaryWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes([0] * 32)) == 0x8A9136AA


def test_events_readable_by_tensorboard(tmp_path):
    ef = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, step=1)
    w.add_scalars({"lr": 1e-4, "top1": 0.8}, step=2)
    w.add_histogram("weights/w1", np.random.RandomState(0).randn(1000), step=3)
    w.add_confusion_matrix("val/cm", np.eye(4) * 10, step=4)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    loader = ef.EventFileLoader(files[0])
    events = list(loader.Load())
    assert events[0].file_version == "brain.Event:2"

    # TensorBoard's loader migrates legacy summaries to generic-data tensor
    # form (data_compat): scalars -> DT_FLOAT scalar tensor, histograms ->
    # [bins, 3] (left, right, count), images -> DT_STRING [w, h, png].
    scalars = {}
    histos = {}
    images = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            if v.HasField("simple_value"):
                scalars[(v.tag, ev.step)] = v.simple_value
            elif v.HasField("histo"):
                histos[(v.tag, ev.step)] = v.histo
            elif v.HasField("image"):
                images[(v.tag, ev.step)] = v.image
            elif v.HasField("tensor"):
                t = v.tensor
                shape = [d.size for d in t.tensor_shape.dim]
                if not shape and t.float_val:
                    scalars[(v.tag, ev.step)] = t.float_val[0]
                elif len(shape) == 2 and shape[1] == 3:
                    buckets = np.frombuffer(
                        t.tensor_content,
                        dtype=np.float64 if t.dtype == 2 else np.float32
                    ).reshape(shape)
                    histos[(v.tag, ev.step)] = buckets
                elif t.string_val:
                    images[(v.tag, ev.step)] = list(t.string_val)
    assert abs(scalars[("loss", 1)] - 0.5) < 1e-6
    assert abs(scalars[("lr", 2)] - 1e-4) < 1e-9
    assert abs(scalars[("top1", 2)] - 0.8) < 1e-6
    h = histos[("weights/w1", 3)]
    assert h.shape == (30, 3)
    assert abs(h[:, 2].sum() - 1000) < 1e-4  # counts
    w_, h_, png = images[("val/cm", 4)]
    # matplotlib figure when available (reference tensorboard_vis.py:165-230
    # draws one), else the 4x4-cells x 16-px fallback heatmap
    assert int(w_) >= 64 and int(h_) >= 64
    assert png.startswith(b"\x89PNG")


def test_confusion_matrix_figure(tmp_path):
    from mspi_tpu.utils.tensorboard import _render_confusion_matrix
    from mspi_tpu.utils.visualization import ScalarWriter

    img = _render_confusion_matrix(np.eye(4) * 10, ["a", "b", "c", "d"])
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    sw = ScalarWriter(str(tmp_path))
    cm = sw.plot_confusion_matrix(np.array([0, 1, 2, 2]),
                                  np.array([0, 1, 2, 1]), 3, global_step=7)
    assert cm[1, 2] == 1 and cm.sum() == 4
    assert (tmp_path / "confusion_7.npy").exists()
    assert (tmp_path / "confusion_7.png").exists()


def test_weight_histograms(tmp_path):
    ef = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    w = SummaryWriter(str(tmp_path))
    params = {"layer1": {"kernel": np.ones((4, 4)), "bias": np.zeros(4)}}
    w.add_weight_histograms(params, step=0)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    tags = set()
    for ev in ef.EventFileLoader(files[0]).Load():
        for v in ev.summary.value:
            tags.add(v.tag)
    assert "weights/layer1/kernel" in tags and "weights/layer1/bias" in tags
