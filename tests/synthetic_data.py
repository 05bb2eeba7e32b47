"""Synthetic AVSP dataset tree builder shared by pipeline/CLI tests."""

import os
import wave

import numpy as np


def build_avsp_tree(root, datasets=(("AVAD", "v1"), ("DIEM", "d1")),
                    n_frames=40, fps=25.0, size=(48, 64), seed=0, sr=8000):
    rng = np.random.default_rng(seed)
    from PIL import Image
    import scipy.io

    for ds, video in datasets:
        frames_dir = os.path.join(root, "video_frames", ds, video)
        maps_dir = os.path.join(root, "annotations", ds, video, "maps")
        fix_dir = os.path.join(root, "annotations", ds, video)
        audio_dir = os.path.join(root, "video_audio", ds, video)
        for d in (frames_dir, maps_dir, audio_dir):
            os.makedirs(d, exist_ok=True)
        for i in range(1, n_frames + 1):
            img = (rng.random((*size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(frames_dir, f"img_{i:05d}.jpg"))
            gt = np.zeros(size, np.uint8)
            gt[size[0] // 4:size[0] // 2, size[1] // 3:size[1] // 2] = 200
            Image.fromarray(gt).save(os.path.join(maps_dir, f"eyeMap_{i:05d}.jpg"))
            fix = np.zeros(size, np.uint8)
            fix[size[0] // 3, size[1] // 3] = 1
            scipy.io.savemat(os.path.join(fix_dir, f"fixMap_{i:05d}.mat"),
                             {"eyeMap": fix})
        # audio long enough to cover every video window (duration = frames/fps)
        n_samples = max(16000, int(sr * (n_frames / fps + 1.0)))
        wav = (rng.standard_normal(n_samples) * 3000).astype(np.int16)
        with wave.open(os.path.join(audio_dir, f"{video}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(wav.tobytes())
    # fold lists grouped per dataset (multiple videos of one dataset get
    # one line each, not an overwrite)
    fold = os.path.join(root, "fold_lists")
    os.makedirs(fold, exist_ok=True)
    by_ds = {}
    for ds, video in datasets:
        by_ds.setdefault(ds, []).append(video)
    for ds, videos in by_ds.items():
        for mode in ("train", "test"):
            name = (f"DIEM_list_{mode}_fps.txt" if ds == "DIEM"
                    else f"{ds}_list_{mode}_1_fps.txt")
            with open(os.path.join(fold, name), "w") as f:
                for video in videos:
                    f.write(f"{video} {n_frames} {fps}\n")
    return root
