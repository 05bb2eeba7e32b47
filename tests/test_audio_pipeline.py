"""Audio pipeline parity: our numpy/jnp STFT vs torch.stft with torchaudio
Spectrogram conventions, plus the full standardise/pad recipe and WAV IO."""

import os

import jax.numpy as jnp
import numpy as np
import torch

from mspi_tpu.data import audio as A


def torch_spectrogram(x: np.ndarray, n_fft=512, hop=160) -> np.ndarray:
    """torchaudio.transforms.Spectrogram defaults via torch.stft."""
    spec = torch.stft(
        torch.tensor(x), n_fft=n_fft, hop_length=hop, win_length=n_fft,
        window=torch.hann_window(n_fft), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    return (spec.abs() ** 2).numpy()


def test_stft_power_matches_torch(rng):
    x = rng.standard_normal(9066).astype(np.float32)
    ours = A.stft_power(x)
    ref = torch_spectrogram(x)
    assert ours.shape == ref.shape == (257, 1 + 9066 // 160)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def test_spectrogram_jax_matches_numpy(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    np.testing.assert_allclose(np.array(A.spectrogram_jax(jnp.array(x))),
                               A.stft_power(x), atol=1e-2, rtol=1e-4)


def test_full_recipe_matches_torch_reference(rng):
    """End-to-end get_audio_spectrogram vs a torch re-implementation of
    avsp_dataloader.py:51-80."""
    sr = 16000
    fps = 30.0
    wav = (rng.standard_normal(sr * 3) * 0.1).astype(np.float32)
    start_idx = 7

    # torch reference path
    start = int(np.round((start_idx / fps) * sr))
    end = int(np.round(((start_idx + 16 + 1) / fps) * sr))
    clip = torch.tensor(wav[start:end])
    spec = torch.stft(clip, 512, 160, 512, torch.hann_window(512), center=True,
                      pad_mode="reflect", normalized=False, onesided=True,
                      return_complex=True).abs() ** 2
    aud = torch.log(spec + 1e-6)[None]
    means = aud.mean(dim=1, keepdim=True)
    stds = aud.std(dim=1, keepdim=True)
    aud = (aud - means) / (stds + 1e-6)
    tmp = torch.zeros(1, 257, 111) + 0.02
    if aud.shape[-1] <= 111:
        tmp[:, :, : aud.shape[-1]] = aud
        ref = tmp[0].numpy()
    else:
        ref = aud[0, :, :111].numpy()

    ours = A.get_audio_spectrogram(None, start_idx, fps, len_snippet=16,
                                   audio_cache=wav)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_missing_audio_constant():
    out = A.get_audio_spectrogram("/nonexistent.wav", 0, 30.0)
    assert out.shape == (257, 111)
    np.testing.assert_allclose(out, 0.02)


def test_wav_roundtrip(tmp_path, rng):
    import wave as wave_mod

    sr = 22050
    x = (rng.standard_normal(sr) * 0.2 * 32767).astype(np.int16)
    stereo = np.stack([x, x], axis=1)
    path = str(tmp_path / "t.wav")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(stereo.tobytes())

    data, got_sr = A.load_wav(path)
    assert got_sr == sr and data.shape == (2, sr)
    np.testing.assert_allclose(data[0], x.astype(np.float32) / 32768.0, atol=1e-6)

    mono16k = A.load_audio_mono_16k(path)
    assert abs(len(mono16k) - 16000) < 10
