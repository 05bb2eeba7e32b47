"""RandAugment / color jitter (jnp, device-fused) + ShortCycleBatchSampler."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.data.rand_augment import (autocontrast, brightness,
                                        color_jitter_batch, contrast, equalize,
                                        invert, lighting_batch, posterize,
                                        rand_augment_batch, rotate, saturation,
                                        sharpness, shear_x, solarize,
                                        translate_y)
from mspi_tpu.train.multigrid import short_cycle_batches


def _clip(rng, T=2, H=16, W=16):
    return jnp.asarray(rng.random((T, H, W, 3)).astype(np.float32))


def test_each_op_preserves_shape_and_range(rng):
    clip = _clip(rng)
    for fn, arg in [(rotate, 15.0), (shear_x, 0.2), (translate_y, 0.2),
                    (brightness, 1.4), (contrast, 0.6), (saturation, 1.5),
                    (posterize, 4.0), (solarize, 0.5), (invert, None),
                    (autocontrast, None), (equalize, None), (sharpness, 1.8)]:
        out = fn(clip, arg)
        assert out.shape == clip.shape, fn.__name__
        o = np.asarray(out)
        assert np.all(o >= -1e-5) and np.all(o <= 1 + 1e-5), fn.__name__
        assert np.isfinite(o).all(), fn.__name__


def test_rotate_identity_and_translate():
    clip = jnp.zeros((1, 8, 8, 3)).at[:, 2, 3].set(1.0)
    np.testing.assert_allclose(np.asarray(rotate(clip, 0.0)),
                               np.asarray(clip), atol=1e-6)
    # translate by exactly 2 px right: inverse map pulls from x-2
    shifted = translate_y(clip, 0.0)
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(clip), atol=1e-6)


def test_rand_augment_batch_deterministic_and_varied(rng):
    clips = jnp.asarray(rng.random((3, 2, 16, 16, 3)).astype(np.float32))
    k = jax.random.PRNGKey(7)
    a = rand_augment_batch(k, clips, num_layers=2, magnitude=9)
    b = rand_augment_batch(k, clips, num_layers=2, magnitude=9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == clips.shape
    assert np.isfinite(np.asarray(a)).all()
    # different key -> (almost surely) different augmentation
    c = rand_augment_batch(jax.random.PRNGKey(8), clips, num_layers=2,
                           magnitude=9)
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # per-sample randomness: the three clips get different ops
    d = np.asarray(a) - np.asarray(clips)
    assert not np.allclose(d[0], d[1])


def test_color_jitter_and_lighting(rng):
    clips = jnp.asarray(rng.random((2, 2, 8, 8, 3)).astype(np.float32))
    out = color_jitter_batch(jax.random.PRNGKey(0), clips)
    assert out.shape == clips.shape
    assert not np.allclose(np.asarray(out), np.asarray(clips))
    eigval = [0.225, 0.224, 0.229]
    eigvec = np.eye(3).tolist()
    lit = lighting_batch(jax.random.PRNGKey(1), clips, eigval, eigvec)
    assert lit.shape == clips.shape
    assert np.all(np.asarray(lit) >= 0) and np.all(np.asarray(lit) <= 1)


def test_short_cycle_batches():
    batches = list(short_cycle_batches(100, base_batch=4, base_crop=224,
                                       shuffle=False))
    # crop cycle 112/152/224 with batch sizes 16/8/4 (within rounding)
    crops = [c for _, c in batches[:3]]
    sizes = [len(i) for i, _ in batches[:3]]
    assert crops == [112, 152, 224]
    assert sizes[0] > sizes[1] > sizes[2] == 4
    assert sizes[0] == int(round(4 * (224 / 112) ** 2))
    # all indices unique across batches
    seen = np.concatenate([i for i, _ in batches])
    assert len(seen) == len(set(seen.tolist()))
