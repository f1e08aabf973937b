"""On-device color augmentation (the HIAST 'CCA' strong view).

The reference builds the strong view on the host with albumentations'
``SomeOf(3 of 8)`` color transforms inside DataLoader workers (reference:
code/sseg/datasets/augmentations.py:73-89,106-134) — a CPU bottleneck the
TPU design moves on device: every transform below is a pure jnp function of
``(img, rng)`` running inside the jit'd train step, vmapped over the batch.

Transform pool (albumentations defaults, reference augmentations.py:75-82):
ColorJitter(0.2), GaussianBlur(3..41), RandomContrast(0..3),
RandomBrightness(+-0.5), Posterize(4 bits), Equalize, Solarize(128), ToGray.

Selection: exactly 3 of 8 chosen uniformly without replacement, each applied
with p=0.5.  Deviation from the reference (documented, distribution-level
parity per SURVEY §7): transforms apply in fixed pool order rather than the
sampled order, so the whole batch is one static XLA program.

Images are float32 in [0, 255] (RGB), shape [H, W, 3]; batch via vmap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MAX_BLUR = 41  # albumentations blur_limit upper bound


def _clip(img):
    return jnp.clip(img, 0.0, 255.0)


def _gray(img):
    # ITU-R BT.601 luma (what OpenCV's cvtColor uses)
    return img @ jnp.asarray([0.299, 0.587, 0.114], img.dtype)


# -- individual transforms ---------------------------------------------------
def color_jitter(img, rng):
    kb, kc, ks, kh = jax.random.split(rng, 4)
    b = jax.random.uniform(kb, (), minval=0.8, maxval=1.2)
    c = jax.random.uniform(kc, (), minval=0.8, maxval=1.2)
    s = jax.random.uniform(ks, (), minval=0.8, maxval=1.2)
    h = jax.random.uniform(kh, (), minval=-0.2, maxval=0.2)
    img = _clip(img * b)  # brightness
    mean = jnp.mean(_gray(img))
    img = _clip(mean + c * (img - mean))  # contrast
    g = _gray(img)[..., None]
    img = _clip(g + s * (img - g))  # saturation
    # hue: rotate channels in YIQ space (cheap exact hue rotation)
    theta = h * jnp.pi
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    t_yiq = jnp.asarray(
        [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]], img.dtype
    )
    t_rgb = jnp.asarray(
        [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]], img.dtype
    )
    rot = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], img.dtype
    )
    rot = rot.at[1, 1].set(cos_t).at[1, 2].set(-sin_t).at[2, 1].set(sin_t).at[2, 2].set(cos_t)
    return _clip(img @ (t_rgb @ rot @ t_yiq).T)


def gaussian_blur(img, rng):
    """Separable blur; odd kernel size sampled in [3, 41], cv2 default sigma."""
    ksize = 3 + 2 * jax.random.randint(rng, (), 0, (_MAX_BLUR - 3) // 2 + 1)
    sigma = 0.3 * ((ksize.astype(jnp.float32) - 1.0) * 0.5 - 1.0) + 0.8
    half = (_MAX_BLUR - 1) // 2
    pos = jnp.arange(-half, half + 1, dtype=jnp.float32)
    active = jnp.abs(pos) <= (ksize - 1) / 2
    w = jnp.where(active, jnp.exp(-0.5 * (pos / sigma) ** 2), 0.0)
    w = w / jnp.sum(w)
    # two 1-D convs over H then W (feature-wise), SAME padding
    x = jnp.moveaxis(img, -1, 0)[:, None]  # [3, 1, H, W]
    kh = w.reshape(1, 1, _MAX_BLUR, 1)
    kw = w.reshape(1, 1, 1, _MAX_BLUR)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME")
    return jnp.moveaxis(x[:, 0], 0, -1)


def random_contrast(img, rng):
    alpha = 1.0 + jax.random.uniform(rng, (), minval=0.0, maxval=3.0)
    mean = jnp.mean(_gray(img))
    return _clip(mean + alpha * (img - mean))


def random_brightness(img, rng):
    beta = jax.random.uniform(rng, (), minval=-0.5, maxval=0.5)
    return _clip(img * (1.0 + beta))


def posterize(img, rng):
    del rng
    return jnp.floor(img / 16.0) * 16.0  # keep 4 bits


def equalize(img, rng):
    """Per-channel histogram equalization on the 256-level quantization."""
    del rng

    def eq_channel(ch):
        q = jnp.clip(ch, 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.float32).at[q.reshape(-1)].add(1.0)
        cdf = jnp.cumsum(hist)
        # cv2 equalizeHist convention: scale by (cdf - cdf_min)/(N - cdf_min)
        cdf_min = cdf[jnp.argmax(hist > 0)]
        denom = jnp.maximum(cdf[-1] - cdf_min, 1.0)
        lut = jnp.clip(jnp.round((cdf - cdf_min) / denom * 255.0), 0, 255)
        return lut[q]

    return jnp.stack([eq_channel(img[..., c]) for c in range(3)], axis=-1)


def solarize(img, rng):
    del rng
    return jnp.where(img >= 128.0, 255.0 - img, img)


def to_gray(img, rng):
    del rng
    g = _gray(img)
    return jnp.repeat(g[..., None], 3, axis=-1)


_POOL = (
    color_jitter,
    gaussian_blur,
    random_contrast,
    random_brightness,
    posterize,
    equalize,
    solarize,
    to_gray,
)


def complex_color_aug(img, rng, selected_num: int = 3):
    """Apply `selected_num`-of-8 transforms (each gated at p=0.5) to one image."""
    k_perm, k_gate, *keys = jax.random.split(rng, 2 + len(_POOL))
    chosen = jax.random.permutation(k_perm, len(_POOL))[:selected_num]
    gates = jax.random.bernoulli(k_gate, 0.5, (len(_POOL),))
    out = img.astype(jnp.float32)
    for i, fn in enumerate(_POOL):
        active = jnp.any(chosen == i) & gates[i]
        out = jnp.where(active, fn(out, keys[i]), out)
    return out


def simple_color_aug(img, rng):
    """The 'SCA' view: ColorJitter(p=.5) + GaussianBlur(p=.5)
    (reference augmentations.py:67-70)."""
    k1, k2, g1, g2 = jax.random.split(rng, 4)
    out = img.astype(jnp.float32)
    out = jnp.where(jax.random.bernoulli(g1, 0.5), color_jitter(out, k1), out)
    out = jnp.where(jax.random.bernoulli(g2, 0.5), gaussian_blur(out, k2), out)
    return out


def batched_color_aug(imgs, rng, kind: str = "CCA"):
    """vmap over the batch with per-sample keys. imgs: [B,H,W,3] in [0,255]."""
    fn = {"CCA": complex_color_aug, "SCA": simple_color_aug}[kind]
    keys = jax.random.split(rng, imgs.shape[0])
    return jax.vmap(fn)(imgs.astype(jnp.float32), keys)
