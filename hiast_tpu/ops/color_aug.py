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


# ---------------------------------------------------------------------------
# batched implementations (the train-step path)
#
# The vmapped per-sample functions above are the readable reference; the
# batched versions below are what the jit'd step uses — measured 5-10x
# faster on v5e because nothing runs per-sample:
#   - gaussian blur: separable shift-and-accumulate with PER-SAMPLE tap
#     weights (one padded slice per tap, no tiny 1-channel convs)
#   - equalize: histogram from a 4x4-subsampled grid (a CDF is a statistic;
#     16x fewer scatter elements, visually identical LUT)
# ---------------------------------------------------------------------------
def _pixel_mean(g):
    """[B,H,W] -> [B,1,1,1] mean, accumulated in float32: a bf16 reduction
    over ~0.5M pixels loses every addend below the running sum's ulp."""
    return jnp.mean(g, axis=(1, 2), dtype=jnp.float32)[:, None, None, None]


def _batched_blur(x, rng):
    """x: [B,H,W,3]; per-sample random odd ksize in [3, 41], cv2 sigma."""
    b, h, w, _ = x.shape
    half = (_MAX_BLUR - 1) // 2
    ksize = 3 + 2 * jax.random.randint(rng, (b,), 0, (_MAX_BLUR - 3) // 2 + 1)
    sigma = 0.3 * ((ksize.astype(jnp.float32) - 1.0) * 0.5 - 1.0) + 0.8
    pos = jnp.arange(-half, half + 1, dtype=jnp.float32)  # [K]
    active = jnp.abs(pos)[None, :] <= ((ksize - 1) / 2)[:, None]  # [B, K]
    wts = jnp.where(active, jnp.exp(-0.5 * (pos[None, :] / sigma[:, None]) ** 2), 0.0)
    wts = (wts / jnp.sum(wts, axis=1, keepdims=True)).astype(x.dtype)  # [B, K]

    # two depthwise convs with PER-SAMPLE taps: fold (batch, channel) into
    # the feature axis and group the conv by it — one conv call per axis,
    # no per-sample dispatch, no lane-shifting slices.
    feat = b * 3
    y = jnp.transpose(x, (0, 3, 1, 2)).reshape(1, feat, h, w)  # [1, B*3, H, W]
    taps = jnp.repeat(wts, 3, axis=0)  # [B*3, K]
    kh = taps.reshape(feat, 1, _MAX_BLUR, 1)
    kw = taps.reshape(feat, 1, 1, _MAX_BLUR)
    y = jax.lax.conv_general_dilated(
        y, kh, (1, 1), [(half, half), (0, 0)], feature_group_count=feat
    )
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (half, half)], feature_group_count=feat
    )
    return jnp.transpose(y.reshape(b, 3, h, w), (0, 2, 3, 1))


def _batched_equalize(x):
    """Per-sample per-channel histogram equalization.

    Statistics: 256-level CDF from a 4x4-subsampled grid (a CDF is a
    statistic; 16x fewer scatter elements, visually identical LUT).

    Application: the exact 256-level one-hot LUT costs ~770 VPU ops/pixel
    (measured 18 ms/apply at 8x512x1024 — it dominated the whole CCA chain);
    a per-pixel gather serializes on TPU.  The CDF is monotone, so the LUT
    is evaluated as a 32-segment PIECEWISE-LINEAR interpolation instead
    (~130 ops/pixel, measured ~5x faster): hat-function weights over 33
    knots sampled from the 256-entry LUT.  Equalization of an augmentation
    view is distribution-level by design (SURVEY §7: the reference's host
    SomeOf pipeline is not replicated bit-for-bit); the interpolation error
    is bounded by half a segment of CDF variation.
    """
    b = x.shape[0]
    q = jnp.clip(x, 0, 255).astype(jnp.int32)  # [B,H,W,3]
    qs = q[:, ::4, ::4, :]  # histogram source
    chan = jnp.arange(3, dtype=jnp.int32)
    samp = jnp.arange(b, dtype=jnp.int32)
    flat = (
        (samp[:, None, None, None] * 3 + chan[None, None, None, :]) * 256
        + qs
    ).reshape(-1)
    hist = jnp.zeros((b * 3 * 256,), jnp.float32).at[flat].add(1.0)
    hist = hist.reshape(b, 3, 256)
    cdf = jnp.cumsum(hist, axis=-1)
    cdf_min = jnp.take_along_axis(cdf, jnp.argmax(hist > 0, axis=-1)[..., None], axis=-1)
    denom = jnp.maximum(cdf[..., -1:] - cdf_min, 1.0)
    lut = jnp.clip(jnp.round((cdf - cdf_min) / denom * 255.0), 0, 255)  # [B,3,256]

    # 33 knots at levels 0, 8, ..., 248, 255; weights in fp32 (bf16's ulp at
    # xk~32 is 0.25 — it would quantize the interpolation fraction)
    knots = jnp.concatenate([lut[:, :, ::8], lut[:, :, -1:]], axis=-1)  # [B,3,33]
    xk = jnp.clip(x.astype(jnp.float32), 0.0, 255.0) / 8.0  # [B,H,W,3]
    j = jnp.arange(33, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(xk[..., None] - j))  # [B,H,W,3,33]
    return jnp.einsum("bhwck,bck->bhwc", w, knots).astype(x.dtype)


def _batched_color_jitter(x, rng):
    b = x.shape[0]
    kb, kc, ks, kh = jax.random.split(rng, 4)
    # factors cast to the image dtype: a float32 factor would silently
    # re-promote a bf16 image chain back to float32
    bf = jax.random.uniform(kb, (b, 1, 1, 1), minval=0.8, maxval=1.2).astype(x.dtype)
    cf = jax.random.uniform(kc, (b, 1, 1, 1), minval=0.8, maxval=1.2).astype(x.dtype)
    sf = jax.random.uniform(ks, (b, 1, 1, 1), minval=0.8, maxval=1.2).astype(x.dtype)
    hf = jax.random.uniform(kh, (b,), minval=-0.2, maxval=0.2)
    x = _clip(x * bf)
    mean = _pixel_mean(_gray(x)).astype(x.dtype)
    x = _clip(mean + cf * (x - mean))
    g = _gray(x)[..., None]
    x = _clip(g + sf * (x - g))
    theta = hf * jnp.pi
    cos_t, sin_t = jnp.cos(theta).astype(x.dtype), jnp.sin(theta).astype(x.dtype)
    t_yiq = jnp.asarray(
        [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]], x.dtype
    )
    t_rgb = jnp.asarray(
        [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]], x.dtype
    )
    eye = jnp.eye(3, dtype=x.dtype)
    rot = jnp.broadcast_to(eye, (b, 3, 3))
    rot = rot.at[:, 1, 1].set(cos_t).at[:, 1, 2].set(-sin_t)
    rot = rot.at[:, 2, 1].set(sin_t).at[:, 2, 2].set(cos_t)
    m = jnp.einsum("ij,bjk,kl->bil", t_rgb, rot, t_yiq)
    return _clip(jnp.einsum("bhwc,bdc->bhwd", x, m))


def batched_color_aug(imgs, rng, kind: str = "CCA", selected_num: int = 3, dtype=jnp.float32):
    """Batched strong-view augmentation. imgs: [B,H,W,3] in [0,255].

    ``dtype=jnp.bfloat16`` halves the HBM traffic of this bandwidth-bound
    chain (the train step uses it).  Precision is a non-issue: the reference
    runs the same transforms on uint8 images (augmentations.py:73-89), so
    bf16's ~8-bit mantissa matches the reference's own quantization;
    statistics (means, histograms, CDFs) still accumulate in float32.
    Same key -> same transform/factor draws regardless of dtype.
    """
    b = imgs.shape[0]
    x = imgs.astype(dtype)
    if kind == "SCA":
        k1, k2, kg = jax.random.split(rng, 3)
        gates = jax.random.bernoulli(kg, 0.5, (2, b))
        x = jnp.where(gates[0, :, None, None, None], _batched_color_jitter(x, k1), x)
        x = jnp.where(gates[1, :, None, None, None], _batched_blur(x, k2), x)
        return x
    assert kind == "CCA", kind

    k_perm, k_gate, kj, kb_, kc, kbr = jax.random.split(rng, 6)
    n_pool = 8
    # per-sample: choose `selected_num` of 8 without replacement
    perm = jax.vmap(lambda k: jax.random.permutation(k, n_pool))(
        jax.random.split(k_perm, b)
    )  # [B, 8]
    chosen = jnp.any(
        perm[:, :selected_num, None] == jnp.arange(n_pool)[None, None, :], axis=1
    )  # [B, 8]
    gates = chosen & jax.random.bernoulli(k_gate, 0.5, (b, n_pool))

    def gate(i):
        return gates[:, i, None, None, None]

    x = jnp.where(gate(0), _batched_color_jitter(x, kj), x)
    x = jnp.where(gate(1), _batched_blur(x, kb_), x)
    alpha = (1.0 + jax.random.uniform(kc, (b, 1, 1, 1), minval=0.0, maxval=3.0)).astype(x.dtype)
    mean = _pixel_mean(_gray(x)).astype(x.dtype)
    x = jnp.where(gate(2), _clip(mean + alpha * (x - mean)), x)
    beta = jax.random.uniform(kbr, (b, 1, 1, 1), minval=-0.5, maxval=0.5).astype(x.dtype)
    x = jnp.where(gate(3), _clip(x * (1.0 + beta)), x)
    x = jnp.where(gate(4), jnp.floor(x / 16.0) * 16.0, x)
    x = jnp.where(gate(5), _batched_equalize(x), x)
    x = jnp.where(gate(6), jnp.where(x >= 128.0, 255.0 - x, x), x)
    g = _gray(x)
    x = jnp.where(gate(7), jnp.repeat(g[..., None], 3, axis=-1), x)
    return x
