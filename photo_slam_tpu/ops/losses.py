"""Image losses / quality metrics: L1, PSNR (2 variants), SSIM.

Semantics match the reference's header-only loss_utils
(reference: include/loss_utils.h:28-125): SSIM uses an 11x11 Gaussian window
with sigma=1.5 applied as a per-channel (grouped) convolution with symmetric
zero padding of window_size//2. On TPU the depthwise conv lowers to XLA
convolutions that fuse with the surrounding elementwise work.

Images are CHW float32 in [0, 1] (matching the reference's torch layout).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(reference: include/loss_utils.h:28-31)."""
    return jnp.abs(pred - gt).mean()


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean-MSE PSNR (reference: include/loss_utils.h:33-37)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def psnr_gaussian_splatting(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-channel-row PSNR variant used by 3DGS eval
    (reference: include/loss_utils.h:43-47): MSE per leading dim, then mean
    of 20*log10(1/sqrt(mse)).
    """
    c = img1.shape[0]
    mse = jnp.mean((img1 - img2).reshape(c, -1) ** 2, axis=1)
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """1D normalized Gaussian (reference: include/loss_utils.h:49-63)."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """[n, n] banded correlation matrix B[a, i] = w[a - i + pad] of the 1D
    Gaussian window, zero-pad boundary semantics: img @ B == 1D conv."""
    w = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    b = np.zeros((n, n), np.float32)
    for k in range(window_size):
        off = k - pad
        b += np.diag(np.full(n - abs(off), w[k], np.float32), -off)
    return b


def _gaussian_blur(img: jnp.ndarray, window_size: int,
                   sigma: float) -> jnp.ndarray:
    """Separable per-channel Gaussian blur of a CHW image as two banded
    MATMULS instead of grouped convolutions.

    The reference uses an 11x11 grouped conv2d (include/loss_utils.h:85-97).
    Grouped convs with 3 channels lower to the TPU's vector unit and were
    the training step's 4th-largest cost; [W,W]/[H,H] banded matrices ride
    the MXU (the extra FLOPs are free there) and the backward pass is just
    the transposed matmuls. precision=HIGHEST keeps f32 accuracy
    (numerically identical to the convolution).
    """
    h, w = img.shape[-2], img.shape[-1]
    bw = jnp.asarray(_band_matrix(w, window_size, sigma))
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    out = jnp.einsum("chw,wW->chW", img, bw,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("chw,hH->cHw", out, bh,
                     precision=jax.lax.Precision.HIGHEST)
    return out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """SSIM over CHW images (reference: include/loss_utils.h:76-124).

    Returns the scalar mean SSIM. Differentiable; used in the training loss as
    (1 - ssim).
    """
    blur = lambda x: _gaussian_blur(x, window_size, sigma)
    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def training_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                  lambda_dssim: float) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1-SSIM) (reference: src/gaussian_mapper.cpp:695-698)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )
