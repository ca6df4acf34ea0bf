"""Quality/statistics kernels: Pearson correlation, PSNR, inter-frame
correlation for shot detection."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pearson(x, y):
    """PearsonCorrelation (main.pas:1465-1492) on flat float arrays."""
    x = x.astype(jnp.float32).ravel()
    y = y.astype(jnp.float32).ravel()
    xm = x - jnp.mean(x)
    ym = y - jnp.mean(y)
    num = jnp.sum(xm * ym)
    den = jnp.sqrt(jnp.sum(xm * xm)) * jnp.sqrt(jnp.sum(ym * ym))
    return jnp.where(den == 0, 0.0, num / den)


@jax.jit
def interframe_correlations(frames_u8):
    """Pearson correlation between consecutive frames
    (ComputeInterFrameCorrelation, main.pas:811-833), batched over the whole
    clip: frames [F, H, W, 3] uint8 -> [F-1] correlations.

    The reference arranges pixels plane-major before correlating; Pearson is
    invariant to that permutation, so we correlate the flat frames directly.
    """
    f = frames_u8.astype(jnp.float32).reshape(frames_u8.shape[0], -1)
    a, b = f[:-1], f[1:]
    am = a - jnp.mean(a, 1, keepdims=True)
    bm = b - jnp.mean(b, 1, keepdims=True)
    num = jnp.sum(am * bm, 1)
    den = jnp.sqrt(jnp.sum(am * am, 1)) * jnp.sqrt(jnp.sum(bm * bm, 1))
    return jnp.where(den == 0, 0.0, num / den)


def psnr(a_u8, b_u8):
    """Peak signal-to-noise ratio between two uint8 images/clips."""
    a = jnp.asarray(a_u8, jnp.float32)
    b = jnp.asarray(b_u8, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return jnp.where(mse == 0, jnp.inf, 10.0 * jnp.log10(255.0 ** 2 / mse))
