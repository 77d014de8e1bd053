"""Image quality metrics: PSNR, SSIM (two protocols), LPIPS (gated).

The reference reports PSNR, torchmetrics SSIM, skimage SSIM (Point-NeRF
protocol), dm-pix SSIM (Mip-NeRF protocol), and LPIPS
(``tetranerf/nerfstudio/model.py:41-67, 695-707``). Here the SSIMs are
implemented in JAX:

- :func:`ssim` with ``filter_type='gaussian'`` reproduces the dm-pix /
  Mip-NeRF protocol (11x11 Gaussian window, sigma 1.5);
- ``filter_type='uniform'`` reproduces the skimage/Point-NeRF protocol
  (7x7 uniform window with sample covariance normalization);

LPIPS requires pretrained AlexNet/VGG weights; it is exposed behind a
loader that raises a clear error when the weights are unavailable
(zero-egress environments).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(image: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0):
    mse = jnp.mean(jnp.square(image - target))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _filter2d(img, kernel):
    """Separable 2-D filter with valid padding. img [H, W, C], kernel [K].

    The convolution MUST run at full f32 precision: TPU decomposes f32
    dots into bf16 MXU passes by default, and the ``E[x^2] - E[x]^2``
    variance cancellation downstream amplifies that error into SSIM
    values that are off by ~0.05 and can exceed 1.
    """
    img = jnp.moveaxis(img, -1, 0)  # [C, H, W]
    conv = functools.partial(
        jnp.convolve, mode="valid", precision=jax.lax.Precision.HIGHEST
    )

    def conv2(ch):
        t = jax.vmap(lambda row: conv(row, kernel))(ch)
        return jax.vmap(
            lambda col: conv(col, kernel),
            in_axes=1,
            out_axes=1,
        )(t)

    return jnp.moveaxis(jax.vmap(conv2)(img), 0, -1)


@functools.partial(
    jax.jit, static_argnames=("filter_type", "filter_size", "use_sample_covariance")
)
def ssim(
    image: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    filter_type: str = "gaussian",
    filter_size: int = 11,
    sigma: float = 1.5,
    use_sample_covariance: bool = False,
):
    """Structural similarity of two ``[H, W, C]`` images.

    ``filter_type='gaussian'`` (11, sigma 1.5) = dm-pix / torchmetrics /
    Mip-NeRF protocol. ``filter_type='uniform'`` with ``filter_size=7`` and
    ``use_sample_covariance=True`` = skimage / Point-NeRF protocol.
    """
    image = jnp.asarray(image, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if filter_type == "gaussian":
        half = filter_size // 2
        offsets = jnp.arange(filter_size) - half
        kernel = jnp.exp(-0.5 * (offsets / sigma) ** 2)
    elif filter_type == "uniform":
        kernel = jnp.ones(filter_size)
    else:
        raise ValueError(filter_type)
    kernel = kernel / jnp.sum(kernel)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x = _filter2d(image, kernel)
    mu_y = _filter2d(target, kernel)
    mu_xx = _filter2d(image * image, kernel)
    mu_yy = _filter2d(target * target, kernel)
    mu_xy = _filter2d(image * target, kernel)
    var_x = mu_xx - mu_x**2
    var_y = mu_yy - mu_y**2
    cov = mu_xy - mu_x * mu_y
    if use_sample_covariance:
        npix = filter_size * filter_size
        factor = npix / (npix - 1)
        var_x, var_y, cov = var_x * factor, var_y * factor, cov * factor
    num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    return jnp.mean(num / den)


def mipnerf_ssim(image, target):
    """dm-pix-equivalent SSIM (Mip-NeRF comparable; ``model.py:41-54``)."""
    return ssim(image, target, filter_type="gaussian", filter_size=11)


def skimage_ssim(image, target):
    """skimage-equivalent SSIM (Point-NeRF comparable; ``model.py:61-67``)."""
    return ssim(
        image,
        target,
        filter_type="uniform",
        filter_size=7,
        use_sample_covariance=True,
    )


class Lpips:
    """LPIPS(alex/vgg). Weight resolution order:

    1. an explicit ``weights_path`` npz (or the
       ``TETRANERF_LPIPS_WEIGHTS`` env var) — the offline path, computed
       in pure JAX (:mod:`tetranerf_tpu.training.lpips_jax`; export the
       npz once with ``lpips_jax.export_lpips_weights`` on a machine with
       internet access);
    2. torchmetrics' pretrained download (needs egress).

    Raises ``RuntimeError`` with a clear message when neither is
    available; PSNR/SSIM metrics remain usable.
    """

    def __init__(
        self, net_type: str = "alex", weights_path: Optional[str] = None
    ):
        import os

        self.net_type = net_type
        self.weights_path = weights_path or os.environ.get(
            "TETRANERF_LPIPS_WEIGHTS"
        )
        self._fn = None
        self._params = None

    def _load(self):
        if self.weights_path:
            from .lpips_jax import load_lpips_params

            self._params = load_lpips_params(self.weights_path)
            return
        try:
            import torch  # noqa: F401
            from torchmetrics.image.lpip import (  # type: ignore
                LearnedPerceptualImagePatchSimilarity,
            )

            self._fn = LearnedPerceptualImagePatchSimilarity(
                net_type=self.net_type
            )
        except Exception as exc:  # pragma: no cover - env without weights
            raise RuntimeError(
                "LPIPS needs either an offline weight file (weights_path / "
                "TETRANERF_LPIPS_WEIGHTS, see lpips_jax.export_lpips_weights)"
                " or torchmetrics with downloadable pretrained weights "
                f"(unavailable: {exc}). PSNR/SSIM metrics remain available."
            ) from exc

    def __call__(self, image: np.ndarray, target: np.ndarray) -> float:
        if self._fn is None and self._params is None:
            self._load()
        if self._params is not None:
            from .lpips_jax import lpips as lpips_jax_fn

            return float(lpips_jax_fn(self._params, image, target))
        import torch

        to_t = lambda x: (
            torch.from_numpy(np.asarray(x, np.float32))
            .permute(2, 0, 1)[None] * 2.0 - 1.0
        )
        with torch.no_grad():
            return float(self._fn(to_t(image), to_t(target)))


def compute_image_metrics(
    image: np.ndarray, target: np.ndarray, lpips: Optional[Lpips] = None
):
    """The reference's eval metric dict (``model.py:695-707``)."""
    out = {
        "psnr": float(psnr(jnp.asarray(image), jnp.asarray(target))),
        "mipnerf_ssim": float(mipnerf_ssim(image, target)),
        "skimage_ssim": float(skimage_ssim(image, target)),
    }
    if lpips is not None:
        try:
            out["lpips"] = lpips(image, target)
        except (RuntimeError, ValueError):
            # Missing weights or image below the backbone's 32px minimum.
            pass
    return out
