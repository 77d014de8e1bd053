"""Metric protocol tests (validated against skimage where available)."""

import numpy as np
import pytest

from tetranerf_tpu.training.metrics import (
    mipnerf_ssim,
    psnr,
    skimage_ssim,
    ssim,
)


@pytest.fixture(scope="module")
def image_pair(rng):
    img = rng.uniform(0, 1, size=(48, 48, 3)).astype(np.float32)
    # Smooth it so SSIM structure terms are meaningful.
    k = np.ones((5, 5)) / 25.0
    sm = np.stack(
        [
            np.real(
                np.fft.ifft2(
                    np.fft.fft2(img[..., c]) * np.fft.fft2(k, s=(48, 48))
                )
            )
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.float32)
    noisy = np.clip(sm + rng.normal(scale=0.05, size=sm.shape), 0, 1).astype(
        np.float32
    )
    return sm, noisy


def test_psnr():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)
    assert float(psnr(a, a)) > 100


def test_ssim_identity(image_pair):
    img, _ = image_pair
    assert float(mipnerf_ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    assert float(skimage_ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


def test_skimage_protocol_matches_skimage(image_pair):
    skimage = pytest.importorskip("skimage.metrics")
    img, noisy = image_pair
    ref = skimage.structural_similarity(
        img, noisy, win_size=7, channel_axis=2, data_range=1.0
    )
    ours = float(skimage_ssim(img, noisy))
    assert ours == pytest.approx(ref, abs=2e-3)


def test_gaussian_protocol_sanity(image_pair):
    img, noisy = image_pair
    v = float(mipnerf_ssim(img, noisy))
    assert 0.0 < v < 1.0
    noisier = np.clip(
        noisy + np.random.default_rng(0).normal(scale=0.1, size=img.shape),
        0,
        1,
    ).astype(np.float32)
    assert float(mipnerf_ssim(img, noisier)) < v


def test_ssim_rejects_unknown_filter(image_pair):
    img, noisy = image_pair
    with pytest.raises(ValueError):
        ssim(img, noisy, filter_type="box")
