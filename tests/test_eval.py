"""Metric-harness tests: FID analytic cases, IS, precision/recall."""

import numpy as np
import pytest

from lumina_t2x_tpu.eval import (
    compute_statistics,
    fid_from_feature_batches,
    frechet_distance,
    inception_score,
    load_adm_npz,
    precision_recall,
)


class TestFID:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2000, 8))
        mu, sig = compute_statistics(x)
        assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8

    def test_mean_shift_analytic(self):
        """For equal covariances, FID = ||dmu||^2."""
        d = 4
        sig = np.eye(d)
        mu1, mu2 = np.zeros(d), np.full(d, 2.0)
        np.testing.assert_allclose(frechet_distance(mu1, sig, mu2, sig), d * 4.0, rtol=1e-9)

    def test_variance_analytic(self):
        """1-D gaussians: FID = (m1-m2)^2 + (s1-s2)^2."""
        f = frechet_distance([0.0], [[4.0]], [1.0], [[1.0]])
        np.testing.assert_allclose(f, 1.0 + (2.0 - 1.0) ** 2, rtol=1e-9)

    def test_sampled_estimate_matches_analytic(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal((20000, 3))
        b = rng.standard_normal((20000, 3)) + np.array([1.0, 0, 0])
        mu1, s1 = compute_statistics(a)
        mu2, s2 = compute_statistics(b)
        np.testing.assert_allclose(frechet_distance(mu1, s1, mu2, s2), 1.0, atol=0.05)

    def test_streaming_matches_batch(self):
        rng = np.random.default_rng(2)
        real = rng.standard_normal((600, 5))
        fake = rng.standard_normal((600, 5)) * 1.3 + 0.5
        mu1, s1 = compute_statistics(real)
        mu2, s2 = compute_statistics(fake)
        ref = frechet_distance(mu1, s1, mu2, s2)
        stream = fid_from_feature_batches(np.array_split(real, 7), np.array_split(fake, 5))
        np.testing.assert_allclose(stream, ref, rtol=1e-6)


class TestIS:
    def test_uniform_predictions_score_one(self):
        probs = np.full((100, 10), 0.1)
        mean, std = inception_score(probs, splits=5)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-6)

    def test_confident_diverse_high(self):
        probs = np.eye(10)[np.arange(100) % 10] * 0.99 + 0.001
        probs /= probs.sum(1, keepdims=True)
        mean, _ = inception_score(probs, splits=2)
        assert mean > 8.0

    def test_fewer_samples_than_splits_finite(self):
        """n < splits must clamp, not NaN (smoke-size FID batches)."""
        rng = np.random.default_rng(0)
        probs = rng.dirichlet(np.ones(10), size=4)
        mean, std = inception_score(probs, splits=10)
        assert np.isfinite(mean) and np.isfinite(std)


class TestPR:
    def test_same_distribution_high(self):
        rng = np.random.default_rng(0)
        real = rng.standard_normal((300, 4))
        fake = rng.standard_normal((300, 4))
        p, r = precision_recall(real, fake)
        assert p > 0.8 and r > 0.8

    def test_disjoint_distribution_low(self):
        rng = np.random.default_rng(0)
        real = rng.standard_normal((200, 4))
        fake = rng.standard_normal((200, 4)) + 50.0
        p, r = precision_recall(real, fake)
        assert p < 0.05 and r < 0.05


class TestNPZ:
    def test_load_adm_npz(self, tmp_path):
        arr = np.zeros((5, 8, 8, 3), np.uint8)
        np.savez(tmp_path / "s.npz", arr_0=arr)
        out = load_adm_npz(str(tmp_path / "s.npz"))
        assert out.shape == (5, 8, 8, 3)
