"""Augmentation tests: shapes, draw semantics, label consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer4sed_tpu.frontend import augment

KEY = jax.random.PRNGKey(42)


def make_batch(b=4, f=32, t=80, c=5, t_lab=20):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, f, t).astype(np.float32))
    labels = jnp.asarray((rng.rand(b, c, t_lab) > 0.7).astype(np.float32))
    return feats, labels


class TestFrameShift:
    def test_shapes_and_content_preserved(self):
        feats, labels = make_batch()
        sf, sl = augment.frame_shift(KEY, feats, labels, net_pooling=4)
        assert sf.shape == feats.shape and sl.shape == labels.shape
        # roll preserves per-sample content
        np.testing.assert_allclose(
            np.sort(np.asarray(sf), axis=-1), np.sort(np.asarray(feats), axis=-1), atol=1e-6
        )

    def test_fractional_net_pooling(self):
        """Label grid FINER than the mel grid (HTSAT: mel_T/label_T < 1):
        the label must roll by shift/net_pooling frames, with the
        reference's magnitude-floor + sign semantics."""
        b, f, t, t_lab = 4, 8, 30, 80
        rng = np.random.RandomState(1)
        feats = jnp.asarray(rng.randn(b, f, t).astype(np.float32))
        labels = jnp.asarray(rng.rand(b, 3, t_lab).astype(np.float32))
        np_ratio = t / t_lab  # 0.375
        sf, sl = augment.frame_shift(KEY, feats, labels, net_pooling=np_ratio, max_shift_frame=9)
        # replicate the internal per-sample draw and check both rolls
        shifts = np.asarray((jax.random.normal(KEY, (b,)) * 9).astype(jnp.int32))
        for i, s in enumerate(shifts):
            np.testing.assert_allclose(
                np.asarray(sf[i]), np.roll(np.asarray(feats[i]), int(s), axis=-1), atol=1e-6
            )
            # reference: `-abs(s) // np` when s < 0, `s // np` otherwise —
            # both are python floor division, i.e. floor(s / np)
            lab_shift = int(-abs(int(s)) // np_ratio) if s < 0 else int(int(s) // np_ratio)
            assert abs(lab_shift) >= abs(int(s))  # finer grid -> larger label roll
            np.testing.assert_allclose(
                np.asarray(sl[i]), np.roll(np.asarray(labels[i]), lab_shift, axis=-1), atol=1e-6
            )

    def test_negative_shift_floor_semantics(self):
        """Python floor division on the NEGATIVE label shift
        (data_aug.py:19: `-abs(shift) // net_pooling` floors toward
        minus infinity): shift=-13, np=4 must roll labels by -4, not -3."""
        key = jax.random.PRNGKey(3)  # draws [-13, 13, 3, 17]
        b, f, t, t_lab = 4, 8, 80, 20
        rng = np.random.RandomState(2)
        feats = jnp.asarray(rng.randn(b, f, t).astype(np.float32))
        labels = jnp.asarray(rng.rand(b, 3, t_lab).astype(np.float32))
        sf, sl = augment.frame_shift(key, feats, labels, net_pooling=4, max_shift_frame=9)
        shifts = np.asarray((jax.random.normal(key, (b,)) * 9).astype(jnp.int32))
        assert (shifts < 0).any() and any(s % 4 for s in shifts)
        for i, s in enumerate(shifts):
            lab_shift = int(s) // 4  # python floor division, signed
            np.testing.assert_allclose(
                np.asarray(sl[i]), np.roll(np.asarray(labels[i]), lab_shift, axis=-1), atol=1e-6
            )

    def test_no_label(self):
        feats, _ = make_batch()
        out = augment.frame_shift(KEY, feats)
        assert out.shape == feats.shape

    def test_per_sample_shifts_differ(self):
        feats = jnp.tile(jnp.arange(80, dtype=jnp.float32)[None, None, :], (4, 1, 1))
        out = np.asarray(augment.frame_shift(KEY, feats))
        first_cols = out[:, 0, 0]
        assert len(np.unique(first_cols)) > 1


class TestMixup:
    def test_soft_label_clamped(self):
        feats, labels = make_batch()
        mf, ml = augment.mixup(KEY, feats, labels, mixup_label_type="soft")
        assert mf.shape == feats.shape
        assert float(ml.max()) <= 1.0 and float(ml.min()) >= 0.0

    def test_hard_unions_labels(self):
        feats, labels = make_batch()
        _, ml = augment.mixup(KEY, feats, labels, mixup_label_type="hard")
        ml = np.asarray(ml)
        assert set(np.unique(ml)).issubset({0.0, 1.0})
        assert ml.sum() >= np.asarray(labels).sum()  # union adds positives


class TestTimeMask:
    def test_masks_features_and_labels(self):
        feats, labels = make_batch()
        mf, ml = augment.time_mask(KEY, feats + 10.0, labels + 1.0, net_pooling=4)
        mf, ml = np.asarray(mf), np.asarray(ml)
        assert (mf == 1e-4).any()
        assert (ml == 0).any()
        # masked label span * net_pooling == masked feature span
        lab_masked = (ml[0, 0] == 0).sum()
        feat_masked = (mf[0, 0] == 1e-4).sum()
        assert feat_masked == lab_masked * 4


class TestFiltAug:
    def test_step_bounded_perturbation(self):
        feats, _ = make_batch()
        out = augment.filt_aug(KEY, feats, db_range=(-0.5, 0.5), n_band=(3, 6), norm_std=5.0)
        assert out.shape == feats.shape
        diff = np.abs(np.asarray(out - feats))
        # max dB change: log(10^(0.5/20) + 1e-5)/5 bounded well below 0.02
        assert diff.max() < 0.02
        assert diff.max() > 0

    def test_linear_type(self):
        feats, _ = make_batch()
        out = augment.filt_aug(KEY, feats, filter_type="linear")
        assert out.shape == feats.shape
        assert bool(jnp.isfinite(out).all())

    def test_filter_constant_over_time(self):
        feats, _ = make_batch()
        out = np.asarray(augment.filt_aug(KEY, feats) - feats)
        # additive term has no time dependence (up to f32 rounding of the add/sub)
        np.testing.assert_allclose(out, np.broadcast_to(out[:, :, :1], out.shape), atol=1e-5, rtol=0)

    def test_jit(self):
        feats, _ = make_batch()
        fn = jax.jit(lambda k, x: augment.filt_aug(k, x))
        assert fn(KEY, feats).shape == feats.shape


class TestFreqMaskNoise:
    def test_freq_mask_zeroes_bins(self):
        feats = jnp.ones((4, 32, 20))
        out = np.asarray(augment.freq_mask(KEY, feats, mask_param=10))
        assert out.shape == feats.shape
        # per-sample masks differ
        masked_bins = (out == 0).all(axis=2).sum(axis=1)
        assert len(np.unique(masked_bins)) > 1 or masked_bins[0] > 0

    def test_add_noise_scales_with_snr(self):
        feats, _ = make_batch()
        noisy_low = augment.add_noise(KEY, feats, snrs=(0, 0.1))
        noisy_high = augment.add_noise(KEY, feats, snrs=(40, 40.1))
        d_low = float(jnp.std(noisy_low - feats))
        d_high = float(jnp.std(noisy_high - feats))
        assert d_low > d_high * 10


class TestFreqNonlinear:
    def test_warp_preserves_shape_and_range(self):
        feats, _ = make_batch()
        out = augment.freq_nonlinear(KEY, feats, bias=0.03)
        assert out.shape == feats.shape
        assert bool(jnp.isfinite(out).all())

    def test_zero_bias_identity(self):
        feats, _ = make_batch()
        out = augment.freq_nonlinear(KEY, feats, bias=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-5)


class TestFeatureTransformation:
    def test_two_views_differ(self):
        feats, _ = make_batch()
        views = augment.feature_transformation(
            KEY,
            feats,
            n_transform=2,
            choice=[1, 0, 0, 0],
            filter_db_range=(-6, 6),
            filter_bands=(3, 6),
            filter_minimum_bandwidth=6,
            filter_type="step",
            norm_std=5.0,
        )
        assert len(views) == 2
        assert not np.allclose(np.asarray(views[0]), np.asarray(views[1]))

    def test_single_view_passthrough_shape(self):
        feats, _ = make_batch()
        out = augment.feature_transformation(KEY, feats, 1, choice=[0, 0, 0, 0])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))
