"""Unit tests for the core layer: codec, filters, losses, ramps, schedules, EMA.

Reference-parity tests use golden semantics from cai525/Transformer4SED
(re-derived, not copied): scipy filters, torch loss formulas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from transformer4sed_tpu.core import (
    LabelCodec,
    apply_class_filter,
    ema_update,
    linear_softmax_pool,
    losses,
    max_filter,
    median_filter,
    ramps,
    schedules,
)
from transformer4sed_tpu.core.codec import find_contiguous_regions


class TestCodec:
    def make_codec(self):
        # DESED setup: 10 s @ 16 kHz, hop 256, net_pooling 4 -> 156 frames
        return LabelCodec(
            labels=["a", "b", "c"], audio_len=10.0, frame_len=2048, frame_hop=256, net_pooling=4, sr=16000
        )

    def test_n_frames(self):
        assert self.make_codec().n_frames == 156
        passt = LabelCodec(
            labels=["x"], audio_len=10.0, frame_len=1024, frame_hop=320, net_pooling=1, sr=32000
        )
        assert passt.n_frames == 1000

    def test_roundtrip(self):
        codec = self.make_codec()
        events = [("a", 1.0, 2.0), ("c", 0.0, 10.0)]
        grid = codec.encode_strong(events)
        assert grid.shape == (156, 3)
        decoded = codec.decode_strong(grid)
        by_label = {lbl: (on, off) for lbl, on, off in decoded}
        assert abs(by_label["a"][0] - 1.0) < 0.1
        assert abs(by_label["a"][1] - 2.0) < 0.1
        # full-clip event: offset = frame_to_time(156) = 9.984 s
        assert by_label["c"][0] == 0.0 and abs(by_label["c"][1] - 10.0) < 0.1
        assert "b" not in by_label

    def test_weak(self):
        codec = self.make_codec()
        vec = codec.encode_weak(["b"])
        assert vec.tolist() == [0.0, 1.0, 0.0]
        assert codec.decode_weak(vec) == ["b"]

    def test_contiguous_regions(self):
        regions = find_contiguous_regions(np.array([1, 1, 0, 0, 1, 0, 1]))
        assert regions.tolist() == [[0, 2], [4, 5], [6, 7]]
        assert find_contiguous_regions(np.zeros(5)).shape == (0, 2)


class TestFilters:
    @pytest.mark.parametrize("width", [3, 5, 7])
    def test_median_matches_scipy(self, width):
        rng = np.random.RandomState(0)
        x = rng.rand(4, 50, 3).astype(np.float32)
        ours = np.asarray(median_filter(jnp.asarray(x), width, axis=1))
        ref = np.stack(
            [
                np.stack(
                    [ndimage.median_filter(x[b, :, c], size=width) for c in range(3)], axis=-1
                )
                for b in range(4)
            ]
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_max_matches_scipy(self):
        rng = np.random.RandomState(1)
        x = rng.rand(2, 31, 2).astype(np.float32)
        ours = np.asarray(max_filter(jnp.asarray(x), 7, axis=1))
        ref = np.stack(
            [
                np.stack([ndimage.maximum_filter(x[b, :, c], size=7) for c in range(2)], axis=-1)
                for b in range(2)
            ]
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_per_class_widths(self):
        rng = np.random.RandomState(2)
        x = rng.rand(1, 40, 4).astype(np.float32)
        widths = [3, 7, 3, 1]
        out = np.asarray(apply_class_filter(jnp.asarray(x), widths, kind="median"))
        for c, w in enumerate(widths):
            ref = ndimage.median_filter(x[0, :, c], size=w) if w > 1 else x[0, :, c]
            np.testing.assert_allclose(out[0, :, c], ref, atol=1e-6)

    def test_width_one_is_identity(self):
        x = jnp.ones((2, 10, 3))
        np.testing.assert_array_equal(np.asarray(median_filter(x, 1)), np.asarray(x))


class TestLosses:
    def test_bce_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(3)
        pred = rng.rand(8, 10).astype(np.float32) * 0.98 + 0.01
        target = (rng.rand(8, 10) > 0.5).astype(np.float32)
        ours = float(losses.bce(jnp.asarray(pred), jnp.asarray(target)))
        ref = float(torch.nn.BCELoss()(torch.tensor(pred), torch.tensor(target)))
        assert abs(ours - ref) < 1e-5

    def test_bce_gradient_finite_at_saturation(self):
        """An untrained CLAP head saturates sigmoid to exactly 1.0; the
        BCE gradient must stay finite there (flooring the log input at 0
        gave inf * 0 = NaN gradients and NaN'd params in one step)."""
        import jax

        pred = jnp.asarray([1.0, 0.0, 0.5])
        for target in (jnp.zeros(3), jnp.ones(3)):
            g = jax.grad(lambda p: losses.bce(p, target))(pred)
            assert bool(jnp.isfinite(g).all()), (target, g)
        # pmam masked_bce too
        from transformer4sed_tpu.pmam.train import masked_bce

        p = jnp.asarray([[[1.0, 0.0]]])
        t = jnp.asarray([[[0.0, 1.0]]])
        m = jnp.ones((1, 1))
        g = jax.grad(lambda p_: masked_bce(p_, t, m))(p)
        assert bool(jnp.isfinite(g).all())

    def test_bce_logits_consistent(self):
        rng = np.random.RandomState(4)
        logits = rng.randn(4, 5).astype(np.float32)
        target = (rng.rand(4, 5) > 0.5).astype(np.float32)
        a = float(losses.bce_logits(jnp.asarray(logits), jnp.asarray(target)))
        b = float(losses.bce(jax.nn.sigmoid(jnp.asarray(logits)), jnp.asarray(target)))
        assert abs(a - b) < 1e-5

    def test_asl_reference_formula(self):
        rng = np.random.RandomState(5)
        pred = rng.rand(6, 4).astype(np.float32) * 0.9 + 0.05
        target = (rng.rand(6, 4) > 0.7).astype(np.float32)
        rp, rn, margin = 0.0, 4.0, 0.05
        pred_m = np.maximum(pred - margin, 0)
        ref = -np.mean(
            (1 - pred) ** rp * target * np.maximum(np.log(pred), -100)
            + pred_m ** rn * (1 - target) * np.maximum(np.log(1 - pred_m), -100)
        )
        ours = float(losses.asl(jnp.asarray(pred), jnp.asarray(target), rp, rn, margin))
        assert abs(ours - ref) < 1e-5

    def test_focal_zero_params_is_bce(self):
        rng = np.random.RandomState(6)
        pred = rng.rand(3, 4).astype(np.float32) * 0.9 + 0.05
        target = (rng.rand(3, 4) > 0.5).astype(np.float32)
        a = float(losses.asymmetric_focal(jnp.asarray(pred), jnp.asarray(target), 0.0, 0.0))
        b = float(losses.bce(jnp.asarray(pred), jnp.asarray(target)))
        assert abs(a - b) < 1e-5

    def test_info_nce_in_batch(self):
        rng = np.random.RandomState(7)
        q = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        loss_same = float(losses.info_nce(q, q, temperature=0.1))
        loss_rand = float(
            losses.info_nce(q, jnp.asarray(rng.randn(8, 16).astype(np.float32)), temperature=0.1)
        )
        assert loss_same < loss_rand

    def test_sup_con_runs(self):
        rng = np.random.RandomState(8)
        f = rng.randn(6, 2, 16).astype(np.float32)
        f = f / np.linalg.norm(f, axis=-1, keepdims=True)
        labels = jnp.asarray(np.array([0, 0, 1, 1, 2, 2]))
        out = float(losses.sup_con(jnp.asarray(f), labels=labels))
        assert np.isfinite(out)

    def test_factory(self):
        fn = losses.loss_function_factory("AslLoss", {"rp": 0, "rn": 4, "margin": 0.05})
        pred = jnp.full((2, 3), 0.5)
        target = jnp.ones((2, 3))
        assert np.isfinite(float(fn(pred, target)))
        with pytest.raises(KeyError):
            losses.loss_function_factory("Nope")


class TestRampsSchedules:
    def test_sigmoid_rampup(self):
        assert float(ramps.sigmoid_rampup(0, 100)) == pytest.approx(np.exp(-5.0), rel=1e-6)
        assert float(ramps.sigmoid_rampup(100, 100)) == pytest.approx(1.0)
        assert float(ramps.sigmoid_rampup(200, 100)) == pytest.approx(1.0)

    def test_cosine_rampdown(self):
        assert float(ramps.cosine_rampdown(0, 10)) == pytest.approx(1.0)
        assert float(ramps.cosine_rampdown(10, 10)) == pytest.approx(0.0, abs=1e-6)

    def test_exponential_down_shape(self):
        sched = schedules.exponential_down(start_iter=100, total_iter=200, exponent=-0.5, warmup_iter=10)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(50)) == pytest.approx(1.0)
        assert float(sched(200)) == pytest.approx(np.exp(-0.5), rel=1e-5)

    def test_exponential_warmup(self):
        sched = schedules.exponential_warmup(100)
        assert float(sched(0)) == pytest.approx(np.exp(-5.0), rel=1e-5)
        assert float(sched(100)) == pytest.approx(1.0)


class TestEma:
    def test_alpha_ramp(self):
        student = {"w": jnp.ones((3,))}
        teacher = {"w": jnp.zeros((3,))}
        # step 1: alpha = min(1 - 1/1, 0.999) = 0 -> teacher = student
        out = ema_update(student, teacher, step=1)
        np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
        # step 2: alpha = 0.5
        out = ema_update(student, teacher, step=2)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.5)
        # large step: alpha = 0.999
        out = ema_update(student, teacher, step=10_000)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.001, rtol=1e-4)


class TestPoolingMath:
    def test_linear_softmax(self):
        p = jnp.asarray(np.array([[[0.5, 1.0], [0.5, 0.0]]], dtype=np.float32))  # [1, 2, 2]
        out = np.asarray(linear_softmax_pool(p, axis=1))
        np.testing.assert_allclose(out[0], [0.5, 1.0], atol=1e-6)

    def test_clamped(self):
        p = jnp.zeros((1, 4, 2))
        out = np.asarray(linear_softmax_pool(p))
        assert (out >= 1e-7).all()
