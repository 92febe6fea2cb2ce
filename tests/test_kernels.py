"""Pallas kernel tests (interpret mode on CPU): flash attention parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.kernels.flash_attention import (
    _flash_forward,
    _xla_attention,
    flash_attention,
)

KEY = jax.random.PRNGKey(0)


def qkv(b=2, h=3, t=200, d=32, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) for _ in range(3))


class TestFlashKernel:
    @pytest.mark.parametrize("t", [128, 200, 300])
    def test_matches_xla_attention(self, t):
        q, k, v = qkv(t=t)
        scale = 1.0 / np.sqrt(q.shape[-1])
        ours = _flash_forward(q, k, v, scale, interpret=True)
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_ragged_seq_mask_correct(self):
        # result on T=130 must equal slicing a T=130 XLA computation,
        # i.e. padded keys are fully masked out
        q, k, v = qkv(t=130)
        scale = 1.0 / np.sqrt(q.shape[-1])
        ours = _flash_forward(q, k, v, scale, interpret=True)
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_public_api_gradients(self):
        q, k, v = qkv(t=64, d=16)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def ref_loss(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, 1.0 / np.sqrt(q.shape[-1])) ** 2)

        g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_attention_module_flash_flag(self):
        from transformer4sed_tpu.models.vit import Attention

        x = jnp.asarray(np.random.RandomState(1).randn(2, 50, 32).astype(np.float32))
        base = Attention(num_heads=4)
        flash = Attention(num_heads=4, use_flash=True)
        params = base.init(KEY, x)
        out_base = base.apply(params, x)
        # on CPU the flash path falls back to XLA -> identical math
        out_flash = flash.apply(params, x)
        np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_flash), atol=1e-5)


class TestFlashBiasKernel:
    @pytest.mark.parametrize("t", [128, 200])
    def test_matches_xla_with_bias(self, t):
        from transformer4sed_tpu.kernels.flash_attention import (
            _flash_bias_forward,
            _xla_attention_bias,
        )

        q, k, v = qkv(t=t)
        rng = np.random.RandomState(9)
        bias = jnp.asarray(rng.randn(2, 3, t, t).astype(np.float32))
        scale = 1.0 / np.sqrt(q.shape[-1])
        ours = _flash_bias_forward(q, k, v, bias, scale, interpret=True)
        ref = _xla_attention_bias(q, k, v, bias, scale)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-5)

    def test_xl_decoder_flash_parity(self):
        """XLDecoder(use_flash) must match the XLA path (CPU fallback ==
        identical math; kernel itself is covered above in interpret mode)."""
        import jax as _jax
        from transformer4sed_tpu.models.xl import TransformerXLDecoder

        x = jnp.asarray(np.random.RandomState(3).randn(2, 60, 32).astype(np.float32))
        dec = TransformerXLDecoder(decoder_layer_num=1, num_heads=4, seq_len=60)
        dec_f = TransformerXLDecoder(decoder_layer_num=1, num_heads=4, seq_len=60, use_flash=True)
        params = dec.init(_jax.random.PRNGKey(0), x)
        a = dec.apply(params, x)
        b = dec_f.apply(params, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_band_mask_folds_into_bias(self):
        import jax as _jax
        from transformer4sed_tpu.models.xl import TransformerXLDecoder

        x = jnp.asarray(np.random.RandomState(4).randn(1, 40, 16).astype(np.float32))
        dec = TransformerXLDecoder(decoder_layer_num=1, num_heads=2, seq_len=40, window_len=7)
        dec_f = TransformerXLDecoder(
            decoder_layer_num=1, num_heads=2, seq_len=40, window_len=7, use_flash=True
        )
        params = dec.init(_jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(dec.apply(params, x)), np.asarray(dec_f.apply(params, x)), atol=1e-4
        )


class TestFlashBackward:
    def test_forward_lse_matches(self):
        from transformer4sed_tpu.kernels.flash_attention import (
            _flash_forward_lse,
            _xla_attention,
        )

        q, k, v = qkv(t=200, d=32)
        scale = 1.0 / np.sqrt(32)
        out, lse = _flash_forward_lse(q, k, v, scale, interpret=True)
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        # lse sanity: softmax denominators reproduce probabilities
        s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * scale
        ref_lse = np.log(np.exp(s).sum(-1))
        np.testing.assert_allclose(np.asarray(lse)[:, :, :200], ref_lse, atol=1e-4)

    def test_backward_matches_xla_grads(self):
        from transformer4sed_tpu.kernels.flash_attention import (
            _flash_backward,
            _flash_forward_lse,
            _xla_attention,
        )

        q, k, v = qkv(t=130, d=16, b=1, h=2)
        scale = 1.0 / np.sqrt(16)
        g = jnp.asarray(np.random.RandomState(5).randn(*q.shape).astype(np.float32))

        out, lse = _flash_forward_lse(q, k, v, scale, block_q=128, interpret=True)
        dq, dk, dv = _flash_backward(q, k, v, out, lse, g, scale, block_q=128, interpret=True)

        def f(q, k, v):
            return _xla_attention(q, k, v, scale)

        _, vjp = jax.vjp(f, q, k, v)
        rq, rk, rv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=3e-5)


class TestFlashXL:
    def _inputs(self, b=1, h=2, t=100, d=16, seed=0):
        rng = np.random.RandomState(seed)
        qu = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        qv = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        p = jnp.asarray(rng.randn(h, 2 * t - 1, d).astype(np.float32))
        return qu, qv, k, v, p

    @pytest.mark.parametrize("t,bq", [(100, 128), (128, 128), (300, 128)])
    def test_matches_xla_reference(self, t, bq):
        from transformer4sed_tpu.kernels.xl_attention import _xl_forward, _xla_xl_attention

        qu, qv, k, v, p = self._inputs(t=t)
        scale = 1.0 / np.sqrt(qu.shape[-1])
        ours = _xl_forward(qu, qv, k, v, p, scale, block_q=bq, block_k=bq, interpret=True)
        ref = _xla_xl_attention(qu, qv, k, v, p, scale)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-5)

    def test_gradients_finite(self):
        from transformer4sed_tpu.kernels.xl_attention import flash_xl_attention

        qu, qv, k, v, p = self._inputs(t=60, d=8)

        def loss(qu, qv, k, v, p):
            return jnp.sum(flash_xl_attention(qu, qv, k, v, p, 0.35) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)
        for g in grads:
            assert bool(jnp.isfinite(g).all())


class TestBandLocalXL:
    """In-kernel band-diagonal local attention (no [T, T] mask tensor)."""

    def test_band_matches_masked_xla(self):
        from transformer4sed_tpu.kernels.xl_attention import (
            _xl_forward,
            _xla_xl_attention,
        )

        rng = np.random.RandomState(0)
        b, h, t, d = 2, 4, 96, 16
        f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
        qu, qv, k, v = f(b, h, t, d), f(b, h, t, d), f(b, h, t, d), f(b, h, t, d)
        p = f(h, 2 * t - 1, d)
        widths = (10, 20, 40, 96)
        ref = _xla_xl_attention(qu, qv, k, v, p, 0.25, widths)
        ours = _xl_forward(
            qu, qv, k, v, p, 0.25, block_q=32, block_k=32, group=8,
            band_widths=widths, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_decoder_band_flash_parity(self):
        """TransformerXLDecoder with window_len: flash (in-kernel band via
        XLA fallback off-TPU) vs explicit-mask path give identical output."""
        from transformer4sed_tpu.models.xl import TransformerXLDecoder

        x = jnp.asarray(np.random.RandomState(1).randn(2, 60, 32).astype(np.float32))
        kw = dict(decoder_layer_num=1, num_heads=4, seq_len=60, window_len=[9, 17, 33, 60])
        dec_mask = TransformerXLDecoder(**kw, use_flash=False)
        dec_band = TransformerXLDecoder(**kw, use_flash=True)
        params = dec_mask.init(jax.random.PRNGKey(0), x)
        out_mask = dec_mask.apply(params, x)
        out_band = dec_band.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out_band), np.asarray(out_mask), atol=2e-5
        )


class TestXLPallasBackward:
    """Fully-Pallas XL backward (dqu/dqv/dk/dv/dp from saved O + LSE)."""

    def _setup(self, widths=None):
        rng = np.random.RandomState(7)
        b, h, t, d = 2, 3, 96, 16
        f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
        qu, qv, k, v = f(b, h, t, d), f(b, h, t, d), f(b, h, t, d), f(b, h, t, d)
        p = f(h, 2 * t - 1, d)
        g = f(b, h, t, d)
        return qu, qv, k, v, p, g, 0.25, widths

    @pytest.mark.parametrize("widths", [None, (10, 20, 96)])
    def test_matches_jax_grad(self, widths):
        from transformer4sed_tpu.kernels.xl_attention import (
            _xl_backward,
            _xl_forward_lse,
            _xla_xl_attention,
        )

        qu, qv, k, v, p, g, sm, widths = self._setup(widths)

        def loss(qu, qv, k, v, p):
            return jnp.sum(_xla_xl_attention(qu, qv, k, v, p, sm, widths) * g)

        ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)
        out, lse = _xl_forward_lse(
            qu, qv, k, v, p, sm, block_q=32, block_k=32, group=8,
            band_widths=widths, interpret=True,
        )
        grads = _xl_backward(
            qu, qv, k, v, p, out, lse, g, sm,
            block_q=32, block_k=32, group=8,
            band_widths=widths, interpret=True,
        )
        for name, ours, want in zip(("dqu", "dqv", "dk", "dv", "dp"), grads, ref):
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(want), atol=5e-6, err_msg=name
            )

    def test_lse_matches_softmax_normalizer(self):
        from transformer4sed_tpu.kernels.xl_attention import (
            _xl_forward_lse,
            _xla_xl_attention,
        )
        from transformer4sed_tpu.models.xl import _rel_position_scores

        qu, qv, k, v, p, g, sm, _ = self._setup()
        out, lse = _xl_forward_lse(
            qu, qv, k, v, p, sm, block_q=32, block_k=32, group=8, interpret=True
        )
        content = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
        position = _rel_position_scores(qv.transpose(0, 2, 1, 3), p.transpose(1, 0, 2))
        s = (content + position) * sm
        want = jax.scipy.special.logsumexp(s, axis=-1)
        t = qu.shape[2]
        np.testing.assert_allclose(
            np.asarray(lse[:, :, 0, :t]), np.asarray(want), atol=1e-4
        )


class TestXLOddLengths:
    """Padding congruence: T not a multiple of the block or sublane sizes."""

    @pytest.mark.parametrize("t", [37, 100, 130])
    def test_forward_and_backward(self, t):
        from transformer4sed_tpu.kernels.xl_attention import (
            _xl_backward,
            _xl_forward_lse,
            _xla_xl_attention,
        )

        rng = np.random.RandomState(t)
        b, h, d = 2, 2, 16
        f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
        qu, qv, k, v = f(b, h, t, d), f(b, h, t, d), f(b, h, t, d), f(b, h, t, d)
        p = f(h, 2 * t - 1, d)
        g = f(b, h, t, d)
        ref_out = _xla_xl_attention(qu, qv, k, v, p, 0.25)
        out, lse = _xl_forward_lse(
            qu, qv, k, v, p, 0.25, block_q=32, block_k=32, group=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)

        def loss(qu, qv, k, v, p):
            return jnp.sum(_xla_xl_attention(qu, qv, k, v, p, 0.25) * g)

        ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)
        grads = _xl_backward(
            qu, qv, k, v, p, out, lse, g, 0.25,
            block_q=32, block_k=32, group=8, interpret=True,
        )
        for name, ours, want in zip(("dqu", "dqv", "dk", "dv", "dp"), grads, ref):
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(want), atol=5e-6, err_msg=f"T={t} {name}"
            )


class TestSwinWindowAttentionKernel:
    """Fused window-attention kernel (kernels/window_attention.py) vs the
    plain XLA reference, interpret mode on CPU."""

    def _data(self, bnw, n, h, d, n_windows, shifted, seed=0):
        from transformer4sed_tpu.models.htsat import _shift_attn_mask

        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(bnw, n, h, d).astype(np.float32))
        k = jnp.asarray(rng.randn(bnw, n, h, d).astype(np.float32))
        v = jnp.asarray(rng.randn(bnw, n, h, d).astype(np.float32))
        bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32) * 0.3)
        shift = None
        if shifted:
            w = int(np.sqrt(n))
            grid = int(np.sqrt(n_windows)) * w
            shift = jnp.asarray(_shift_attn_mask(grid, grid, w, w // 2))
        return q, k, v, bias, shift

    @pytest.mark.parametrize(
        "bnw,n,h,d,n_windows,shifted",
        [
            (32, 64, 4, 24, 16, False),   # pack=8, n_pat=2
            (32, 64, 4, 24, 16, True),    # shifted windows
            (8, 64, 8, 24, 4, False),     # P >= nW (cross-image packing)
            (8, 64, 8, 24, 4, True),
            (6, 16, 2, 8, 1, False),      # tiny test-model shapes
            (5, 64, 2, 24, 1, False),     # P=1 fallback (bnw prime)
            (16, 64, 16, 24, 4, True),    # VMEM budget caps the pack (h=16)
        ],
    )
    def test_matches_xla_reference(self, bnw, n, h, d, n_windows, shifted):
        from transformer4sed_tpu.kernels.window_attention import (
            _window_forward,
            _xla_window_attention,
        )

        q, k, v, bias, shift = self._data(bnw, n, h, d, n_windows, shifted)
        scale = d ** -0.5
        ref = _xla_window_attention(q, k, v, bias, shift, n_windows, scale)
        ours = _window_forward(q, k, v, bias, shift, n_windows, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_gradients_match_xla(self):
        from transformer4sed_tpu.kernels.window_attention import (
            _xla_window_attention,
            swin_window_attention,
        )

        q, k, v, bias, shift = self._data(16, 64, 4, 24, 16, True, seed=1)
        scale = 24 ** -0.5

        def loss_kernel(q, k, v, bias):
            return jnp.sum(swin_window_attention(q, k, v, bias, shift, 16, scale) ** 2)

        def loss_xla(q, k, v, bias):
            return jnp.sum(_xla_window_attention(q, k, v, bias, shift, 16, scale) ** 2)

        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

        # the shift-mask cotangent must be the real gradient, not zeros
        # (softmax(s + mask) does depend on the mask)
        gs1 = jax.grad(
            lambda s: jnp.sum(swin_window_attention(q, k, v, bias, s, 16, scale) ** 2)
        )(shift)
        gs2 = jax.grad(
            lambda s: jnp.sum(_xla_window_attention(q, k, v, bias, s, 16, scale) ** 2)
        )(shift)
        assert float(jnp.abs(gs2).max()) > 0
        np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), atol=2e-5)

    @pytest.mark.parametrize(
        "bnw,n,h,d,n_windows,shifted",
        [
            (32, 64, 4, 24, 16, False),
            (32, 64, 4, 24, 16, True),
            (8, 64, 8, 24, 4, True),   # P >= nW (cross-image packing)
            (5, 64, 2, 24, 1, False),  # P=1 fallback
        ],
    )
    def test_pallas_backward_matches_xla_vjp(self, bnw, n, h, d, n_windows, shifted):
        """The fully-Pallas backward (interpret mode): dq/dk/dv/dbias and
        the scattered dshift vs jax.vjp of the XLA reference."""
        from transformer4sed_tpu.kernels.window_attention import (
            _window_backward,
            _xla_window_attention,
        )

        q, k, v, bias, shift = self._data(bnw, n, h, d, n_windows, shifted, seed=2)
        scale = d ** -0.5
        out = _xla_window_attention(q, k, v, bias, shift, n_windows, scale)
        gout = jnp.asarray(
            np.random.RandomState(3).randn(*out.shape).astype(np.float32) * 0.1)

        if shifted:
            _, vjp = jax.vjp(
                lambda q_, k_, v_, b_, s_: _xla_window_attention(q_, k_, v_, b_, s_, n_windows, scale),
                q, k, v, bias, shift)
            refs = vjp(gout)
        else:
            _, vjp = jax.vjp(
                lambda q_, k_, v_, b_: _xla_window_attention(q_, k_, v_, b_, None, n_windows, scale),
                q, k, v, bias)
            refs = (*vjp(gout), None)

        ours = _window_backward(q, k, v, out, gout, bias, shift, n_windows, scale,
                                interpret=True)
        names = ("dq", "dk", "dv", "dbias", "dshift")
        for name, a, b in zip(names, ours, refs):
            if b is None:
                assert a is None, name
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                       err_msg=name)

    def test_pallas_backward_bf16_dtypes(self):
        """bf16 primals -> bf16 dq/dk/dv cotangents, f32 bias cotangent
        (the bias_table param dtype), all finite."""
        from transformer4sed_tpu.kernels.window_attention import (
            _window_backward,
            _xla_window_attention,
        )

        q, k, v, bias, shift = self._data(8, 64, 4, 24, 4, True, seed=4)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        scale = 24 ** -0.5
        out = _xla_window_attention(q, k, v, bias, shift, 4, scale)
        gout = out.astype(jnp.bfloat16)
        dq, dk, dv, dbias, dshift = _window_backward(
            q, k, v, out.astype(jnp.bfloat16), gout, bias, shift, 4, scale,
            interpret=True)
        assert dq.dtype == dk.dtype == dv.dtype == jnp.bfloat16
        assert dbias.dtype == bias.dtype and dshift.dtype == shift.dtype
        for x in (dq, dk, dv, dbias, dshift):
            assert np.isfinite(np.asarray(x, np.float32)).all()

    def test_bnw_not_multiple_of_windows_raises(self):
        from transformer4sed_tpu.kernels.window_attention import _window_forward

        q, k, v, bias, shift = self._data(24, 64, 4, 24, 16, True)
        with pytest.raises(ValueError, match="multiple of n_windows"):
            _window_forward(q[:24], k[:24], v[:24], bias, shift, 16, 0.2, interpret=True)

    def test_maskless_pack_ignores_window_count(self):
        """With no shift mask every window is interchangeable: an awkward
        nW must not shrink the pack (and the zeros shift tile is indexed
        at 0, never out of bounds)."""
        from transformer4sed_tpu.kernels.window_attention import (
            _choose_pack,
            _window_forward,
            _xla_window_attention,
        )

        assert _choose_pack(18, 64, 2, 1) == 6  # nW=9 irrelevant without a mask
        q, k, v, bias, _ = self._data(18, 64, 2, 24, 9, False)
        ref = _xla_window_attention(q, k, v, bias, None, 9, 0.2)
        ours = _window_forward(q, k, v, bias, None, 9, 0.2, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


class TestFlashNHDKernel:
    """Heads-in-lanes flash attention (no HBM transposes): interpret-mode
    parity vs the split-head XLA reference, ragged T, and gradients
    through the transpose+saved-LSE backward route."""

    @pytest.mark.parametrize("t", [64, 190, 300])
    def test_matches_split_head_attention(self, t):
        from transformer4sed_tpu.kernels.flash_attention import (
            _flash_nhd_forward,
            _split_heads,
            _merge_heads,
            _xla_attention,
        )

        b, h, d = 2, 4, 16
        c = h * d
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        k = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        v = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        scale = d ** -0.5
        ref = _merge_heads(_xla_attention(
            _split_heads(q, h), _split_heads(k, h), _split_heads(v, h), scale))
        ours = _flash_nhd_forward(q, k, v, h, scale, block_q=128, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_gradients_match_xla(self):
        from transformer4sed_tpu.kernels.flash_attention import (
            flash_attention_nhd,
            _split_heads,
            _merge_heads,
            _xla_attention,
        )

        b, t, h, d = 2, 50, 4, 16
        c = h * d
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        k = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        v = jnp.asarray(rng.randn(b, t, c).astype(np.float32))

        def loss_kernel(q, k, v):
            return jnp.sum(flash_attention_nhd(q, k, v, h) ** 2)

        def loss_xla(q, k, v):
            scale = d ** -0.5
            return jnp.sum(_merge_heads(_xla_attention(
                _split_heads(q, h), _split_heads(k, h), _split_heads(v, h), scale)) ** 2)

        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)

    @pytest.mark.parametrize("t", [64, 190, 300])
    def test_forward_lse_matches(self, t):
        """The forward-with-LSE kernel: output parity with the plain nhd
        kernel AND per-head LSE parity with the log-sum-exp definition."""
        from transformer4sed_tpu.kernels.flash_attention import (
            _flash_nhd_forward,
            _flash_nhd_forward_lse,
            _split_heads,
        )

        b, h, d = 2, 4, 16
        c = h * d
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        k = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        v = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        scale = d ** -0.5
        ref = _flash_nhd_forward(q, k, v, h, scale, block_q=128, interpret=True)
        out, lse = _flash_nhd_forward_lse(q, k, v, h, scale, block_q=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", _split_heads(q, h), _split_heads(k, h)) * scale
        ref_lse = jax.scipy.special.logsumexp(s, axis=-1)  # [B, H, T]
        np.testing.assert_allclose(
            np.asarray(lse)[:, :, :t], np.asarray(ref_lse), atol=2e-5)

    @pytest.mark.parametrize("t", [64, 190])
    def test_nhd_backward_matches_xla(self, t):
        """The fully heads-in-lanes backward (interpret mode): dq/dk/dv
        vs the split-head XLA autodiff reference, incl. ragged T."""
        from transformer4sed_tpu.kernels.flash_attention import (
            _flash_nhd_backward,
            _flash_nhd_forward_lse,
            _merge_heads,
            _split_heads,
            _xla_attention,
        )

        b, h, d = 2, 4, 16
        c = h * d
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        k = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        v = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        g = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        scale = d ** -0.5

        o, lse = _flash_nhd_forward_lse(q, k, v, h, scale, block_q=128, interpret=True)
        dq, dk, dv = _flash_nhd_backward(
            q, k, v, o, lse, g, h, scale, block_q=128, interpret=True)

        def f(q_, k_, v_):
            return _merge_heads(_xla_attention(
                _split_heads(q_, h), _split_heads(k_, h), _split_heads(v_, h), scale))

        _, vjp = jax.vjp(f, q, k, v)
        rq, rk, rv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=3e-5)

    def test_nhd_backward_bf16_dtypes(self):
        """bf16 primals -> bf16 cotangents through the nhd backward
        (the deacbd2 bug class, pinned at the new kernel boundary)."""
        from transformer4sed_tpu.kernels.flash_attention import (
            _flash_nhd_backward,
            _flash_nhd_forward_lse,
        )

        b, t, h, d = 1, 64, 4, 16
        c = h * d
        rng = np.random.RandomState(4)
        q = jnp.asarray(rng.randn(b, t, c)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, t, c)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, t, c)).astype(jnp.bfloat16)
        g = jnp.asarray(rng.randn(b, t, c)).astype(jnp.bfloat16)
        o, lse = _flash_nhd_forward_lse(q, k, v, h, d ** -0.5, block_q=64, interpret=True)
        assert lse.dtype == jnp.float32
        dq, dk, dv = _flash_nhd_backward(
            q, k, v, o, lse, g, h, d ** -0.5, block_q=64, interpret=True)
        assert dq.dtype == dk.dtype == dv.dtype == jnp.bfloat16
        for x in (dq, dk, dv):
            assert bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))


class TestXLNHDKernel:
    """Heads-in-lanes XL attention: interpret-mode parity vs the
    transposed-layout path (incl. band widths and the in-kernel pos-bias
    adds), and gradients through the fallback vjp route."""

    def _data(self, b, t, h, d, seed=0):
        rng = np.random.RandomState(seed)
        c = h * d
        q = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        k = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        v = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        bu = jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.1)
        bv = jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.1)
        p = jnp.asarray(rng.randn(h, 2 * t - 1, d).astype(np.float32) * 0.1)
        return q, k, v, bu, bv, p

    @pytest.mark.parametrize("band", [None, (6, 10, 6, 10)])
    def test_matches_transposed_path(self, band):
        from transformer4sed_tpu.kernels.xl_attention import (
            _xl_merge,
            _xl_nhd_forward,
            _xl_split,
            _xla_xl_attention,
        )

        b, t, h, d = 2, 200, 4, 32
        q, k, v, bu, bv, p = self._data(b, t, h, d)
        scale = d ** -0.5
        qh = _xl_split(q, h)
        qu = qh + bu[None, :, None]
        qv = qh + bv[None, :, None]
        ref = _xl_merge(_xla_xl_attention(qu, qv, _xl_split(k, h), _xl_split(v, h),
                                          p, scale, band))
        ours = _xl_nhd_forward(q, k, v, bu, bv, p, h, scale,
                               block_q=128, band_widths=band, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-5)

    def test_gradients_match_xla(self):
        from transformer4sed_tpu.kernels.xl_attention import (
            _xl_merge,
            _xl_split,
            _xla_xl_attention,
            flash_xl_attention_nhd,
        )

        b, t, h, d = 2, 60, 4, 16
        q, k, v, bu, bv, p = self._data(b, t, h, d, seed=1)
        scale = d ** -0.5

        def loss_kernel(q, k, v, bu, bv, p):
            return jnp.sum(flash_xl_attention_nhd(q, k, v, bu, bv, p, h, scale) ** 2)

        def loss_xla(q, k, v, bu, bv, p):
            qh = _xl_split(q, h)
            out = _xla_xl_attention(qh + bu[None, :, None], qh + bv[None, :, None],
                                    _xl_split(k, h), _xl_split(v, h), p, scale, None)
            return jnp.sum(_xl_merge(out) ** 2)

        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, bu, bv, p)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, bu, bv, p)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)

    @pytest.mark.parametrize("band", [None, (6, 10, 6, 10)])
    @pytest.mark.parametrize("t", [100, 130])
    def test_nhd_lse_forward_and_fused_backward(self, t, band):
        """The fully heads-in-lanes differentiated path (r4): forward-
        with-LSE output parity, then the fused nhd backward's six
        cotangents (dq/dk/dv/dbu/dbv/dp) vs XLA autodiff of the
        transposed reference — incl. ragged T and band masks."""
        from transformer4sed_tpu.kernels.xl_attention import (
            _xl_merge,
            _xl_nhd_backward,
            _xl_nhd_forward_lse,
            _xl_split,
            _xla_xl_attention,
        )

        b, h, d = 2, 4, 16
        q, k, v, bu, bv, p = self._data(b, t, h, d, seed=3)
        rng = np.random.RandomState(4)
        g = jnp.asarray(rng.randn(b, t, h * d).astype(np.float32))
        scale = d ** -0.5

        def ref_fn(q, k, v, bu, bv, p):
            qh = _xl_split(q, h)
            return _xl_merge(_xla_xl_attention(
                qh + bu[None, :, None], qh + bv[None, :, None],
                _xl_split(k, h), _xl_split(v, h), p, scale, band))

        out, lse = _xl_nhd_forward_lse(q, k, v, bu, bv, p, h, scale,
                                       block_q=32, group=8,
                                       band_widths=band, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_fn(q, k, v, bu, bv, p)),
                                   atol=3e-5)
        assert lse.shape[:2] == (b, h) and lse.dtype == jnp.float32

        dq, dk, dv, dbu, dbv, dp = _xl_nhd_backward(
            q, k, v, bu, bv, p, out, lse, g, h, scale,
            block_q=32, group=8, band_widths=band, interpret=True)
        _, vjp = jax.vjp(ref_fn, q, k, v, bu, bv, p)
        refs = vjp(g)
        for name, ours, want in zip(("dq", "dk", "dv", "dbu", "dbv", "dp"),
                                    (dq, dk, dv, dbu, dbv, dp), refs):
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(want), atol=1e-4,
                err_msg=f"T={t} band={band} {name}")

    def test_bf16_cotangent_dtypes_match_primals(self):
        """bf16 regression: dq must come back in the primal dtype. A f32
        dq next to bf16 dk/dv breaks the VJP of the caller's qkv split
        (lax.concatenate rejects mixed dtypes) — exactly the
        models/xl.py in_proj pattern, which only f32 tests exercised."""
        from transformer4sed_tpu.kernels.xl_attention import flash_xl_attention_nhd

        b, t, h, d = 1, 24, 4, 16
        q, k, v, bu, bv, p = self._data(b, t, h, d, seed=2)
        qkv = jnp.concatenate([q, k, v], axis=-1).astype(jnp.bfloat16)
        p16 = p.astype(jnp.bfloat16)
        scale = d ** -0.5

        def loss(qkv):
            q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
            out = flash_xl_attention_nhd(q_, k_, v_, bu, bv, p16, h, scale)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(qkv)  # raised TypeError before the dtype fix
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, dtype=np.float32)).all()

    def test_bf16_bias_cotangent_dtypes_match_primals(self):
        """Advisor r2: a fully-bf16 param tree passes bf16 pos_bias_u/v;
        dbu/dbv must come back bf16 too, not hardcoded float32."""
        from transformer4sed_tpu.kernels.xl_attention import flash_xl_attention_nhd

        b, t, h, d = 1, 24, 4, 16
        q, k, v, bu, bv, p = self._data(b, t, h, d, seed=4)
        q, k, v, p = (x.astype(jnp.bfloat16) for x in (q, k, v, p))
        bu16, bv16 = bu.astype(jnp.bfloat16), bv.astype(jnp.bfloat16)
        scale = d ** -0.5

        def loss(bu_, bv_):
            out = flash_xl_attention_nhd(q, k, v, bu_, bv_, p, h, scale)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        dbu, dbv = jax.grad(loss, argnums=(0, 1))(bu16, bv16)
        assert dbu.dtype == jnp.bfloat16 and dbv.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(dbu, dtype=np.float32)).all()


def test_flash_nhd_bf16_cotangent_dtypes():
    """Same bf16 qkv-split regression for the plain flash nhd kernel."""
    from transformer4sed_tpu.kernels.flash_attention import flash_attention_nhd

    b, t, h, d = 1, 30, 4, 16
    c = h * d
    rng = np.random.RandomState(3)
    qkv = jnp.asarray(rng.randn(b, t, 3 * c).astype(np.float32)).astype(jnp.bfloat16)

    def loss(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(flash_attention_nhd(q, k, v, h).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(qkv)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, dtype=np.float32)).all()
