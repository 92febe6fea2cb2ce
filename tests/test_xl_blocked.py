"""Blocked rel-position scores must match the naive full-width + rel-shift path."""

import jax.numpy as jnp
import numpy as np

from transformer4sed_tpu.models.xl import _pick_block, _rel_position_scores, _rel_shift


class TestBlockedRelPos:
    def _naive(self, q_v, p):
        s = jnp.einsum("bqhd,phd->bhqp", q_v, p)
        return _rel_shift(s)

    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        for t in (40, 100, 1000 // 8):
            q_v = jnp.asarray(rng.randn(2, t, 3, 8).astype(np.float32))
            p = jnp.asarray(rng.randn(2 * t - 1, 3, 8).astype(np.float32))
            blocked = np.asarray(_rel_position_scores(q_v, p))
            naive = np.asarray(self._naive(q_v, p))
            np.testing.assert_allclose(blocked, naive, atol=1e-4)

    def test_prime_length_fallback(self):
        rng = np.random.RandomState(1)
        t = 97  # prime -> bq falls back to small divisor or full
        q_v = jnp.asarray(rng.randn(1, t, 2, 4).astype(np.float32))
        p = jnp.asarray(rng.randn(2 * t - 1, 2, 4).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_rel_position_scores(q_v, p)), np.asarray(self._naive(q_v, p)), atol=1e-4
        )

    def test_pick_block(self):
        assert 1000 % _pick_block(1000) == 0
        assert _pick_block(1000) in (125, 200, 250)
        assert _pick_block(128) == 128


class TestXLWithClsToken:
    def test_forward_shapes(self):
        import jax
        from transformer4sed_tpu.models.xl import (
            TransformerXLWithClsToken,
            rel_positional_encoding,
        )

        t, cls_num, d = 20, 2, 16
        blk = TransformerXLWithClsToken(num_heads=4, cls_num=cls_num)
        x = jnp.asarray(np.random.RandomState(0).randn(2, t + cls_num, d).astype(np.float32))
        pe = jnp.asarray(rel_positional_encoding(t, d))[0]
        params = blk.init(jax.random.PRNGKey(0), x, pe)
        out = blk.apply(params, x, pe)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())
        assert "cls_pos_emb" in params["params"]["attn"]


class TestVanillaCrossAttentionBlock:
    def test_residual_from_v_and_shapes(self):
        import jax
        from transformer4sed_tpu.models.xl import VanillaCrossAttentionBlock

        blk = VanillaCrossAttentionBlock(num_heads=4, mlp_ratio=2.0)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 6, 16).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 6, 16).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 6, 16).astype(np.float32))
        variables = blk.init(jax.random.PRNGKey(0), q, k, v)
        out = blk.apply(variables, q, k, v)
        assert out.shape == (2, 6, 16)
        # reference wiring: attention residual is taken from v, not q
        # (vanilla.py:51) -> with zeroed attn+mlp output the block would
        # return v; check sensitivity: changing q changes output only
        # through attention, changing v shifts the residual directly.
        out_q = blk.apply(variables, q + 100.0, k, v)
        out_v = blk.apply(variables, q, k, v + 1.0)
        assert not np.allclose(np.asarray(out), np.asarray(out_q))
        assert not np.allclose(np.asarray(out), np.asarray(out_v))

    def test_cross_lengths(self):
        import jax
        from transformer4sed_tpu.models.xl import VanillaCrossAttention

        attn = VanillaCrossAttention(num_heads=2)
        q = jnp.zeros((1, 5, 8))
        k = jnp.ones((1, 9, 8))
        v = jnp.ones((1, 9, 8))
        variables = attn.init(jax.random.PRNGKey(0), q, k, v)
        out = attn.apply(variables, q, k, v)
        assert out.shape == (1, 5, 8)
