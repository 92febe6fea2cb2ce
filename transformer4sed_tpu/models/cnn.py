"""CNN branch library: DCASE CRNN-style CNN, frequency-dynamic (FDY)
convolution, and a ResNet variant.

Parity targets in the reference:
  * ``CNN`` (``src/models/cnn/base.py:33-113``): conv -> batch/group
    norm -> {relu, leakyrelu, GLU, context-gating} -> avg-pool pyramid.
  * ``FDY_CNN`` / ``Dynamic_conv2d`` (``src/models/cnn/FDY_cnn.py:7-117``):
    per-frame attention over ``n_basis_kernels`` basis convolutions with
    temperature softmax (pool over freq); realised as ONE grouped conv
    producing n_ker*out channels then an attention-weighted sum — the
    same trick the reference uses, which keeps the MXU busy with a
    single big conv instead of n_ker small ones.
  * ``ResNet`` (``src/models/cnn/resnet.py:26-255``): basic + v2
    (pre-act) blocks, optional DropBlock, optional 1-D conv head after
    squeezing the freq axis.

Layout: inputs are [B, 1, T, F] (the reference feeds
``mel.transpose(1, 2).unsqueeze(1)``); internally NHWC for flax convs.
BatchNorm uses a 'batch_stats' collection: pass ``train=True`` and
``mutable=['batch_stats']`` during training, or use
``normalization='layer'`` (GroupNorm(1), stat-free — TPU-friendlier).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer4sed_tpu.models.vit import fast_gelu

from transformer4sed_tpu.models.norm import RefBatchNorm


def _norm(kind: str, name: str, train: bool):
    if kind == "batch":
        # reference: nn.BatchNorm2d(eps=0.001, momentum=0.99) (base.py:75,
        # FDY_cnn.py:153) — torch momentum = weight on the NEW batch stat
        return RefBatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=0.001, name=name
        )
    return nn.GroupNorm(num_groups=1, name=name)


class GLUGate(nn.Module):
    """x * sigmoid path with a linear on the channel axis (reference GLU)."""

    @nn.compact
    def __call__(self, x):  # NHWC
        lin = nn.Dense(x.shape[-1], name="linear")(x)
        return lin * jax.nn.sigmoid(x)


class ContextGating(nn.Module):
    @nn.compact
    def __call__(self, x):  # NHWC
        lin = nn.Dense(x.shape[-1], name="linear")(x)
        return x * jax.nn.sigmoid(lin)


def _activation(name: str, module_name: str):
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == "glu":
        return GLUGate(name=module_name)
    if name == "cg":
        return ContextGating(name=module_name)
    raise ValueError(f"unknown activation {name!r}")


class CNN(nn.Module):
    """CRNN-style conv pyramid. Input [B, 1, T, F] -> [B, C, T', F']."""

    n_in_channel: int = 1
    activation: str = "glu"
    conv_dropout: float = 0.0
    kernel_size: Sequence[int] = (3, 3, 3)
    padding: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    nb_filters: Sequence[int] = (64, 64, 64)
    pooling: Sequence[Tuple[int, int]] = ((1, 4), (1, 4), (1, 4))
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # per-layer geometry lists must cover every conv layer (the
        # reference asserts equal lengths, base.py:61; fail with the
        # config fix instead of an IndexError mid-trace)
        for name in ("kernel_size", "padding", "stride", "pooling"):
            if len(getattr(self, name)) < len(self.nb_filters):
                raise ValueError(
                    f"cnn_param.{name} has {len(getattr(self, name))} entries for "
                    f"{len(self.nb_filters)} nb_filters — provide one per conv layer"
                )
        h = jnp.transpose(x, (0, 2, 3, 1))  # -> NHWC
        for i, filters in enumerate(self.nb_filters):
            h = nn.Conv(
                filters,
                kernel_size=(self.kernel_size[i], self.kernel_size[i]),
                strides=(self.stride[i], self.stride[i]),
                padding=self.padding[i],
                dtype=self.dtype,
                name=f"conv{i}",
            )(h)
            h = _norm(self.normalization, f"norm{i}", train)(h)
            act = _activation(self.activation, f"act{i}")
            h = act(h)
            if self.conv_dropout:
                h = nn.Dropout(self.conv_dropout)(h, deterministic=not train)
            pt, pf = self.pooling[i]
            h = nn.avg_pool(h, window_shape=(pt, pf), strides=(pt, pf))
        return jnp.transpose(h, (0, 3, 1, 2))  # -> [B, C, T', F']


class DynamicConv2d(nn.Module):
    """Frequency-dynamic convolution: attention over basis kernels.

    Attention path (pool_dim='freq'): mean over freq -> conv1d(k) ->
    BN -> relu -> conv1d(1) -> softmax(/temperature) over kernels, per
    frame.
    """

    out_planes: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    n_basis_kernels: int = 4
    temperature: float = 31.0
    pool_dim: str = "freq"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:  # NHWC [B,T,F,C]
        b, t, f, c = x.shape
        nk = self.n_basis_kernels
        hidden = max(c // 4, 4)

        if self.pool_dim == "freq":
            a = jnp.mean(x, axis=2)  # [B, T, C]
        elif self.pool_dim == "time":
            a = jnp.mean(x, axis=1)  # [B, F, C]
        elif self.pool_dim == "chan":
            a = jnp.mean(x, axis=3)  # [B, T, F] -> treat F as channels
            a = a  # [B, T, F]
        elif self.pool_dim == "both":
            a = jnp.mean(x, axis=(1, 2))  # [B, C]
        else:
            raise ValueError(self.pool_dim)

        if self.pool_dim == "both":
            a = nn.Dense(hidden, name="att_fc1")(a)
            a = jax.nn.relu(a)
            att = nn.Dense(nk, name="att_fc2")(a)  # [B, nk]
            att = jax.nn.softmax(att / self.temperature, axis=-1)
            att = att[:, None, None, :, None]  # [B,1,1,nk,1]
        else:
            a = nn.Conv(
                hidden,
                kernel_size=(self.kernel_size,),
                strides=(self.stride,),
                padding=self.padding,
                use_bias=False,
                dtype=self.dtype,
                name="att_conv1",
            )(a)
            a = RefBatchNorm(use_running_average=not train, name="att_bn")(a)
            a = jax.nn.relu(a)
            att = nn.Conv(nk, kernel_size=(1,), dtype=self.dtype, name="att_conv2")(a)
            att = jax.nn.softmax(att / self.temperature, axis=-1)  # [B, T|F, nk]
            if self.pool_dim in ("freq", "chan"):
                att = att[:, :, None, :, None]  # [B,T,1,nk,1]
            else:
                att = att[:, None, :, :, None]  # [B,1,F,nk,1]

        # one conv with nk*out channels, then weighted sum over the basis dim
        y = nn.Conv(
            nk * self.out_planes,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="basis_conv",
        )(x)
        y = y.reshape(b, y.shape[1], y.shape[2], nk, self.out_planes)
        return jnp.sum(y * att, axis=3)  # [B, T, F, out]


class FDY_CNN(nn.Module):
    """Frequency-dynamic CNN pyramid (reference FDY_CNN)."""

    n_input_ch: int = 1
    activation: str = "glu"
    conv_dropout: float = 0.0
    kernel: Sequence[int] = (3, 3, 3)
    pad: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    nb_filters: Sequence[int] = (64, 64, 64)
    pooling: Sequence[Tuple[int, int]] = ((1, 4), (1, 4), (1, 4))
    normalization: str = "batch"
    n_basis_kernels: int = 4
    DY_layers: Sequence[int] = (0, 1, 1, 1, 1, 1, 1)
    temperature: float = 31.0
    pool_dim: str = "freq"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        for i, filters in enumerate(self.nb_filters):
            if self.DY_layers[i] == 1:
                h = DynamicConv2d(
                    out_planes=filters,
                    kernel_size=self.kernel[i],
                    stride=self.stride[i],
                    padding=self.pad[i],
                    n_basis_kernels=self.n_basis_kernels,
                    temperature=self.temperature,
                    pool_dim=self.pool_dim,
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(h, train=train)
            else:
                h = nn.Conv(
                    filters,
                    kernel_size=(self.kernel[i], self.kernel[i]),
                    strides=(self.stride[i], self.stride[i]),
                    padding=self.pad[i],
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(h)
            h = _norm(self.normalization, f"norm{i}", train)(h)
            h = _activation(self.activation, f"act{i}")(h)
            if self.conv_dropout:
                h = nn.Dropout(self.conv_dropout)(h, deterministic=not train)
            pt, pf = self.pooling[i]
            h = nn.avg_pool(h, window_shape=(pt, pf), strides=(pt, pf))
        return jnp.transpose(h, (0, 3, 1, 2))


class _BasicBlock(nn.Module):
    """Reference BasicBlock / ResNetV2Block (``resnet.py:26-122``):
    GELU activations; both convs use the pair's FIRST stride (the second
    is accepted and ignored upstream — reference quirk preserved);
    channel-changing residuals go through timm's ``downsample_avg``
    (1x1 conv + BatchNorm). Basic applies a final GELU after the
    residual add; v2 is pre-activation with no final act.

    Documented deviation: for ``stride != 1`` the reference residual
    path is never strided (``downsample_avg(nIn, nOut, 1)`` at
    ``resnet.py:187``, and no downsample at all when channels match), so
    the ``x += residual`` add crashes in torch for ANY strided config —
    it is untestable dead code there (no shipped config uses ResNet).
    Here the residual is avg-pooled by the block's total spatial
    reduction (stride^2 per dim, matching the two strided convs), the
    evident ``downsample_avg`` intent."""

    mid_channel: int
    out_channel: int
    stride: int = 1
    v2: bool = False
    drop_rate: float = 0.0
    drop_width: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:  # NHWC
        in_ch = x.shape[-1]

        def drop(h):
            if self.drop_rate:
                h = DropBlock2D(rate=self.drop_rate, block_size=self.drop_width)(
                    h, deterministic=not train
                )
            return h

        residual = x
        if self.v2:  # pre-activation
            h = RefBatchNorm(use_running_average=not train, name="bn1")(x)
            h = drop(h)
            h = fast_gelu(h)
            h = nn.Conv(self.mid_channel, (3, 3), (self.stride, self.stride), padding=1,
                        use_bias=False, dtype=self.dtype, name="conv1")(h)
            h = RefBatchNorm(use_running_average=not train, name="bn2")(h)
            h = drop(h)
            h = fast_gelu(h)
            h = nn.Conv(self.out_channel, (3, 3), (self.stride, self.stride), padding=1,
                        use_bias=False, dtype=self.dtype, name="conv2")(h)
        else:
            h = nn.Conv(self.mid_channel, (3, 3), (self.stride, self.stride), padding=1,
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            h = RefBatchNorm(use_running_average=not train, name="bn1")(h)
            h = drop(h)
            h = fast_gelu(h)
            h = nn.Conv(self.out_channel, (3, 3), (self.stride, self.stride), padding=1,
                        use_bias=False, dtype=self.dtype, name="conv2")(h)
            h = RefBatchNorm(use_running_average=not train, name="bn2")(h)
            h = drop(h)
        total = self.stride * self.stride  # both convs apply the stride
        if total != 1:
            # ceil-mode pool so shapes match the padding=1 strided convs
            residual = nn.avg_pool(residual, (total, total), (total, total),
                                   padding="SAME")
        if in_ch != self.out_channel:
            residual = nn.Conv(self.out_channel, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(residual)
            residual = RefBatchNorm(use_running_average=not train,
                                     name="downsample_bn")(residual)
        out = h + residual
        return out if self.v2 else fast_gelu(out)


class ResNet(nn.Module):
    """ResNet conv branch (reference ``resnet.py:143-255``).

    Filters are consumed in PAIRS: block i uses mid=nb_filters[i],
    out=nb_filters[i+1] (so ``len(nb_filters)`` must be even) and is
    followed by AvgPool(pooling[i+1]). ``res_block_type='resnetv2'``
    prepends the 3x3 VALID pre-conv. The optional 1-D head is
    conv1d (no padding) -> BatchNorm -> GELU per stage on the
    freq-squeezed sequence.
    """

    n_in_channel: int = 1
    nb_filters: Sequence[int] = (64, 64, 64, 64)
    stride: Sequence[int] = (1, 1, 1, 1, 1)
    pooling: Sequence[Tuple[int, int]] = ((1, 4), (1, 4), (1, 4), (1, 4))
    res_block_type: str = "basic"
    drop_block: float = 0.0
    drop_block_width: Sequence[int] = (3, 3, 3, 3)
    cnn_1d_dict: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def _drop_width(self, i: int) -> int:
        """DropBlock width for the pair starting at filter index ``i``.

        The reference indexes the raw even block index into
        ``drop_block_width`` (``resnet.py:205``) — an IndexError for any
        list shorter than the filter count. Preserve that layout when the
        list is long enough, fall back to one-width-per-pair, then to the
        last entry, so deep stacks don't crash on the default 4-tuple.
        """
        w = self.drop_block_width
        if i < len(w):
            return w[i]
        if i // 2 < len(w):
            return w[i // 2]
        return w[-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert len(self.nb_filters) % 2 == 0, "nb_filters pairs (mid, out)"
        v2 = self.res_block_type == "resnetv2"
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        if v2:
            # reference pre_cov: Conv2d(1, nb_filters[0], 3) with NO padding
            h = nn.Conv(self.nb_filters[0], (3, 3), padding="VALID",
                        dtype=self.dtype, name="pre_cov")(h)
        for i in range(0, len(self.nb_filters), 2):
            h = _BasicBlock(
                mid_channel=self.nb_filters[i],
                out_channel=self.nb_filters[i + 1],
                stride=self.stride[i],
                v2=v2,
                drop_rate=self.drop_block,
                drop_width=self._drop_width(i),
                dtype=self.dtype,
                name=f"res_block{i}",
            )(h, train=train)
            pt, pf = self.pooling[i + 1]
            h = nn.avg_pool(h, (pt, pf), (pt, pf))
        if self.cnn_1d_dict:
            assert h.shape[2] == 1, "cnn_1d head requires freq pooled to 1"
            s = h[:, :, 0, :]  # [B, T, C]
            for j, (flt, ker) in enumerate(
                zip(self.cnn_1d_dict["filters"], self.cnn_1d_dict["kernel_size"])
            ):
                # reference CNN1d: unpadded conv -> BatchNorm -> GELU
                s = nn.Conv(flt, (ker,), padding="VALID", dtype=self.dtype,
                            name=f"cnn_1d_{j}")(s)
                s = RefBatchNorm(use_running_average=not train, name=f"cnn_1d_bn{j}")(s)
                s = fast_gelu(s)
            h = s[:, :, None, :]
        return jnp.transpose(h, (0, 3, 1, 2))


class DropBlock2D(nn.Module):
    """DropBlock regularisation (Ghiasi et al. 2018): drop contiguous
    spatial blocks instead of iid units (reference ResNet's optional
    drop_block, ``src/models/cnn/resnet.py``)."""

    rate: float = 0.1
    block_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:  # NHWC
        if deterministic or self.rate == 0.0:
            return x
        b, h, w, c = x.shape
        bs = min(self.block_size, h, w)
        gamma = (
            self.rate / (bs ** 2) * (h * w) / max((h - bs + 1) * (w - bs + 1), 1)
        )
        rng = self.make_rng("dropout")
        seeds = jax.random.bernoulli(rng, gamma, (b, h - bs + 1, w - bs + 1, c))
        seeds = jnp.pad(seeds, ((0, 0), (bs // 2, bs - 1 - bs // 2), (bs // 2, bs - 1 - bs // 2), (0, 0)))
        # expand seeds to blocks with a max-pool
        mask = nn.max_pool(seeds.astype(jnp.float32), (bs, bs), strides=(1, 1), padding="SAME")
        keep = 1.0 - mask
        scale = keep.size / jnp.maximum(jnp.sum(keep), 1.0)
        return x * keep * scale
