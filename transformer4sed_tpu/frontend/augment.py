"""Batch-level mel/label augmentations as pure PRNG-keyed jnp functions.

Functional equivalents of the reference augmentation suite
(``src/preprocess/data_aug.py:11-222``), redesigned for XLA: no
data-dependent shapes, no host loops. Draw semantics are preserved —
``frame_shift`` draws per sample, ``mixup``/``time_mask``/``filt_aug``
draw per batch, ``freq_mask`` per sample — so training statistics
match, while every op is a handful of fused vector instructions.

Shapes: mel features are ``[B, F, T]``; strong labels ``[B, C, T_lab]``
with ``T = net_pooling * T_lab``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# -- frame shift ---------------------------------------------------------------

def frame_shift(
    key: jax.Array,
    features: jnp.ndarray,
    label: Optional[jnp.ndarray] = None,
    net_pooling: Optional[float] = None,
    max_shift_frame: int = 90,
):
    """Per-sample Gaussian circular time shift of mel (+ pooled label).

    The reference draws ``int(gauss(0, max_shift_frame))`` per sample and
    rolls feature/label (label shift divided by net_pooling with
    floor-toward-minus-infinity on the negative side,
    ``data_aug.py:11-28``). ``net_pooling`` may be fractional — e.g.
    HTSAT label grids are *finer* than the mel grid (mel_T / label_T
    < 1), where the label must roll by ``shift / net_pooling`` frames.
    """
    b = features.shape[0]
    shifts = (jax.random.normal(key, (b,)) * max_shift_frame).astype(jnp.int32)

    def roll_one(x, s):
        return jnp.roll(x, s, axis=-1)

    shifted = jax.vmap(roll_one)(features, shifts)
    if label is None:
        return shifted
    # reference semantics (`data_aug.py:19`): `-abs(shift) // net_pooling`
    # for negative shifts — Python floor division of the NEGATIVE value,
    # i.e. floor toward minus infinity; one signed floor covers both signs
    lab_shift = jnp.floor(shifts.astype(jnp.float32) / float(net_pooling)).astype(jnp.int32)
    shifted_label = jax.vmap(roll_one)(label, lab_shift)
    return shifted, shifted_label


# -- mixup ----------------------------------------------------------------------

def mixup(
    key: jax.Array,
    features: jnp.ndarray,
    label: Optional[jnp.ndarray] = None,
    alpha: float = 0.2,
    beta: float = 0.2,
    mixup_label_type: str = "soft",
):
    """Beta-mixup within the batch (one permutation + one coefficient per call).

    'soft' mixes labels by the same coefficient; 'hard' unions them and
    draws ``c in [0.3, 0.7]`` (reference ``data_aug.py:31-90``).
    """
    kperm, kc = jax.random.split(key)
    b = features.shape[0]
    perm = jax.random.permutation(kperm, b)
    c = jax.random.beta(kc, alpha, beta)
    if mixup_label_type == "hard":
        c = c * 0.4 + 0.3

    mixed = c * features + (1.0 - c) * features[perm]
    if label is None:
        return mixed
    if mixup_label_type == "soft":
        mixed_label = jnp.clip(c * label + (1.0 - c) * label[perm], 0.0, 1.0)
    elif mixup_label_type == "hard":
        mixed_label = jnp.clip(label + label[perm], 0.0, 1.0)
    else:
        raise NotImplementedError(f"mixup_label_type {mixup_label_type!r}")
    return mixed, mixed_label


# -- time mask -------------------------------------------------------------------

def time_mask(
    key: jax.Array,
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    net_pooling: Optional[int] = None,
    mask_ratios: Tuple[int, int] = (10, 20),
):
    """Zero a random contiguous time span (shared across the batch).

    Width ~ U[T/ratio_hi, T/ratio_lo); start ~ U[0, T - width) (the
    reference's data-dependent bound — fine under jit, randint accepts
    traced bounds); features in the span are set to 1e-4 and labels to 0
    (reference ``data_aug.py:93-108``). Deviation: the reference clamps
    the feature span end to ``len(features)`` — the BATCH size of the
    3-D tensor, which for any realistic batch makes the feature masking
    a silent no-op (``data_aug.py:99``); the intended span is used here
    (the function is unwired in the reference recipes either way).
    """
    kw, kl = jax.random.split(key)
    if labels is not None:
        n_frame = labels.shape[-1]
        t_width = jax.random.randint(kw, (), n_frame // mask_ratios[1], n_frame // mask_ratios[0])
        t_low = jax.random.randint(kl, (), 0, n_frame - t_width)
        lab_pos = jnp.arange(n_frame)
        lab_mask = (lab_pos >= t_low) & (lab_pos < t_low + t_width)
        feat_pos = jnp.arange(features.shape[-1])
        feat_mask = (feat_pos >= t_low * net_pooling) & (feat_pos < (t_low + t_width) * net_pooling)
        features = jnp.where(feat_mask[None, None, :], 1e-4, features)
        labels = jnp.where(lab_mask[None, None, :], 0.0, labels)
        return features, labels
    n_frame = features.shape[-1]
    t_width = jax.random.randint(kw, (), n_frame // mask_ratios[1], n_frame // mask_ratios[0])
    t_low = jax.random.randint(kl, (), 0, n_frame - t_width)
    pos = jnp.arange(n_frame)
    mask = (pos >= t_low) & (pos < t_low + t_width)
    return jnp.where(mask[None, None, :], 0.0, features)


# -- FilterAugment ----------------------------------------------------------------

def filt_aug(
    key: jax.Array,
    features: jnp.ndarray,
    db_range: Sequence[float] = (-0.5, 0.5),
    n_band: Sequence[int] = (3, 6),
    min_bw: int = 6,
    filter_type: str = "step",
    norm_std: float = 5.0,
) -> jnp.ndarray:
    """FilterAugment (ICASSP 2022 variant) applied additively in the log domain.

    The reference builds a per-batch random EQ of ``n in [lo, hi)``
    bands with boundaries at least ``min_bw`` apart, then adds
    ``log(filt + 1e-5)/norm_std`` to the log-mel
    (``data_aug.py:150-192``). Dynamic band counts are handled here
    with a static max-band layout plus masking: unused boundaries
    collapse to the top of the spectrum, so the gather stays
    static-shaped under jit.
    """
    b, n_freq, _ = features.shape
    lo, hi = int(n_band[0]), int(n_band[1])
    max_bands = hi - 1  # randint high is exclusive
    kn, kb, kf = jax.random.split(key, 3)

    n_bands_drawn = jax.random.randint(kn, (), lo, hi)

    # effective min bandwidth shrink (reference while-loop), static per band count
    def eff_min_bw(nb):
        mbw = min_bw
        while n_freq - nb * mbw + 1 < 0:
            mbw -= 1
        return mbw

    # boundaries: sorted uniform draws + spacing offsets; one set per batch (shared)
    # max draw uses the largest band count's constraint; per-count offsets applied below
    def boundaries_for(nb_static: int) -> jnp.ndarray:
        mbw = eff_min_bw(nb_static)
        if nb_static <= 1:
            return jnp.full((max_bands + 1,), n_freq, dtype=jnp.int32).at[0].set(0)
        raw = jax.random.randint(kb, (nb_static - 1,), 0, n_freq - nb_static * mbw + 1)
        inner = jnp.sort(raw) + jnp.arange(1, nb_static) * mbw
        bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32), inner.astype(jnp.int32)])
        pad = jnp.full((max_bands + 1 - nb_static,), n_freq, dtype=jnp.int32)
        return jnp.concatenate([bounds, pad])  # [max_bands + 1], trailing entries = n_freq

    branch_bounds = jnp.stack([boundaries_for(nb) for nb in range(lo, hi)])  # [hi-lo, max_bands+1]
    bounds = branch_bounds[n_bands_drawn - lo]  # [max_bands+1] inc. sentinel n_freq entries
    upper = jnp.concatenate([bounds[1:], jnp.full((1,), n_freq, jnp.int32)])

    freq_idx = jnp.arange(n_freq)
    # band id of each freq bin: number of boundaries <= f, minus 1
    band_of = jnp.sum(freq_idx[None, :] >= bounds[:, None], axis=0) - 1  # [n_freq]

    if filter_type == "step":
        factors_db = (
            jax.random.uniform(kf, (b, max_bands)) * (db_range[1] - db_range[0]) + db_range[0]
        )
        factors = 10.0 ** (factors_db / 20.0)
        freq_filt = factors[:, band_of]  # [B, n_freq]
    elif filter_type == "linear":
        factors_db = (
            jax.random.uniform(kf, (b, max_bands + 1)) * (db_range[1] - db_range[0]) + db_range[0]
        )
        left_db = factors_db[:, band_of]
        right_db = factors_db[:, band_of + 1]
        span = jnp.maximum((upper - bounds)[band_of], 1)
        frac = (freq_idx - bounds[band_of]) / span
        # interpolate in dB then convert to linear gain. (The reference's
        # linear branch skips the dB->linear conversion and would take
        # log() of negative values for negative db ranges — a latent bug
        # vs the original FilterAugment; fixed here.)
        freq_filt = 10.0 ** ((left_db + (right_db - left_db) * frac) / 20.0)
    else:
        raise ValueError(f"unknown filter_type {filter_type!r}")

    # single-band draw is a no-op in the reference
    freq_filt = jnp.where(n_bands_drawn > 1, freq_filt, jnp.ones_like(freq_filt))
    return features + jnp.log(freq_filt + 1e-5)[:, :, None] / norm_std


# -- frequency masking -----------------------------------------------------------

def freq_mask(key: jax.Array, features: jnp.ndarray, mask_param: int) -> jnp.ndarray:
    """Per-sample SpecAugment frequency mask (torchaudio iid_masks parity).

    Width ~ U[0, mask_param), start ~ U[0, F - width); masked bins -> 0.
    """
    b, n_freq, _ = features.shape
    kw, ks = jax.random.split(key)
    widths = jax.random.uniform(kw, (b,)) * mask_param
    starts = jax.random.uniform(ks, (b,)) * (n_freq - widths)
    pos = jnp.arange(n_freq)[None, :]
    mask = (pos >= starts[:, None]) & (pos < (starts + widths)[:, None])
    return jnp.where(mask[:, :, None], 0.0, features)


# -- additive noise ---------------------------------------------------------------

def add_noise(
    key: jax.Array, features: jnp.ndarray, snrs: Tuple[float, float] = (15, 30)
) -> jnp.ndarray:
    """Gaussian noise at a per-sample random SNR (reference ``data_aug.py:195-204``)."""
    ksnr, kn = jax.random.split(key)
    b = features.shape[0]
    snr_db = (snrs[0] - snrs[1]) * jax.random.uniform(ksnr, (b, 1, 1)) + snrs[1]
    snr = 10.0 ** (snr_db / 20.0)
    # torch.std default is the UNBIASED estimator (ddof=1)
    sigma = jnp.std(features, axis=(1, 2), keepdims=True, ddof=1) / snr
    return features + jax.random.normal(kn, features.shape) * sigma


# -- frequency warp ---------------------------------------------------------------

def freq_nonlinear(key: jax.Array, mel: jnp.ndarray, f: float = 1.0, bias: float = 0.02) -> jnp.ndarray:
    """Sinusoidal frequency-axis warp via linear re-interpolation.

    The reference loops ``np.interp`` over every (batch, frame) column
    with a single random phase per call (``data_aug.py:207-222``); here
    the same warp is one vmapped ``jnp.interp`` over the whole tensor.
    """
    b, n_freq, t = mel.shape
    phase = jax.random.uniform(key, ())
    ind = jnp.arange(n_freq, dtype=jnp.float32)
    x = ind / n_freq
    ind_t = n_freq * (x + bias * jnp.sin(2.0 * jnp.pi * (f * x + phase)))

    cols = mel.transpose(0, 2, 1).reshape(b * t, n_freq)
    warped = jax.vmap(lambda col: jnp.interp(ind, ind_t, col))(cols)
    return warped.reshape(b, t, n_freq).transpose(0, 2, 1)


# -- composite view generator ------------------------------------------------------

def feature_transformation(
    key: jax.Array,
    features: jnp.ndarray,
    n_transform: int,
    choice: Sequence[int],
    filter_db_range: Sequence[float] = (-0.5, 0.5),
    filter_bands: Sequence[int] = (3, 6),
    filter_minimum_bandwidth: int = 6,
    filter_type: str = "step",
    freq_mask_ratio: Optional[int] = None,
    noise_snrs: Optional[Tuple[float, float]] = None,
    norm_std: float = 5.0,
) -> List[jnp.ndarray]:
    """Produce ``n_transform`` independently augmented views of a log-mel batch.

    ``choice = [filt_aug, freq_mask, add_noise, freq_nonlinear]`` flags,
    applied in the reference's order: warp -> filt_aug -> freq mask ->
    noise (``data_aug.py:111-147``). ``n_transform=2`` yields distinct
    student/teacher views for mean-teacher training.
    """
    views = []
    for i in range(n_transform):
        vkey = jax.random.fold_in(key, i)
        k0, k1, k2, k3, k4 = jax.random.split(vkey, 5)
        x = features
        if choice[3]:
            bias = 0.03 * jax.random.uniform(k4, ())
            x = freq_nonlinear(k3, x, bias=bias)
        if choice[0]:
            x = filt_aug(
                k0,
                x,
                db_range=filter_db_range,
                n_band=filter_bands,
                min_bw=filter_minimum_bandwidth,
                filter_type=filter_type,
                norm_std=norm_std,
            )
        if choice[1]:
            x = freq_mask(k1, x, freq_mask_ratio)
        if choice[2]:
            x = add_noise(k2, x, snrs=noise_snrs)
        views.append(x)
    if n_transform == 1:
        return views[0]
    return views
