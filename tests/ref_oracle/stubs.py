"""Test-only stubs for third-party packages the reference imports.

The image ships torch but not timm / torchaudio / torchlibrosa /
matplotlib-on-headless quirks. The reference code under live-oracle
test imports exactly these public symbols:

* ``timm.models.vision_transformer.Block`` (+ ``Attention``, ``Mlp``,
  ``DropPath``) — timm 0.4.5 ViT block semantics
  (pre-LN, qkv fused linear, scaled-dot attention, GELU MLP).
* ``timm.models.layers.helpers.to_2tuple``,
  ``timm.models.layers.trunc_normal_``.
* ``timm.models.helpers.load_pretrained`` — never exercised in tests
  (models built with ``load_pretrained_model=False``); raises if hit.
* ``torchaudio.compliance.kaldi.get_mel_banks`` — Kaldi triangular mel
  banks, implemented from the Kaldi definition (vtln_warp_factor==1
  only, which is all the reference ever passes —
  passt_feature_extraction.py:73-81).
* ``torchlibrosa.stft.Spectrogram`` / ``LogmelFilterBank`` and
  ``torchlibrosa.augmentation.SpecAugmentation`` — implemented from
  torchlibrosa's public semantics (torch.stft reflect-pad Hann power
  spectrogram; slaney-normed librosa mel weights; power_to_db with
  global-max top_db clamp; SpecAugmentation is a no-op in eval mode).
* ``sed_scores_eval.base_modules.scores.create_score_dataframe`` /
  ``validate_score_dataframe`` — the (onset, offset, *classes)
  DataFrame layout with T+1 boundary timestamps
  (src/codec/decoder.py:12 imports exactly these two).

These are stubs of *dependency libraries* (public semantics), not of
reference code — the reference modules themselves are imported live.
"""

from __future__ import annotations

import math
import sys
import types
from itertools import repeat

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# ---------------------------------------------------------------------------
# timm 0.4.5 surface
# ---------------------------------------------------------------------------


def to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return tuple(repeat(x, 2))


def drop_path(x, drop_prob: float = 0.0, training: bool = False):
    if drop_prob == 0.0 or not training:
        return x
    keep_prob = 1 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = keep_prob + torch.rand(shape, dtype=x.dtype, device=x.device)
    random_tensor.floor_()
    return x.div(keep_prob) * random_tensor


class DropPath(nn.Module):
    def __init__(self, drop_prob=None):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return drop_path(x, self.drop_prob or 0.0, self.training)


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        x = self.fc1(x)
        x = self.act(x)
        x = self.drop(x)
        x = self.fc2(x)
        x = self.drop(x)
        return x


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None,
                 attn_drop=0.0, proj_drop=0.0):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = qk_scale or head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (self.qkv(x)
               .reshape(B, N, 3, self.num_heads, C // self.num_heads)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        attn = self.attn_drop(attn)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        x = self.proj(x)
        x = self.proj_drop(x)
        return x


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0,
                 act_layer=nn.GELU, norm_layer=nn.LayerNorm):
        super().__init__()
        self.norm1 = norm_layer(dim)
        self.attn = Attention(dim, num_heads=num_heads, qkv_bias=qkv_bias,
                              qk_scale=qk_scale, attn_drop=attn_drop, proj_drop=drop)
        self.drop_path = DropPath(drop_path) if drop_path > 0.0 else nn.Identity()
        self.norm2 = norm_layer(dim)
        self.mlp = Mlp(in_features=dim, hidden_features=int(dim * mlp_ratio),
                       act_layer=act_layer, drop=drop)

    def forward(self, x):
        x = x + self.drop_path(self.attn(self.norm1(x)))
        x = x + self.drop_path(self.mlp(self.norm2(x)))
        return x


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


class _TimmPatchEmbed(nn.Module):
    """timm 0.4.5 PatchEmbed (non-overlapping conv patchify). The AST
    reference overrides ``timm.models.vision_transformer.PatchEmbed``
    before ``create_model`` (ast_models.py:120) — ``_create_deit`` looks
    the class up at call time so the override takes effect, like real
    timm's module-global reference does."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768):
        super().__init__()
        img_size = to_2tuple(img_size)
        patch_size = to_2tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.num_patches = (img_size[1] // patch_size[1]) * (img_size[0] // patch_size[0])
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size, stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _DistilledVisionTransformer(nn.Module):
    """timm 0.4.5 deit distilled ViT surface: the attributes/state_dict
    keys ASTModel touches (patch_embed/cls_token/dist_token/pos_embed/
    pos_drop/blocks/norm + head/head_dist). Blocks use timm ViT defaults
    (qkv_bias=True, LN eps 1e-6)."""

    def __init__(self, img_size, patch_size, embed_dim, depth, num_heads,
                 num_classes=1000):
        super().__init__()
        import functools

        patch_embed_cls = sys.modules["timm.models.vision_transformer"].PatchEmbed
        self.patch_embed = patch_embed_cls(
            img_size=img_size, patch_size=patch_size, in_chans=3, embed_dim=embed_dim)
        num_patches = self.patch_embed.num_patches
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.dist_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, num_patches + 2, embed_dim))
        self.pos_drop = nn.Dropout(0.0)
        norm_layer = functools.partial(nn.LayerNorm, eps=1e-6)
        self.blocks = nn.ModuleList(
            Block(dim=embed_dim, num_heads=num_heads, mlp_ratio=4.0,
                  qkv_bias=True, norm_layer=norm_layer) for _ in range(depth))
        self.norm = norm_layer(embed_dim)
        self.head = nn.Linear(embed_dim, num_classes)
        self.head_dist = nn.Linear(embed_dim, num_classes)
        trunc_normal_(self.pos_embed, std=0.02)
        trunc_normal_(self.cls_token, std=0.02)
        trunc_normal_(self.dist_token, std=0.02)


_DEIT_CFGS = {
    "vit_deit_tiny_distilled_patch16_224": (224, 16, 192, 12, 3),
    "vit_deit_small_distilled_patch16_224": (224, 16, 384, 12, 6),
    "vit_deit_base_distilled_patch16_224": (224, 16, 768, 12, 12),
    "vit_deit_base_distilled_patch16_384": (384, 16, 768, 12, 12),
}


def create_model(model_name, pretrained=False, **kwargs):
    if pretrained:  # pragma: no cover - guarded path
        raise RuntimeError(
            "timm stub: pretrained weights unavailable — live-oracle tests "
            "must build with imagenet_pretrain=False")
    if model_name not in _DEIT_CFGS:
        raise RuntimeError(f"timm stub: unknown model {model_name!r}")
    return _DistilledVisionTransformer(*_DEIT_CFGS[model_name])


def load_pretrained(*args, **kwargs):  # pragma: no cover - guarded path
    raise RuntimeError(
        "timm stub: load_pretrained must not be reached in live-oracle tests "
        "(build reference models with load_pretrained_model=False)"
    )


def downsample_avg(in_channels, out_channels, kernel_size, stride=1,
                   dilation=1, first_dilation=None, norm_layer=None):
    """timm 0.4.5 resnet.py helper (avg-pool downsample shortcut)."""
    norm_layer = norm_layer or nn.BatchNorm2d
    assert dilation == 1, "stub supports dilation=1 only (all the reference uses)"
    if stride == 1:
        pool = nn.Identity()
    else:
        pool = nn.AvgPool2d(2, stride, ceil_mode=True, count_include_pad=False)
    return nn.Sequential(
        pool,
        nn.Conv2d(in_channels, out_channels, 1, stride=1, padding=0, bias=False),
        norm_layer(out_channels),
    )


# ---------------------------------------------------------------------------
# torchaudio.compliance.kaldi.get_mel_banks (Kaldi definition)
# ---------------------------------------------------------------------------


def _mel_scale_kaldi(freq):
    return 1127.0 * (1.0 + freq / 700.0).log()


def get_mel_banks(num_bins, window_length_padded, sample_freq,
                  low_freq, high_freq, vtln_low, vtln_high, vtln_warp_factor):
    """Kaldi triangular mel banks -> (bins [num_bins, n_fft//2], center_freqs)."""
    assert num_bins > 3, "Must have at least 3 mel bins"
    assert window_length_padded % 2 == 0
    assert vtln_warp_factor == 1.0, "stub supports no VTLN warping (reference passes 1.0)"
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    assert 0.0 <= low_freq < nyquist and 0.0 < high_freq <= nyquist and low_freq < high_freq

    fft_bin_width = sample_freq / window_length_padded
    mel_low_freq = 1127.0 * math.log(1.0 + low_freq / 700.0)
    mel_high_freq = 1127.0 * math.log(1.0 + high_freq / 700.0)
    mel_freq_delta = (mel_high_freq - mel_low_freq) / (num_bins + 1)

    bin_idx = torch.arange(num_bins, dtype=torch.float64).unsqueeze(1)
    left_mel = mel_low_freq + bin_idx * mel_freq_delta
    center_mel = mel_low_freq + (bin_idx + 1.0) * mel_freq_delta
    right_mel = mel_low_freq + (bin_idx + 2.0) * mel_freq_delta
    center_freqs = 700.0 * ((center_mel / 1127.0).exp() - 1.0)

    mel = _mel_scale_kaldi(
        fft_bin_width * torch.arange(num_fft_bins, dtype=torch.float64)
    ).unsqueeze(0)
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    bins = torch.max(torch.zeros(1, dtype=torch.float64),
                     torch.min(up_slope, down_slope))
    return bins.to(torch.get_default_dtype()), center_freqs.to(torch.get_default_dtype())


# ---------------------------------------------------------------------------
# torchlibrosa surface (HTSAT frontend)
# ---------------------------------------------------------------------------


def _slaney_mel_weights(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel(htk=False, norm='slaney') weights [n_mels, 1+n_fft//2]."""

    def hz_to_mel(f):
        f = np.asanyarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        if mels.ndim:
            log_t = f >= min_log_hz
            mels[log_t] = min_log_mel + np.log(f[log_t] / min_log_hz) / logstep
        elif f >= min_log_hz:
            mels = min_log_mel + np.log(f / min_log_hz) / logstep
        return mels

    def mel_to_hz(m):
        m = np.asanyarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        if m.ndim:
            log_t = m >= min_log_mel
            freqs[log_t] = min_log_hz * np.exp(logstep * (m[log_t] - min_log_mel))
        elif m >= min_log_mel:
            freqs = min_log_hz * np.exp(logstep * (m - min_log_mel))
        return freqs

    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


class Spectrogram(nn.Module):
    def __init__(self, n_fft=2048, hop_length=None, win_length=None,
                 window="hann", center=True, pad_mode="reflect", power=2.0,
                 freeze_parameters=True):
        super().__init__()
        assert window == "hann"
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 4
        self.win_length = win_length or n_fft
        self.center = center
        self.pad_mode = pad_mode
        self.power = power
        self.register_buffer("window_fn", torch.hann_window(self.win_length))

    def forward(self, x):
        # input (batch, samples) -> (batch, 1, time_steps, freq_bins)
        spec = torch.stft(
            x, n_fft=self.n_fft, hop_length=self.hop_length,
            win_length=self.win_length, window=self.window_fn,
            center=self.center, pad_mode=self.pad_mode,
            normalized=False, onesided=True, return_complex=True,
        )
        mag2 = spec.real ** 2 + spec.imag ** 2
        if self.power != 2.0:
            mag2 = mag2 ** (self.power / 2.0)
        return mag2.transpose(1, 2).unsqueeze(1)


class LogmelFilterBank(nn.Module):
    def __init__(self, sr=22050, n_fft=2048, n_mels=64, fmin=0.0, fmax=None,
                 is_log=True, ref=1.0, amin=1e-10, top_db=80.0,
                 freeze_parameters=True):
        super().__init__()
        self.is_log = is_log
        self.ref = ref
        self.amin = amin
        self.top_db = top_db
        melW = torch.from_numpy(_slaney_mel_weights(sr, n_fft, n_mels, fmin, fmax).T)
        self.register_buffer("melW", melW)

    def forward(self, x):
        mel = torch.matmul(x, self.melW)
        if self.is_log:
            mel = self.power_to_db(mel)
        return mel

    def power_to_db(self, x):
        log_spec = 10.0 * torch.log10(torch.clamp(x, min=self.amin))
        log_spec -= 10.0 * np.log10(np.maximum(self.amin, self.ref))
        if self.top_db is not None:
            log_spec = torch.clamp(log_spec, min=log_spec.max().item() - self.top_db)
        return log_spec


class SpecAugmentation(nn.Module):
    """Train-only masking; live-oracle tests run in eval mode -> identity."""

    def __init__(self, time_drop_width, time_stripes_num,
                 freq_drop_width, freq_stripes_num):
        super().__init__()
        self.time_drop_width = time_drop_width
        self.time_stripes_num = time_stripes_num
        self.freq_drop_width = freq_drop_width
        self.freq_stripes_num = freq_stripes_num

    def forward(self, x):
        if not self.training:
            return x
        raise RuntimeError("SpecAugmentation stub implements eval mode only")


# ---------------------------------------------------------------------------
# sed_scores_eval surface (create/validate score dataframes)
# ---------------------------------------------------------------------------


def create_score_dataframe(scores, timestamps, event_classes):
    """sed_scores_eval layout: columns (onset, offset, *classes), row t
    spanning [timestamps[t], timestamps[t+1])."""
    import pandas as pd

    scores = np.asarray(scores)
    timestamps = np.asarray(timestamps, dtype=np.float64)
    assert scores.ndim == 2 and len(timestamps) == scores.shape[0] + 1
    assert scores.shape[1] == len(event_classes)
    return pd.DataFrame(
        np.concatenate([timestamps[:-1, None], timestamps[1:, None], scores], axis=1),
        columns=["onset", "offset", *event_classes],
    )


def validate_score_dataframe(df, timestamps=None, event_classes=None):
    cols = list(df.columns)
    assert cols[:2] == ["onset", "offset"], cols
    ts = np.concatenate([df["onset"].to_numpy(), df["offset"].to_numpy()[-1:]])
    return ts, cols[2:]


# ---------------------------------------------------------------------------
# sys.modules installation
# ---------------------------------------------------------------------------


def _module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def install() -> None:
    """Idempotently install the stub packages into ``sys.modules``.

    Real installations (if ever present in the image) win: we skip any
    top-level package that already imports.
    """
    for pkg in ("timm", "torchaudio", "torchlibrosa"):
        if pkg in sys.modules and not getattr(sys.modules[pkg], "__t4s_stub__", False):
            continue  # already installed (real or stub)

    if "timm" not in sys.modules:
        timm = _module("timm")
        timm.__t4s_stub__ = True
        timm.__version__ = "0.4.5"
        timm.create_model = create_model
        models = _module("timm.models")
        layers = _module("timm.models.layers")
        layers_helpers = _module("timm.models.layers.helpers")
        vit = _module("timm.models.vision_transformer")
        helpers = _module("timm.models.helpers")
        timm.models = models
        models.layers = layers
        models.vision_transformer = vit
        models.helpers = helpers
        layers.helpers = layers_helpers
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        layers_helpers.to_2tuple = to_2tuple
        resnet = _module("timm.models.resnet")
        models.resnet = resnet
        resnet.downsample_avg = downsample_avg
        vit.Block = Block
        vit.PatchEmbed = _TimmPatchEmbed
        vit.Attention = Attention
        vit.Mlp = Mlp
        vit.DropPath = DropPath
        vit.trunc_normal_ = trunc_normal_
        helpers.load_pretrained = load_pretrained

    if "torchaudio" not in sys.modules:
        ta = _module("torchaudio")
        ta.__t4s_stub__ = True
        compliance = _module("torchaudio.compliance")
        kaldi = _module("torchaudio.compliance.kaldi")
        ta.compliance = compliance
        compliance.kaldi = kaldi
        kaldi.get_mel_banks = get_mel_banks

    if "sed_scores_eval" not in sys.modules:
        sse = _module("sed_scores_eval")
        sse.__t4s_stub__ = True
        base = _module("sed_scores_eval.base_modules")
        scores_mod = _module("sed_scores_eval.base_modules.scores")
        sse.base_modules = base
        base.scores = scores_mod
        scores_mod.create_score_dataframe = create_score_dataframe
        scores_mod.validate_score_dataframe = validate_score_dataframe

    if "codecarbon" not in sys.modules:
        cc = _module("codecarbon")
        cc.__t4s_stub__ = True

        class OfflineEmissionsTracker:  # no-op carbon tracker
            def __init__(self, *args, **kwargs):
                pass

            def start(self):
                pass

            def stop(self):
                return 0.0

        cc.OfflineEmissionsTracker = OfflineEmissionsTracker

    if "wget" not in sys.modules:
        wget = _module("wget")
        wget.__t4s_stub__ = True

        def _no_download(*args, **kwargs):  # pragma: no cover - guarded path
            raise RuntimeError("wget stub: downloads are not available in tests")

        wget.download = _no_download

    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tv.__t4s_stub__ = True
        ops = _module("torchvision.ops")
        tv.ops = ops

        def drop_block2d(input, p, block_size, inplace=False, eps=1e-6, training=True):
            # torchvision.ops.drop_block2d: identity when eval or p==0 —
            # the only paths live-oracle tests take (reference resnet.py:5)
            if not training or p == 0.0:
                return input
            raise RuntimeError("torchvision stub implements eval/p=0 drop_block2d only")

        ops.drop_block2d = drop_block2d

    # -- import-surface-only stubs for the RECIPE trainer modules ---------
    # (recipes/desed/finetune/train.py etc. import these at module top;
    # the live trainer tests never call into them — train() touches only
    # torch + src.preprocess + src.utils)
    if "torchmetrics" not in sys.modules:
        tm = _module("torchmetrics")
        tm.__t4s_stub__ = True

        class _UnusedMetric:  # constructor-only placeholder
            def __init__(self, *args, **kwargs):
                raise RuntimeError("torchmetrics stub: not usable in live tests")

        class MultilabelF1Score:
            """Functional torchmetrics parity: thresholded multilabel F1,
            macro-averaged, zero-division -> 0 per class (the semantics
            the reference validation relies on, finetune/train.py:277-287).
            Used LIVE by the eval-system oracle, so implemented for real."""

            def __init__(self, num_labels, average="macro",
                         compute_on_step=False, threshold=0.5, **kwargs):
                assert average == "macro", average
                self.threshold = threshold
                self.tp = torch.zeros(num_labels, dtype=torch.float64)
                self.fp = torch.zeros(num_labels, dtype=torch.float64)
                self.fn = torch.zeros(num_labels, dtype=torch.float64)

            def to(self, device):
                return self

            def __call__(self, preds, target):
                p = preds >= self.threshold
                t = target.bool()
                self.tp += (p & t).sum(0).double()
                self.fp += (p & ~t).sum(0).double()
                self.fn += (~p & t).sum(0).double()

            def compute(self):
                denom = 2 * self.tp + self.fp + self.fn
                f1 = torch.where(denom > 0, 2 * self.tp / denom.clamp(min=1), torch.zeros_like(denom))
                return f1.mean()

        tm.Metric = _UnusedMetric
        tm.AveragePrecision = _UnusedMetric
        cls_mod = _module("torchmetrics.classification")
        tm.classification = cls_mod
        cls_mod.MultilabelAveragePrecision = _UnusedMetric
        cls_mod.MultilabelF1Score = MultilabelF1Score
        f_beta = _module("torchmetrics.classification.f_beta")
        cls_mod.f_beta = f_beta
        f_beta.MultilabelF1Score = MultilabelF1Score

    if "psds_eval" not in sys.modules:
        pe = _module("psds_eval")
        pe.__t4s_stub__ = True

        class PSDSEvalError(Exception):
            pass

        class _UnusedPSDSEval:
            def __init__(self, *args, **kwargs):
                raise RuntimeError("psds_eval stub: not usable in live tests")

        pe.PSDSEval = _UnusedPSDSEval
        pe.plot_psd_roc = lambda *a, **k: None
        psds_mod = _module("psds_eval.psds")
        pe.psds = psds_mod
        psds_mod.PSDSEvalError = PSDSEvalError

    if "sed_eval" not in sys.modules:
        se = _module("sed_eval")
        se.__t4s_stub__ = True
        sound_event = _module("sed_eval.sound_event")
        se.sound_event = sound_event

        class _UnusedMetrics:
            def __init__(self, *args, **kwargs):
                raise RuntimeError("sed_eval stub: not usable in live tests")

        sound_event.EventBasedMetrics = _UnusedMetrics
        sound_event.SegmentBasedMetrics = _UnusedMetrics

    if "torchlibrosa" not in sys.modules:
        tl = _module("torchlibrosa")
        tl.__t4s_stub__ = True
        stft = _module("torchlibrosa.stft")
        aug = _module("torchlibrosa.augmentation")
        tl.stft = stft
        tl.augmentation = aug
        stft.Spectrogram = Spectrogram
        stft.LogmelFilterBank = LogmelFilterBank
        aug.SpecAugmentation = SpecAugmentation
