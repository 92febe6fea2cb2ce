"""PMAM end-to-end on synthetic audio: feature extraction -> GMM ->
pseudo-label TSVs -> FrameWiseLabeledDataset -> prototype-BCE step.

The full four-stage loop of SURVEY.md §3.3 on tiny shapes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from scipy.io import wavfile

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.data import DataLoader, FrameWiseLabeledDataset, UnlabeledDataset
from transformer4sed_tpu.frontend import PasstFrontend
from transformer4sed_tpu.pmam import (
    GaussianMixture,
    PMAMConfig,
    extract_frame_features,
    generate_pseudo_labels,
    make_pmam_step,
)
from transformer4sed_tpu.train.mlm import MLMState

SR = 32000
CLIP_SECONDS = 1.2
N_SAMPLES = int(SR * CLIP_SECONDS)
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pmam_wavs")
    rng = np.random.RandomState(0)
    for i in range(4):
        wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.05
        wavfile.write(str(d / f"u{i}.wav"), SR, (wav * 32767).astype(np.int16))
    return str(d)


def test_pmam_full_loop(wav_dir, tmp_path):
    from tests.test_recipes_e2e import tiny_sed_model

    codec = LabelCodec(labels=("a", "b"), audio_len=CLIP_SECONDS, frame_len=1024,
                       frame_hop=320, sr=SR)
    model = tiny_sed_model(
        class_num=2,
        at_adapter=False,
        mlm=True,
        mlm_dict={"mask_rate": 0.75, "strategy": "block", "block_width": 10, "out_dim": 32},
    )
    frontend = PasstFrontend()

    ds = UnlabeledDataset(wav_dir, True, codec)
    loader = DataLoader(ds, batch_size=2, num_workers=0, drop_last=False)

    mel0 = frontend.normalize(frontend(jnp.zeros((1, N_SAMPLES))))
    variables = model.init({"params": KEY, "mlm": KEY}, mel0)

    # stage 1: tap decoder-block features
    mels, names = [], []
    for batch in loader:
        mels.append(frontend.normalize(frontend(jnp.asarray(batch["wav"]))))
        names.append(batch["filename"])
    feats = extract_frame_features(
        model, variables, mels, feature_layer="transformer_0", downsample_rate=4
    )
    assert feats.shape[1] == 32 and len(feats) > 0

    # stage 2: GMM over features
    gmm = GaussianMixture(num_components=3, covariance_type="diag", n_iter=10).fit(feats)
    assert gmm.means.shape == (3, 32)

    # stage 3: per-clip pseudo-label TSVs
    out_dir = str(tmp_path / "pseudo")
    n = generate_pseudo_labels(
        model, variables, gmm, mels, names, out_dir, feature_layer="transformer_0",
        label_sr=100.0,
    )
    assert n == 4
    tsvs = sorted(os.listdir(out_dir))
    assert len(tsvs) == 4 and tsvs[0].endswith(".tsv")

    # stage 4: FrameWiseLabeledDataset feeds the prototype-BCE step
    fw = FrameWiseLabeledDataset(out_dir, wav_dir, False, codec)
    fw_loader = DataLoader(fw, batch_size=2, num_workers=0, drop_last=False)
    batch = next(iter(fw_loader))
    assert batch["label"].shape[1] == 3  # K prototypes

    def model_apply(params, mel_in, train=False, rngs=None, **kw):
        return model.apply({"params": params}, mel_in, train=train, rngs=rngs, **kw)

    tx = optax.adamw(1e-3)
    state = MLMState(
        params=variables["params"], opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    # the pseudo-label grid is at 100 Hz over 1.2 s = 120 frames = decoder frames
    step = jax.jit(make_pmam_step(model_apply, frontend, tx, gmm.means, PMAMConfig()))
    state, metrics = step(
        state,
        {"wav": jnp.asarray(batch["wav"]), "labels": jnp.asarray(batch["label"])},
        KEY,
    )
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state.step) == 1
