"""Streaming scorer: chunk-size invariance + window overlap-add math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.core.codec import LabelCodec

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def setup():
    from tests.test_recipes_e2e import tiny_sed_model
    from transformer4sed_tpu.frontend import PasstFrontend

    codec = LabelCodec(
        labels=("a", "b"), audio_len=1.2, frame_len=1024, frame_hop=320, sr=32000
    )
    model = tiny_sed_model(class_num=2)
    frontend = PasstFrontend()
    mel = frontend.normalize(frontend(jnp.zeros((1, int(1.2 * 32000)))))
    params = model.init({"params": KEY}, mel)["params"]
    return model, frontend, params, codec


def _collect(scorer, wav, chunks):
    rows = []
    pos = 0
    for n in chunks:
        rows.extend(scorer.push(wav[pos : pos + n]))
        pos += n
    assert pos == len(wav)
    rows.extend(scorer.flush())
    return rows


class TestStreamingScorer:
    def test_chunk_size_invariance(self, setup):
        """Identical finalized rows regardless of how the stream is cut."""
        from transformer4sed_tpu.recipes.stream import StreamingScorer

        model, frontend, params, codec = setup
        sr = codec.sr
        wav = np.random.RandomState(0).randn(int(3.0 * sr)).astype(np.float32) * 0.05

        def run(chunks):
            scorer = StreamingScorer(
                model, frontend, params, codec, hop_seconds=0.6,
                median_filter=3, model_kwargs={"temp_w": 0.5},
            )
            return _collect(scorer, wav, chunks)

        n = len(wav)
        a = run([n])  # one shot
        rng = np.random.RandomState(1)
        cuts = []
        left = n
        while left > 0:
            c = min(int(rng.randint(1000, 20000)), left)
            cuts.append(c)
            left -= c
        b = run(cuts)
        assert len(a) == len(b) > 0
        for (ta, sa), (tb, sb) in zip(a, b):
            assert ta == tb
            np.testing.assert_allclose(sa, sb, atol=1e-6)

    def test_matches_manual_overlap_add(self, setup):
        """Finalized frames equal the mean of per-window jit scores."""
        from transformer4sed_tpu.core.filters import apply_class_filter
        from transformer4sed_tpu.recipes.stream import StreamingScorer

        model, frontend, params, codec = setup
        sr = codec.sr
        win = int(codec.audio_len * sr)
        hop = int(0.6 * sr)
        wav = np.random.RandomState(2).randn(int(2.4 * sr)).astype(np.float32) * 0.05

        scorer = StreamingScorer(
            model, frontend, params, codec, hop_seconds=0.6,
            median_filter=3, model_kwargs={"temp_w": 0.5},
        )
        rows = _collect(scorer, wav, [len(wav)])
        t_frames = scorer._frames_per_win

        # manual: same windows (hop grid + final end-anchored), same filter
        def fwd(w):
            mel = frontend.normalize(frontend(jnp.asarray(w[None])))
            out = model.apply({"params": params}, mel, temp_w=0.5)
            s = jnp.transpose(out.strong, (0, 2, 1))
            return np.asarray(apply_class_filter(s, 3, kind="median")[0])

        starts = list(range(0, len(wav) - win + 1, hop))
        final_start = len(wav) - win
        if final_start not in starts:
            starts.append(final_start)
        acc = np.zeros((400, 2)); cnt = np.zeros((400, 1))
        for s0 in starts:
            f0 = int(round(s0 / win * t_frames))
            sc = fwd(wav[s0 : s0 + win])
            acc[f0 : f0 + len(sc)] += sc
            cnt[f0 : f0 + len(sc)] += 1
        sec_per_frame = codec.audio_len / t_frames
        expected = [
            (f * sec_per_frame, acc[f] / cnt[f, 0]) for f in range(400) if cnt[f, 0] > 0
        ]
        n_stream_frames = int(round(len(wav) / win * t_frames))
        expected = [e for e in expected if e[0] < n_stream_frames * sec_per_frame - 1e-9]
        assert len(rows) == len(expected)
        for (ta, sa), (tb, sb) in zip(rows, expected):
            assert abs(ta - tb) < 1e-9
            np.testing.assert_allclose(sa, sb, atol=1e-6)

    def test_memory_bounded_on_long_stream(self, setup):
        """Finalized rows are compacted out of the accumulators: a long
        live stream keeps them O(window), not O(stream)."""
        from transformer4sed_tpu.recipes.stream import StreamingScorer

        model, frontend, params, codec = setup
        sr = codec.sr
        scorer = StreamingScorer(
            model, frontend, params, codec, hop_seconds=0.3,
            median_filter=3, model_kwargs={"temp_w": 0.5},
        )
        rng = np.random.RandomState(4)
        n_rows = 0
        for _ in range(20):  # 12 s total through a 1.2 s window
            n_rows += len(scorer.push(rng.randn(int(0.6 * sr)).astype(np.float32) * 0.05))
        assert n_rows > 0
        # accumulator stays within a few windows of frames
        assert scorer._acc.shape[0] <= 8 * scorer._frames_per_win
        assert scorer._buffer.shape[0] <= scorer.win + int(0.6 * sr)

    def test_short_stream(self, setup):
        """A stream shorter than one window still emits (padded window)."""
        from transformer4sed_tpu.recipes.stream import StreamingScorer

        model, frontend, params, codec = setup
        wav = np.random.RandomState(3).randn(int(0.5 * codec.sr)).astype(np.float32) * 0.05
        scorer = StreamingScorer(
            model, frontend, params, codec, median_filter=3, model_kwargs={"temp_w": 0.5}
        )
        assert scorer.push(wav) == []
        rows = scorer.flush()
        assert len(rows) > 0
        # only frames inside the 0.5 s stream are emitted
        assert rows[-1][0] < 0.5
