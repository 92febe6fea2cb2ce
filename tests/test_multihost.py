"""Multi-host execution primitives (parallel/multihost.py).

The image is single-process, so these tests exercise (a) the exact
degenerate behavior at process_count == 1 that every recipe rides, and
(b) the sharding/gather logic itself with process_index/process_count
injected explicitly (what each of N processes would produce, and that
the union reassembles the global structure).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer4sed_tpu.parallel.multihost import (
    ProcessShardedBatchSampler,
    gather_clip_scores,
    gather_objects,
    is_primary,
    make_global_batch,
    maybe_initialize,
    shard_batch_indices,
    shard_eval_items,
)


class TestShardBatchIndices:
    def test_single_process_identity(self):
        assert shard_batch_indices([3, 1, 4, 1, 5], 0, 1) == [3, 1, 4, 1, 5]

    def test_contiguous_chunks_cover_global(self):
        global_batch = list(range(12))
        chunks = [shard_batch_indices(global_batch, pi, 4) for pi in range(4)]
        assert all(len(c) == 3 for c in chunks)
        # contiguity: process pi owns rows [pi*3, (pi+1)*3) — the rows its
        # devices hold under P('data') with jax.devices() ordering
        assert [i for c in chunks for i in c] == global_batch

    def test_indivisible_raises_loudly(self):
        with pytest.raises(ValueError, match="not divisible"):
            shard_batch_indices(list(range(10)), 0, 4)

    def test_sampler_wrapper_composition(self):
        from transformer4sed_tpu.data.sampler import ConcatBatchSampler, RandomSampler

        base = lambda: ConcatBatchSampler(
            [RandomSampler(8, 0), RandomSampler(8, 1)], [2, 2]
        )
        global_batches = list(base())
        per_proc = []
        for pi in range(2):
            s = ProcessShardedBatchSampler(base(), pi=pi, pc=2)
            per_proc.append(list(s))
        assert len(per_proc[0]) == len(global_batches)
        for g, a, b in zip(global_batches, per_proc[0], per_proc[1]):
            assert a + b == g  # order-preserving reassembly

    def test_dataloader_process_shard_noop_single_process(self):
        from transformer4sed_tpu.data.loader import DataLoader

        class Toy:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return {"x": np.full((3,), i, np.float32)}

        plain = list(DataLoader(Toy(), batch_size=4, num_workers=0))
        sharded = list(DataLoader(Toy(), batch_size=4, num_workers=0, process_shard=True))
        assert len(plain) == len(sharded)
        for a, b in zip(plain, sharded):
            np.testing.assert_array_equal(a["x"], b["x"])


class TestEvalSharding:
    def test_strided_partition(self):
        items = [f"clip{i}" for i in range(7)]
        shards = [shard_eval_items(items, pi, 3) for pi in range(3)]
        assert sorted(x for s in shards for x in s) == sorted(items)
        assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1

    def test_single_process_identity(self):
        assert shard_eval_items(["a", "b"], 0, 1) == ["a", "b"]


class TestGather:
    def test_gather_objects_single_process(self):
        obj = {"a": np.arange(3), "b": ["x"]}
        out = gather_objects(obj)
        assert len(out) == 1 and out[0] is obj

    def test_gather_clip_scores_single_process(self):
        scores = {"clip0": np.ones((4, 2))}
        assert gather_clip_scores(scores) == scores

    def test_padded_u8_roundtrip_simulated(self, monkeypatch):
        """The length-exchange + padded-payload protocol, with
        process_allgather simulated for 3 processes of unequal sizes."""
        import pickle

        import transformer4sed_tpu.parallel.multihost as mh

        objs = [{"p": 0}, {"p": 1, "extra": np.arange(5)}, {"p": 2, "s": "x" * 100}]
        payloads = [pickle.dumps(o, protocol=pickle.HIGHEST_PROTOCOL) for o in objs]
        lengths = np.asarray([len(p) for p in payloads], np.int64)

        def fake_allgather(x):
            # simulate: every process contributed its own max-padded buffer
            maxlen = int(lengths.max())
            out = np.zeros((3, maxlen), np.uint8)
            for i, p in enumerate(payloads):
                out[i, : len(p)] = np.frombuffer(p, np.uint8)
            return out

        monkeypatch.setattr(
            "jax.experimental.multihost_utils.process_allgather", fake_allgather
        )
        buf = np.frombuffer(payloads[0], np.uint8)
        got = mh._allgather_padded_u8(buf, lengths)
        for g, o in zip(got, objs):
            loaded = pickle.loads(g)
            assert loaded.keys() == o.keys()

    def test_gather_clip_scores_merges_disjoint(self, monkeypatch):
        import transformer4sed_tpu.parallel.multihost as mh

        parts = [{"clip0": 1}, {"clip1": 2}, {"clip2": 3}]
        monkeypatch.setattr(mh, "gather_objects", lambda obj: parts)
        merged = gather_clip_scores(parts[0])
        assert merged == {"clip0": 1, "clip1": 2, "clip2": 3}


class TestGlobalBatch:
    def test_single_process_matches_device_put(self):
        from transformer4sed_tpu.parallel import make_mesh, put_batch

        mesh = make_mesh(min(8, jax.device_count()))
        batch = {"wav": np.random.RandomState(0).randn(8, 16).astype(np.float32)}
        out = put_batch(batch, mesh)
        np.testing.assert_array_equal(np.asarray(out["wav"]), batch["wav"])
        from jax.sharding import PartitionSpec as P

        assert out["wav"].sharding.spec == P("data")

    def test_make_global_batch_is_put_batch_alias(self):
        from transformer4sed_tpu.parallel import make_mesh

        mesh = make_mesh(1)
        out = make_global_batch({"x": np.ones((4, 2), np.float32)}, mesh)
        assert np.asarray(out["x"]).sum() == 8.0


class TestPrimaryGating:
    def test_single_process_is_primary(self):
        assert is_primary()

    def test_maybe_initialize_noop_without_request(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("T4S_MULTIHOST", raising=False)
        assert maybe_initialize() is False

    def test_maybe_initialize_never_touches_the_backend(self, monkeypatch):
        """The request guard must consult only the distributed-client
        state: jax.process_count() would itself initialize the XLA
        backend, after which jax.distributed.initialize raises
        RuntimeError — the entry point would crash in exactly the case
        it exists for."""
        monkeypatch.setenv("T4S_MULTIHOST", "1")

        def poisoned(*a, **k):  # any backend-initializing call = bug
            raise AssertionError("maybe_initialize touched the XLA backend")

        monkeypatch.setattr(jax, "process_count", poisoned)
        monkeypatch.setattr(jax, "devices", poisoned)
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        calls = {}
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: calls.setdefault("kw", kw)
        )
        assert maybe_initialize() is True
        assert "kw" in calls

    def test_maybe_initialize_idempotent_when_client_exists(self, monkeypatch):
        monkeypatch.setenv("T4S_MULTIHOST", "1")
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)

        def boom(**kw):
            raise AssertionError("re-initialized an existing distributed client")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        assert maybe_initialize() is True

    def test_save_params_called_on_every_process(self, tmp_path, monkeypatch):
        """Orbax save runs cross-host barriers internally and must be
        called by ALL hosts — a process-0 gate would deadlock the
        primary at the first barrier (the round-3 review finding)."""
        from transformer4sed_tpu.utils import checkpoint as ck

        calls = []

        class FakeCkptr:
            def save(self, path, tree, force=False):
                calls.append(path)

        monkeypatch.setattr(ck, "_ckptr", lambda: FakeCkptr())
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        ck.save_params(str(tmp_path / "best"), {"w": np.ones(2)})
        assert len(calls) == 1

    def test_save_checkpoint_backup_rename_is_primary_only(self, tmp_path, monkeypatch):
        from transformer4sed_tpu.utils import checkpoint as ck

        calls = []

        class FakeCkptr:
            def save(self, path, tree, force=False):
                calls.append(path)

        monkeypatch.setattr(ck, "_ckptr", lambda: FakeCkptr())
        monkeypatch.setattr(ck, "_async_ckptr", lambda: None)
        target = tmp_path / "last_state"
        target.mkdir()
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        ck.save_checkpoint(str(target), {"w": np.ones(2)}, async_save=False)
        # non-primary: orbax still called, no fs munging
        assert len(calls) == 1
        assert not (tmp_path / "last_state.prev").exists()
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        ck.save_checkpoint(str(target), {"w": np.ones(2)}, async_save=False)
        assert (tmp_path / "last_state.prev").exists()

    def test_best_models_flush_saves_everywhere_json_primary_only(
        self, tmp_path, monkeypatch
    ):
        from transformer4sed_tpu.utils import checkpoint as ck
        from transformer4sed_tpu.utils.logging import BestModels

        saved = []
        monkeypatch.setattr(ck, "save_params", lambda path, tree: saved.append(path))
        best = BestModels(str(tmp_path), flush_every=1)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        best.update(0, 0.5, {"w": np.ones(2)})
        assert saved  # orbax path runs on non-primary too (barrier contract)
        assert not (tmp_path / "best_metric.json").exists()
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        best.update(1, 0.7, {"w": np.ones(2)})
        assert (tmp_path / "best_metric.json").exists()


class TestEvalLocalization:
    def test_local_eval_mesh_single_process_is_train_mesh(self):
        from transformer4sed_tpu.parallel import make_mesh
        from transformer4sed_tpu.parallel.multihost import local_eval_mesh

        mesh = make_mesh(min(8, jax.device_count()))
        assert local_eval_mesh(mesh) is mesh

    def test_process_shard_items_noop_single_process(self):
        from transformer4sed_tpu.data.loader import DataLoader

        class Toy:
            def __len__(self):
                return 7

            def __getitem__(self, i):
                return {"x": np.full((2,), i, np.float32)}

        plain = list(DataLoader(Toy(), batch_size=3, num_workers=0, drop_last=False))
        split = list(
            DataLoader(
                Toy(), batch_size=3, num_workers=0, drop_last=False,
                process_shard_items=True,
            )
        )
        assert len(plain) == len(split)
        for a, b in zip(plain, split):
            np.testing.assert_array_equal(a["x"], b["x"])

    def test_process_shard_items_strided_union(self, monkeypatch):
        from transformer4sed_tpu.data import loader as loader_mod

        class Toy:
            def __len__(self):
                return 7

            def __getitem__(self, i):
                return {"x": np.full((2,), i, np.float32)}

        seen = []
        for pi in range(3):
            monkeypatch.setattr(jax, "process_count", lambda: 3)
            monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
            dl = loader_mod.DataLoader(
                Toy(), batch_size=2, num_workers=0, drop_last=False,
                process_shard_items=True,
            )
            for batch in dl:
                seen.extend(int(v[0]) for v in batch["x"])
        assert sorted(seen) == list(range(7))  # disjoint cover, no padding

    def test_process_shard_items_rejects_custom_sampler(self):
        from transformer4sed_tpu.data.loader import DataLoader
        from transformer4sed_tpu.data.sampler import SequentialSampler

        class Toy:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return {"x": np.zeros(1, np.float32)}

        with pytest.raises(ValueError, match="process_shard_items"):
            DataLoader(
                Toy(), sampler=SequentialSampler(4), batch_size=2,
                process_shard_items=True,
            )

    def test_put_train_batch_without_mesh(self):
        from transformer4sed_tpu.recipes.common import put_train_batch

        out = put_train_batch({"wav": np.ones((4, 8), np.float32)}, None)
        assert isinstance(out["wav"], jnp.ndarray)

    def test_put_train_batch_with_mesh_shards(self):
        from transformer4sed_tpu.parallel import make_mesh
        from transformer4sed_tpu.recipes.common import put_train_batch
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh(min(8, jax.device_count()))
        out = put_train_batch({"wav": np.ones((8, 4), np.float32)}, mesh)
        assert out["wav"].sharding.spec == P("data")
