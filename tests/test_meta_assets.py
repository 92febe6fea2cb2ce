"""Vendored meta/ label tables: presence, reference ordering, resolution.

The reference vendors behavior-defining label tables
(``/root/reference/meta/``); these tests pin the vendored copies so the
AudioSet/DASM stages run with reference-identical class order out of
the box.
"""

import json
import os

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(rel):
    with open(os.path.join(REPO, rel)) as f:
        return json.load(f)


class TestVendoredAssets:
    def test_audioset_labeldict_order(self):
        """447 classes in the reference index order
        (labeldict_audioset_strong.json: 'Cacophony'=0 ... 'Sniff'=446)."""
        ld = _load("meta/audioset_strong/labeldict_audioset_strong.json")
        assert len(ld) == 447
        assert sorted(ld.values()) == list(range(447))
        assert ld["Cacophony"] == 0 and ld["Sniff"] == 446

        from transformer4sed_tpu.recipes.audioset_strong import load_label_dict

        labels = load_label_dict(
            os.path.join(REPO, "meta/audioset_strong/labeldict_audioset_strong.json")
        )
        assert labels[0] == "Cacophony" and labels[446] == "Sniff"

    def test_state_type_map(self):
        """common/rare map covers the label space (405 of 447 typed — the
        reference drops some classes from val; split_psds_by_type
        tolerates the gap via 'unknown')."""
        ld = _load("meta/audioset_strong/labeldict_audioset_strong.json")
        sm = _load("meta/audioset_strong/state.json")
        assert set(sm.values()) == {"common", "rare"}
        assert len(set(sm) & set(ld)) >= 400

    def test_desed_labeldict_matches_default_config(self):
        dl = _load("meta/desed/labeldict_DESED.json")
        order = [k for k, _ in sorted(dl.items(), key=lambda kv: kv[1])]
        with open(os.path.join(REPO, "config/mat-sed/base.yaml")) as f:
            cfg = yaml.safe_load(f)
        assert order == cfg["dataset"]["labels"]

    def test_openset_labels(self):
        op = _load("meta/audioset_strong/hierarchical/openset_label.json")
        assert isinstance(op, list) and len(op) > 30
        assert all(isinstance(x, str) for x in op)

    def test_weight_tables_parse(self):
        import pandas as pd

        for rel in (
            "meta/audioset_strong/train/weight.tsv",
            "meta/audioset_strong/hierarchical/reweight.tsv",
        ):
            df = pd.read_csv(os.path.join(REPO, rel), sep="\t")
            assert {"filename", "weight"} <= set(df.columns)
            assert (df["weight"] > 0).all()
            assert len(df) > 90_000

    def test_resolve_meta_path_from_other_cwd(self, tmp_path, monkeypatch):
        from transformer4sed_tpu.recipes.common import resolve_meta_path

        monkeypatch.chdir(tmp_path)
        rel = "meta/audioset_strong/state.json"
        resolved = resolve_meta_path(rel)
        assert os.path.isabs(resolved) and os.path.exists(resolved)
        # absolute and existing cwd-relative paths pass through untouched
        assert resolve_meta_path(resolved) == resolved
        (tmp_path / "local.json").write_text("{}")
        assert resolve_meta_path("local.json") == "local.json"
