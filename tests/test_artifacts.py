"""Artifact contract tests: run-dir naming/parsing, discovery, CSV, curves."""

import json
import os

import numpy as np

from multimodal_vqvae_compression_audio_tactile_tpu.utils import artifacts


class TestRunDirContract:
    def test_name_roundtrip(self):
        assert artifacts.run_dir_name(6, 128) == "rvqB6_K128"

    def test_parse_from_meta(self, tmp_path):
        d = tmp_path / "rvqB6_K128"
        d.mkdir()
        artifacts.write_meta(str(d), {"rvq_books": 10, "rvq_embed": 512})
        # meta wins over the directory name (reference behavior)
        assert artifacts.parse_run_dir(str(d)) == (10, 512)

    def test_parse_fallback_to_dirname(self, tmp_path):
        d = tmp_path / "rvqB3_K256"
        d.mkdir()
        assert artifacts.parse_run_dir(str(d)) == (3, 256)

    def test_parse_corrupt_meta_falls_back(self, tmp_path):
        d = tmp_path / "rvqB2_K128"
        d.mkdir()
        (d / "meta.json").write_text("{not json")
        assert artifacts.parse_run_dir(str(d)) == (2, 128)

    def test_parse_unparseable_returns_none(self, tmp_path):
        d = tmp_path / "something_else"
        d.mkdir()
        assert artifacts.parse_run_dir(str(d)) is None

    def test_discover_runs_sorted_dirs_only(self, tmp_path):
        for name in ["rvqB2_K128", "rvqB10_K512", "unrelated"]:
            (tmp_path / name).mkdir()
        (tmp_path / "rvqB1_K128.txt").write_text("")  # file, not dir
        runs = artifacts.discover_runs(str(tmp_path))
        assert [os.path.basename(r) for r in runs] == ["rvqB10_K512", "rvqB2_K128"]


class TestWriters:
    def test_csv_filters_fields(self, tmp_path):
        p = str(tmp_path / "s.csv")
        artifacts.write_csv(p, [{"a": 1, "b": 2, "junk": 3}], ["a", "b"])
        lines = open(p).read().strip().split("\n")
        assert lines[0] == "a,b"
        assert lines[1] == "1,2"

    def test_hist_and_curves(self, tmp_path):
        hist = {"train": [1.0, 0.5], "val": [1.1, 0.6]}
        artifacts.write_hist(str(tmp_path), hist)
        out = artifacts.write_curves(str(tmp_path), hist)
        assert json.load(open(tmp_path / "hist.json")) == hist
        assert os.path.exists(out)
