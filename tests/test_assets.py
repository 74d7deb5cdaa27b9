"""Standalone-assets coverage (round-1 verdict item 9): fetch_assets
populates a fresh root, and resolve_asset finds every file through
$GEMBENCH_ASSETS_ROOT without touching the upstream checkout."""
import json
import os

import pytest

from robot3dlotus_tpu.scripts.fetch_assets import ASSET_FILES, fetch
from robot3dlotus_tpu.utils import assets as assets_mod

UPSTREAM = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(UPSTREAM),
                    reason="no local upstream checkout to fetch from")
def test_fetch_assets_and_resolve(tmp_path, monkeypatch):
    written = fetch(str(tmp_path), src=UPSTREAM)
    assert len(written) == len(ASSET_FILES)

    monkeypatch.setenv("GEMBENCH_ASSETS_ROOT", str(tmp_path))
    # resolution must hit the fresh root, not the upstream fallback
    for rel in ASSET_FILES:
        resolved = assets_mod.resolve_asset(rel)
        assert resolved == str(tmp_path / rel), resolved
        assert os.path.exists(resolved)

    # split sizes pin the benchmark definition (SURVEY.md §2a assets row)
    counts = {"assets/taskvars_train.json": 31,
              "assets/taskvars_test_l2.json": 28,
              "assets/taskvars_test_l3.json": 21,
              "assets/taskvars_test_l4.json": 12}
    for rel, n in counts.items():
        data = json.load(open(tmp_path / rel))
        assert len(data) == n, (rel, len(data))


def test_fetch_assets_missing_src(tmp_path):
    with pytest.raises(FileNotFoundError):
        fetch(str(tmp_path), src=str(tmp_path / "nonexistent"))
