"""Tests for the measurement/summary tools that have CPU-runnable logic."""

import jax
import numpy as np
import pytest

from tools.model_summary import summarize
from x3d_multigrid_tpu.models import x3d


class TestModelSummary:
    def test_m_matches_reference_param_count(self):
        # 3,794,322 is the parameter count of the reference torch model
        # (M, 400 classes) — the .pt converter maps keys 1:1
        # (tests/test_reference_parity.py), so the counts must agree.
        cfg = x3d.x3d_config("M", n_classes=400)
        rows, (params, gflops) = summarize(cfg)
        assert params == 3_794_322
        assert abs(sum(r[1] for r in rows) - params) == 0
        assert 5.0 < gflops < 15.0  # 16x224^2 forward, sanity band

    def test_totals_match_real_init(self):
        cfg = x3d.x3d_config("S", n_classes=11, task="loc",
                             blocks_override=(1, 1, 2, 1))
        _, (params, _) = summarize(cfg, batch=2, frames=4, crop=64)
        real = x3d.init_params(jax.random.PRNGKey(0), cfg)
        real_n = sum(int(np.prod(l.shape))
                     for l in jax.tree_util.tree_leaves(real))
        assert params == real_n

    def test_loc_head_shape(self):
        cfg = x3d.x3d_config("M", n_classes=157, task="loc")
        rows, _ = summarize(cfg, batch=3, frames=8, crop=160)
        assert rows[-1][2] == (3, 8, 157)


class TestBenchFlow:
    """Driver contract: `python bench.py` must exit 0 and print exactly
    one parsable JSON headline line (round 2's rc=124 regression guard).
    --tiny exercises the full budget/estimator/JSON plumbing on CPU."""

    @pytest.mark.slow
    def test_tiny_bench_emits_one_json_headline(self, tmp_path):
        import json
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # Deliberately a FRESH cache dir: the run is cold.  XLA:CPU AOT
        # cache entries are machine-feature-pinned (they refuse to load
        # across differing hosts — observed cpu_aot_loader errors), so
        # committing CPU entries for this test would be dead repo weight;
        # the committed .jax_cache holds only the TPU bench programs.
        env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
        out = subprocess.run(
            [sys.executable, "bench.py", "--tiny", "--steps", "2",
             "--budget", "3000"],
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
            env=env, capture_output=True, text=True, timeout=1500)
        assert out.returncode == 0, out.stderr[-2000:]
        json_lines = [l for l in out.stdout.splitlines()
                      if l.startswith("{")]
        assert len(json_lines) == 1, out.stdout[-2000:]
        parsed = json.loads(json_lines[0])
        assert parsed["metric"] == "multigrid_train_clips_per_sec_per_chip"
        assert parsed["value"] > 0
        assert parsed["unit"] == "clips/s/chip"
        assert "per_bucket" in parsed["detail"]
