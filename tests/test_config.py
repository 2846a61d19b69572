"""Config-file layer (utils/config.py): round-trip, validation, and CLI
precedence (defaults < config file < explicit flags) — the real config
system SURVEY §5.6 calls for in place of the reference's edited-in-source
constants (train_x3d_kinetics_multigrid.py:40-67)."""

import json

import pytest

from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KineticsRecipe, main as kinetics_main,
)
from x3d_multigrid_tpu.train.recipes.charades import (
    CharadesRecipe, main as charades_main,
)
from x3d_multigrid_tpu.utils.config import (
    make_recipe, save_recipe, load_recipe_dict, recipe_to_dict,
)


class TestRoundTrip:
    def test_save_load_identity(self, tmp_path):
        r = KineticsRecipe(batch_size=64, long_cycle=(4, 2, 1),
                           model_overrides={"blocks_override": (1, 1, 1, 1)})
        p = tmp_path / "r.json"
        save_recipe(r, str(p))
        r2 = make_recipe(KineticsRecipe, str(p))
        assert r2 == r

    def test_tuples_coerced_from_json_lists(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text(json.dumps({
            "long_cycle": [4, 2, 1],
            "long_cycle_lr_scale": [4, 0.5, 0.5],
            "model_overrides": {
                "inplanes_override": [[12, 8], [16, 8], [24, 16], [32, 16]],
            },
        }))
        r = make_recipe(KineticsRecipe, str(p))
        assert r.long_cycle == (4, 2, 1)
        assert r.long_cycle_lr_scale == (4, 0.5, 0.5)
        assert r.model_overrides["inplanes_override"] == (
            (12, 8), (16, 8), (24, 16), (32, 16))

    def test_dict_matches_dataclass(self):
        d = recipe_to_dict(CharadesRecipe(task="loc"))
        assert d["task"] == "loc" and d["n_classes"] == 157


class TestValidation:
    def test_unknown_key_raises_with_field_list(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps({"batch_sizee": 4}))
        with pytest.raises(ValueError, match="batch_sizee"):
            load_recipe_dict(str(p), KineticsRecipe)

    def test_non_object_json_raises(self, tmp_path):
        p = tmp_path / "arr.json"
        p.write_text("[1, 2]")
        with pytest.raises(ValueError, match="JSON object"):
            load_recipe_dict(str(p), KineticsRecipe)

    def test_overrides_validated_too(self):
        with pytest.raises(ValueError, match="nope"):
            make_recipe(KineticsRecipe, None, nope=3)


class TestPrecedence:
    def test_defaults_config_overrides(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text(json.dumps({"batch_size": 32, "max_epochs": 7}))
        r = make_recipe(KineticsRecipe, str(p),
                        max_epochs=9, version=None)
        assert r.batch_size == 32       # from config
        assert r.max_epochs == 9        # explicit override wins
        assert r.version == "M"         # None override dropped -> default

    def _run_cli(self, main_fn, argv, monkeypatch):
        monkeypatch.setattr("sys.argv", argv)
        main_fn()

    def test_kinetics_cli_dump_config(self, tmp_path, monkeypatch, capsys):
        cfg = tmp_path / "c.json"
        cfg.write_text(json.dumps({"batch_size": 32, "max_epochs": 7,
                                   "remat": True}))
        out = tmp_path / "resolved.json"
        self._run_cli(kinetics_main,
                      ["prog", "--config", str(cfg), "--batch-size", "64",
                       "--dump-config", str(out)], monkeypatch)
        got = json.loads(out.read_text())
        assert got["batch_size"] == 64      # explicit flag beats config
        assert got["max_epochs"] == 7       # config beats default
        assert got["remat"] is True         # config sets store_true field
        assert got["version"] == "M"        # untouched default
        # the resolved dump reloads to the identical recipe
        r = make_recipe(KineticsRecipe, str(out))
        assert r.batch_size == 64 and r.remat is True

    def test_charades_cli_dump_config(self, tmp_path, monkeypatch):
        cfg = tmp_path / "c.json"
        cfg.write_text(json.dumps({"task": "loc", "init_lr": 0.01}))
        out = tmp_path / "resolved.json"
        self._run_cli(charades_main,
                      ["prog", "--config", str(cfg),
                       "--dump-config", str(out)], monkeypatch)
        got = json.loads(out.read_text())
        assert got["task"] == "loc" and got["init_lr"] == 0.01
        assert got["n_classes"] == 157

    def test_tiny_respects_explicit_batch_size(self, tmp_path, monkeypatch):
        out = tmp_path / "resolved.json"
        self._run_cli(kinetics_main,
                      ["prog", "--tiny", "--batch-size", "16",
                       "--dump-config", str(out)], monkeypatch)
        got = json.loads(out.read_text())
        assert got["batch_size"] == 16
        assert got["crop_size_override"] == 32

    def test_tiny_is_below_config_precedence(self, tmp_path, monkeypatch):
        """--tiny is a preset: values the user set in --config must beat
        it (defaults < tiny < config < explicit flags)."""
        cfg = tmp_path / "c.json"
        cfg.write_text(json.dumps({"batch_size": 24, "frames": 32,
                                   "short_side": 64}))
        out = tmp_path / "resolved.json"
        self._run_cli(kinetics_main,
                      ["prog", "--tiny", "--config", str(cfg),
                       "--dump-config", str(out)], monkeypatch)
        got = json.loads(out.read_text())
        assert got["batch_size"] == 24          # config beats tiny preset
        assert got["frames"] == 32
        assert got["short_side"] == 64
        assert got["crop_size_override"] == 32  # tiny fills the rest
        assert got["gamma_tau_override"] == 2

        cfg2 = tmp_path / "c2.json"
        cfg2.write_text(json.dumps({"batch_size": 12}))
        out2 = tmp_path / "resolved2.json"
        self._run_cli(charades_main,
                      ["prog", "--tiny", "--config", str(cfg2),
                       "--dump-config", str(out2)], monkeypatch)
        got2 = json.loads(out2.read_text())
        assert got2["batch_size"] == 12
        assert got2["crop_size_override"] == 32
