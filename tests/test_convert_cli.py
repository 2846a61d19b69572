"""Checkpoint converter CLI: .pt <-> .npz round trips + config inference."""

import json

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from x3d_multigrid_tpu.models import init_params, init_bn_state
from x3d_multigrid_tpu.models.x3d import x3d_config
from x3d_multigrid_tpu.train import checkpoint as ckpt_mod
from x3d_multigrid_tpu.train.convert_cli import (
    infer_bn_splits, infer_config_from_state_dict, main,
)

TINY = dict(blocks_override=(1, 2, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)


def _save_reference_pt(path, cfg, *, bn_splits, long_ind=None):
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = init_bn_state(cfg, num_splits=bn_splits)
    sd = ckpt_mod.to_torch_state_dict(params, state)
    out = {"model_state_dict": {
        k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
        else torch.tensor(v) for k, v in sd.items()}}
    if long_ind is not None:
        out["long_ind"] = long_ind
    torch.save(out, path)
    return params, state


def test_infer_config_and_splits_tiny():
    cfg = x3d_config("M", n_classes=11, **TINY)
    params = init_params(jax.random.PRNGKey(1), cfg)
    state = init_bn_state(cfg, num_splits=2)
    sd = ckpt_mod.to_torch_state_dict(params, state)
    got = infer_config_from_state_dict(sd)
    assert got.n_classes == 11
    assert tuple(got.stage_blocks) == TINY["blocks_override"]
    assert tuple(got.block_inplanes) == TINY["inplanes_override"]
    assert got.fc1_dim == 32
    assert infer_bn_splits(sd) == 2


def test_infer_config_full_m_uses_version_tables():
    cfg = x3d_config("M", n_classes=400)
    params = init_params(jax.random.PRNGKey(2), cfg)
    state = init_bn_state(cfg, num_splits=4)
    sd = ckpt_mod.to_torch_state_dict(params, state)
    got = infer_config_from_state_dict(sd)
    assert got.version == "M"
    assert got.blocks_override is None and got.inplanes_override is None
    assert got.n_classes == 400 and infer_bn_splits(sd) == 4


def test_pt_npz_pt_round_trip(tmp_path, capsys):
    cfg = x3d_config("M", n_classes=11, **TINY)
    pt = tmp_path / "ref.pt"
    params, state = _save_reference_pt(pt, cfg, bn_splits=2, long_ind=3)

    npz = tmp_path / "conv.npz"
    main([str(pt), str(npz)])
    meta = json.loads(capsys.readouterr().out)["meta"]
    assert meta["long_ind"] == 3 and meta["bn_splits"] == 2
    assert meta["n_classes"] == 11

    ck = ckpt_mod.load_checkpoint(str(npz))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(ck["params"])[0]):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(a, b, atol=0, rtol=0, err_msg=str(ka))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(state)[0],
            jax.tree_util.tree_flatten_with_path(ck["bn_state"])[0]):
        np.testing.assert_allclose(a, b, atol=0, rtol=0, err_msg=str(ka))

    pt2 = tmp_path / "back.pt"
    main([str(npz), str(pt2)])
    sd_orig = torch.load(pt, weights_only=False)["model_state_dict"]
    back = torch.load(pt2, weights_only=False)
    assert back["long_ind"] == 3
    sd_back = back["model_state_dict"]
    assert set(sd_back) == set(sd_orig)
    for k in sd_orig:
        np.testing.assert_allclose(sd_back[k].numpy(), sd_orig[k].numpy(),
                                   atol=0, rtol=0, err_msg=k)


def test_pt_npz_pt_optimizer_state_round_trip(tmp_path, capsys):
    """Full reference checkpoint (model + SGD momenta + MultiStepLR state,
    train_x3d_kinetics_multigrid.py:286-291) survives .pt -> .npz -> .pt."""
    import collections

    cfg = x3d_config("M", n_classes=11, **TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = init_bn_state(cfg, num_splits=2)
    sd = ckpt_mod.to_torch_state_dict(params, state)
    rng = np.random.RandomState(3)
    names = ckpt_mod._param_key_order(sd)
    osd = {"state": {i: {"momentum_buffer": torch.from_numpy(
                rng.randn(*np.shape(sd[n])).astype(np.float32))}
                     for i, n in enumerate(names)},
           "param_groups": [{"lr": 0.05, "momentum": 0.9, "dampening": 0,
                             "weight_decay": 5e-5, "nesterov": False,
                             "params": list(range(len(names)))}]}
    ssd = {"milestones": collections.Counter({100: 1, 200: 1}),
           "gamma": 0.1, "base_lrs": [0.2], "last_epoch": 42,
           "_step_count": 43, "_last_lr": [0.05]}
    pt = tmp_path / "full.pt"
    torch.save({"model_state_dict": {
                    k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()},
                "optimizer_state_dict": osd,
                "scheduler_state_dict": ssd,
                "long_ind": 1}, pt)

    npz = tmp_path / "full.npz"
    main([str(pt), str(npz)])
    meta = json.loads(capsys.readouterr().out)["meta"]
    assert meta["step"] == 42 and meta["lr_lr"] == 0.05
    assert meta["milestones"] == [100, 200] and meta["long_ind"] == 1

    ck = ckpt_mod.load_checkpoint(str(npz))
    assert "momentum" in ck
    # momentum leaves mirror the params tree and are non-trivial
    mp = jax.tree_util.tree_flatten_with_path(ck["momentum"])[0]
    pp = jax.tree_util.tree_flatten_with_path(ck["params"])[0]
    assert [p for p, _ in mp] == [p for p, _ in pp]
    assert any(np.abs(l).max() > 0 for _, l in mp)

    pt2 = tmp_path / "back.pt"
    main([str(npz), str(pt2)])
    back = torch.load(pt2, weights_only=False)
    osd2 = back["optimizer_state_dict"]
    assert osd2["param_groups"][0]["lr"] == 0.05
    for i in range(len(names)):
        np.testing.assert_allclose(
            osd2["state"][i]["momentum_buffer"].numpy(),
            osd["state"][i]["momentum_buffer"].numpy(),
            atol=0, rtol=0, err_msg=names[i])
    ssd2 = back["scheduler_state_dict"]
    assert ssd2["last_epoch"] == 42
    assert sorted(dict(ssd2["milestones"])) == [100, 200]


def test_module_prefix_accepted_and_bad_layout_rejected():
    cfg = x3d_config("M", n_classes=11, **TINY)
    params = init_params(jax.random.PRNGKey(4), cfg)
    state = init_bn_state(cfg, num_splits=2)
    sd = ckpt_mod.to_torch_state_dict(params, state)
    prefixed = {f"module.{k}": v for k, v in sd.items()}
    got = infer_config_from_state_dict(prefixed)  # DataParallel save
    assert got.n_classes == 11
    p2, _ = ckpt_mod.from_torch_state_dict(prefixed, got)
    np.testing.assert_array_equal(np.asarray(p2["fc2"]["b"]),
                                  np.asarray(params["fc2"]["b"]))
    with pytest.raises(ValueError, match="not a reference X3D state dict"):
        infer_config_from_state_dict({"encoder.weight": np.zeros(3)})


def test_rejects_ambiguous_directions(tmp_path):
    with pytest.raises(SystemExit):
        main([str(tmp_path / "a.npz"), str(tmp_path / "b.npz")])
    with pytest.raises(SystemExit):
        main([str(tmp_path / "a.pt"), str(tmp_path / "b.pth")])
