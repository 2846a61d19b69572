"""Standalone multi-view evaluation path on the CPU mesh."""

import numpy as np
import jax

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.train.recipes.evaluate_kinetics import evaluate
from x3d_multigrid_tpu.parallel import data_mesh

TINY = dict(version="M", n_classes=7, dropout=0.0,
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)


def test_evaluate_multiview():
    cfg = x3d_config(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bn = init_bn_state(cfg, 1)
    rng = np.random.RandomState(0)
    loader = [
        {"clip": rng.randint(0, 255, (8, 3, 2, 40, 40, 3), np.uint8),
         "label": rng.randint(0, 7, (8,)).astype(np.int32)}
        for _ in range(2)
    ]
    acc = evaluate(params, bn, cfg, loader, crop_size=32,
                   mesh=data_mesh(8))
    assert 0.0 <= acc <= 1.0


def test_evaluate_valid_mask_and_prob_collection():
    """Zero-padded rows (valid=False) must not affect Top-1, and collected
    probs cover exactly the valid rows in order."""
    cfg = x3d_config(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bn = init_bn_state(cfg, 1)
    rng = np.random.RandomState(1)
    clips = rng.randint(0, 255, (6, 3, 2, 40, 40, 3), np.uint8)
    labels = rng.randint(0, 7, (6,)).astype(np.int32)
    plain = [{"clip": clips, "label": labels}]
    padded = [{
        "clip": np.concatenate([clips, np.zeros_like(clips[:2])]),
        "label": np.concatenate([labels, [-1, -1]]).astype(np.int32),
        "valid": np.asarray([True] * 6 + [False] * 2),
    }]
    mesh = data_mesh(8)
    acc1, probs1 = evaluate(params, bn, cfg, plain, crop_size=32,
                            mesh=mesh, collect_probs=True)
    acc2, probs2 = evaluate(params, bn, cfg, padded, crop_size=32,
                            mesh=mesh, collect_probs=True)
    assert acc1 == acc2
    assert probs1.shape == probs2.shape == (6, 7)
    np.testing.assert_allclose(probs1, probs2, rtol=1e-5, atol=1e-6)


def test_testing_subset_prediction_dump(tmp_path, monkeypatch, capsys):
    """--subset testing --crops 2 --dump preds.npz on an unlabeled fake
    test dir writes (video_ids, probs) with reference 10-sliding-view
    semantics (kinetics.py:205-239; test-dir scan kinetics.py:110-118)."""
    import sys
    from x3d_multigrid_tpu.data.synthetic import make_fake_kinetics
    from x3d_multigrid_tpu.models import x3d_config as _cfg
    from x3d_multigrid_tpu.train.checkpoint import save_checkpoint
    from x3d_multigrid_tpu.train.recipes import evaluate_kinetics as ek

    root, anno, labels = make_fake_kinetics(
        str(tmp_path / "data"), n_classes=3, videos_per_class=1,
        n_frames=40, frame_size=(48, 48), test_videos=3)
    cfg = x3d_config(**{**TINY, "n_classes": 3})
    params = init_params(jax.random.PRNGKey(2), cfg)
    bn = init_bn_state(cfg, 1)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, params=params, bn_state=bn,
                    meta={"step": 0})

    dump = str(tmp_path / "preds.npz")
    argv = ["evaluate_kinetics",
            "--ckpt", ckpt + ".npz", "--root", root, "--anno", anno,
            "--labels", labels, "--subset", "testing", "--crops", "2",
            "--frames", "16", "--batch-size", "2", "--short-side", "40",
            "--n-classes", "3", "--dump", dump]
    monkeypatch.setattr(sys, "argv", argv)
    # tiny geometry: reuse the tiny model dims via version-M overrides
    monkeypatch.setattr(ek, "CROP_SIZE", {"M": 32})
    monkeypatch.setattr(ek, "GAMMA_TAU", {"M": 2})
    monkeypatch.setattr(
        ek, "x3d_config",
        lambda version, n_classes: x3d_config(
            **{**TINY, "n_classes": n_classes}))
    ek.main()
    out = np.load(dump, allow_pickle=False)
    assert sorted(out["video_ids"].tolist()) == \
        ["test0", "test1", "test2"]
    assert out["probs"].shape == (3, 3)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-4)
