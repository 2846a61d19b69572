"""Optimizer/LR-control parity vs torch, checkpoint round-trips, and the
DP train step end-to-end on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from x3d_multigrid_tpu.models import (
    x3d_config, init_params, init_bn_state, forward,
)
from x3d_multigrid_tpu.train import (
    init_momentum, sgd_update, LRController, PlateauLRController,
)
from x3d_multigrid_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, from_torch_state_dict,
    to_torch_state_dict,
)
from x3d_multigrid_tpu.parallel import data_mesh, make_train_step

TINY = dict(version="M", n_classes=5,
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)


class TestSGD:
    def test_matches_torch_sgd(self):
        rng = np.random.RandomState(0)
        w0 = rng.randn(4, 3).astype(np.float32)
        params = {"w": jnp.asarray(w0)}
        mom = init_momentum(params)
        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)
        for step in range(5):
            g = rng.randn(4, 3).astype(np.float32)
            params, mom = sgd_update(params, {"w": jnp.asarray(g)}, mom,
                                     lr=0.1, momentum=0.9, weight_decay=0.01)
            opt.zero_grad()
            tw.grad = torch.from_numpy(g.copy())
            opt.step()
        np.testing.assert_allclose(params["w"], tw.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)


class TestLRController:
    def _torch_oracle(self, init_lr, warmup, milestones, events, n_steps):
        """Replay the reference's param-group manipulation with a real
        torch optimizer + MultiStepLR."""
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=init_lr)
        sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones)
        lr_var = init_lr
        used = []
        for s in range(n_steps):
            if s in events:
                for g in opt.param_groups:
                    g["lr"] *= events[s]
                    lr_var = g["lr"]
            cur = s  # steps - st_steps with st_steps=0
            if 1 < cur < warmup:
                scale = min(1.0, (cur + 1) / warmup)
                for g in opt.param_groups:
                    g["lr"] = scale * lr_var
            used.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        return used

    def test_warmup_scaling_milestones_interplay(self):
        events = {0: 8.0, 30: 0.5, 60: 0.5}  # long-cycle transitions
        milestones = [50, 80]
        ctrl = LRController(0.2, warmup_steps=10, milestones=milestones)
        ours = []
        for s in range(100):
            if s in events:
                ctrl.on_long_cycle(events[s])
            ours.append(ctrl.step_lr(s))
        oracle = self._torch_oracle(0.2, 10, milestones, events, 100)
        np.testing.assert_allclose(ours, oracle, rtol=1e-6)

    def test_plateau_controller(self):
        ctrl = PlateauLRController(0.1, patience=2, factor=0.5)
        lrs = [ctrl.step(m) for m in [1.0, 0.9, 0.95, 0.93, 0.94, 0.92]]
        # best=0.9 at idx1; bad at idx2,3,4 -> reduce after 3rd bad
        assert lrs[:4] == [0.1, 0.1, 0.1, 0.1]
        assert lrs[4] == pytest.approx(0.05)


class TestCheckpoint:
    def test_npz_roundtrip(self, tmp_path):
        cfg = x3d_config(**TINY)
        params = init_params(jax.random.PRNGKey(0), cfg)
        bn = init_bn_state(cfg, 2)
        mom = init_momentum(params)
        path = str(tmp_path / "ck")
        save_checkpoint(path, params=params, bn_state=bn, momentum=mom,
                        meta={"step": 123, "long_ind": 2})
        out = load_checkpoint(path)
        assert out["meta"] == {"step": 123, "long_ind": 2}
        for a, b in zip(jax.tree.leaves(params),
                        jax.tree.leaves(out["params"])):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(jax.tree.leaves(bn),
                        jax.tree.leaves(out["bn_state"])):
            np.testing.assert_array_equal(a, b)

    def test_torch_state_dict_roundtrip(self):
        """to_torch -> from_torch is identity, and the key set matches the
        reference layout (SURVEY §5.4)."""
        cfg = x3d_config("M", n_classes=7)
        params = init_params(jax.random.PRNGKey(1), cfg)
        bn = init_bn_state(cfg, 4)
        sd = to_torch_state_dict(params, bn)
        # spot-check reference key layout
        assert "conv1_s.weight" in sd
        assert "layer1.0.bn1.split_bn.running_mean" in sd
        assert "layer1.0.fc1.weight" in sd          # SE on even block
        assert "layer1.1.fc1.weight" not in sd      # no SE on odd block
        assert "layer1.0.downsample.0.weight" in sd
        assert sd["fc2.weight"].shape == (7, 2048)
        # conv layout is torch OIDHW
        assert sd["conv1_s.weight"].shape == (24, 3, 1, 3, 3)
        assert sd["layer1.0.conv2.weight"].shape == (54, 1, 3, 3, 3)

        p2, s2 = from_torch_state_dict(sd, cfg)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(jax.tree.leaves(bn), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(a, b)

    def test_forward_parity_after_torch_roundtrip(self):
        """Converted weights drive the same forward outputs."""
        cfg = x3d_config(**TINY, dropout=0.0)
        params = init_params(jax.random.PRNGKey(2), cfg)
        bn = init_bn_state(cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 16, 16, 3))
        ref, _ = forward(params, bn, x, cfg=cfg, train=False)
        p2, s2 = from_torch_state_dict(to_torch_state_dict(params, bn), cfg)
        p2 = jax.tree.map(jnp.asarray, p2)
        s2 = jax.tree.map(jnp.asarray, s2)
        out, _ = forward(p2, s2, x, cfg=cfg, train=False)
        np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


class TestTrainStepMesh:
    def test_dp_train_step_runs_and_improves(self):
        cfg = x3d_config(**TINY, dropout=0.0)
        mesh = data_mesh(8)
        params = init_params(jax.random.PRNGKey(0), cfg)
        bn = init_bn_state(cfg, 2)
        mom = init_momentum(params)
        step = make_train_step(cfg, mesh, loss="kinetics", donate=False)
        batch = {
            "clip": jax.random.normal(jax.random.PRNGKey(1),
                                      (32, 2, 16, 16, 3)),
            "label": jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 5),
        }
        losses = []
        for i in range(6):
            params, mom, bn, out = step(params, mom, bn, batch,
                                        jnp.float32(0.05),
                                        jax.random.PRNGKey(i))
            losses.append(float(out.loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # memorizes the fixed batch

    def test_dp_matches_single_device_with_permuted_splits(self):
        """8-chip DP with 1 local split == 1-chip with 8 splits on a
        permuted batch: chip k's contiguous shard {2k, 2k+1} equals split
        s's strided group {s, s+8} after permutation sigma(s)=2s,
        sigma(s+8)=2s+1.  Validates that per-chip SubBN + pmean'd grads
        reproduce the reference's per-GPU BN semantics exactly."""
        cfg = x3d_config(**TINY, dropout=0.0)
        params = init_params(jax.random.PRNGKey(0), cfg)
        mom = init_momentum(params)
        clip = jax.random.normal(jax.random.PRNGKey(1), (16, 2, 16, 16, 3))
        label = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 5)
        lr = jnp.float32(0.1)
        rng = jax.random.PRNGKey(9)

        step8 = make_train_step(cfg, data_mesh(8), loss="kinetics",
                                donate=False)
        p8, _, _, out8 = step8(params, mom, init_bn_state(cfg, 1),
                               {"clip": clip, "label": label}, lr, rng)

        # permutation mapping split groups onto contiguous shards
        sigma = np.empty(16, np.int64)
        for s in range(8):
            sigma[s] = 2 * s
            sigma[s + 8] = 2 * s + 1
        step1 = make_train_step(cfg, data_mesh(1), loss="kinetics",
                                donate=False)
        p1, _, _, out1 = step1(params, mom, init_bn_state(cfg, 8),
                               {"clip": clip[sigma], "label": label[sigma]},
                               lr, rng)

        np.testing.assert_allclose(float(out8.loss), float(out1.loss),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p8), jax.tree.leaves(p1)):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
