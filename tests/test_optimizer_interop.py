"""Optimizer/scheduler state interop against the ACTUAL reference.

The reference resumes model + optimizer + scheduler + ``long_ind`` from one
``.pt`` (train_x3d_kinetics_multigrid.py:166-173,185-187).  These tests
prove a half-trained reference run migrates here with its SGD momenta and
LR state intact: build the torch model + SGD, step once, convert, and
assert the NEXT framework step equals the next torch step (float64,
rel err < 1e-6) — and the reverse direction hands a torch user back an
``optimizer_state_dict``/``scheduler_state_dict`` their own
``load_state_dict`` accepts and continues from bit-identically.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
import x3d as ref_x3d  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x3d_multigrid_tpu.models.x3d import X3DConfig, forward  # noqa: E402
from x3d_multigrid_tpu.train.checkpoint import (  # noqa: E402
    _param_key_order, from_torch_state_dict, momentum_from_torch_sgd,
    momentum_to_torch_sgd, scheduler_to_torch, to_torch_state_dict,
    training_meta_from_torch,
)
from x3d_multigrid_tpu.train.sgd import sgd_update  # noqa: E402

BN_SPLITS = 4
B, T, H, W = 8, 4, 32, 32
LR, MU, WD = 0.1, 0.9, 5e-5


def _export(model):
    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)


def _build():
    torch.manual_seed(0)
    return ref_x3d.generate_model(
        "M", n_classes=400, n_input_channels=3, dropout=0.0,
        base_bn_splits=BN_SPLITS, task="class").double()


def _torch_step(model, opt, x, labels):
    model.train()
    logits = model(x).squeeze(2)
    loss = torch.nn.functional.cross_entropy(logits, labels)
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss.detach())


def test_param_order_matches_state_dict_key_order():
    """The converter's core assumption: the non-buffer keys of the model
    state dict are in ``model.parameters()`` order (= the optimizer's
    param-group id order)."""
    model = _build()
    named = [k for k, _ in model.named_parameters()]
    assert _param_key_order(model.state_dict()) == named


def test_sgd_state_interop_next_steps_match():
    with jax.enable_x64(True):
        _run_interop()


def _run_interop():
    model = _build()
    opt = torch.optim.SGD(model.parameters(), lr=LR, momentum=MU,
                          weight_decay=WD)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, [10_000, 20_000])

    rng = np.random.RandomState(7)
    batches = [rng.randn(B, 3, T, H, W) for _ in range(2)]
    labels = [rng.randint(0, 400, size=(B,)) for _ in range(2)]

    # torch step 1 -> the checkpoint a reference run would save
    _torch_step(model, opt,
                torch.from_numpy(batches[0]), torch.from_numpy(labels[0]))
    sched.step()
    ckpt = {"model_state_dict": _export(model),
            "optimizer_state_dict": opt.state_dict(),
            "scheduler_state_dict": sched.state_dict(),
            "long_ind": 2}

    cfg = X3DConfig(version="M", n_classes=400, dropout=0.0, task="class")
    params, state = from_torch_state_dict(ckpt["model_state_dict"], cfg)
    momentum = momentum_from_torch_sgd(
        ckpt["optimizer_state_dict"], ckpt["model_state_dict"], cfg)
    meta = training_meta_from_torch(ckpt)
    assert meta["step"] == 1
    assert meta["long_ind"] == 2
    assert meta["lr_lr"] == pytest.approx(LR)
    assert meta["milestones"] == [10_000, 20_000]

    # momentum tree mirrors the params tree leaf-for-leaf
    p_paths = [p for p, _ in
               jax.tree_util.tree_flatten_with_path(params)[0]]
    m_flat = jax.tree_util.tree_flatten_with_path(momentum)[0]
    assert p_paths == [p for p, _ in m_flat]
    assert any(np.abs(np.asarray(l)).max() > 0 for _, l in m_flat), \
        "momentum buffers were lost in conversion"

    # --- step 2, both sides, same batch --------------------------------
    _torch_step(model, opt, torch.from_numpy(batches[1]),
                torch.from_numpy(labels[1]))
    ref_params, _ = from_torch_state_dict(_export(model), cfg)

    params_j = jax.tree.map(jnp.asarray, params)
    xj = jnp.asarray(batches[1].transpose(0, 2, 3, 4, 1))
    lbl = jnp.asarray(labels[1])

    def loss_fn(p):
        logits, _ = forward(p, state, xj, cfg=cfg, train=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(logp[jnp.arange(B), lbl])

    grads = jax.grad(loss_fn)(params_j)
    new_params, new_mom = sgd_update(
        params_j, grads, jax.tree.map(jnp.asarray, momentum),
        lr=meta["lr_lr"], momentum=MU, weight_decay=WD)

    flat_ours = jax.tree_util.tree_flatten_with_path(new_params)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, ref_params))[0]
    for (po, lo), (pr, lr_) in zip(flat_ours, flat_ref):
        assert po == pr
        err = _rel_err(np.asarray(lo), np.asarray(lr_))
        assert err < 1e-6, (
            f"post-step-2 param diverges at {jax.tree_util.keystr(po)} "
            f"(rel {err:.2e}) — momentum state was not carried over")

    # --- reverse: our momentum -> torch optimizer, step 3 matches -------
    model2 = _build()
    sd_back = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in to_torch_state_dict(
                   jax.tree.map(np.asarray, new_params), state).items()}
    # running stats differ (we did not update state here) but step-3
    # parity only needs parameters + momenta: train-mode BN uses batch
    # stats, so load weights, then our momenta.
    model2.load_state_dict(sd_back)
    opt2 = torch.optim.SGD(model2.parameters(), lr=LR, momentum=MU,
                           weight_decay=WD)
    osd = momentum_to_torch_sgd(
        jax.tree.map(np.asarray, new_mom), state,
        lr=LR, sgd_momentum=MU, weight_decay=WD)
    for pid in osd["state"]:
        osd["state"][pid]["momentum_buffer"] = torch.from_numpy(
            np.ascontiguousarray(osd["state"][pid]["momentum_buffer"]))
    opt2.load_state_dict(osd)
    ssd = scheduler_to_torch(2, [10_000, 20_000], base_lr=LR, last_lr=LR)
    sched2 = torch.optim.lr_scheduler.MultiStepLR(opt2, [1])
    sched2.load_state_dict(ssd)
    assert sorted(sched2.milestones) == [10_000, 20_000]

    x3 = rng.randn(B, 3, T, H, W)
    l3 = rng.randint(0, 400, size=(B,))
    _torch_step(model, opt, torch.from_numpy(x3), torch.from_numpy(l3))
    _torch_step(model2, opt2, torch.from_numpy(x3), torch.from_numpy(l3))
    for (k, a), (k2, b) in zip(model.named_parameters(),
                               model2.named_parameters()):
        assert k == k2
        err = _rel_err(a.detach().numpy(), b.detach().numpy())
        assert err < 1e-6, f"step-3 diverges at {k} (rel {err:.2e})"
