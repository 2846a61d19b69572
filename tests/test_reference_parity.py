"""Forward/backward parity against the ACTUAL reference PyTorch model.

Instantiates ``/root/reference/x3d.py::generate_model`` (torch, CPU, random
weights), exports its state dict, converts via
``train.checkpoint.from_torch_state_dict``, and compares:

  1. train-mode forward logits (SubBN batch-stat path, x3d.py:47-52),
  2. SubBN running-stat updates after that forward (split_bn momentum math),
  3. ``aggregate_sub_bn_stats`` output (x3d.py:27-45) vs ``aggregate_all_subbn``,
  4. eval-mode forward logits through the aggregated stats (x3d.py:316-345),
  5. gradients + one SGD(momentum=0.9, wd=5e-5) step (torch.optim.SGD oracle),

for task='class' AND task='loc'.  This is the one test that can falsify a
systematic misreading of the architecture (padding, SE placement, stat
grouping): every other parity test round-trips our own converter.

Runs eagerly (no jit) in FLOAT64 (``jax.enable_x64``) so the
tolerances can be ~1e-6 — two orders tighter than fp32 accumulation noise
allows, and far below any structural divergence (>=1e-2).  At these tiny
shapes eager dispatch is cheaper than compiling the 26-block graph.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
import x3d as ref_x3d  # noqa: E402  (the reference module)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x3d_multigrid_tpu.models.x3d import (  # noqa: E402
    X3DConfig, forward, aggregate_all_subbn)
from x3d_multigrid_tpu.train.checkpoint import from_torch_state_dict  # noqa: E402
from x3d_multigrid_tpu.train.sgd import sgd_update, init_momentum  # noqa: E402

BN_SPLITS = 4
B, T, H, W = 8, 4, 32, 32  # B divisible by BN_SPLITS; H=W=32 -> 1x1 at conv5


def _export(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(np.abs(b).max(), 1e-8)
    return np.abs(a - b).max() / denom


def _build(task):
    torch.manual_seed(0)
    return ref_x3d.generate_model(
        "M", n_classes=400, n_input_channels=3, dropout=0.0,
        base_bn_splits=BN_SPLITS, task=task).double()


def _torch_logits_to_ours(t, task):
    # reference: class (B, C, 1) -> (B, C); loc (B, C, T) -> (B, T, C)
    if task == "class":
        return t.squeeze(2).detach().numpy()
    return t.permute(0, 2, 1).detach().numpy()


def _collect_split_stats(model):
    """{prefix: (running_mean (S,C), running_var (S,C))} for every SubBN."""
    out = {}
    for name, m in model.named_modules():
        if isinstance(m, ref_x3d.SubBatchNorm3d):
            c = m.num_features
            out[name] = (
                m.split_bn.running_mean.detach().numpy().reshape(-1, c),
                m.split_bn.running_var.detach().numpy().reshape(-1, c),
            )
    return out


def _our_subbn_leaves(state, prefix=""):
    """Flatten our BN state into {reference-style prefix: subbn dict}."""
    out = {}
    if isinstance(state, dict) and "split_mean" in state:
        out[prefix] = state
        return out
    if isinstance(state, dict):
        for k, v in state.items():
            name = k
            if k == "downsample_bn":
                name = "downsample.1"
            p = f"{prefix}.{name}" if prefix else name
            out.update(_our_subbn_leaves(v, p))
    elif isinstance(state, list):
        for i, v in enumerate(state):
            out.update(_our_subbn_leaves(v, f"{prefix}.{i}"))
    return out


@pytest.mark.parametrize("task", ["class", "loc"])
def test_reference_parity(task):
    with jax.enable_x64(True):
        _run_parity(task)


def test_long_cycle_transition_trajectory():
    """Multi-step parity ACROSS a long-cycle transition — the seam where
    the two codebases differ most structurally: torch rebuilds split_bn
    modules in place (update_bn_splits_long_cycle, x3d.py:298-303) and
    edits the optimizer param-group LR
    (train_x3d_kinetics_multigrid.py:227-234); we resize a functional BN
    state tree and scale a host-side LR.  Six SGD steps, split count
    8 -> 4 and LR x0.5 at step 3, comparing params, momenta, split
    running stats, LR and loss at EVERY step, then aggregated eval
    logits at the end.

    The two sides are re-synced from the torch state after each step's
    comparison: free-running float64 trajectories at this tiny test
    geometry diverge chaotically (~300x amplification per step through
    the ill-conditioned 4-8-element stage-4 BN stat groups — measured;
    real geometry has ~1e6-element groups), which would drown structural
    errors in rounding noise by step 2.  With resync every comparison is
    a tight single-step check (params 1e-6, stats 1e-9), and a
    structural mismatch at the transition (wrong split grouping, wrong
    stat reset, wrong LR factor) still fails loudly at step 3+."""
    with jax.enable_x64(True):
        _run_trajectory()


def _run_trajectory():
    from x3d_multigrid_tpu.models.x3d import resize_bn_splits
    from x3d_multigrid_tpu.train.checkpoint import momentum_from_torch_sgd

    T2 = 4
    model = _build("class")
    # enter long cycle 1: splits = base * 2 (the reference fires this on
    # the first batch of a cycle, train_x3d_kinetics_multigrid.py:227-228).
    # The rebuilt split_bn modules come out float32 (x3d.py:301 ignores the
    # model dtype); re-cast so the float64 comparison stays meaningful.
    assert model.update_bn_splits_long_cycle(2) == 2 * BN_SPLITS
    model.double()

    cfg = X3DConfig(version="M", n_classes=400, dropout=0.0, task="class")

    def sync_from_torch():
        sd = _export(model)
        p, s = from_torch_state_dict(sd, cfg)
        mom = momentum_from_torch_sgd(opt.state_dict(), sd, cfg)
        return (jax.tree.map(jnp.asarray, p),
                jax.tree.map(jnp.asarray, s),
                jax.tree.map(jnp.asarray, mom))

    lr = 0.05
    opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=0.9,
                          weight_decay=5e-5)
    params, state, momentum = sync_from_torch()
    rng = np.random.RandomState(11)
    model.train()

    for step in range(6):
        if step == 3:  # the long-cycle transition under test
            model.update_bn_splits_long_cycle(1)
            model.double()  # fresh split_bn arrives float32 (see above)
            for g in opt.param_groups:
                g["lr"] *= 0.5
            state = resize_bn_splits(state, BN_SPLITS)
            lr *= 0.5
            # our resized state must equal torch's rebuilt split_bn state
            # BEFORE any forward: fresh 0/1 split stats at the new split
            # count, eval stats preserved
            _, torch_state = from_torch_state_dict(_export(model), cfg)
            for (po, lo), (pr, lref) in zip(
                    jax.tree_util.tree_flatten_with_path(state)[0],
                    jax.tree_util.tree_flatten_with_path(
                        jax.tree.map(jnp.asarray, torch_state))[0]):
                assert po == pr
                assert np.asarray(lo).shape == np.asarray(lref).shape, po
                assert _rel_err(np.asarray(lo), np.asarray(lref)) < 1e-12, \
                    f"transition state {jax.tree_util.keystr(po)}"
        assert abs(lr - opt.param_groups[0]["lr"]) < 1e-15, f"step {step}"

        x_np = rng.randn(B, 3, T2, H, W)
        labels = rng.randint(0, 400, size=(B,))
        xt = torch.from_numpy(x_np)
        xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))

        logits_t = model(xt).squeeze(2)
        loss_t = torch.nn.functional.cross_entropy(
            logits_t, torch.from_numpy(labels))
        opt.zero_grad()
        loss_t.backward()
        opt.step()

        def loss_fn(p):
            logits, new_state = forward(p, state, xj, cfg=cfg, train=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(logp[jnp.arange(B), jnp.asarray(labels)])
            return loss, new_state

        (loss_j, state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, momentum = sgd_update(params, grads, momentum, lr=lr,
                                      momentum=0.9, weight_decay=5e-5)

        assert abs(float(loss_j) - float(loss_t.detach())) < 1e-8 * max(
            1.0, abs(float(loss_t.detach()))), f"step {step} loss"
        ref_sd = _export(model)
        ref_params, _ = from_torch_state_dict(ref_sd, cfg)
        ref_mom = momentum_from_torch_sgd(opt.state_dict(), ref_sd, cfg)
        for ours, ref, what, tol in ((params, ref_params, "param", 1e-6),
                                     (momentum, ref_mom, "momentum", 1e-6)):
            flat_ours = jax.tree_util.tree_flatten_with_path(ours)[0]
            flat_ref = jax.tree_util.tree_flatten_with_path(
                jax.tree.map(jnp.asarray, ref))[0]
            for (po, lo), (pr, lref) in zip(flat_ours, flat_ref):
                assert po == pr
                err = _rel_err(np.asarray(lo), np.asarray(lref))
                assert err < tol, (
                    f"step {step}: {what} {jax.tree_util.keystr(po)} "
                    f"diverges (rel {err:.2e})")
        ref_stats = _collect_split_stats(model)
        our_stats = _our_subbn_leaves(state)
        for name, (rm, rv) in ref_stats.items():
            sm = np.asarray(our_stats[name]["split_mean"])
            assert rm.shape == sm.shape, (name, step)
            assert _rel_err(sm, rm) < 1e-9, f"step {step} {name} mean"
            assert _rel_err(np.asarray(our_stats[name]["split_var"]),
                            rv) < 1e-9, f"step {step} {name} var"
        # resync: keep each step's comparison single-step-tight (see
        # docstring — free-running f64 chaos, not a semantics gap)
        params, state, momentum = sync_from_torch()

    # aggregated eval parity after the whole trajectory
    model.aggregate_sub_bn_stats()
    model.eval()
    x_np = rng.randn(B, 3, T2, H, W)
    with torch.no_grad():
        ref_eval = model(torch.from_numpy(x_np)).squeeze(2).numpy()
    ours_eval, _ = forward(params, aggregate_all_subbn(state),
                           jnp.asarray(x_np.transpose(0, 2, 3, 4, 1)),
                           cfg=cfg, train=False)
    err = _rel_err(np.asarray(ours_eval), ref_eval)
    assert err < 1e-6, f"post-trajectory eval logits diverge ({err:.2e})"


def _run_parity(task):
    model = _build(task)
    cfg = X3DConfig(version="M", n_classes=400, dropout=0.0, task=task)
    params, state = from_torch_state_dict(_export(model), cfg)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    rng = np.random.RandomState(1)
    x_np = rng.randn(B, 3, T, H, W)  # float64
    xt = torch.from_numpy(x_np)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))  # NCTHW -> NTHWC

    # --- 1. train-mode forward -------------------------------------------
    model.train()
    with torch.no_grad():
        ref_train = _torch_logits_to_ours(model(xt), task)
    ours_train, new_state = forward(params, state, xj, cfg=cfg, train=True)
    err = _rel_err(np.asarray(ours_train), ref_train)
    assert err < 1e-6, f"train-mode logits diverge: rel err {err:.2e}"

    # --- 2. split running stats after one train forward ------------------
    ref_stats = _collect_split_stats(model)
    our_stats = _our_subbn_leaves(new_state)
    assert set(ref_stats) == set(our_stats), (
        set(ref_stats) ^ set(our_stats))
    for name, (rm, rv) in ref_stats.items():
        sm = np.asarray(our_stats[name]["split_mean"])
        sv = np.asarray(our_stats[name]["split_var"])
        assert rm.shape == sm.shape, name
        assert _rel_err(sm, rm) < 1e-9, f"{name} split_mean"
        assert _rel_err(sv, rv) < 1e-9, f"{name} split_var"

    # --- 3 + 4. aggregate stats, eval-mode forward -----------------------
    model.aggregate_sub_bn_stats()
    agg_state = aggregate_all_subbn(new_state)
    agg_leaves = _our_subbn_leaves(agg_state)
    for name, m in model.named_modules():
        if isinstance(m, ref_x3d.SubBatchNorm3d):
            assert _rel_err(np.asarray(agg_leaves[name]["mean"]),
                            m.bn.running_mean.detach().numpy()) < 1e-9, name
            assert _rel_err(np.asarray(agg_leaves[name]["var"]),
                            m.bn.running_var.detach().numpy()) < 1e-9, name
    model.eval()
    with torch.no_grad():
        ref_eval = _torch_logits_to_ours(model(xt), task)
    ours_eval, _ = forward(params, agg_state, xj, cfg=cfg, train=False)
    err = _rel_err(np.asarray(ours_eval), ref_eval)
    assert err < 1e-6, f"eval-mode logits diverge: rel err {err:.2e}"

    # --- 5. gradients + one SGD step (both tasks) -------------------------
    # class: CE loss; loc: temporal interpolation + (BCE(max)+BCE)/2
    # (train_x3d_charades_loc.py:168-189) through the SHIPPED loss fn.
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9,
                          weight_decay=5e-5)
    opt.zero_grad()
    if task == "class":
        labels = rng.randint(0, 400, size=(B,))
        logits_t = model(xt).squeeze(2)
        loss_t = torch.nn.functional.cross_entropy(
            logits_t, torch.from_numpy(labels))

        def loss_fn(p):
            logits, _ = forward(p, state, xj, cfg=cfg, train=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[jnp.arange(B), jnp.asarray(labels)])
    else:
        from x3d_multigrid_tpu.parallel.train_step import (
            _charades_loc_loss)
        TL = 11  # label resolution != logit resolution forces the interp
        labels = (rng.rand(B, 400, TL) < 0.1).astype(np.float64)
        crit = torch.nn.BCEWithLogitsLoss()
        lt = torch.from_numpy(labels)
        per_frame = model(xt)                                    # B C T
        up = torch.nn.functional.interpolate(per_frame, TL, mode="linear")
        loss_t = (crit(torch.max(up, dim=2)[0], torch.max(lt, dim=2)[0])
                  + crit(up, lt)) / 2.0

        def loss_fn(p):
            logits, _ = forward(p, state, xj, cfg=cfg, train=True)
            loss, _ = _charades_loc_loss(
                logits, {"label": jnp.asarray(labels.transpose(0, 2, 1))})
            return loss

    loss_t.backward()
    opt.step()
    ref_sd = _export(model)
    ref_params, _ = from_torch_state_dict(ref_sd, cfg)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-7 * max(
        1.0, abs(float(loss_t.detach())))
    new_params, _ = sgd_update(params, grads, init_momentum(params),
                               lr=0.1, momentum=0.9, weight_decay=5e-5)

    flat_ours = jax.tree_util.tree_flatten_with_path(new_params)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, ref_params))[0]
    assert len(flat_ours) == len(flat_ref)
    for (path_o, leaf_o), (path_r, leaf_r) in zip(flat_ours, flat_ref):
        assert path_o == path_r
        err = _rel_err(np.asarray(leaf_o), np.asarray(leaf_r))
        assert err < 1e-6, (
            f"post-SGD param diverges at {jax.tree_util.keystr(path_o)}: "
            f"rel err {err:.2e}")
