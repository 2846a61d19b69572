"""Checkpointing: native .npz format + reference ``.pt`` interchange.

Native format: one ``.npz`` holding every leaf of the (params, momentum,
bn_state) trees under path-joined keys plus a JSON sidecar of scalars
(step, long_ind, lr state) — the same information set the reference saves
(model/optimizer/scheduler state + ``long_ind``,
train_x3d_kinetics_multigrid.py:286-291), resumable mid-multigrid-cycle.

Interchange: the reference's torch state-dict layout (SURVEY §5.4)
  conv1_s.weight, conv1_t.weight, bn1.{weight,bias},
  bn1.bn.running_{mean,var}, bn1.split_bn.running_{mean,var},
  layer{1..4}.{i}.{conv1,conv2,conv3}.weight, ...bn{1,2,3}.*,
  layer{1..4}.{i}.{fc1,fc2}.{weight,bias}          (SE),
  layer{1..4}.{i}.downsample.{0.weight,1.*}        (shortcut B),
  conv5.weight, bn5.*, fc1.weight, fc2.{weight,bias}
maps to our pytrees with layout transposes:
  conv (O, I/g, kd, kh, kw) <-> DHWIO (kd, kh, kw, I/g, O)
  linear (out, in)          <-> (in, out)
  split_bn running stats (S*C,) <-> (S, C)  (split s at channels [s*C,(s+1)*C))
"""

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from x3d_multigrid_tpu.models.x3d import X3DConfig, Params, BNState


# ---------------------------------------------------------------------------
# Native npz checkpoints
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path: str, *, params, bn_state, momentum=None,
                    meta: Optional[Dict[str, Any]] = None):
    """Write ``<path>.npz`` (+ meta JSON inside the archive)."""
    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten(params).items()})
    flat.update({f"bn_state/{k}": v for k, v in _flatten(bn_state).items()})
    if momentum is not None:
        flat.update({f"momentum/{k}": v
                     for k, v in _flatten(momentum).items()})
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")


def load_checkpoint(path: str):
    """Returns dict with 'params', 'bn_state', optional 'momentum', 'meta'."""
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__").tobytes()).decode()) \
        if "__meta__" in flat else {}
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in flat.items():
        top, rest = k.split("/", 1)
        groups.setdefault(top, {})[rest] = v
    out = {name: _unflatten(g) for name, g in groups.items()}
    out["meta"] = meta
    return out


# ---------------------------------------------------------------------------
# Reference torch state-dict interchange
# ---------------------------------------------------------------------------

def _conv_from_torch(w: np.ndarray) -> np.ndarray:
    # (O, I/g, kd, kh, kw) -> (kd, kh, kw, I/g, O)
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def _conv_to_torch(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2))


def _bn_from(sd: Dict[str, np.ndarray], prefix: str):
    """(affine params, subbn state) from a SubBatchNorm3d prefix."""
    c = sd[f"{prefix}.weight"].shape[0]
    split_mean = sd[f"{prefix}.split_bn.running_mean"]
    s = split_mean.shape[0] // c
    p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    st = {
        "split_mean": split_mean.reshape(s, c),
        "split_var": sd[f"{prefix}.split_bn.running_var"].reshape(s, c),
        "mean": sd[f"{prefix}.bn.running_mean"],
        "var": sd[f"{prefix}.bn.running_var"],
    }
    return p, st


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Drop a uniform ``module.`` prefix (an ``nn.DataParallel`` save — the
    reference wraps the model at train_x3d_kinetics_multigrid.py:177 but
    saves ``x3d.module.state_dict()``; user checkpoints may not)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _check_reference_layout(sd: Dict[str, Any]) -> None:
    required = ("conv1_s.weight", "conv1_t.weight", "bn1.weight",
                "layer1.0.conv1.weight", "fc2.weight")
    missing = [k for k in required if k not in sd]
    if missing:
        raise ValueError(
            "not a reference X3D state dict: missing expected keys "
            f"{missing} (have {len(sd)} keys, e.g. "
            f"{sorted(sd)[:4]}); expected the layout of "
            "/root/reference/x3d.py (conv1_s/conv1_t/layerN.M.../fc1/fc2)")


def from_torch_state_dict(sd: Dict[str, np.ndarray], cfg: X3DConfig
                          ) -> Tuple[Params, BNState]:
    """Convert a reference state dict (torch tensors or numpy arrays) into
    our (params, bn_state) pytrees."""
    # np.array(copy=True): torch ``.numpy()`` SHARES memory with the live
    # tensor — without the copy, later in-place updates of the torch model's
    # BN buffers would silently mutate our pytrees (jnp.asarray on CPU may
    # alias the numpy buffer rather than copy it).
    sd = {k: np.array(getattr(v, "numpy", lambda: v)(), copy=True)
          for k, v in strip_module_prefix(sd).items()}
    _check_reference_layout(sd)
    params: Dict[str, Any] = {
        "conv1_s": {"w": _conv_from_torch(sd["conv1_s.weight"])},
        "conv1_t": {"w": _conv_from_torch(sd["conv1_t.weight"])},
    }
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = _bn_from(sd, "bn1")

    for stage in range(1, 5):
        blocks_p, blocks_s = [], []
        i = 0
        while f"layer{stage}.{i}.conv1.weight" in sd:
            pre = f"layer{stage}.{i}"
            blk_p: Dict[str, Any] = {
                "conv1": {"w": _conv_from_torch(sd[f"{pre}.conv1.weight"])},
                "conv2": {"w": _conv_from_torch(sd[f"{pre}.conv2.weight"])},
                "conv3": {"w": _conv_from_torch(sd[f"{pre}.conv3.weight"])},
            }
            blk_s: Dict[str, Any] = {}
            for bn in ("bn1", "bn2", "bn3"):
                blk_p[bn], blk_s[bn] = _bn_from(sd, f"{pre}.{bn}")
            if f"{pre}.fc1.weight" in sd:  # SE (even blocks)
                blk_p["se"] = {
                    "fc1": {"w": _conv_from_torch(sd[f"{pre}.fc1.weight"]),
                            "b": sd[f"{pre}.fc1.bias"]},
                    "fc2": {"w": _conv_from_torch(sd[f"{pre}.fc2.weight"]),
                            "b": sd[f"{pre}.fc2.bias"]},
                }
            if f"{pre}.downsample.0.weight" in sd:
                conv = {"w": _conv_from_torch(sd[f"{pre}.downsample.0.weight"])}
                bn_p, bn_s = _bn_from(sd, f"{pre}.downsample.1")
                blk_p["downsample"] = {"conv": conv, "bn": bn_p}
                blk_s["downsample_bn"] = bn_s
            blocks_p.append(blk_p)
            blocks_s.append(blk_s)
            i += 1
        params[f"layer{stage}"] = blocks_p
        state[f"layer{stage}"] = blocks_s

    params["conv5"] = {"w": _conv_from_torch(sd["conv5.weight"])}
    params["bn5"], state["bn5"] = _bn_from(sd, "bn5")
    params["fc1"] = {"w": _conv_from_torch(sd["fc1.weight"])}
    params["fc2"] = {"w": np.ascontiguousarray(sd["fc2.weight"].T),
                     "b": sd["fc2.bias"]}
    return params, state


def to_torch_state_dict(params: Params, state: BNState) -> Dict[str, np.ndarray]:
    """Export to the reference key layout (numpy arrays; caller may wrap in
    torch tensors).

    Keys are emitted in the reference module's registration order (stem,
    per-block conv1/bn1/conv2/bn2/conv3/bn3/SE/downsample, tail) so the
    non-buffer key order equals ``model.parameters()`` order — the
    optimizer-state converters (:func:`momentum_to_torch_sgd`) depend on
    that to assign param-group ids."""
    sd: Dict[str, np.ndarray] = {}

    def put_bn(prefix, p, st):
        c = p["scale"].shape[0]
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(st["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(st["var"])
        sd[f"{prefix}.bn.num_batches_tracked"] = np.asarray(0)
        sd[f"{prefix}.split_bn.running_mean"] = \
            np.asarray(st["split_mean"]).reshape(-1)
        sd[f"{prefix}.split_bn.running_var"] = \
            np.asarray(st["split_var"]).reshape(-1)
        sd[f"{prefix}.split_bn.num_batches_tracked"] = np.asarray(0)

    sd["conv1_s.weight"] = _conv_to_torch(np.asarray(params["conv1_s"]["w"]))
    sd["conv1_t.weight"] = _conv_to_torch(np.asarray(params["conv1_t"]["w"]))
    put_bn("bn1", params["bn1"], state["bn1"])
    for stage in range(1, 5):
        for i, (bp, bs) in enumerate(zip(params[f"layer{stage}"],
                                         state[f"layer{stage}"])):
            pre = f"layer{stage}.{i}"
            for conv, bn in (("conv1", "bn1"), ("conv2", "bn2"),
                             ("conv3", "bn3")):
                sd[f"{pre}.{conv}.weight"] = _conv_to_torch(
                    np.asarray(bp[conv]["w"]))
                put_bn(f"{pre}.{bn}", bp[bn], bs[bn])
            if "se" in bp:
                sd[f"{pre}.fc1.weight"] = _conv_to_torch(
                    np.asarray(bp["se"]["fc1"]["w"]))
                sd[f"{pre}.fc1.bias"] = np.asarray(bp["se"]["fc1"]["b"])
                sd[f"{pre}.fc2.weight"] = _conv_to_torch(
                    np.asarray(bp["se"]["fc2"]["w"]))
                sd[f"{pre}.fc2.bias"] = np.asarray(bp["se"]["fc2"]["b"])
            if "downsample" in bp:
                sd[f"{pre}.downsample.0.weight"] = _conv_to_torch(
                    np.asarray(bp["downsample"]["conv"]["w"]))
                put_bn(f"{pre}.downsample.1", bp["downsample"]["bn"],
                       bs["downsample_bn"])
    sd["conv5.weight"] = _conv_to_torch(np.asarray(params["conv5"]["w"]))
    put_bn("bn5", params["bn5"], state["bn5"])
    sd["fc1.weight"] = _conv_to_torch(np.asarray(params["fc1"]["w"]))
    sd["fc2.weight"] = np.ascontiguousarray(np.asarray(params["fc2"]["w"]).T)
    sd["fc2.bias"] = np.asarray(params["fc2"]["b"])
    return sd


def load_torch_checkpoint(path: str, cfg: X3DConfig):
    """Load a reference ``.pt`` checkpoint file (requires torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    params, state = from_torch_state_dict(sd, cfg)
    meta = {k: v for k, v in ckpt.items()
            if k not in ("model_state_dict",) and np.isscalar(v)}
    return params, state, meta


# ---------------------------------------------------------------------------
# Reference optimizer / scheduler state interchange
#
# The reference saves SGD momenta and MultiStepLR state alongside the model
# (train_x3d_kinetics_multigrid.py:286-291) and restores them on resume
# (:168-171,185-187) — without converting them, a half-trained reference run
# loses its SGD momentum and LR state when migrating here.
# ---------------------------------------------------------------------------

def _param_key_order(model_sd: Dict[str, Any]):
    """Parameter keys of a reference model state dict, in the order
    ``model.parameters()`` yields them.

    torch's ``state_dict`` saves each module's parameters before its
    buffers and recurses children in registration order — the same
    traversal as ``named_parameters()`` — so the non-buffer keys of the
    state dict ARE the optimizer's param-group order (``optim.SGD(
    x3d.parameters(), ...)``, train_x3d_kinetics_multigrid.py:183, puts
    every parameter in one group).  Verified against the actual reference
    model in tests/test_optimizer_interop.py.
    """
    buffers = ("running_mean", "running_var", "num_batches_tracked")
    return [k for k in model_sd if not k.endswith(buffers)]


def momentum_from_torch_sgd(optimizer_sd: Dict[str, Any],
                            model_sd: Dict[str, Any],
                            cfg: X3DConfig):
    """Reference ``optimizer_state_dict`` -> our momentum pytree.

    Maps each ``momentum_buffer`` through the SAME key/layout transform as
    the weights by substituting buffers for parameter values in a copy of
    the model state dict and re-running :func:`from_torch_state_dict`
    (so conv transposes, fc2 transpose and split-BN reshapes can never
    drift from the weight converter).  Parameters the torch run never
    stepped (no state entry) get zero momentum, matching torch SGD's
    first-step ``buf = d_p`` == ``mu * 0 + d_p`` initialization.
    """
    model_sd = strip_module_prefix(model_sd)
    names = _param_key_order(model_sd)
    groups = optimizer_sd["param_groups"]
    ids = [i for g in groups for i in g["params"]]
    if len(ids) != len(names):
        raise ValueError(
            f"optimizer state has {len(ids)} params across "
            f"{len(groups)} group(s) but the model state dict has "
            f"{len(names)} parameters — not a matching checkpoint")
    state = optimizer_sd.get("state", {})
    sd_mom = dict(model_sd)  # keeps BN buffers for the layout inference
    for i, name in zip(ids, names):
        buf = state.get(i, {}).get("momentum_buffer")
        if buf is None:
            buf = np.zeros_like(
                np.asarray(getattr(model_sd[name], "numpy",
                                   lambda: model_sd[name])()))
        sd_mom[name] = buf
    momentum, _ = from_torch_state_dict(sd_mom, cfg)
    return momentum


def momentum_to_torch_sgd(momentum, bn_state, *, lr: float,
                          sgd_momentum: float = 0.9,
                          weight_decay: float = 5e-5,
                          step: int = 0) -> Dict[str, Any]:
    """Our momentum pytree -> a reference-shaped ``optimizer_state_dict``
    (one param group, ids in ``model.parameters()`` order) that
    ``torch.optim.SGD(...).load_state_dict`` accepts."""
    sd = to_torch_state_dict(momentum, bn_state)
    names = _param_key_order(sd)
    state = {}
    for i, name in enumerate(names):
        state[i] = {"momentum_buffer": sd[name]}
    return {
        "state": state,
        "param_groups": [{
            "lr": float(lr), "momentum": float(sgd_momentum),
            "dampening": 0, "weight_decay": float(weight_decay),
            "nesterov": False, "maximize": False, "foreach": None,
            "differentiable": False, "fused": None,
            "params": list(range(len(names))),
        }],
    }


def scheduler_to_torch(step: int, milestones, *, gamma: float = 0.1,
                       base_lr: float, last_lr: float) -> Dict[str, Any]:
    """Our (step, milestones) -> a ``MultiStepLR.state_dict()`` shape."""
    try:
        import collections
        ms = collections.Counter(int(m) for m in milestones)
    except Exception:
        ms = {int(m): 1 for m in milestones}
    return {"milestones": ms, "gamma": float(gamma),
            "base_lrs": [float(base_lr)], "last_epoch": int(step),
            "_step_count": int(step) + 1, "_last_lr": [float(last_lr)]}


def training_meta_from_torch(ckpt: Dict[str, Any], *,
                             init_lr: Optional[float] = None
                             ) -> Dict[str, Any]:
    """Extract resume metadata (step counter, live LR, warmup base,
    milestones, long_ind) from a full reference checkpoint dict.

    ``lr_base`` is the reference's module-level ``lr`` python variable —
    the warmup reference value.  After the reference loads a checkpoint it
    resets that variable to ``init_lr`` (train_x3d_kinetics_multigrid.py:
    181) regardless of the saved LR; pass ``init_lr`` to reproduce that,
    else the live LR is used (the sane choice: warmup only matters in the
    first 8000 steps, before the first checkpoint at step 4000+ is likely
    consumed for migration).
    """
    meta: Dict[str, Any] = {}
    osd = ckpt.get("optimizer_state_dict")
    if osd:
        g0 = osd["param_groups"][0]
        meta["lr_lr"] = float(g0["lr"])
        meta["lr_base"] = float(init_lr if init_lr is not None
                                else g0["lr"])
        meta["sgd_momentum"] = float(g0.get("momentum", 0.9))
        meta["weight_decay"] = float(g0.get("weight_decay", 5e-5))
    ssd = ckpt.get("scheduler_state_dict")
    if ssd:
        meta["step"] = int(ssd.get("last_epoch", 0))
        ms = ssd.get("milestones")
        if ms is not None:
            meta["milestones"] = sorted(int(m) for m in dict(ms))
        if "gamma" in ssd:
            meta["gamma"] = float(ssd["gamma"])
    if "long_ind" in ckpt and np.isscalar(ckpt["long_ind"]):
        meta["long_ind"] = int(ckpt["long_ind"])
    return meta


def load_torch_checkpoint_full(path: str, cfg: X3DConfig, *,
                               init_lr: Optional[float] = None):
    """Load a reference ``.pt`` checkpoint WITH optimizer/scheduler state.

    Returns ``(params, bn_state, momentum, meta)``; ``momentum`` is None
    when the checkpoint carries no optimizer state (e.g. the shipped
    pretrained weights).  ``meta`` holds step/lr/milestones/long_ind as
    produced by :func:`training_meta_from_torch`.
    """
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    params, state = from_torch_state_dict(sd, cfg)
    momentum = None
    if "optimizer_state_dict" in ckpt:
        momentum = momentum_from_torch_sgd(
            ckpt["optimizer_state_dict"], sd, cfg)
    meta = training_meta_from_torch(ckpt, init_lr=init_lr)
    return params, state, momentum, meta
