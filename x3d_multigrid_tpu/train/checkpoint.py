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


def from_torch_state_dict(sd: Dict[str, np.ndarray], cfg: X3DConfig
                          ) -> Tuple[Params, BNState]:
    """Convert a reference state dict (torch tensors or numpy arrays) into
    our (params, bn_state) pytrees."""
    # np.array(copy=True): torch ``.numpy()`` SHARES memory with the live
    # tensor — without the copy, later in-place updates of the torch model's
    # BN buffers would silently mutate our pytrees (jnp.asarray on CPU may
    # alias the numpy buffer rather than copy it).
    sd = {k: np.array(getattr(v, "numpy", lambda: v)(), copy=True)
          for k, v in sd.items()}
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
    torch tensors)."""
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
            for conv in ("conv1", "conv2", "conv3"):
                sd[f"{pre}.{conv}.weight"] = _conv_to_torch(
                    np.asarray(bp[conv]["w"]))
            for bn in ("bn1", "bn2", "bn3"):
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
