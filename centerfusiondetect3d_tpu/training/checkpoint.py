"""Checkpoint save/load (orbax) + PyTorch reference-checkpoint importer.

Replaces the reference's torch.save dict checkpoints and elastic loader
(/root/reference/src/lib/utils/utils.py:197-218, model/model.py:58-162):

- Native format: orbax checkpoints holding {params, batch_stats, opt_state,
  epoch, history} with crash-safe atomic writes and a `model_last` alias.
- ``import_torch_checkpoint``: maps a reference ``state_dict`` (torch naming
  + OIHW layouts) onto this framework's flax tree - including DCN offset
  convs, depthwise ConvTranspose upsamplers, BN running stats, and head
  towers - with elastic behavior: shape-mismatched or missing entries are
  skipped with a report instead of failing (model/model.py:119-127).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Tuple

import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


# --------------------------------------------------------------------------
# native orbax checkpoints
# --------------------------------------------------------------------------

def save_checkpoint(directory: str, state, epoch: int, history=None,
                    keep_alias: bool = True):
    """Save {params, batch_stats, opt_state, step, epoch, history} under
    directory/model_{epoch} (+ model_last alias).

    ``opt_state`` (AdamW moments / SGD momentum + the injected LR) is stored
    as a flat leaf dict so resume is step-identical — the reference persists
    the torch optimizer state the same way
    (/root/reference/src/lib/utils/utils.py:197-218,
    model/model.py:150-152). The tree structure is rebuilt at resume time
    from the live TrainState's own opt_state treedef.
    """
    import jax

    assert ocp is not None, "orbax unavailable"
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    opt_leaves = jax.tree.leaves(jax.device_get(state.opt_state))
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": {f"{i:04d}": np.asarray(leaf)
                      for i, leaf in enumerate(opt_leaves)},
        "step": np.asarray(jax.device_get(state.step)),
        "epoch": np.int64(epoch),
        "history": history or {},
    }
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(directory, f"model_{epoch}")
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if keep_alias:
        alias = os.path.join(directory, "model_last")
        ckptr.save(alias, payload, force=True)
        ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    assert ocp is not None, "orbax unavailable"
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def resume_state(path: str, state):
    """Restore a TrainState for step-identical resume.

    Returns (state, start_epoch). ``opt_state`` leaves are re-hung on the
    live state's treedef (same optimizer => same structure); if the leaf
    count or shapes mismatch (optimizer changed between runs), falls back to
    params-only restore with a warning — the same elastic behavior the
    reference's loadModel applies to the torch optimizer
    (/root/reference/src/lib/model/model.py:129-162).
    """
    import warnings

    import jax

    payload = load_checkpoint(path)
    state = state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )
    saved = payload.get("opt_state")
    if saved is not None:
        leaves = [saved[k] for k in sorted(saved)]
        live_leaves, treedef = jax.tree.flatten(state.opt_state)
        if len(leaves) == len(live_leaves) and all(
            np.shape(a) == np.shape(b) for a, b in zip(leaves, live_leaves)
        ):
            state = state.replace(opt_state=jax.tree.unflatten(treedef, leaves))
        else:
            warnings.warn(
                "checkpoint opt_state does not match the current optimizer "
                "structure; resuming with a fresh optimizer state"
            )
    if "step" in payload:
        import jax.numpy as jnp

        state = state.replace(step=jnp.asarray(payload["step"], jnp.int32))
    return state, int(payload.get("epoch", -1)) + 1


# --------------------------------------------------------------------------
# torch state_dict import
# --------------------------------------------------------------------------

_TREE_BLOCK = {"block1": ("conv1", "bn1"), "block2": ("conv2", "bn2")}


def _torch_key(path: Tuple[str, ...], collection: str) -> Tuple[str, str]:
    """Map a flax param path to (torch key, kind).

    kind: conv | bn_w | bn_b | bn_mean | bn_var | dcn_w | bias | up | raw
    """
    parts = list(path)
    leaf = parts.pop()

    def bn_kind():
        return {
            "scale": "bn_w", "bias": "bn_b", "mean": "bn_mean", "var": "bn_var"
        }[leaf]

    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "base":
            out.append("base")
        elif p == "base_layer":
            # ConvBnAct -> Sequential(conv, bn, relu)
            nxt = parts[i + 1]
            out.append("base_layer." + ("0" if nxt == "conv" else "1"))
            i += 2
            continue
        elif re.fullmatch(r"level[01]_\d+", p):
            lvl, idx = p.split("_")
            nxt = parts[i + 1]
            j = 3 * int(idx) + (0 if nxt == "conv" else 1)
            out.append(f"{lvl}.{j}")
            i += 2
            continue
        elif p in ("block1", "block2"):
            conv_name, bn_name = _TREE_BLOCK[p]
            nxt = parts[i + 1]
            out.append(conv_name if nxt == "conv" else bn_name)
            i += 2
            continue
        elif p == "project":
            nxt = parts[i + 1]
            out.append("project." + ("0" if nxt == "conv" else "1"))
            i += 2
            continue
        elif p == "root":
            nxt = parts[i + 1]
            out.append("root." + ("conv" if nxt == "conv" else "bn"))
            i += 2
            continue
        elif re.fullmatch(r"(proj|node)_\d+", p) or p.startswith("ida_") or p in (
            "dla_up", "ida_up", "tree1", "tree2",
        ):
            out.append(p)
        elif re.fullmatch(r"up_\d+", p):
            out.append(p)
            return ".".join(out) + ".weight", "up"
        elif p == "conv_offset_mask":
            out.append(p)
        elif re.fullmatch(r"(left|right)[12]", p):
            # GlobalConvNode separable pair -> torch convLeft/convRight
            # Sequential indices (reference dla.py:328-382)
            side = "convLeft" if p.startswith("left") else "convRight"
            out.append(f"{side}.{int(p[-1]) - 1}")
        elif p == "bn" and leaf in ("scale", "bias", "mean", "var"):
            # DCN node activation BN (torch: .activation.0) or plain node BN
            prev = parts[i - 1] if i else ""
            if prev in ("conv_offset_mask",):
                raise KeyError("unexpected bn position")
            # DeformConvNode: bn directly under the node -> activation.0
            out.append("activation.0")
            return ".".join(out) + "." + _BN_LEAF[leaf], bn_kind()
        elif p == "conv" and i + 1 < len(parts) and parts[i + 1] in ("conv", "bn"):
            # ConvNode: ConvBnAct submodule named "conv" -> torch Sequential
            nxt = parts[i + 1]
            out.append("conv." + ("0" if nxt == "conv" else "1"))
            i += 2
            continue
        elif p == "detect_head_0":
            out.append("detectHead_0")
        elif re.fullmatch(r"tower_\d+", p):
            out.append(str(2 * int(p.split("_")[1])))
        elif p == "out":
            # resolved by the caller (depends on tower depth); placeholder
            out.append("__OUT__")
        else:
            out.append(p)
        i += 1

    key = ".".join(out)
    if leaf == "kernel":
        return key + ".weight", "conv"
    if leaf == "weight":
        return key + ".weight", "dcn_w"
    if leaf == "bias":
        return key + ".bias", "bias"
    if leaf in ("scale", "mean", "var"):
        return key + "." + _BN_LEAF[leaf], {
            "scale": "bn_w", "mean": "bn_mean", "var": "bn_var"
        }[leaf]
    return key + "." + leaf, "raw"


_BN_LEAF = {
    "scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"
}


def _convert(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":  # OIHW -> HWIO
        if value.ndim == 4:
            return np.transpose(value, (2, 3, 1, 0))
        return value
    if kind == "dcn_w":  # DCN weight OIHW -> HWIO
        return np.transpose(value, (2, 3, 1, 0))
    if kind == "up":  # depthwise ConvTranspose (C, 1, k, k) -> (k, k, 1, C)
        return np.transpose(value, (2, 3, 1, 0))
    return value


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def _resolve_out_index(torch_key: str, head_conv: Dict[str, list]) -> str:
    """Replace the __OUT__ placeholder with the tower's final Sequential index."""
    if "__OUT__" not in torch_key:
        return torch_key
    m = re.search(r"detectHead_0\.([A-Za-z_0-9]+?)\.__OUT__", torch_key)
    head = m.group(1)
    n_hidden = len(head_conv.get(head, []))
    idx = 2 * n_hidden if n_hidden else 0
    return torch_key.replace("__OUT__", str(idx))


# legacy upstream-CenterFusion name aliases handled by the reference's
# elastic loader (model/model.py:165-250 toggleWeightName)
_LEGACY_HEAD_ALIASES = {
    "dep_sec.": "detectHead_0.depth2.",
    "rot_sec.": "detectHead_0.rotation2.",
    "hm.": "detectHead_0.heatmap.",
    "wh.": "detectHead_0.widthHeight.",
    "dep.": "detectHead_0.depth.",
    "dim.": "detectHead_0.dimension.",
    "rot.": "detectHead_0.rotation.",
    "amodel_offset.": "detectHead_0.amodal_offset.",
}
_LEGACY_HEADS = (
    "reg", "depth2", "rotation2", "heatmap", "widthHeight", "depth", "rotation",
    "dimension", "amodal_offset", "nuscenes_att", "velocity",
)


def modernize_torch_key(name: str) -> str:
    """Map legacy CenterFusion state_dict names onto current reference names."""
    # old DCN param layout: <up>.<node>_N.conv.{weight,bias} -> .{weight,bias}
    if re.match(r".*_up.*_\d\.conv\.(weight|bias)$", name):
        name = name.replace("conv.weight", "weight").replace("conv.bias", "bias")
    name = name.replace(".actf.", ".activation.")
    name = name.replace("conv.conv_offset_mask", "conv_offset_mask")
    for old, new in _LEGACY_HEAD_ALIASES.items():
        if name.startswith(old):
            return new + name[len(old):]
    # oldv2: bare head prefixes without the detectHead_0 module
    for head in _LEGACY_HEADS:
        if name.startswith(head + "."):
            return "detectHead_0." + name
    return name


def import_torch_checkpoint(state_dict: Dict[str, np.ndarray], params,
                            batch_stats, head_conv=None, strict: bool = False):
    """Fill a flax (params, batch_stats) tree pair from a torch state_dict.

    state_dict values may be torch tensors or numpy arrays; legacy upstream
    CenterFusion names are modernized first. Returns (params, batch_stats,
    report) where report lists loaded/skipped keys.
    """
    head_conv = dict(head_conv or {})
    sd = {}
    for k, v in state_dict.items():
        k = k[7:] if k.startswith("module.") else k
        k = k[6:] if k.startswith("model.") else k
        k = modernize_torch_key(k)
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    report = {"loaded": [], "missing": [], "shape_mismatch": []}

    def fill(tree, collection):
        flat = _flatten(tree)
        out = {}
        for path, value in flat.items():
            try:
                tkey, kind = _torch_key(path, collection)
                tkey = _resolve_out_index(tkey, head_conv)
            except Exception:
                tkey, kind = None, None
            if tkey is not None and tkey in sd:
                cand = _convert(sd[tkey], kind)
                if tuple(cand.shape) == tuple(np.shape(value)):
                    out[path] = cand.astype(np.asarray(value).dtype)
                    report["loaded"].append(tkey)
                    continue
                report["shape_mismatch"].append(tkey)
            else:
                report["missing"].append(".".join(path))
            out[path] = value
        return _unflatten(out)

    new_params = fill(params, "params")
    new_stats = fill(batch_stats, "batch_stats")
    if strict and (report["missing"] or report["shape_mismatch"]):
        raise KeyError(f"strict import failed: {report}")

    # DCN offset visibility (reference offsets are unclamped, dla.py:461-472;
    # our TPU shift path clamps to ±DCN_MAX_OFFSET): surface each node's
    # trained offset-projection weight RMS so a checkpoint whose offsets
    # plausibly exceed the clamp is loud, not silent. Offset rows are the
    # first 18 of the 27 conv_offset_mask output channels (OIHW axis 0).
    off_rms = {}
    for k, v in sd.items():
        if k.endswith("conv_offset_mask.weight") and np.ndim(v) == 4:
            off_rms[k[: -len(".weight")]] = float(
                np.sqrt(np.mean(np.square(v[:18].astype(np.float64))))
            )
    if off_rms:
        report["dcn_offset_weight_rms"] = off_rms
        peak = max(off_rms.values())
        if peak > 0:
            import logging

            logging.getLogger("cfd3d.checkpoint").info(
                "DCN offset conv weight RMS: max %.4g over %d nodes — if "
                "trained offsets exceed MODEL.DLA.DCN_MAX_OFFSET, prefer "
                "DCN_IMPL=shift_hybrid (sparse exact correction) or xla "
                "(exact) on TPU",
                peak, len(off_rms),
            )
    return new_params, new_stats, report


def export_torch_state_dict(params, batch_stats, head_conv=None
                            ) -> Dict[str, np.ndarray]:
    """Inverse of import: flax trees -> reference-named torch state_dict
    (numpy values, OIHW layouts). Used for interop and import round-trips."""
    head_conv = dict(head_conv or {})
    inverse = {"conv": (3, 2, 0, 1), "dcn_w": (3, 2, 0, 1), "up": (3, 2, 0, 1)}
    out: Dict[str, np.ndarray] = {}
    for collection, tree in (("params", params), ("batch_stats", batch_stats)):
        for path, value in _flatten(tree).items():
            tkey, kind = _torch_key(path, collection)
            tkey = _resolve_out_index(tkey, head_conv)
            v = np.asarray(value)
            if kind in inverse and v.ndim == 4:
                v = np.transpose(v, inverse[kind])
            out[tkey] = v
    return out


# --------------------------------------------------------------------------
# reference .pt checkpoint files (state_dict + loss-history migration)
# --------------------------------------------------------------------------


def migrate_reference_history(ckpt: Dict[str, Any]) -> Dict[str, Dict[str, list]]:
    """Normalize a reference checkpoint's loss logs to this framework's
    history format ``{train: {head: [per-epoch]}, val: {head: [per-eval]}}``.

    Handles both reference formats: the legacy per-epoch *lists* and the
    epoch-keyed *dicts* its ``renewCheckpoint`` migration produces
    (/root/reference/src/lib/model/model.py:253-316) — dict logs are
    flattened back to epoch-ordered lists, which is this framework's native
    shape (``Trainer.history`` / ``plot_history``).
    """
    out: Dict[str, Dict[str, list]] = {"train": {}, "val": {}}
    for split in ("train", "val"):
        log = ckpt.get(split)
        if not isinstance(log, dict):
            continue
        for head, values in log.items():
            if isinstance(values, dict) and values:
                ordered = sorted(values.items(), key=lambda kv: float(kv[0]))
                out[split][head] = [v for _, v in ordered]
            elif isinstance(values, list):
                out[split][head] = list(values)
    return out


def is_torch_checkpoint(path: str) -> bool:
    """True for a reference-style torch checkpoint *file* (.pt/.pth)."""
    return os.path.isfile(path) and path.endswith((".pt", ".pth"))


def load_torch_file(path: str) -> Dict[str, Any]:
    """``torch.load`` a reference checkpoint (.pt/.pth).

    Accepts both a full reference checkpoint dict ({state_dict, epoch,
    train/val loss logs, ...} as written by its saveModel,
    /root/reference/src/lib/utils/utils.py:197-218) and a bare state_dict.
    Returns {"state_dict", "epoch", "history"} with the loss history
    migrated via :func:`migrate_reference_history`.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return {
            "state_dict": ckpt["state_dict"],
            "epoch": int(ckpt.get("epoch", -1)),
            "history": migrate_reference_history(ckpt),
        }
    return {"state_dict": ckpt, "epoch": -1,
            "history": {"train": {}, "val": {}}}


def load_weights(path: str, params, batch_stats, head_conv=None):
    """Load weights from a native orbax directory OR a reference torch file,
    dispatching on the path (the reference's ``loadModel`` ergonomics:
    ``MODEL.LOAD_DIR`` points at either format).

    Returns ``(params, batch_stats, meta)`` with
    ``meta = {"epoch", "history"[, "report"]}`` — "report" (loaded /
    missing / shape_mismatch keys) only for torch files.
    """
    if is_torch_checkpoint(path):
        payload = load_torch_file(path)
        p, s, report = import_torch_checkpoint(
            payload["state_dict"], params, batch_stats, head_conv
        )
        return p, s, {"epoch": payload["epoch"],
                      "history": payload["history"], "report": report}
    payload = load_checkpoint(path)
    return payload["params"], payload["batch_stats"], {
        "epoch": int(payload.get("epoch", -1)),
        "history": payload.get("history") or {"train": {}, "val": {}},
    }


def export_torch_checkpoint(path: str, params, batch_stats, *, epoch: int = -1,
                            history=None, head_conv=None,
                            extra: Dict[str, Any] = None) -> str:
    """Write a FULL reference-format checkpoint file (torch.save dict:
    {state_dict, epoch, train, val, ...} as the reference's saveModel emits,
    /root/reference/src/lib/utils/utils.py:197-218) so reference tooling —
    its loadModel, plotters, wandb resubmission — can consume a model
    trained here. Loss history is written in the reference's current
    epoch-keyed dict format (the post-renewCheckpoint shape).
    """
    import torch

    # np.array(..., copy=True): jax-backed buffers are read-only and torch
    # tensors must own writable memory
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_torch_state_dict(params, batch_stats,
                                              head_conv).items()}
    ckpt: Dict[str, Any] = {"state_dict": sd, "epoch": int(epoch)}
    history = history or {}
    for split in ("train", "val"):
        log = history.get(split) or {}
        ckpt[split] = {}
        for head, values in log.items():
            # align keys to the checkpoint's actual epoch range: a resumed
            # run carries only the post-resume tail of the history, so the
            # last entry must land on `epoch`, not on len(values)
            start = epoch - len(values) + 1 if epoch >= len(values) else 1
            ckpt[split][head] = {
                start + i: float(v) for i, v in enumerate(values)
            }
    ckpt.update(extra or {})
    torch.save(ckpt, path)
    return path
