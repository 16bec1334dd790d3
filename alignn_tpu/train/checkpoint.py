"""Checkpoint save/load + reference-torch-checkpoint conversion.

Replaces `torch.save(net.state_dict())` checkpointing
(`alignn/train.py:551-563,711-715`) with flax msgpack serialization.
Unlike the reference — which saves only model weights, so resume restarts
optimization (SURVEY.md §5) — full-state checkpoints here include the
optimizer state and epoch counter for true resume.

`convert_torch_checkpoint` maps a reference ``best_model.pt`` state_dict
onto this framework's parameter tree for pretrained-model parity
(figshare zoo, reference `alignn/pretrained.py:243-303`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import core, serialization, traverse_util


def _fetch(tree):
    """One batched device->host transfer for a whole pytree.

    serialization would otherwise np.asarray leaves one at a time —
    hundreds of round-trips through a remote-device tunnel.
    """
    import jax

    return jax.device_get(tree)


def checkpoint_meta(atom_features: str = "cgcnn",
                    **extra) -> Dict[str, Any]:
    """Standard checkpoint metadata: feature-table provenance + extras.

    Stamped into every saved/converted checkpoint so a weights file is
    verifiably tied to the exact featurization it was trained against
    (VERDICT r3 #5; `alignn/graphs.py:1003-1020`)."""
    from alignn_tpu.chem.features import feature_table_provenance

    meta = {"feature_table": feature_table_provenance(atom_features)}
    meta.update(extra)
    return meta


def check_feature_table(meta: Optional[Dict[str, Any]],
                        atom_features: str = "cgcnn",
                        where: str = "checkpoint") -> bool:
    """Warn when a checkpoint's stamped feature table is not the one
    currently active.  Returns True when provably matching; unstamped
    (pre-provenance) checkpoints return False silently."""
    stamped = (meta or {}).get("feature_table")
    if not stamped:
        return False
    from alignn_tpu.chem.features import feature_table_provenance

    active = feature_table_provenance(
        stamped.get("atom_features", atom_features))
    if stamped.get("sha256") != active["sha256"]:
        print(f"[checkpoint] WARNING: {where} was saved against "
              f"feature table {stamped.get('source')} "
              f"sha256={str(stamped.get('sha256'))[:12]}… but the active "
              f"{active['atom_features']} table is {active['source']} "
              f"sha256={active['sha256'][:12]}… — embeddings will see "
              f"different inputs; re-convert/re-train against the "
              f"active table.")
        return False
    return True


def save_params(path: str, params, batch_stats=None,
                meta: Optional[Dict[str, Any]] = None):
    """Weights-only checkpoint (distribution format)."""
    payload = {"params": serialization.to_state_dict(_fetch(params))}
    if batch_stats:
        payload["batch_stats"] = serialization.to_state_dict(
            _fetch(batch_stats))
    if meta:
        payload["meta"] = meta
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_params(path: str) -> Tuple[Dict, Dict]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload["params"], payload.get("batch_stats", {})


def load_params_with_meta(path: str) -> Tuple[Dict, Dict,
                                              Dict[str, Any]]:
    """(params, batch_stats, meta) in ONE restore — callers that also
    want the provenance stamp must not pay a second full-payload
    msgpack_restore (restart.mpk carries the optimizer moments too)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return (payload["params"], payload.get("batch_stats", {}),
            payload.get("meta") or {})


def load_meta(path: str) -> Dict[str, Any]:
    """Metadata stamped into a .mpk checkpoint ({} for pre-provenance
    files).  Works for both save_params payloads ("meta") and
    save_train_state payloads ("extra").  NOTE: restores the full
    payload — on a load path prefer load_params_with_meta /
    load_train_state(with_extra=True)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = payload.get("meta") or {}
    if not meta and isinstance(payload.get("extra"), dict):
        meta = payload["extra"].get("meta") or {}
    return meta


def save_train_state(path: str, state, epoch: int,
                     extra: Optional[Dict[str, Any]] = None):
    """Full-state checkpoint (params + opt state + counters)."""
    payload = {
        "params": serialization.to_state_dict(_fetch(state.params)),
        "batch_stats": serialization.to_state_dict(
            _fetch(state.batch_stats)),
        "opt_state": serialization.to_state_dict(_fetch(state.opt_state)),
        "step": int(state.step),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload, in_place=True))


def load_train_state(path: str, state,
                     with_extra: bool = False):
    """Restore a full-state checkpoint into a template `state`.

    Returns (state, epoch), or (state, epoch, extra) with
    `with_extra=True` — the dict save_train_state persisted (it was
    previously written but unreachable).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(state.params, payload["params"])
    batch_stats = serialization.from_state_dict(
        state.batch_stats, payload["batch_stats"])
    opt_state = serialization.from_state_dict(
        state.opt_state, payload["opt_state"])
    new_state = state.replace(
        params=params, batch_stats=batch_stats, opt_state=opt_state,
        step=jnp.asarray(payload["step"], jnp.int32))
    if with_extra:
        return new_state, int(payload.get("epoch", 0)), \
            payload.get("extra", {})
    return new_state, int(payload.get("epoch", 0))


# ---------------------------------------------------------------------------
# torch state_dict conversion (pretrained zoo parity)
# ---------------------------------------------------------------------------

_NORM_MAP = {"weight": "scale", "bias": "bias",
             "running_mean": "mean", "running_var": "var"}


def _convert_entries(sd: Dict[str, np.ndarray], layout: str = "nested"):
    """Yield (flax_path_tuple, collection, array) per torch entry.

    Reference module naming (verified against models/alignn.py:69-76,
    :176-184 and models/alignn_atomwise.py:151-155):
      atom_embedding.layer.{0:Linear,1:Norm}.*          MLPLayer
      edge_embedding.{0:RBF}.{1,2:MLPLayer}.layer.*     via Sequential
      angle_embedding likewise
      alignn_layers.N.{node_update,edge_update}.{src_gate,dst_gate,
        edge_gate,src_update,dst_update}.* and bn_nodes/bn_edges.*
      gcn_layers.N.<same EGGC fields>
      fc.weight/bias (+ fc1/fc2/fc3/fc_atomwise/fc_additional_output)
    This framework's tree (nn/models.py):
      embeddings/{atom_embedding,edge_embedding_0,edge_embedding_1,
                  angle_embedding_0,angle_embedding_1}/{linear,norm}
      trunk/{alignn_layers_N/{node_update,edge_update},gcn_layers_N}/
        {src_gate,...,norm_nodes,norm_edges}
    """
    def mlp(dest_prefix, rest, arr):
        # rest like ['layer', '0', 'weight'] (Linear) or
        # ['layer', '1', 'running_mean'] (Norm)
        if len(rest) < 3 or rest[0] != "layer":
            return None
        idx, p = rest[1], rest[2]
        if idx == "0":  # Linear
            if p == "weight":
                return dest_prefix + ("linear", "kernel"), "params", arr.T
            return dest_prefix + ("linear", "bias"), "params", arr
        if p in ("running_mean", "running_var"):
            return (dest_prefix + ("norm", _NORM_MAP[p]),
                    "batch_stats", arr)
        if p == "num_batches_tracked":
            return None
        return dest_prefix + ("norm", _NORM_MAP[p]), "params", arr

    def eggc(dest_prefix, rest, arr):
        # rest like ['src_gate', 'weight'] or ['bn_nodes', 'running_var']
        mod, p = rest[0], rest[-1]
        if mod in ("src_gate", "dst_gate", "edge_gate", "src_update",
                   "dst_update"):
            if p == "weight":
                return dest_prefix + (mod, "kernel"), "params", arr.T
            return dest_prefix + (mod, "bias"), "params", arr
        if mod in ("norm_nodes", "norm_edges", "bn_nodes", "bn_edges"):
            name = {"bn_nodes": "norm_nodes",
                    "bn_edges": "norm_edges"}.get(mod, mod)
            if p in ("running_mean", "running_var"):
                return (dest_prefix + (name, _NORM_MAP[p]),
                        "batch_stats", arr)
            if p == "num_batches_tracked":
                return None
            return dest_prefix + (name, _NORM_MAP[p]), "params", arr
        return None

    for key, w in sd.items():
        parts = key.split(".")
        arr = np.asarray(w)
        if parts[0] == "module":  # strip DDP prefix
            parts = parts[1:]
        head = parts[0]

        # layout="nested": ALIGNN/ALIGNNAtomWise tree (embeddings/ +
        # trunk/ submodules); layout="flat": eALIGNNAtomWise tree
        # (everything at top level, nn/ealignn.py)
        emb_prefix = () if layout == "flat" else ("embeddings",)
        trunk_prefix = () if layout == "flat" else ("trunk",)
        out = None
        if head == "atom_embedding":
            out = mlp(emb_prefix + ("atom_embedding",), parts[1:], arr)
        elif head in ("edge_embedding", "angle_embedding"):
            # Sequential(RBF, MLPLayer, MLPLayer): indices 1, 2
            seq_idx = parts[1]
            if seq_idx != "0":  # RBF has no params
                dest = emb_prefix + (f"{head}_{int(seq_idx) - 1}",)
                out = mlp(dest, parts[2:], arr)
        elif head == "extra_feature_embedding":
            out = mlp(("extra_feature_embedding",), parts[1:], arr)
        elif head == "alignn_layers":
            n, sub = parts[1], parts[2]
            out = eggc(trunk_prefix + (f"alignn_layers_{n}", sub),
                       parts[3:], arr)
        elif head == "gcn_layers":
            out = eggc(trunk_prefix + (f"gcn_layers_{parts[1]}",),
                       parts[2:], arr)
        elif head in ("fc", "fc1", "fc2", "fc3", "fc_atomwise",
                      "fc_additional_output"):
            if len(parts) >= 3 and parts[1] == "layer":
                # extra-features path: reference fc1/fc2 are MLPLayers
                # (alignn.py:260-267, keys fc1.layer.0.weight etc.) —
                # route through the MLP mapping or their Linear+Norm
                # weights silently keep random init
                out = mlp((head,), parts[1:], arr)
            else:
                p = parts[2] if len(parts) >= 3 and parts[1].isdigit() \
                    else parts[1]
                if p == "weight":
                    out = (head, "kernel"), "params", arr.T
                elif p == "bias":
                    # the reference's log-link init overwrites fc.bias
                    # with a 0-d tensor (alignn.py:276-278) — restore
                    # the [1] shape
                    out = (head, "bias"), "params", np.atleast_1d(arr)
        if out is not None:
            yield out
        # unknown entries are skipped (e.g. link params absent here)


def convert_torch_checkpoint(pt_path: str,
                             layout: str = "nested") -> Tuple[Dict, Dict]:
    """Load a reference .pt checkpoint -> (params, batch_stats) trees.

    layout="nested" for ALIGNN/ALIGNNAtomWise, "flat" for eALIGNN.
    """
    import torch

    obj = torch.load(pt_path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    params_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    stats_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for entry in _convert_entries(sd, layout=layout):
        if entry is None:
            continue
        path, coll, arr = entry
        (params_flat if coll == "params" else stats_flat)[path] = arr
    params = traverse_util.unflatten_dict(params_flat)
    stats = traverse_util.unflatten_dict(stats_flat)
    return core.freeze(params), core.freeze(stats)


def save_converted_checkpoint(pt_path: str, out_path: str,
                              atom_features: str = "cgcnn",
                              layout: str = "nested") -> str:
    """Convert a reference .pt checkpoint and persist it WITH feature-
    table provenance, so the conversion's table dependency is recorded
    at conversion time (VERDICT r3 #5)."""
    params, stats = convert_torch_checkpoint(pt_path, layout=layout)
    meta = checkpoint_meta(atom_features,
                           converted_from=os.path.basename(pt_path))
    save_params(out_path, params, stats or None, meta=meta)
    return out_path


def merge_converted(template_params, converted_params):
    """Overlay converted weights onto an initialized parameter tree.

    Any template leaf missing from the conversion is kept (and reported),
    so partially-matching checkpoints still load.
    """
    t = traverse_util.flatten_dict(
        serialization.to_state_dict(template_params))
    c = traverse_util.flatten_dict(
        serialization.to_state_dict(core.unfreeze(converted_params)))
    missing, mismatched = [], []
    for k in t:
        if k in c:
            if tuple(np.shape(c[k])) == tuple(np.shape(t[k])):
                # .dtype is metadata — np.asarray(t[k]) would device_get
                # EVERY template leaf through the remote tunnel
                t[k] = np.asarray(c[k], dtype=getattr(
                    t[k], "dtype", np.float32))
            else:
                mismatched.append("/".join(k))
        else:
            missing.append("/".join(k))
    unused = [k for k in c if k not in t]
    report = {"missing": missing, "mismatched": mismatched,
              "unused": ["/".join(k) for k in unused]}
    merged = serialization.from_state_dict(
        template_params, traverse_util.unflatten_dict(t))
    return merged, report
