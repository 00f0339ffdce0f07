"""PyTorch checkpoint → flax params converter.

BASELINE.json requires "checkpoint-convertible weights": a reference
``model_*.pth`` state dict must load into this framework for depth-map
parity testing (SURVEY.md §7 step 5). The fiddly parts handled here:

* conv kernels: torch OIHW → flax HWIO; 3D: OIDHW → DHWIO; 1×1 "convs"
  that became Dense layers: (O, I) → (I, O);
* BatchNorm: (weight, bias, running_mean, running_var) →
  params (scale, bias) + batch_stats (mean, var);
* transposed conv: torch IODHW/IOHW with flipped spatial semantics → flax
  ConvTranspose HWIO/DHWIO kernels.

Because ``/root/reference`` was empty at build time (SURVEY.md §0), the
reference's exact module names are unverifiable; ``convert_state_dict``
therefore works structurally: it walks OUR param tree, consumes torch
tensors in the order given by an explicit name map (or a same-shape
greedy match), and converts per-kind. The name map for the true reference
layout is one small table to fill in once real checkpoints exist.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file to {name: ndarray} (CPU, no grad)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:      # reference Checkpointer layout
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")                  # nn.DataParallel prefix
        out[k] = v.detach().cpu().numpy()
    return out


# -- per-kind tensor conversions -------------------------------------------

def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """OIHW→HWIO or OIDHW→DHWIO."""
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"not a conv kernel: shape {w.shape}")


def torch_deconv_to_flax(w: np.ndarray) -> np.ndarray:
    """ConvTranspose: torch stores (I, O, *spatial); our DeconvBlock uses
    flax ``ConvTranspose(transpose_kernel=True)`` whose kernel layout is
    (*spatial, O, I) — verified output-exact vs torch."""
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"not a deconv kernel: shape {w.shape}")


def torch_linear_to_flax(w: np.ndarray) -> np.ndarray:
    """(O, I) → (I, O). Also used for 1×1 convs collapsed to Dense:
    (O, I, 1, 1)/(O, I, 1) drop the trailing spatial 1-dims first (a full
    squeeze would also collapse a 1-wide out-channel dim, e.g. the flow
    head's final (1, C, 1) Conv1d)."""
    while w.ndim > 2 and w.shape[-1] == 1:
        w = w[..., 0]
    if w.ndim != 2:
        raise ValueError(f"not a linear kernel: shape {w.shape}")
    return np.ascontiguousarray(w.T)


def flax_to_torch_conv(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:
        return np.transpose(w, (3, 2, 0, 1))
    if w.ndim == 5:
        return np.transpose(w, (4, 3, 0, 1, 2))
    raise ValueError(f"shape {w.shape}")


# -- structural conversion --------------------------------------------------

def _flatten(tree: Mapping, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    out: Dict = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def _convert_leaf(path: Tuple[str, ...], torch_w: np.ndarray,
                  target_shape: Tuple[int, ...]) -> np.ndarray:
    leaf = path[-1]
    parent = path[-2] if len(path) > 1 else ""
    if leaf == "kernel":
        if parent.startswith("ConvTranspose") or "Deconv" in parent:
            w = torch_deconv_to_flax(torch_w)
        elif parent.startswith("Dense"):
            w = torch_linear_to_flax(torch_w)
        elif torch_w.ndim >= 4:
            w = torch_conv_to_flax(torch_w)
            if (tuple(w.shape) != tuple(target_shape)
                    and np.squeeze(torch_w).ndim == 2):
                # 1×1 conv folded into a matmul param (EdgeConv's split
                # kernel keeps the reference's (2C, F) layout)
                w = torch_linear_to_flax(torch_w)
        else:
            w = torch_linear_to_flax(torch_w)
    elif leaf in ("bias", "scale", "mean", "var"):
        w = torch_w
    else:
        w = torch_w
    if tuple(w.shape) != tuple(target_shape):
        raise ValueError(
            f"converted shape {w.shape} != target {target_shape} at {'/'.join(path)}")
    return w.astype(np.float32)


# torch BN/conv leaf-name suffix → flax leaf name within a module
_TORCH_LEAF = {
    "kernel": ("weight",),
    "bias": ("bias",),
    "scale": ("weight",),        # BN gamma
    "mean": ("running_mean",),
    "var": ("running_var",),
}


def convert_checkpoint(pth_path: str, cfg, out_dir: str,
                       name_map: Dict[str, str] | None = None) -> str:
    """Reference ``.pth`` → orbax checkpoint loadable via ``TEST.WEIGHT``.

    Builds the model from ``cfg``, initializes a template TrainState at a
    tiny shape, converts the torch state dict onto it, and writes the
    state under ``out_dir`` (StandardCheckpointer layout — exactly what
    ``Checkpointer.load(path=...)`` restores). → the written path.
    """
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from pointmvsnet_tpu.models import build_model
    from pointmvsnet_tpu.parallel import create_train_state
    from pointmvsnet_tpu.utils.solver import build_optimizer

    model, _, _ = build_model(cfg)
    d = 8
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 2, 64, 64, 3).astype(np.float32))
    cams = np.zeros((1, 2, 2, 4, 4), np.float32)
    cams[:, :, 0] = np.eye(4)
    cams[:, :, 1, :3, :3] = [[80, 0, 32], [0, 80, 32], [0, 0, 1]]
    cams[:, :, 1, 3] = [8.0, 0.5, d, 8.0 + (d - 1) * 0.5]
    batch = {"images": images, "cams": jnp.asarray(cams)}
    state = create_train_state(
        model, build_optimizer(cfg, 1), jax.random.PRNGKey(0), batch,
        dict(is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
             num_virtual_plane=d))

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    converted = convert_state_dict(load_pth(pth_path), variables, name_map)
    state = state.replace(params=converted["params"],
                          batch_stats=converted.get("batch_stats", {}))

    import os
    out_dir = os.path.abspath(out_dir)
    ocp.StandardCheckpointer().save(out_dir, state, force=True)
    return out_dir


def main(argv=None):
    """CLI: ``python -m pointmvsnet_tpu.utils.torch_convert --pth m.pth
    --cfg configs/dtu_wde3.yaml --out converted_ckpt`` → pass the out dir
    as ``TEST.WEIGHT`` to the test entry."""
    import argparse

    from pointmvsnet_tpu.config import load_cfg_from_file

    ap = argparse.ArgumentParser(description="torch .pth -> TEST.WEIGHT dir")
    ap.add_argument("--pth", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    cfg = load_cfg_from_file(args.cfg)
    cfg.freeze()
    path = convert_checkpoint(args.pth, cfg, args.out)
    print(f"converted {args.pth} -> {path}")


def convert_state_dict(torch_sd: Dict[str, np.ndarray],
                       variables: Mapping,
                       name_map: Dict[str, str] | None = None) -> Dict:
    """Convert a torch state dict onto the structure of ``variables``
    (a flax ``{"params": ..., "batch_stats": ...}`` tree).

    ``name_map``: flax path string ("params/img_conv/ConvBlock_0/Conv_0/kernel")
    → torch tensor name. Missing entries fall back to a same-shape greedy
    match (after per-kind conversion), which is exact for sequentially
    numbered architectures like this one. Raises if any flax leaf stays
    unmatched.
    """
    import re

    def natural(path: Tuple[str, ...]):
        # "ConvBlock_10" must sort after "ConvBlock_2": split numeric runs
        return tuple(
            tuple(int(t) if t.isdigit() else t for t in re.split(r"(\d+)", p))
            for p in path)

    name_map = dict(name_map or {})
    flat_target = _flatten(variables)
    remaining = {k: np.asarray(v) for k, v in torch_sd.items()
                 if np.asarray(v).dtype != np.int64}  # skip num_batches_tracked

    out: Dict[Tuple[str, ...], np.ndarray] = {}
    unmatched = []
    for path, target in sorted(flat_target.items(), key=lambda kv: natural(kv[0])):
        pstr = "/".join(path)
        tname = name_map.get(pstr)
        if tname is not None:
            if tname not in remaining:
                raise KeyError(f"name_map points at missing torch tensor {tname!r}")
            out[path] = _convert_leaf(path, remaining.pop(tname), np.shape(target))
            continue
        # greedy same-shape match in torch insertion order
        hit = None
        for name, w in remaining.items():
            leaf_names = _TORCH_LEAF.get(path[-1], (path[-1],))
            if not any(name.endswith("." + ln) or name == ln for ln in leaf_names):
                continue
            try:
                conv = _convert_leaf(path, w, np.shape(target))
            except ValueError:
                continue
            hit = (name, conv)
            break
        if hit is None:
            unmatched.append(pstr)
        else:
            remaining.pop(hit[0])
            out[path] = hit[1]
    if unmatched:
        raise ValueError(f"unmatched flax params ({len(unmatched)}): "
                         f"{unmatched[:8]} ...")
    return _unflatten(out)


if __name__ == "__main__":
    main()
