"""Interop with the reference's ``best_model.pth`` checkpoints.

The reference saves ``{epoch, model_state_dict, optimizer_state_dict,
train_loss, val_loss, f1_class2, f1_per_class, num_classes}``
(pcs.py:373-382) where ``model_state_dict`` follows the §2.2 layer table:
Conv1d weights ``(out, in, 1)`` + bias, BatchNorm1d
weight/bias/running_mean/running_var/num_batches_tracked, optionally all
under a ``module.`` DataParallel prefix (pcs.py:407-428).

Mapping to our pytrees:
- ``<conv>.weight (out,in,1)`` -> ``params[<conv>]['kernel'] (in,out)``
  (squeeze kernel dim + transpose — channels-last dense layout);
- ``<conv>.bias`` -> ``params[<conv>]['bias']``;
- ``<bn>.weight/.bias`` -> ``params[<bn>]['scale'/'bias']``;
- ``<bn>.running_mean/.running_var`` -> ``batch_stats[<bn>]['mean'/'var']``;
- ``num_batches_tracked`` is dropped (torch only uses it for
  momentum=None, which the reference never sets).

``export_torch_state_dict`` is the inverse, so parity tests can drive the
actual reference architecture in torch with our weights.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from pcseg_tpu.models.pointnet import BN_FOR

CONV_NAMES = tuple(BN_FOR.keys()) + ("seg_conv4",)


def _strip_module_prefix(sd: Mapping[str, Any]) -> dict[str, Any]:
    # DataParallel prefix normalization — reference does the same dance at
    # pcs.py:407-428.
    if any(k.startswith("module.") for k in sd):
        return {k.removeprefix("module."): v for k, v in sd.items()}
    return dict(sd)


def import_torch_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch state_dict (tensors or ndarrays) -> {params, batch_stats}."""
    sd = _strip_module_prefix(state_dict)

    def arr(key: str) -> np.ndarray:
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    params: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {}
    for conv in CONV_NAMES:
        w = arr(f"{conv}.weight")
        if w.ndim != 3 or w.shape[-1] != 1:
            raise ValueError(f"{conv}.weight has shape {w.shape}, want (out,in,1)")
        params[conv] = {
            "kernel": np.ascontiguousarray(w[:, :, 0].T),
            "bias": arr(f"{conv}.bias"),
        }
        bn = BN_FOR.get(conv)
        if bn is not None:
            params[bn] = {"scale": arr(f"{bn}.weight"), "bias": arr(f"{bn}.bias")}
            batch_stats[bn] = {
                "mean": arr(f"{bn}.running_mean"),
                "var": arr(f"{bn}.running_var"),
            }
    return {"params": params, "batch_stats": batch_stats}


def export_torch_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """{params, batch_stats} -> reference-layout state_dict (ndarrays)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: dict[str, np.ndarray] = {}
    for conv in CONV_NAMES:
        k = np.asarray(params[conv]["kernel"], np.float32)
        out[f"{conv}.weight"] = np.ascontiguousarray(k.T)[:, :, None]
        out[f"{conv}.bias"] = np.asarray(params[conv]["bias"], np.float32)
        bn = BN_FOR.get(conv)
        if bn is not None:
            out[f"{bn}.weight"] = np.asarray(params[bn]["scale"], np.float32)
            out[f"{bn}.bias"] = np.asarray(params[bn]["bias"], np.float32)
            out[f"{bn}.running_mean"] = np.asarray(stats[bn]["mean"], np.float32)
            out[f"{bn}.running_var"] = np.asarray(stats[bn]["var"], np.float32)
            out[f"{bn}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def load_best_model_pth(path: str) -> tuple[dict, dict]:
    """Load a reference ``best_model.pth``; returns (variables, metadata).

    metadata carries the checkpoint's num_classes / metrics
    (pcs.py:373-382); torch is only needed for this interop path.
    """
    import torch  # local import: torch is interop-only, not a framework dep

    # weights_only=True: the reference checkpoint holds only tensors /
    # ints / floats / lists (pcs.py:373-382), and full unpickling would
    # execute arbitrary code from an untrusted .pth.
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    variables = import_torch_state_dict(ckpt["model_state_dict"])
    meta = {k: v for k, v in ckpt.items() if k != "model_state_dict"}
    meta.pop("optimizer_state_dict", None)
    return variables, meta
