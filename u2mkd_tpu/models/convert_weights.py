"""torch ResNet checkpoint -> SwiftNet flax params conversion.

The reference initializes its image branch from the standard torchvision
``resnet18-5c106cde.pth`` ImageNet checkpoint (``swiftnet.py:338-343``,
``load_state_dict(strict=False)`` — only backbone keys match). This module
maps such a state_dict onto our :class:`SwiftNetResNet` parameter tree:

  torch conv [O, I, kh, kw]  -> flax conv [kh, kw, I, O]
  torch bn weight/bias/running_mean/running_var -> scale/bias + batch_stats
  layer{L}.{B}.conv{1,2}/bn{1,2}/downsample.{0,1} -> layer{L}_{B} blocks

Note the reference's stem is stride-1 7x7 (torchvision's is stride-2) — the
weights transfer unchanged; only the stride differs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_resnet_to_swiftnet(state_dict: Dict[str, "object"],
                               layers=(2, 2, 2, 2)) -> Tuple[dict, dict]:
    """Returns (params_update, batch_stats_update) trees for the
    ``pix_branch`` scope. Missing keys are simply absent (caller merges)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put_bn(scope, prefix):
        if f"{prefix}.weight" not in sd:
            return
        params[scope] = {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
        }
        stats[scope] = {
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }

    if "conv1.weight" in sd:
        params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1")

    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            t = f"layer{li + 1}.{bi}"
            scope = f"layer{li + 1}_{bi}"
            blk: dict = {}
            if f"{t}.conv1.weight" in sd:
                blk["conv1"] = {"kernel": _conv(sd[f"{t}.conv1.weight"])}
                blk["conv2"] = {"kernel": _conv(sd[f"{t}.conv2.weight"])}
            for bn_i in (1, 2):
                if f"{t}.bn{bn_i}.weight" in sd:
                    blk[f"bn{bn_i}"] = {
                        "scale": sd[f"{t}.bn{bn_i}.weight"],
                        "bias": sd[f"{t}.bn{bn_i}.bias"],
                    }
                    stats.setdefault(scope, {})[f"bn{bn_i}"] = {
                        "mean": sd[f"{t}.bn{bn_i}.running_mean"],
                        "var": sd[f"{t}.bn{bn_i}.running_var"],
                    }
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                blk["down_bn"] = {
                    "scale": sd[f"{t}.downsample.1.weight"],
                    "bias": sd[f"{t}.downsample.1.bias"],
                }
                stats.setdefault(scope, {})["down_bn"] = {
                    "mean": sd[f"{t}.downsample.1.running_mean"],
                    "var": sd[f"{t}.downsample.1.running_var"],
                }
            if blk:
                params[scope] = blk
    return params, stats


def convert_swiftnet_full(state_dict: Dict[str, "object"],
                          layers=(2, 2, 2, 2)) -> Tuple[dict, dict]:
    """Full reference ``SwiftNetResNet`` state_dict -> flax trees: the
    resnet backbone plus the SPP (``spp.spp.{spp_bn,spp0..2,spp_fuse}``)
    and decoder (``upsample.{i}.{bottleneck,blend_conv}``) heads
    (reference ``swiftnet.py:120-330``). Lets a trained reference image
    branch be ported verbatim; also the basis of the exec'd-reference
    whole-forward oracle (``tests/test_ref_swiftnet_oracle.py``)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params, stats = convert_resnet_to_swiftnet(sd, layers)

    def put_brc(scope_parts, prefix):
        """_BNReluConv: norm (BN) + conv."""
        if f"{prefix}.conv.weight" not in sd:
            return
        p = params
        s = stats
        for part in scope_parts[:-1]:
            p = p.setdefault(part, {})
            s = s.setdefault(part, {})
        leaf = scope_parts[-1]
        p[leaf] = {
            "norm": {"scale": sd[f"{prefix}.norm.weight"],
                     "bias": sd[f"{prefix}.norm.bias"]},
            "conv": {"kernel": _conv(sd[f"{prefix}.conv.weight"])},
        }
        s[leaf] = {
            "norm": {"mean": sd[f"{prefix}.norm.running_mean"],
                     "var": sd[f"{prefix}.norm.running_var"]},
        }

    for name in ("spp_bn", "spp0", "spp1", "spp2", "spp_fuse"):
        put_brc(["spp", name], f"spp.spp.{name}")
    for i in range(3):
        put_brc([f"up{i}", "bottleneck"], f"upsample.{i}.bottleneck")
        put_brc([f"up{i}", "blend_conv"], f"upsample.{i}.blend_conv")
    return params, stats


def _deep_merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            cur = out.get(k)
            out[k] = _deep_merge(cur if isinstance(cur, dict) else {}, v)
        else:
            import jax.numpy as jnp

            out[k] = jnp.asarray(v)
    return out


def load_imagenet_pretrain(path: str, variables: dict,
                           scope: str = "pix_branch") -> dict:
    """Merge a torch resnet checkpoint into a variables dict whose params
    contain ``scope``. Returns updated variables; no-op if path is falsy.

    Expected file (reference ``swiftnet.py:338-343``): torchvision's
    ``resnet18-5c106cde.pth`` (the 8-hex suffix is the leading sha256 of
    the file, per torchvision's naming convention;
    https://download.pytorch.org/models/resnet18-5c106cde.pth). Its
    state_dict has 122 entries: 102 tensors this converter consumes or
    skips (conv/bn/fc) plus 20 ``num_batches_tracked`` counters. The
    backbone mapping matches 100 tensors (everything except ``fc.weight``
    / ``fc.bias`` — the reference also drops them via ``strict=False``).
    A file that matches ZERO backbone tensors raises instead of silently
    training from random init."""
    if not path:
        return variables
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    p_up, s_up = convert_resnet_to_swiftnet(
        {k: v.numpy() for k, v in sd.items()}
    )
    def _count(tree):
        if isinstance(tree, dict):
            return sum(_count(v) for v in tree.values())
        return 1

    n_loaded = _count(p_up) + _count(s_up)
    if n_loaded == 0:
        raise ValueError(
            f"ImageNet pretrain {path!r}: no torchvision-resnet keys found "
            f"(got {sorted(sd)[:5]}...) — wrong file? Expected "
            f"resnet18-5c106cde.pth-style state_dict (see docstring)."
        )
    print(f"[convert_weights] loaded {n_loaded} backbone tensors "
          f"from {path}")
    out = dict(variables)
    params = dict(out["params"])
    params[scope] = _deep_merge(params[scope], p_up)
    out["params"] = params
    if "batch_stats" in out and s_up:
        stats = dict(out["batch_stats"])
        stats[scope] = _deep_merge(stats.get(scope, {}), s_up)
        out["batch_stats"] = stats
    return out
