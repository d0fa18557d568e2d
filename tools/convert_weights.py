"""Convert reference PyTorch checkpoints (DETR / Deformable-DETR /
TrackFormer, torchvision ResNet) into trackformer_tpu npz parameter files.

Layout transforms:
  * conv kernels OIHW -> HWIO;
  * linear weights (out, in) -> (in, out);
  * torch nn.MultiheadAttention packed in_proj (3C, C) -> separate
    q/k/v kernels;
  * frozen-BN buffers copy by name.

Usage:
  python tools/convert_weights.py checkpoint.pth out.npz
The inverse name mapping is generated from the target model's parameter
tree, so coverage is checkable: unmapped keys on either side are reported.
"""
from __future__ import annotations

import argparse
import re
import sys
import os.path as osp
from typing import Dict, Optional, Tuple

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def torch_key_for(path: str) -> Optional[Tuple[str, str]]:
    """Our flat param path -> (torch state-dict key, transform).

    transform in {conv, linear, copy, qkv_q, qkv_k, qkv_v, embed}.
    """
    p = path.replace("params/", "")

    # ---- backbone trunk ----
    m = re.match(r"backbone/trunk/(.*)", p)
    if m:
        rest = m.group(1)
        base = "backbone.0.body."
        rest = re.sub(r"layer(\d)_(\d+)/", r"layer\1.\2.", rest)
        rest = rest.replace("downsample_conv/", "downsample.0.")
        rest = rest.replace("downsample_bn/", "downsample.1.")
        rest = rest.replace("/", ".")
        if rest.endswith(".kernel"):
            return base + rest[:-len(".kernel")] + ".weight", "conv"
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            if rest.endswith("." + suffix):
                return base + rest, "copy"
        return None

    # ---- input projections ----
    m = re.match(r"input_proj_(\d+)/conv/(kernel|bias)", p)
    if m:
        i, kind = m.groups()
        name = "weight" if kind == "kernel" else "bias"
        return f"input_proj.{i}.0.{name}", ("conv" if kind == "kernel"
                                            else "copy")
    m = re.match(r"input_proj_(\d+)/norm/(scale|bias)", p)
    if m:
        i, kind = m.groups()
        name = "weight" if kind == "scale" else "bias"
        return f"input_proj.{i}.1.{name}", "copy"
    m = re.match(r"input_proj/(kernel|bias)", p)  # vanilla DETR single conv
    if m:
        kind = m.group(1)
        name = "weight" if kind == "kernel" else "bias"
        return f"input_proj.{name}", ("conv" if kind == "kernel" else "copy")

    # ---- embeddings ----
    if p == "query_embed":
        return "query_embed.weight", "copy"
    if p == "level_embed":
        return "transformer.level_embed", "copy"

    # ---- deformable encoder/decoder layers ----
    def msda(sub: str, tk: str):
        mm = re.match(
            rf"{sub}/(sampling_offsets|attention_weights|value_proj|"
            rf"output_proj)/(kernel|bias)", rest2)
        if mm:
            mod, kind = mm.groups()
            name = "weight" if kind == "kernel" else "bias"
            t = "linear" if kind == "kernel" else "copy"
            return f"{tk}.{mod}.{name}", t
        return None

    m = re.match(r"encoder/layer_(\d+)/(.*)", p)
    if m:
        i, rest2 = m.groups()
        tk = f"transformer.encoder.layers.{i}"
        r = msda("self_attn", tk + ".self_attn")
        if r:
            return r
        return _ffn_norm(rest2, tk)

    m = re.match(r"decoder_layers_(\d+)/(.*)", p)
    if m:
        i, rest2 = m.groups()
        tk = f"transformer.decoder.layers.{i}"
        r = msda("cross_attn", tk + ".cross_attn")
        if r:
            return r
        r = _torch_mha(rest2, "self_attn", tk + ".self_attn")
        if r:
            return r
        return _ffn_norm(rest2, tk)

    # ---- vanilla transformer ----
    m = re.match(r"transformer/(encoder|decoder|track_attention)_layer_(\d+)"
                 r"/(.*)", p)
    if m:
        which, i, rest2 = m.groups()
        if which == "track_attention":
            tk = f"transformer.decoder.layers_track_attention.{i}"
        else:
            tk = f"transformer.{which}.layers.{i}"
        r = _torch_mha(rest2, "self_attn", tk + ".self_attn")
        if r:
            return r
        r = _torch_mha(rest2, "multihead_attn", tk + ".multihead_attn")
        if r:
            return r
        return _ffn_norm(rest2, tk)
    m = re.match(r"transformer/decoder_norm/(scale|bias)", p)
    if m:
        name = "weight" if m.group(1) == "scale" else "bias"
        return f"transformer.decoder.norm.{name}", "copy"

    # ---- heads ----
    m = re.match(r"(class_embed)(?:_(\d+))?/(kernel|bias)", p)
    if m:
        _, i, kind = m.groups()
        tk = f"class_embed.{i}" if i is not None else "class_embed"
        name = "weight" if kind == "kernel" else "bias"
        return f"{tk}.{name}", ("linear" if kind == "kernel" else "copy")
    m = re.match(r"(bbox_embed)(?:_(\d+))?/layer_(\d+)/(kernel|bias)", p)
    if m:
        _, i, j, kind = m.groups()
        tk = f"bbox_embed.{i}" if i is not None else "bbox_embed"
        name = "weight" if kind == "kernel" else "bias"
        return f"{tk}.layers.{j}.{name}", ("linear" if kind == "kernel"
                                           else "copy")
    # ---- two-stage proposal projections (reference
    # deformable_transformer.py:53-56) ----
    m = re.match(r"(enc_output|pos_trans)(_norm)?/(kernel|scale|bias)", p)
    if m:
        mod, is_norm, kind = m.groups()
        name = "weight" if kind in ("kernel", "scale") else "bias"
        t = "linear" if kind == "kernel" else "copy"
        return f"transformer.{mod}{is_norm or ''}.{name}", t
    m = re.match(r"reference_points/(kernel|bias)", p)
    if m:
        kind = m.group(1)
        name = "weight" if kind == "kernel" else "bias"
        return f"transformer.reference_points.{name}", \
            ("linear" if kind == "kernel" else "copy")

    # ---- segm heads ----
    m = re.match(r"bbox_attention/(q_linear|k_linear)/(kernel|bias)", p)
    if m:
        mod, kind = m.groups()
        name = "weight" if kind == "kernel" else "bias"
        return f"bbox_attention.{mod}.{name}", \
            ("linear" if kind == "kernel" else "copy")
    m = re.match(r"mask_head/(\w+)/(kernel|bias|scale)", p)
    if m:
        mod, kind = m.groups()
        name = "weight" if kind in ("kernel", "scale") else "bias"
        t = "conv" if (kind == "kernel" and not mod.startswith("gn")) \
            else "copy"
        return f"mask_head.{mod}.{name}", t
    return None


def _ffn_norm(rest2: str, tk: str):
    m = re.match(r"(linear\d)/(kernel|bias)", rest2)
    if m:
        mod, kind = m.groups()
        name = "weight" if kind == "kernel" else "bias"
        return f"{tk}.{mod}.{name}", ("linear" if kind == "kernel"
                                      else "copy")
    m = re.match(r"(norm\d)/(scale|bias)", rest2)
    if m:
        mod, kind = m.groups()
        name = "weight" if kind == "scale" else "bias"
        return f"{tk}.{mod}.{name}", "copy"
    return None


def _torch_mha(rest2: str, ours: str, tk: str):
    m = re.match(rf"{ours}/(q_proj|k_proj|v_proj|out_proj)/(kernel|bias)",
                 rest2)
    if not m:
        return None
    mod, kind = m.groups()
    if mod == "out_proj":
        name = "weight" if kind == "kernel" else "bias"
        t = "linear" if kind == "kernel" else "copy"
        return f"{tk}.out_proj.{name}", t
    part = {"q_proj": "q", "k_proj": "k", "v_proj": "v"}[mod]
    src = "in_proj_weight" if kind == "kernel" else "in_proj_bias"
    return f"{tk}.{src}", f"qkv_{part}"


def convert(torch_state: Dict[str, np.ndarray],
            target_flat: Dict[str, np.ndarray],
            verbose: bool = True) -> Dict[str, np.ndarray]:
    # strip DataParallel/"detr." prefixes (reference train.py:156-171)
    cleaned = {}
    for k, v in torch_state.items():
        k = k.replace("module.", "")
        if k.startswith("detr."):
            k = k[len("detr."):]
        cleaned[k] = np.asarray(v)
    out = dict(target_flat)
    used = set()
    for path, tgt in target_flat.items():
        r = torch_key_for(path)
        if r is None:
            if verbose and "bn" not in path:
                print(f"  unmapped (ours): {path}")
            continue
        tkey, transform = r
        if tkey not in cleaned:
            if verbose:
                print(f"  missing (torch): {tkey} for {path}")
            continue
        v = cleaned[tkey]
        used.add(tkey)
        if transform == "conv":
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif transform == "linear":
            v = v.T
        elif transform.startswith("qkv_"):
            c = v.shape[-1] if v.ndim == 2 else v.shape[0] // 3
            i = {"q": 0, "k": 1, "v": 2}[transform[-1]]
            v = v[i * c:(i + 1) * c]
            if v.ndim == 2:
                v = v.T
        if v.shape != tgt.shape:
            print(f"  SHAPE MISMATCH {path}: torch {v.shape} "
                  f"vs ours {tgt.shape} - keeping init")
            continue
        out[path] = v.astype(tgt.dtype)
    if verbose:
        unused = set(cleaned) - used
        for k in sorted(unused):
            print(f"  unused (torch): {k}")
        print(f"converted {len(used)}/{len(target_flat)} target params")
    return out


def main():
    import torch
    import yaml

    from trackformer_tpu.models import build_model
    from trackformer_tpu.structures import FrameBatch
    from trackformer_tpu.utils.checkpoint import (flatten_params,
                                                  save_params_npz,
                                                  unflatten_params)
    from trackformer_tpu.utils.config import load_config, nested_namespace

    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--config", default=None,
                    help="train config.yaml describing the model")
    ap.add_argument("--named-configs", nargs="*", default=["deformable"])
    args = ap.parse_args()

    if args.config:
        with open(args.config) as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = load_config("train.yaml", args.named_configs)
    margs = nested_namespace(cfg)
    model, _, _, _ = build_model(margs)

    import jax
    import jax.numpy as jnp
    batch = FrameBatch.from_images(jnp.zeros((1, 64, 64, 3)),
                                   jnp.array([[64, 64]]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    state = {k: v.numpy() for k, v in state.items()
             if hasattr(v, "numpy")}
    flat = convert(state, flatten_params(params))
    save_params_npz(unflatten_params(flat), args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
