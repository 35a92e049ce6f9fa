"""Convert reference PyTorch checkpoints to vcagan flax variable trees.

The reference saves a dict of 7 state_dicts per checkpoint
(reference: train.py:303-309: v_front/gen/post/dis1..3/s_dis).  This tool
maps every tensor into this framework's channels-last parameter layout:

- Conv2d OIHW -> HWIO; Conv3d OIDHW -> DHWIO; Conv1d OIW -> WIO
- Linear (out, in) -> kernel (in, out)
- GRU weight_ih/hh (3H, in) -> w_i/w_h (in, 3H); gate order r|z|n matches
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
- flatten-order permutations where the reference flattens (C, F) C-major
  while this framework flattens (F, C) F-major (attention q input, sync
  critic projection)
- time/freq transposes where this framework lays audio maps out time-major
  (sync critic + audio fronts: reference convs see (freq, time) maps, ours
  see (time, freq) -> spatial kernel transpose)

Usage:
    python tools/convert_torch_ckpt.py --ckpt Best_xxx.ckpt --out ckpt_dir/
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def conv2d(w) -> np.ndarray:  # OIHW -> HWIO
    return _t(w).transpose(2, 3, 1, 0)


def conv2d_swapped(w) -> np.ndarray:  # OIHW -> (W,H)IO for time-major maps
    return _t(w).transpose(3, 2, 1, 0)


def conv3d(w) -> np.ndarray:  # OIDHW -> DHWIO
    return _t(w).transpose(2, 3, 4, 1, 0)


def conv1d(w) -> np.ndarray:  # OIW -> WIO
    return _t(w).transpose(2, 1, 0)


def linear_kernel(w) -> np.ndarray:  # (out, in) -> (in, out)
    return _t(w).transpose(1, 0)


def bn(sd: Dict, prefix: str):
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def prelu(sd: Dict, prefix: str):
    return {"alpha": _t(sd[f"{prefix}.weight"])}


def _perm_cf_to_fc(c: int, f: int) -> np.ndarray:
    """Row permutation taking our (f-major) flat index to the reference's
    (c-major) flat index: perm[f*C + c] = c*F + f."""
    idx = np.arange(c * f)
    f_idx, c_idx = idx // c, idx % c
    return c_idx * f + f_idx


# --------------------------------------------------------------------- blocks


def basic_block(sd: Dict, p: str, swapped: bool = False):
    """reference resnet.BasicBlock -> vcagan.nn.resnet.BasicBlock tree."""
    cv = conv2d_swapped if swapped else conv2d
    params = {
        "conv1": {"kernel": cv(sd[f"{p}.conv1.weight"])},
        "conv2": {"kernel": cv(sd[f"{p}.conv2.weight"])},
    }
    stats = {}
    for torch_bn, ours in (("bn1", "bn1"), ("bn2", "bn2")):
        bp, bs = bn(sd, f"{p}.{torch_bn}")
        params[ours] = bp
        stats[ours] = bs
    # relu_type='relu' BasicBlocks have parameter-free activations
    if f"{p}.relu1.weight" in sd:
        params["act1"] = prelu(sd, f"{p}.relu1")
        params["act2"] = prelu(sd, f"{p}.relu2")
    if f"{p}.downsample.0.weight" in sd:
        params["down_conv"] = {"kernel": cv(sd[f"{p}.downsample.0.weight"])}
        bp, bs = bn(sd, f"{p}.downsample.1")
        params["down_bn"] = bp
        stats["down_bn"] = bs
    return params, stats


def gen_res_blk(sd: Dict, p: str):
    params = {
        "conv1": {
            "kernel": conv2d(sd[f"{p}.conv1.weight"]),
            "bias": _t(sd[f"{p}.conv1.bias"]),
        },
        "conv2": {
            "kernel": conv2d(sd[f"{p}.conv2.weight"]),
            "bias": _t(sd[f"{p}.conv2.bias"]),
        },
    }
    stats = {}
    for name in ("norm1", "norm2"):
        bp, bs = bn(sd, f"{p}.{name}")
        params[name] = bp
        stats[name] = bs
    if f"{p}.conv1x1.weight" in sd:
        params["conv1x1"] = {"kernel": conv2d(sd[f"{p}.conv1x1.weight"])}
    return params, stats


def res_blk(sd: Dict, p: str, one_d: bool = False):
    cv = conv1d if one_d else conv2d
    params = {
        "conv1": {
            "kernel": cv(sd[f"{p}.conv1.weight"]),
            "bias": _t(sd[f"{p}.conv1.bias"]),
        },
        "conv2": {
            "kernel": cv(sd[f"{p}.conv2.weight"]),
            "bias": _t(sd[f"{p}.conv2.bias"]),
        },
    }
    if f"{p}.conv1x1.weight" in sd:
        params["conv1x1"] = {"kernel": cv(sd[f"{p}.conv1x1.weight"])}
    return params, {}


def gru(sd: Dict, p: str, layers: int):
    """torch nn.GRU -> vcagan.nn.gru.BiGRU tree (fused-direction layers)."""
    params = {}
    for layer in range(layers):
        layer_params = {}
        for suffix, ours in (("", "fwd"), ("_reverse", "bwd")):
            layer_params[f"{ours}_w_i"] = linear_kernel(
                sd[f"{p}.weight_ih_l{layer}{suffix}"]
            )
            layer_params[f"{ours}_w_h"] = linear_kernel(
                sd[f"{p}.weight_hh_l{layer}{suffix}"]
            )
            layer_params[f"{ours}_b_i"] = _t(sd[f"{p}.bias_ih_l{layer}{suffix}"])
            layer_params[f"{ours}_b_h"] = _t(sd[f"{p}.bias_hh_l{layer}{suffix}"])
        params[f"l{layer}"] = layer_params
    return params


def dense(sd: Dict, p: str):
    out = {"kernel": linear_kernel(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = _t(sd[f"{p}.bias"])
    return out


# -------------------------------------------------------------------- modules


def convert_visual_front(sd: Dict):
    params = {
        "stem_conv": {"kernel": conv3d(sd["frontend.0.weight"])},
        "stem_act": prelu(sd, "frontend.2"),
        "fc": dense(sd, "fc"),
    }
    stats = {}
    bp, bs = bn(sd, "frontend.1")
    params["stem_bn"] = bp
    stats["stem_bn"] = bs

    resnet_p, resnet_s = {}, {}
    for stage in range(1, 5):
        for block in range(2):
            p, s = basic_block(sd, f"resnet.layer{stage}.{block}")
            resnet_p[f"layer{stage}_{block}"] = p
            if s:
                resnet_s[f"layer{stage}_{block}"] = s
    params["resnet"] = resnet_p
    stats["resnet"] = resnet_s

    params["sentence_encoder"] = gru(sd, "sentence_encoder", layers=2)
    return {"params": params, "batch_stats": stats}


def convert_decoder(sd: Dict):
    params, stats = {}, {}
    for i in range(3):
        p, s = gen_res_blk(sd, f"decode.{i}")
        params[f"decode_{i}"] = p
        stats[f"decode_{i}"] = s
    for stage in ("g1", "g2", "g3"):
        for i in range(3):
            p, s = gen_res_blk(sd, f"{stage}.{i}")
            params[f"{stage}_{i}"] = p
            stats[f"{stage}_{i}"] = s

    for att, c_dim, f_dim in (("att1", 128, 20), ("att2", 64, 40)):
        a = {
            "k": dense(sd, f"{att}.k"),
            "v": dense(sd, f"{att}.v"),
            "mel": dense(sd, f"{att}.mel"),
        }
        q = dense(sd, f"{att}.q")
        perm = _perm_cf_to_fc(c_dim, f_dim)
        a["q"] = {"kernel": q["kernel"][perm], "bias": q["bias"]}
        params[att] = a

    for i in (1, 2):
        params[f"attconv{i}"] = {
            "kernel": conv2d(sd[f"attconv{i}.weight"]),
            "bias": _t(sd[f"attconv{i}.bias"]),
        }
    for i in (1, 2, 3):
        head_p, head_s = {}, {}
        bp, bs = bn(sd, f"to_mel{i}.0")
        head_p["norm"] = bp
        head_s["norm"] = bs
        head_p["conv"] = {
            "kernel": conv2d(sd[f"to_mel{i}.2.weight"]),
            "bias": _t(sd[f"to_mel{i}.2.bias"]),
        }
        params[f"to_mel{i}"] = head_p
        stats[f"to_mel{i}"] = head_s
    return {"params": params, "batch_stats": stats}


def convert_postnet(sd: Dict):
    params = {
        "conv_in": {
            "kernel": conv1d(sd["postnet.0.weight"]),
            "bias": _t(sd["postnet.0.bias"]),
        },
        "conv_out": {"kernel": conv1d(sd["postnet.6.weight"])},
    }
    stats = {}
    bp, bs = bn(sd, "postnet.1")
    params["bn_in"] = bp
    stats["bn_in"] = bs
    for i, idx in enumerate((3, 4, 5), start=1):
        p, _ = res_blk(sd, f"postnet.{idx}", one_d=True)
        params[f"res{i}"] = p
    return {"params": params, "batch_stats": stats}


def convert_discriminator(sd: Dict, phase: str):
    repeat = {"1": 2, "2": 3, "3": 4}[phase]
    params = {
        "conv_in": {
            "kernel": conv2d(sd["main.0.weight"]),
            "bias": _t(sd["main.0.bias"]),
        }
    }
    for i in range(repeat):
        p, _ = res_blk(sd, f"main.{i + 1}")
        params[f"block{i}"] = p
    params["uncond_conv"] = {
        "kernel": conv2d(sd["uncond.1.weight"]),
        "bias": _t(sd["uncond.1.bias"]),
    }
    params["uncond_out"] = dense(sd, "uncond.4")
    params["cond_conv1"] = {
        "kernel": conv2d(sd["cond.1.weight"]),
        "bias": _t(sd["cond.1.bias"]),
    }
    params["cond_conv2"] = {
        "kernel": conv2d(sd["cond.3.weight"]),
        "bias": _t(sd["cond.3.bias"]),
    }
    params["cond_out"] = dense(sd, "cond.6")
    return {"params": params}


def convert_sync_discriminator(sd: Dict):
    # frontend convs see (freq, time) in the reference but (time, freq)
    # here -> swapped spatial kernels.
    params = {
        "conv1": {
            "kernel": conv2d_swapped(sd["frontend.0.weight"]),
            "bias": _t(sd["frontend.0.bias"]),
        },
        "conv2": {
            "kernel": conv2d_swapped(sd["frontend.3.weight"]),
            "bias": _t(sd["frontend.3.bias"]),
        },
        "act1": prelu(sd, "frontend.2"),
        "act2": prelu(sd, "frontend.5"),
    }
    stats = {}
    for torch_bn, ours in (("frontend.1", "bn1"), ("frontend.4", "bn2")):
        bp, bs = bn(sd, torch_bn)
        params[ours] = bp
        stats[ours] = bs
    p, s = basic_block(sd, "Res_block.0", swapped=True)
    params["res"] = p
    stats["res"] = s
    # Linear input: reference flattens (C=256, F=20) c-major; ours (F, C)
    proj = dense(sd, "Linear")
    perm = _perm_cf_to_fc(256, 20)
    params["proj"] = {"kernel": proj["kernel"][perm], "bias": proj["bias"]}
    return {"params": params, "batch_stats": stats}


def convert_grid_asr(front_sd: Dict, back_sd: Dict):
    """ASR_model/GRID Audio_front + Backend -> GridASR tree."""
    af = {
        "conv1": {
            "kernel": conv2d_swapped(front_sd["frontend.0.weight"]),
            "bias": _t(front_sd["frontend.0.bias"]),
        },
        "conv2": {
            "kernel": conv2d_swapped(front_sd["frontend.3.weight"]),
            "bias": _t(front_sd["frontend.3.bias"]),
        },
        "act1": prelu(front_sd, "frontend.2"),
        "act2": prelu(front_sd, "frontend.5"),
    }
    stats_af = {}
    for torch_bn, ours in (("frontend.1", "bn1"), ("frontend.4", "bn2")):
        bp, bs = bn(front_sd, torch_bn)
        af[ours] = bp
        stats_af[ours] = bs
    p, s = basic_block(front_sd, "Res_block.0", swapped=True)
    af["res"] = p
    stats_af["res"] = s
    proj = dense(front_sd, "Linear")
    perm = _perm_cf_to_fc(64, 20)
    af["proj"] = {"kernel": proj["kernel"][perm], "bias": proj["bias"]}

    params = {
        "audio_front": af,
        "gru": gru(back_sd, "gru", layers=2),
        "fc": dense(back_sd, "fc"),
    }
    return {"params": params, "batch_stats": {"audio_front": stats_af}}


def convert_lrw_asr(front_sd: Dict, back_sd: Dict):
    """ASR_model/LRW Audio_front + Backend -> LRWClassifier tree.

    Mirrors convert_grid_asr with the LRW topology deltas
    (ASR_model/LRW/src/models/audio_front.py:11-25, classifier.py:4-24):
    128/256-channel k3 frontend, plain-ReLU BasicBlock(256), Linear(256*20
    -> 512) with the c-major flatten permutation, biGRU(512) x2, and the
    mean-pooled Linear(1024 -> 500) head.
    """
    af = {
        "conv1": {
            "kernel": conv2d_swapped(front_sd["frontend.0.weight"]),
            "bias": _t(front_sd["frontend.0.bias"]),
        },
        "conv2": {
            "kernel": conv2d_swapped(front_sd["frontend.3.weight"]),
            "bias": _t(front_sd["frontend.3.bias"]),
        },
        "act1": prelu(front_sd, "frontend.2"),
        "act2": prelu(front_sd, "frontend.5"),
    }
    stats_af = {}
    for torch_bn, ours in (("frontend.1", "bn1"), ("frontend.4", "bn2")):
        bp, bs = bn(front_sd, torch_bn)
        af[ours] = bp
        stats_af[ours] = bs
    p, s = basic_block(front_sd, "Res_block.0", swapped=True)
    af["res"] = p
    stats_af["res"] = s
    proj = dense(front_sd, "Linear")
    perm = _perm_cf_to_fc(256, 20)
    af["proj"] = {"kernel": proj["kernel"][perm], "bias": proj["bias"]}

    params = {
        "audio_front": af,
        "gru": gru(back_sd, "gru", layers=2),
        "fc": dense(back_sd, "fc"),
    }
    return {"params": params, "batch_stats": {"audio_front": stats_af}}


def convert_full_checkpoint(ckpt: Dict):
    """Reference 7-state_dict checkpoint -> (g_variables, d_variables)."""
    g = {
        "v_front": convert_visual_front(ckpt["v_front_state_dict"]),
        "gen": convert_decoder(ckpt["gen_state_dict"]),
        "post": convert_postnet(ckpt["post_state_dict"]),
    }
    d = {
        f"dis{i}": convert_discriminator(ckpt[f"dis{i}_state_dict"], str(i))
        for i in (1, 2, 3)
    }
    d["s_dis"] = convert_sync_discriminator(ckpt["s_dis_state_dict"])
    return g, d


def main():
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    ckpt = torch.load(args.ckpt, map_location="cpu")
    g, d = convert_full_checkpoint(ckpt)

    import orbax.checkpoint as ocp
    import os

    saver = ocp.StandardCheckpointer()
    saver.save(os.path.abspath(args.out), {"generator": g, "discriminator": d})
    saver.wait_until_finished()
    print(f"converted -> {args.out}")


if __name__ == "__main__":
    main()
