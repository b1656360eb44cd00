"""Import reference PyTorch checkpoints into flax parameter trees.

The reference saves `{'model': state_dict, 'optimizer', 'epoch', ...}` via
torch.save (reference: utils/misc.py:268-285). This module converts the
`model` state_dict of the flagship combo (SwinTransformerNNFormer encoder +
MONAI SwinUNETRCustom decoder) into this framework's parameter tree, enabling
bit-parity evaluation of reference-trained weights on TPU.

Layout conversions (torch -> flax):
  Linear  (O, I)            -> kernel (I, O)
  Conv3d  (O, I, k, k, k)   -> kernel (k, k, k, I, O)
  ConvTranspose3d (I,O,k..) -> kernel (k, k, k, I, O), spatially flipped
    (verified numerically in tests/test_torch_import.py — flax ConvTranspose
    cross-correlates where torch convolves)
  LayerNorm weight/bias     -> scale/bias (nested under the fp32 wrapper)
  InstanceNorm3d weight/bias-> scale/bias
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def dense(sd: Dict, prefix: str) -> Dict:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def conv(sd: Dict, prefix: str) -> Dict:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def conv_transpose(sd: Dict, prefix: str) -> Dict:
    w = _np(sd[f"{prefix}.weight"])  # (I, O, k, k, k)
    k = w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1]  # flip spatial dims
    p = {"kernel": np.ascontiguousarray(k)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def layer_norm(sd: Dict, prefix: str) -> Dict:
    return {"LayerNorm_0": {"scale": _np(sd[f"{prefix}.weight"]),
                            "bias": _np(sd[f"{prefix}.bias"])}}


def instance_norm(sd: Dict, prefix: str) -> Dict:
    if f"{prefix}.weight" in sd:
        return {"scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}
    # non-affine InstanceNorm in the checkpoint: identity affine here
    return {}


def _interp_grid(arr: np.ndarray, dst_shape) -> np.ndarray:
    """Trilinear resize of a (S1, S2, S3, C) grid to (*dst_shape, C) with
    align_corners=False sampling (torch F.interpolate semantics)."""
    from scipy.ndimage import map_coordinates

    src = arr.shape[:3]
    axes = [np.clip((np.arange(d) + 0.5) * s / d - 0.5, 0, s - 1)
            for d, s in zip(dst_shape, src)]
    grid = np.meshgrid(*axes, indexing="ij")
    coords = np.stack([g.ravel() for g in grid])
    out = np.empty(tuple(dst_shape) + arr.shape[3:], np.float32)
    for c in range(arr.shape[3]):
        out[..., c] = map_coordinates(
            arr[..., c].astype(np.float64), coords, order=1,
            mode="nearest").reshape(dst_shape)
    return out


def resize_rel_pos_bias_table(table: np.ndarray, src_window, dst_window) -> np.ndarray:
    """Resize a 3D-window relative-position bias table across window sizes.

    (prod(2*ws-1), nH) -> (prod(2*wd-1), nH). TPU-native equivalent of the
    reference's (dead) pretrained-loader surgery (utils/checkpoint.py:51-66),
    which bicubic-interpolates 2D tables; our tables index 3D displacement
    grids, so we resize the (2w-1)^3 grid trilinearly (align_corners=False)
    per head.
    """
    src = tuple(2 * int(w) - 1 for w in (src_window if hasattr(src_window, "__len__")
                                         else (src_window,) * 3))
    dst = tuple(2 * int(w) - 1 for w in (dst_window if hasattr(dst_window, "__len__")
                                         else (dst_window,) * 3))
    nh = table.shape[-1]
    assert table.shape[0] == int(np.prod(src)), \
        f"table rows {table.shape[0]} != prod{src}"
    if src == dst:
        return table.astype(np.float32)
    grid = table.reshape(*src, nh).astype(np.float32)
    return _interp_grid(grid, dst).reshape(-1, nh)


def resize_abs_pos_embed(pos: np.ndarray, src_grid, dst_grid,
                         num_extra_tokens: int = 0) -> np.ndarray:
    """Resize a (1, N + extra, C) 3D absolute position embedding to a new
    token grid (reference surgery: utils/checkpoint.py:69-92, 2D bicubic on
    ViT pos_embed; here the 3D trilinear equivalent). Extra (cls) tokens are
    kept unchanged and stay in front."""
    src_grid, dst_grid = tuple(src_grid), tuple(dst_grid)
    squeeze = pos.ndim == 2
    if squeeze:
        pos = pos[None]
    extra = pos[:, :num_extra_tokens]
    tokens = pos[:, num_extra_tokens:]
    c = tokens.shape[-1]
    assert tokens.shape[1] == int(np.prod(src_grid))
    grid = tokens.reshape(*src_grid, c).astype(np.float32)
    resized = _interp_grid(grid, dst_grid).reshape(1, -1, c)
    out = np.concatenate([extra.astype(np.float32), resized], axis=1)
    return out[0] if squeeze else out


def _strip_module_prefix(sd: Dict) -> Dict:
    """Remove DDP 'module.' prefixes (reference wraps in DDP,
    run_training.py:84)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def import_swin_encoder(sd: Dict, prefix: str = "encoder.",
                        num_layers: int = 4, window_sizes=None) -> Dict:
    """SwinTransformerNNFormer state_dict -> SwinEncoder3D params.

    window_sizes (optional, per stage): when given, relative-position bias
    tables whose row count does not match the target (2w-1)^3 grid are
    trilinearly resized (resize_rel_pos_bias_table) — the functional
    equivalent of the reference's dead pretrained-loader surgery
    (utils/checkpoint.py:51-66), so differently-windowed reference
    checkpoints import instead of shape-erroring.
    """
    sd = _strip_module_prefix(sd)
    g = lambda name: prefix + name  # noqa: E731
    params: Dict = {}

    if g("patch_embed.proj.weight") in sd:
        pe = {"Conv_0": conv(sd, g("patch_embed.proj"))}
        if g("patch_embed.norm.weight") in sd:
            pe["LayerNorm_0"] = layer_norm(sd, g("patch_embed.norm"))
        params["patch_embed"] = pe

    if g("rel_crop_pos_emb.weight") in sd:
        params["rel_crop_pos_emb"] = dense(sd, g("rel_crop_pos_emb"))
    if g("global_token") in sd:
        params["global_token"] = _np(sd[g("global_token")])
    # LCV learned vectors (ParameterList entries)
    lcv_vecs = []
    k = 0
    while g(f"lcv.vectors.{k}") in sd:
        lcv_vecs.append(_np(sd[g(f"lcv.vectors.{k}")]))
        k += 1
    if lcv_vecs:
        lcv: Dict = {"vectors": np.stack(lcv_vecs)}
        if g("lcv.fc.weight") in sd:
            lcv["fc"] = dense(sd, g("lcv.fc"))
        params["lcv"] = lcv

    i = 0
    while g(f"layers.{i}.blocks.0.norm1.weight") in sd:
        lp: Dict = {}
        j = 0
        while g(f"layers.{i}.blocks.{j}.norm1.weight") in sd:
            base = g(f"layers.{i}.blocks.{j}")
            table = _np(sd[f"{base}.attn.relative_position_bias_table"])
            if window_sizes is not None:
                dst_w = window_sizes[min(i, len(window_sizes) - 1)]
                dst = (dst_w,) * 3 if np.isscalar(dst_w) else tuple(dst_w)
                if table.shape[0] != int(np.prod([2 * w - 1 for w in dst])):
                    # cubic source window inferred from the row count
                    src_w = int(round((table.shape[0] ** (1 / 3) + 1) / 2))
                    table = resize_rel_pos_bias_table(table, (src_w,) * 3, dst)
            attn = {
                "qkv_kernel": _np(sd[f"{base}.attn.qkv.weight"]).T,
                "proj_kernel": _np(sd[f"{base}.attn.proj.weight"]).T,
                "proj_bias": _np(sd[f"{base}.attn.proj.bias"]),
                "relative_position_bias_table": table,
            }
            if f"{base}.attn.qkv.bias" in sd:
                attn["qkv_bias"] = _np(sd[f"{base}.attn.qkv.bias"])
            if f"{base}.attn.rel_pos_bias_affine_emb" in sd:
                attn["rel_pos_bias_affine_emb"] = _np(
                    sd[f"{base}.attn.rel_pos_bias_affine_emb"])
                attn["rel_pos_bias_affine_lin"] = dense(
                    sd, f"{base}.attn.rel_pos_bias_affine_lin")
            if f"{base}.attn.gt_proj.weight" in sd:
                attn["gt_proj"] = dense(sd, f"{base}.attn.gt_proj")
            lp[f"blocks_{j}"] = {
                "LayerNorm_0": layer_norm(sd, f"{base}.norm1"),
                "LayerNorm_1": layer_norm(sd, f"{base}.norm2"),
                "attn": attn,
                "Mlp_0": {
                    "Dense_0": dense(sd, f"{base}.mlp.fc1"),
                    "Dense_1": dense(sd, f"{base}.mlp.fc2"),
                },
            }
            j += 1
        lp["downsample"] = {
            "LayerNorm_0": layer_norm(sd, g(f"layers.{i}.downsample.norm")),
            "reduction": {"Conv_0": conv(sd, g(f"layers.{i}.downsample.reduction"))},
        }
        if g(f"layers.{i}.gt_upsample.weight") in sd:
            lp["gt_upsample"] = dense(sd, g(f"layers.{i}.gt_upsample"))
        params[f"layers_{i}"] = lp
        i += 1

    for k in range(num_layers):
        if g(f"norm{k}.weight") in sd:
            params[f"norm{k}"] = layer_norm(sd, g(f"norm{k}"))
    return params


def _res_block(sd: Dict, prefix: str) -> Dict:
    """MONAI UnetResBlock (inside UnetrBasicBlock '.layer' or UnetrUpBlock
    '.conv_block') -> our UnetResBlock params."""
    out = {
        "conv1": {"Conv_0": conv(sd, f"{prefix}.conv1.conv")},
        "norm1": instance_norm(sd, f"{prefix}.norm1"),
        "conv2": {"Conv_0": conv(sd, f"{prefix}.conv2.conv")},
        "norm2": instance_norm(sd, f"{prefix}.norm2"),
    }
    if f"{prefix}.conv3.conv.weight" in sd:
        out["conv3"] = {"Conv_0": conv(sd, f"{prefix}.conv3.conv")}
        out["norm3"] = instance_norm(sd, f"{prefix}.norm3")
    return out


def import_unetr_decoder(sd: Dict, num_layers: int = 4) -> Dict:
    """MONAI-block decoder of reference SwinUNETRCustom -> SwinUNETRDecoder
    params (reference: models/segmentors/swin_unetr.py:70-130)."""
    sd = _strip_module_prefix(sd)
    params: Dict = {}
    # unet_encoders: [encoder0(raw vol), encoder1(stem), enc per stage...]
    for k in range(num_layers + 2):
        params[f"encoder{k}"] = _res_block(sd, f"unet_encoders.{k}.layer")
    # unet_decoders: [decoder0(patch upsample), dec per stage...]
    for k in range(num_layers + 1):
        params[f"decoder{k}"] = {
            "transp_conv": {"ConvTranspose_0": conv_transpose(
                sd, f"unet_decoders.{k}.transp_conv.conv")},
            "conv_block": _res_block(sd, f"unet_decoders.{k}.conv_block"),
        }
    params["out"] = {"conv": {"Conv_0": conv(sd, "out.conv.conv")}}
    return params


def import_swin_unetr_checkpoint(state_dict: Dict, num_layers: int = 4) -> Dict:
    """Full flagship model: {'encoder': ..., 'decoder': ...} parameter tree."""
    sd = _strip_module_prefix(state_dict)
    return {
        "encoder": import_swin_encoder(sd, "encoder.", num_layers),
        "decoder": import_unetr_decoder(sd, num_layers),
    }


def _official_block(sd: Dict, base: str) -> Dict:
    """One official SwinTransformerBlock (swin_unetr_official.py:617-663
    load_from key list) -> OfficialSwinBlock params."""
    attn = {
        "relative_position_bias_table": _np(
            sd[f"{base}.attn.relative_position_bias_table"]),
        "qkv": dense(sd, f"{base}.attn.qkv"),
        "proj": dense(sd, f"{base}.attn.proj"),
    }
    return {
        "norm1": layer_norm(sd, f"{base}.norm1"),
        "norm2": layer_norm(sd, f"{base}.norm2"),
        "attn": attn,
        # SSL checkpoints name the MLP weights fc1/fc2; a trained model's
        # own state_dict has the MLPBlock attribute names linear1/linear2
        # (the reference load_from translates fc->linear,
        # swin_unetr_official.py:646-650)
        "mlp": {
            "Dense_0": dense(sd, f"{base}.mlp.fc1"
                             if f"{base}.mlp.fc1.weight" in sd
                             else f"{base}.mlp.linear1"),
            "Dense_1": dense(sd, f"{base}.mlp.fc2"
                             if f"{base}.mlp.fc2.weight" in sd
                             else f"{base}.mlp.linear2"),
        },
    }


def import_swin_unetr_official(weights: Dict, depths=(2, 2, 2, 2)) -> Dict:
    """MONAI SwinUNETR ``load_from`` surgery -> SwinViTOfficial param tree.

    Accepts the SSL-pretrained checkpoint format the reference's load_from
    consumes: ``weights['state_dict']['module.<...>']``
    (reference: models/segmentors/swin_unetr_official.py:232-280). Covers
    exactly what load_from covers: patch_embed, every block, every
    downsample. Returns the {'swinViT': ...} subtree — merge over a model
    init to keep the decoder randomly initialized, like the reference.
    """
    sd = weights.get("state_dict", weights)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    vit: Dict = {"patch_embed": {"Conv_0": conv(sd, "patch_embed.proj")}}
    for k, depth in enumerate(depths):
        for n in range(depth):
            base = f"layers{k + 1}.0.blocks.{n}"
            vit[f"layers{k + 1}_blocks{n}"] = _official_block(sd, base)
        dbase = f"layers{k + 1}.0.downsample"
        vit[f"layers{k + 1}_downsample"] = {
            "norm": layer_norm(sd, f"{dbase}.norm"),
            "reduction": {"kernel": _np(sd[f"{dbase}.reduction.weight"]).T},
        }
    return {"swinViT": vit}


def import_swin_unetr_official_full(state_dict: Dict,
                                    depths=(2, 2, 2, 2)) -> Dict:
    """A COMPLETE official-SwinUNETR state_dict (encoder + MONAI decoder
    blocks) -> SwinUNETROfficial param tree (for importing fully-trained
    models rather than SSL encoders)."""
    sd = _strip_module_prefix(state_dict)
    vit_sd = {k[len("swinViT."):]: v for k, v in sd.items()
              if k.startswith("swinViT.")}
    params = import_swin_unetr_official({"state_dict": vit_sd}, depths)
    for name in ["encoder1", "encoder2", "encoder3", "encoder4", "encoder10"]:
        params[name] = _res_block(sd, f"{name}.layer")
    for name in ["decoder1", "decoder2", "decoder3", "decoder4", "decoder5"]:
        params[name] = {
            "transp_conv": {"ConvTranspose_0": conv_transpose(
                sd, f"{name}.transp_conv.conv")},
            "conv_block": _res_block(sd, f"{name}.conv_block"),
        }
    params["out"] = {"conv": {"Conv_0": conv(sd, "out.conv.conv")}}
    return params


def import_video_swin(state_dict: Dict, depths=(2, 2, 2, 2),
                      grid=None) -> Dict:
    """Video-Swin ``SwinTransformer3D`` state_dict (reference:
    models/backbones/swin_3d.py:470-708) -> VideoSwin3D param tree.

    Key map: ``patch_embed.proj`` -> patch_embed conv, ``patch_embed.norm``
    -> patch_norm, ``layers.{k}.blocks.{i}.*`` -> ``layers_{k}_blocks_{i}``
    (same block layout as the MONAI-official swin, so ``_official_block``
    is shared), ``layers.{k}.downsample.{norm,reduction}`` ->
    ``layers_{k}_downsample``. The reference's flat ``absolute_pos_embed``
    (1, num_patches, C) is reshaped onto the (d, h, w) patch ``grid``
    (the reference's own ape add is shape-broken — swin_3d.py:700 adds the
    flat table to a channels-first 5-D map — so grid-major order is the
    only sane interpretation)."""
    sd = _strip_module_prefix(state_dict)
    params: Dict = {"patch_embed": conv(sd, "patch_embed.proj")}
    if "patch_embed.norm.weight" in sd:
        params["patch_norm"] = layer_norm(sd, "patch_embed.norm")
    if "absolute_pos_embed" in sd:
        ape = _np(sd["absolute_pos_embed"])  # (1, N, C)
        d, h, w = grid
        params["absolute_pos_embed"] = ape.reshape(1, d, h, w, ape.shape[-1])
    for k, depth in enumerate(depths):
        for i in range(depth):
            params[f"layers_{k}_blocks_{i}"] = _official_block(
                sd, f"layers.{k}.blocks.{i}")
        dbase = f"layers.{k}.downsample"
        params[f"layers_{k}_downsample"] = {
            "norm": layer_norm(sd, f"{dbase}.norm"),
            "reduction": {"kernel": _np(sd[f"{dbase}.reduction.weight"]).T},
        }
    return params


def load_reference_pth(path: str) -> Dict:
    """torch.load a reference checkpoint file and return the model state_dict."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        return payload["model"]
    return payload
