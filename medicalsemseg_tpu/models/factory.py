"""Model factory: --model name -> encoder+decoder pair.

Mirrors reference models/model_builder.py:14-242 (7 wired combos). Unknown
names raise instead of silently returning None (a reference bug we fix,
model_builder.py falls through for the default 'UNETR_Official').
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from flax import linen as nn

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.models.decoders import (
    SegFormerHead,
    SegFormerHeadOfficial,
    SwinUNETRCustom,
)
from medicalsemseg_tpu.models.embeddings import (
    scale_intensity_range,
    scale_intensity_range_percentiles,
)
from medicalsemseg_tpu.models.swin import SwinEncoder3D

MODEL_NAMES = (
    "nnFormerUNETR", "SwInception", "SwinDepth", "SwinSegFormer",
    "SegFormer3D", "GCViTUNETR", "FocalNetUNETR", "UNETR_Official",
    "nnFormer", "SwinUNETR_Official", "LRGFormerUNETR", "VideoSwinUNETR",
    "Swin2D",
)


def _lcv_transform(cfg: Config):
    """Intensity transform applied to the LCV interval table
    (reference: models/model_builder.py:16-32)."""
    if cfg.t_fixed_ct_intensity:
        return functools.partial(scale_intensity_range, a_min=cfg.t_ct_min,
                                 a_max=cfg.t_ct_max, b_min=0.0, b_max=1.0,
                                 clip=True)
    return functools.partial(scale_intensity_range_percentiles, lower=5,
                             upper=95, b_min=0.0, b_max=1.0, clip=True)


def _compute_dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
            "float32": jnp.float32}[cfg.compute_dtype]


def _use_pallas(cfg: Config) -> bool:
    """Fused Pallas attention only on real TPU backends (CPU pallas would
    need interpreter mode)."""
    import jax

    return bool(cfg.use_pallas_attention) and jax.default_backend() not in (
        "cpu",)


def _official_swin_fused_enabled() -> bool:
    """The round-5 zoo A/B (tools/zoo_train_ab.jsonl) measured the fused
    kernels at SwinUNETR_Official's constructor-window 7^3 shapes being
    REJECTED by the TPU Mosaic backend compile (HTTP 500
    tpu_compile_helper exit 1) in both directions, while every 6^3-window
    model compiles and runs. Until a 7^3 kernel build is demonstrated on
    hardware, the official model defaults to the XLA attention path
    (measured: 557.9 ms 16-window fwd, 185.7 ms bs1 train — the model
    stays fully functional). MEDSEG_OFFICIAL_FUSED=1 forces the fused
    path back on for diagnosis."""
    import os

    return os.environ.get("MEDSEG_OFFICIAL_FUSED", "0") == "1"


def _swin_encoder(cfg: Config, mlp_type: str) -> SwinEncoder3D:
    return SwinEncoder3D(
        patch_size=cfg.patch_size3(),
        in_chans=cfg.in_chans,
        embed_dim=cfg.hidden_dim,
        depths=tuple(cfg.depths),
        num_heads=tuple(cfg.num_heads),
        window_sizes=cfg.window_sizes(),
        mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias,
        drop_path_rate=cfg.drop_path_rate,
        mlp_type=mlp_type,
        use_learned_cls_vectors=cfg.learned_cls_vectors,
        lcv_transform=_lcv_transform(cfg) if cfg.learned_cls_vectors else None,
        lcv_vector_dim=cfg.lcv_vector_dim,
        lcv_sincos_emb=cfg.lcv_sincos_emb,
        lcv_final_layer=cfg.lcv_final_layer,
        lcv_concat_vector=cfg.lcv_concat_vector,
        lcv_only=cfg.lcv_only,
        lcv_linear_comb=cfg.lcv_linear_comb,
        lcv_patch_voxel_mean=cfg.lcv_patch_voxel_mean,
        rel_crop_pos_emb=cfg.rel_crop_pos_emb,
        rel_pos_bias_affine=cfg.rel_pos_bias_affine,
        use_abs_pos_emb=cfg.abs_pos_emb,
        global_token=cfg.global_token,
        use_pallas=_use_pallas(cfg),
        pallas_train=cfg.pallas_train,
        remat=cfg.remat,
        dtype=_compute_dtype(cfg),
    )


def build_model(cfg: Config) -> nn.Module:
    """--model name -> flax module with the tuple-input forward contract.

    Input: (volume (B,D,H,W,Cin) channels-last, rel_crop_loc (B,3),
    affine_xyz (B,3)); output: (B, D, H, W, n_classes) fp32 logits.
    """
    dtype = _compute_dtype(cfg)
    name = cfg.model

    if name in ("nnFormerUNETR", "SwInception", "SwinDepth"):
        mlp_type = {"nnFormerUNETR": "dense", "SwInception": "inception",
                    "SwinDepth": "dwconv"}[name]
        encoder = _swin_encoder(cfg, mlp_type)
        return SwinUNETRCustom(
            encoder=encoder, out_channels=cfg.output_dim,
            hidden_size=cfg.hidden_dim, patch_size=cfg.patch_size3(),
            remat=cfg.remat, dtype=dtype)

    if name == "SwinSegFormer":
        # the reference builds this encoder without LCV/affine options
        # (model_builder.py:174-184)
        encoder = SwinEncoder3D(
            patch_size=cfg.patch_size3(), in_chans=cfg.in_chans,
            embed_dim=cfg.hidden_dim, depths=tuple(cfg.depths),
            num_heads=tuple(cfg.num_heads), window_sizes=cfg.window_sizes(),
            qkv_bias=cfg.qkv_bias, use_abs_pos_emb=cfg.abs_pos_emb,
            drop_path_rate=cfg.drop_path_rate,
            use_pallas=_use_pallas(cfg), dtype=dtype)
        return SegFormerHead(encoder=encoder, num_classes=cfg.output_dim,
                             dtype=dtype)

    if name == "SegFormer3D":
        from medicalsemseg_tpu.models.segformer import MixVisionTransformer3D
        encoder = MixVisionTransformer3D(
            in_chans=cfg.in_chans, embed_dim=cfg.hidden_dim,
            depths=tuple(cfg.depths), num_heads=tuple(cfg.num_heads),
            sr_ratios=(8, 4, 2, 1), qkv_bias=cfg.qkv_bias,
            drop_path_rate=cfg.drop_path_rate,
            use_pallas=_use_pallas(cfg), dtype=dtype)
        return SegFormerHeadOfficial(encoder=encoder,
                                     num_classes=cfg.output_dim, dtype=dtype)

    if name == "GCViTUNETR":
        from medicalsemseg_tpu.models.gcvit import GCViT3D
        encoder = GCViT3D(
            in_chans=cfg.in_chans, dim=cfg.hidden_dim, mlp_ratio=3.0,
            depths=tuple(cfg.depths), num_heads=tuple(cfg.num_heads),
            window_sizes=cfg.window_sizes(), qkv_bias=cfg.qkv_bias,
            drop_path_rate=cfg.drop_path_rate, use_pallas=_use_pallas(cfg),
            pallas_train=cfg.pallas_train,
            ref_quirk_index=cfg.ref_quirk_rel_pos, dtype=dtype)
        return SwinUNETRCustom(
            encoder=encoder, out_channels=cfg.output_dim,
            hidden_size=cfg.hidden_dim, patch_size=cfg.patch_size3(),
            remat=cfg.remat, dtype=dtype)

    if name == "FocalNetUNETR":
        from medicalsemseg_tpu.models.focalnet import FocalNet3D
        encoder = FocalNet3D(
            patch_size=cfg.patch_size3(), in_chans=cfg.in_chans,
            embed_dim=cfg.hidden_dim, depths=tuple(cfg.depths),
            focal_windows=cfg.window_sizes(),
            drop_path_rate=cfg.drop_path_rate,
            use_pallas=_use_pallas(cfg), dtype=dtype)
        return SwinUNETRCustom(
            encoder=encoder, out_channels=cfg.output_dim,
            hidden_size=cfg.hidden_dim, patch_size=cfg.patch_size3(),
            remat=cfg.remat, dtype=dtype)

    if name == "nnFormer":
        # the official symmetric nnFormer (vendored-dead in the reference,
        # nnformer_official.py:918-978, SURVEY.md §2.2) as a working entry;
        # --deep_supervision enables the per-scale heads the reference
        # official model trains with (nnformer_official.py:952-978)
        from medicalsemseg_tpu.models.nnformer import NNFormer
        return NNFormer(out_channels=cfg.output_dim, in_chans=cfg.in_chans,
                        embed_dim=cfg.hidden_dim, depths=tuple(cfg.depths),
                        num_heads=tuple(cfg.num_heads),
                        window_sizes=cfg.window_sizes(),
                        patch_size=cfg.patch_size3(), qkv_bias=cfg.qkv_bias,
                        drop_path_rate=cfg.drop_path_rate,
                        deep_supervision=cfg.deep_supervision,
                        ref_quirk_index=cfg.ref_quirk_rel_pos,
                        use_pallas=_use_pallas(cfg),
                        pallas_train=cfg.pallas_train, dtype=dtype)

    if name == "UNETR_Official":
        # the reference's DEFAULT model name, which its factory silently
        # fails to build (model_builder.py falls through); a working ViT-B
        # UNETR here (vendored-dead unetr_official.py, SURVEY.md §2.2)
        from medicalsemseg_tpu.models.unetr import UNETR
        return UNETR(out_channels=cfg.output_dim, in_chans=cfg.in_chans,
                     feature_size=max(cfg.hidden_dim // 3, 8),
                     hidden_size=768, depth=12, num_heads=12,
                     patch_size=(16, 16, 16),
                     drop_path_rate=cfg.drop_path_rate,
                     use_pallas=_use_pallas(cfg), dtype=dtype)

    if name == "SwinUNETR_Official":
        # the vendored MONAI SwinUNETR (981 LoC dead in the reference,
        # swin_unetr_official.py:32-295, SURVEY.md §2.2 row 33) as a working
        # entry; fixed 7^3 windows, v1 PatchMerging quirk, load_from
        # checkpoint surgery via utils/torch_import.import_swin_unetr_official
        from medicalsemseg_tpu.models.swin_official import SwinUNETROfficial
        return SwinUNETROfficial(
            out_channels=cfg.output_dim, in_chans=cfg.in_chans,
            feature_size=cfg.hidden_dim, depths=tuple(cfg.depths),
            num_heads=tuple(cfg.num_heads),
            drop_path_rate=cfg.drop_path_rate,
            use_pallas=_use_pallas(cfg) and _official_swin_fused_enabled(),
            dtype=dtype)

    if name == "LRGFormerUNETR":
        # local/region/global joint-attention encoder (broken-dead upstream,
        # lrgformer.py:184-304, SURVEY.md §2.2 row 36) repaired into a working
        # entry; local tokens at 2x the usual patch stride to keep the
        # reference's ~14k-token budget (see models/lrgformer.py docstring)
        from medicalsemseg_tpu.models.lrgformer import LRGFormer3D
        lrg_patch = tuple(2 * p for p in cfg.patch_size3())
        encoder = LRGFormer3D(
            patch_size=lrg_patch, in_chans=cfg.in_chans,
            embed_dim=cfg.hidden_dim, depths=tuple(cfg.depths),
            num_heads=tuple(cfg.num_heads), mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias, drop_path_rate=cfg.drop_path_rate,
            dtype=dtype)
        return SwinUNETRCustom(
            encoder=encoder, out_channels=cfg.output_dim,
            hidden_size=cfg.hidden_dim, patch_size=lrg_patch,
            remat=cfg.remat, dtype=dtype)

    if name == "VideoSwinUNETR":
        # Video-Swin 3D backbone (vendored-dead upstream, swin_3d.py:470-708,
        # SURVEY.md §2.2 row 34) wired through the standard UNETR decoder;
        # anisotropic windows available on the module (models/video_swin.py)
        from medicalsemseg_tpu.models.video_swin import VideoSwin3D
        w = cfg.window_sizes()[0]
        encoder = VideoSwin3D(
            in_chans=cfg.in_chans, embed_dim=cfg.hidden_dim,
            depths=tuple(cfg.depths), num_heads=tuple(cfg.num_heads),
            window=(w, w, w), patch_size=cfg.patch_size3(),
            mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            drop_path_rate=cfg.drop_path_rate, ape=cfg.abs_pos_emb,
            use_pallas=_use_pallas(cfg), dtype=dtype)
        return SwinUNETRCustom(
            encoder=encoder, out_channels=cfg.output_dim,
            hidden_size=cfg.hidden_dim, patch_size=cfg.patch_size3(),
            remat=cfg.remat, dtype=dtype)

    if name == "Swin2D":
        # the --input_dim 2 path, functional here (the reference parses the
        # flag, utils/arguments.py:42, but never consumes it, and its
        # vendored swin_2d.py backbone is never built): vanilla 2D Swin
        # pyramid + linear-fuse segmentation head over (B, H, W, Cin) images
        if cfg.input_dim != 2:
            raise ValueError("--model Swin2D requires --input_dim 2")
        from medicalsemseg_tpu.models.swin2d import Swin2DSeg
        return Swin2DSeg(
            num_classes=cfg.output_dim, in_chans=cfg.in_chans,
            embed_dim=cfg.hidden_dim, depths=tuple(cfg.depths),
            num_heads=tuple(cfg.num_heads),
            window_size=cfg.window_sizes()[0],
            patch_size=(cfg.patch_size3()[0]
                        if cfg.patch_size3()[0] > 1 else 4),
            mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            drop_path_rate=cfg.drop_path_rate, dtype=dtype)

    raise ValueError(
        f"unknown model {name!r}; available: {', '.join(MODEL_NAMES)}")
