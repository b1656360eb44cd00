"""Measure the ACTUAL reference model's CPU forward time (baseline anchor).

Builds the reference's flagship nnFormerUNETR exactly as its factory does
(/root/reference/models/model_builder.py:15-66: SwinTransformerNNFormer
encoder + SwinUNETRCustom decoder) and times one 96^3 window forward in
torch fp32 on this host's CPU. The result anchors BASELINE.json's
"cpu_measured" so bench.py's vs_baseline compares against the reference's own
model rather than this framework's XLA:CPU build.

monai and timm are not installed in this image; the three MONAI blocks the
reference decoder uses (UnetrBasicBlock/UnetrUpBlock res_block=True,
UnetOutBlock — monai.networks.blocks) are re-implemented here faithfully
(same conv/norm/act counts, kernel sizes and strides), and timm's three used
symbols are stubbed as in tests/test_reference_parity.py. Timing-faithful,
not bit-identical to MONAI.

Usage: python tools/measure_reference_cpu.py [--iters 1] [--size 96]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_3tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(min=a * std, max=b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    layers.to_3tuple = to_3tuple
    layers.to_2tuple = lambda x: tuple(x) if isinstance(x, (tuple, list)) else (x, x)
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    for name, mod in [("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers)]:
        sys.modules[name] = mod


class UnetResBlock(nn.Module):
    """MONAI UnetResBlock: conv3-IN-lrelu, conv3-IN, 1x1 shortcut, lrelu."""

    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1):
        super().__init__()
        p = kernel_size // 2
        self.conv1 = nn.Conv3d(in_ch, out_ch, kernel_size, stride, p, bias=False)
        self.norm1 = nn.InstanceNorm3d(out_ch, affine=True)
        self.conv2 = nn.Conv3d(out_ch, out_ch, kernel_size, 1, p, bias=False)
        self.norm2 = nn.InstanceNorm3d(out_ch, affine=True)
        self.act = nn.LeakyReLU(0.01, inplace=True)
        self.downsample = in_ch != out_ch or stride != 1
        if self.downsample:
            self.conv3 = nn.Conv3d(in_ch, out_ch, 1, stride, bias=False)
            self.norm3 = nn.InstanceNorm3d(out_ch, affine=True)

    def forward(self, x):
        res = x
        h = self.act(self.norm1(self.conv1(x)))
        h = self.norm2(self.conv2(h))
        if self.downsample:
            res = self.norm3(self.conv3(res))
        return self.act(h + res)


class UnetrBasicBlock(nn.Module):
    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 stride, norm_name, res_block=True):
        super().__init__()
        self.layer = UnetResBlock(in_channels, out_channels, kernel_size, stride)

    def forward(self, x):
        return self.layer(x)


class UnetrUpBlock(nn.Module):
    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 upsample_kernel_size, norm_name, res_block=True):
        super().__init__()
        up = upsample_kernel_size
        if isinstance(up, int):
            up = (up,) * 3
        self.transp_conv = nn.ConvTranspose3d(in_channels, out_channels, up,
                                              stride=up, bias=False)
        self.conv_block = UnetResBlock(out_channels * 2, out_channels,
                                       kernel_size, 1)

    def forward(self, x, skip):
        x = self.transp_conv(x)
        return self.conv_block(torch.cat([x, skip], dim=1))


class UnetOutBlock(nn.Module):
    def __init__(self, spatial_dims, in_channels, out_channels):
        super().__init__()
        self.conv = nn.Conv3d(in_channels, out_channels, 1, bias=True)

    def forward(self, x):
        return self.conv(x)


def _install_monai_stub():
    if "monai" in sys.modules:
        return
    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    unetr_block = types.ModuleType("monai.networks.blocks.unetr_block")
    dynunet_block = types.ModuleType("monai.networks.blocks.dynunet_block")
    layers_mod = types.ModuleType("monai.networks.layers")
    utils_mod = types.ModuleType("monai.utils")

    class _ConvFactory:
        """monai.networks.layers.Conv factory: Conv[Conv.CONV, 3] -> Conv3d."""

        CONV = "conv"
        CONVTRANS = "convtrans"

        def __getitem__(self, key):
            name, dims = key
            table = {("conv", 1): nn.Conv1d, ("conv", 2): nn.Conv2d,
                     ("conv", 3): nn.Conv3d,
                     ("convtrans", 1): nn.ConvTranspose1d,
                     ("convtrans", 2): nn.ConvTranspose2d,
                     ("convtrans", 3): nn.ConvTranspose3d}
            return table[(str(name), int(dims))]

    layers_mod.Conv = _ConvFactory()

    unetr_block.UnetrBasicBlock = UnetrBasicBlock
    unetr_block.UnetrUpBlock = UnetrUpBlock
    dynunet_block.UnetOutBlock = UnetOutBlock

    def ensure_tuple_rep(v, n):
        return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n

    utils_mod.ensure_tuple_rep = ensure_tuple_rep
    blocks.unetr_block = unetr_block
    blocks.dynunet_block = dynunet_block
    networks.blocks = blocks
    monai.networks = networks
    monai.utils = utils_mod
    networks.layers = layers_mod
    for name, mod in [("monai", monai), ("monai.networks", networks),
                      ("monai.networks.blocks", blocks),
                      ("monai.networks.blocks.unetr_block", unetr_block),
                      ("monai.networks.blocks.dynunet_block", dynunet_block),
                      ("monai.networks.layers", layers_mod),
                      ("monai.utils", utils_mod)]:
        sys.modules[name] = mod


def build_reference_flagship(size: int):
    _install_timm_stub()
    _install_monai_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.backbones.swin_nnformer import SwinTransformerNNFormer
    from models.segmentors.swin_unetr import SwinUNETRCustom

    # flagship args (reference model_builder.py:33-66 with the working
    # settings from BASELINE.md: 96^3, patch 2, dim 48, depths 2222)
    encoder = SwinTransformerNNFormer(
        pretrain_img_size=(size,) * 3, patch_size=(2, 2, 2), in_chans=1,
        embed_dim=48,
        depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
        window_size=(6, 6, 6, 6),
        qkv_bias=False, use_learned_cls_vectors=False, lcv_transform=None,
        rel_pos_bias_affine=False, rel_crop_pos_emb=False,
        use_abs_pos_emb=False, global_token=False)
    model = SwinUNETRCustom(encoder, in_channels=1, out_channels=14,
                            img_size=size, hidden_size=48, patch_size=2)
    return model.eval()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--size", type=int, default=96)
    args = ap.parse_args()

    model = build_reference_flagship(args.size)
    n_params = sum(p.numel() for p in model.parameters())
    x = torch.randn(1, 1, args.size, args.size, args.size)

    with torch.no_grad():
        t0 = time.time()
        out = model((x, None, None))
        warm = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            out = model((x, None, None))
            times.append(time.time() - t0)

    print(json.dumps({
        "model": "reference nnFormerUNETR (torch fp32, CPU)",
        "params_m": round(n_params / 1e6, 2),
        "window": [args.size] * 3,
        "out_shape": list(out.shape),
        "warmup_s": round(warm, 2),
        "seconds_per_window_fp32": round(float(np.median(times)), 2),
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
