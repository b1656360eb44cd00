"""Segmentation decoders / heads.

  * UNETR-style convolutional decoder (the main head for all *UNETR combos)
    re-deriving MONAI's UnetrBasicBlock / UnetrUpBlock / UnetOutBlock used by
    reference: models/segmentors/swin_unetr.py:20-147.
  * SegFormer all-MLP heads (custom progressive-fusion and official variants)
    reference: models/segmentors/segformer_head.py:38-121,
               models/segmentors/segformer_head_official.py:38-91.

Channels-last; convolution + instance-norm + leaky-relu chains are left to XLA
fusion (conv epilogues fuse into the convolution on TPU).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medicalsemseg_tpu.models.layers import (
    BatchNorm,
    Conv3d,
    ConvTranspose3d,
    InstanceNorm,
    remat_module,
)
from medicalsemseg_tpu.ops.resize import resize_trilinear

Dtype = Any


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


def decoder_fuse_enabled() -> bool:
    """Inference-only fused decoder path (winograd conv with the preceding
    InstanceNorm+LeakyReLU folded into its input epilogue). A/B-gated via
    MEDSEG_FUSED_DECODER until the TPU benchmarks confirm the win."""
    import os

    import jax

    from medicalsemseg_tpu.ops.pallas import winograd3d as _w3

    return (os.environ.get("MEDSEG_FUSED_DECODER", "0") != "0"
            and (jax.default_backend() != "cpu" or _w3._FORCE_INTERPRET))


class UnetResBlock(nn.Module):
    """conv3-IN-lrelu -> conv3-IN, 1x1-IN shortcut when shape changes, lrelu.

    Equivalent of MONAI UnetResBlock as instantiated by UnetrBasicBlock
    (res_block=True) in reference: models/segmentors/swin_unetr.py:73-128.

    With ``fuse`` (inference), conv2 runs as the F(2,3) winograd Pallas
    kernel with norm1+lrelu folded into its input epilogue
    (ops/pallas/winograd3d.py): the normalized volume never round-trips HBM
    and the PE-bound 3^3 conv does 3.375x less MXU work.
    """

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, fuse: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        residual = x
        conv1 = Conv3d(self.out_channels, self.kernel_size,
                       strides=self.strides, use_bias=False, dtype=self.dtype,
                       name="conv1")
        norm1 = InstanceNorm(dtype=self.dtype, name="norm1")
        conv2 = Conv3d(self.out_channels, self.kernel_size, use_bias=False,
                       dtype=self.dtype, name="conv2")
        y = conv1(x)

        if fuse and tuple(self.kernel_size) == (3, 3, 3):
            from medicalsemseg_tpu.ops.pallas.winograd3d import (
                winograd_conv3d_f23, winograd_f23_applicable)
            fuse = winograd_f23_applicable(tuple(y.shape[1:4]), y.shape[-1])
        else:
            fuse = False

        if fuse:
            g, b_ = norm1(y, params_only=True)
            k2, _ = conv2(y, params_only=True)
            yf = y.astype(jnp.float32)
            axes = tuple(range(1, y.ndim - 1))
            mu = yf.mean(axes)                      # (B, C)
            var = yf.var(axes)
            sc = g[None] * jax.lax.rsqrt(var + 1e-5)
            sh = b_[None] - mu * sc
            y = winograd_conv3d_f23(y, k2, epilogue=(sc, sh), lrelu=True)
        else:
            y = _lrelu(norm1(y))
            y = conv2(y)
        y = InstanceNorm(dtype=self.dtype, name="norm2")(y)
        if in_ch != self.out_channels or any(s != 1 for s in self.strides):
            residual = Conv3d(self.out_channels, (1, 1, 1), strides=self.strides,
                              use_bias=False, dtype=self.dtype, name="conv3")(x)
            residual = InstanceNorm(dtype=self.dtype, name="norm3")(residual)
        return _lrelu(y + residual)


class UnetrUpBlock(nn.Module):
    """Transposed-conv x2 upsample, concat skip, residual conv block.

    Equivalent of MONAI UnetrUpBlock (reference: swin_unetr.py:93-128).
    """

    out_channels: int
    upsample: Tuple[int, int, int] = (2, 2, 2)
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 deterministic: bool = False,
                 fuse: bool = False) -> jnp.ndarray:
        x = ConvTranspose3d(self.out_channels, kernel_size=self.upsample,
                            strides=self.upsample, use_bias=False,
                            dtype=self.dtype, name="transp_conv")(
                                x, deterministic)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return UnetResBlock(self.out_channels, self.kernel_size,
                            dtype=self.dtype, name="conv_block")(x, fuse)


class UnetOutBlock(nn.Module):
    """1x1x1 conv to class logits (MONAI UnetOutBlock; reference swin_unetr.py:130).

    ``class_major=True`` emits (n_classes, B, D, H, W) logits via a
    transposed dot_general instead of channels-last + transpose. Motivation
    (round 5, sliding-window inference): a channels-last (sw, 96^3, 14)
    logits tensor lane-pads its minor dim 14 -> 128 in HBM (9.1x physical
    bytes), and the Gaussian blender wants class-major anyway
    (sliding_window.py run_batch_b) — producing class-major at the dot
    avoids both the padded materialization and the transpose copy. Same
    params, same contraction (K=48, f32 MXU accumulation), same bias-add
    dtype; parity tested in tests/test_sliding_window.py."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, class_major: bool = False) -> jnp.ndarray:
        conv = Conv3d(self.out_channels, (1, 1, 1), use_bias=True,
                      dtype=self.dtype, name="conv")
        if not class_major:
            return conv(x).astype(jnp.float32)  # logits fp32 for the loss
        kernel, bias = conv(x, params_only=True)
        k = kernel[0, 0, 0].astype(self.dtype)  # (C, n_classes)
        # (n_classes,) x (B, D, H, W): class axis leads, spatial stays minor
        y = jax.lax.dot_general(
            k, x.astype(self.dtype),
            (((0,), (x.ndim - 1,)), ((), ())))
        y = y + bias.astype(self.dtype)[(...,) + (None,) * (x.ndim - 1)]
        return y.astype(jnp.float32)


class SwinUNETRDecoder(nn.Module):
    """The UNETR-style decoder over a 5-scale pyramid.

    forward contract (reference: models/segmentors/swin_unetr.py:138-147):
      z = [stem@R, s1@R/2, s2@R/4, s3@R/8, s4@R/16] (channels-last here),
      plus the raw input volume for the full-resolution skip. The first
      up-block upsamples by ``patch_size``.
    """

    out_channels: int
    hidden_size: int = 48
    patch_size: Tuple[int, int, int] = (2, 2, 2)
    num_layers: int = 4
    remat: Any = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vol: jnp.ndarray, z: List[jnp.ndarray],
                 deterministic: bool = False,
                 class_major_logits: bool = False) -> jnp.ndarray:
        h = self.hidden_size
        nl = self.num_layers
        assert len(z) == nl + 1

        # remat partitions the decoder backward into per-block computations:
        # the whole-graph backward at batch >= 2 crashes this pod's AOT
        # compiler even though every block compiles individually. Mode "conv"
        # saves the conv outputs so the replay is elementwise-only; mode
        # "mixed" keeps that for the low-resolution blocks but fully remats
        # the FULL-RES blocks (encoder0/decoder0) whose saved, lane-padded
        # conv outputs are what OOMs HBM at bs8 under "conv".
        res_cls = remat_module(UnetResBlock, self.remat, static_argnums=(2,))
        up_cls = remat_module(UnetrUpBlock, self.remat, static_argnums=(3, 4))
        hires = "full" if self.remat == "mixed" else self.remat
        res_cls_hi = remat_module(UnetResBlock, hires, static_argnums=(2,))
        up_cls_hi = remat_module(UnetrUpBlock, hires, static_argnums=(3, 4))

        # fused winograd+IN-epilogue conv blocks (inference only, A/B-gated)
        fuse = deterministic and decoder_fuse_enabled()

        # per-scale residual refiners ("unet_encoders" in the reference)
        enc0 = res_cls_hi(h, dtype=self.dtype, name="encoder0")(
            vol.astype(self.dtype), fuse)
        enc = [res_cls(h, dtype=self.dtype, name="encoder1")(z[0], fuse)]
        for i in range(nl):
            enc.append(res_cls(h * 2 ** (i + 1), dtype=self.dtype,
                               name=f"encoder{i + 2}")(z[i + 1], fuse))

        # top-down: dec[i] maps h*2^(i+1) -> h*2^i with skip at h*2^i
        x = enc[-1]
        for i in range(nl - 1, -1, -1):
            x = up_cls(h * 2 ** i, dtype=self.dtype,
                       name=f"decoder{i + 1}")(x, enc[i], deterministic, fuse)
        x = up_cls_hi(h, upsample=self.patch_size, dtype=self.dtype,
                      name="decoder0")(x, enc0, deterministic, fuse)
        return UnetOutBlock(self.out_channels, dtype=self.dtype,
                            name="out")(x, class_major_logits)


class SwinUNETRCustom(nn.Module):
    """Encoder + UNETR decoder, tuple input contract, channels-last logits.

    Output (B, D, H, W, n_classes) — the channels-last analogue of the
    reference's (B, n_classes, D, H, W) (reference: swin_unetr.py:138-147).
    """

    encoder: nn.Module
    out_channels: int
    hidden_size: int = 48
    patch_size: Tuple[int, int, int] = (2, 2, 2)
    remat: Any = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True,
                 class_major_logits: bool = False) -> jnp.ndarray:
        vol = x_in[0]
        z = self.encoder(x_in, deterministic=deterministic)
        return SwinUNETRDecoder(
            out_channels=self.out_channels, hidden_size=self.hidden_size,
            patch_size=self.patch_size, num_layers=len(z) - 1,
            remat=self.remat, dtype=self.dtype, name="decoder")(
                vol, z, deterministic, class_major_logits)


class _LinearEmbed(nn.Module):
    """Per-scale Dense to the shared embedding dim (SegFormer 'MLP' module)."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)


class _FuseConv(nn.Module):
    """1x1 conv + BN(eps 1e-3) + GELU fuse block (SegFormer BasicConv3d)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = Conv3d(self.features, (1, 1, 1), use_bias=True, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=deterministic, epsilon=1e-3,
                      dtype=self.dtype)(x)
        return nn.gelu(x, approximate=False)


class SegFormerHead(nn.Module):
    """Progressive top-down all-MLP head over 5 scales
    (reference: models/segmentors/segformer_head.py:38-121)."""

    encoder: nn.Module
    num_classes: int
    embedding_dim: int = 512
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> jnp.ndarray:
        org_shape = x_in[0].shape[1:4]
        z = self.encoder(x_in, deterministic=deterministic)
        c0, c1, c2, c3, c4 = z

        e = self.embedding_dim
        _c4 = _LinearEmbed(e, self.dtype, name="linear_c4")(c4)
        _c4 = resize_trilinear(_c4, c3.shape[1:4])
        _c3 = _LinearEmbed(e, self.dtype, name="linear_c3")(c3)
        _c3 = _FuseConv(e, self.dtype, name="linear_fuse_3")(
            jnp.concatenate([_c4, _c3], -1), deterministic)
        _c3 = resize_trilinear(_c3, c2.shape[1:4])
        _c2 = _LinearEmbed(e, self.dtype, name="linear_c2")(c2)
        _c2 = _FuseConv(e, self.dtype, name="linear_fuse_2")(
            jnp.concatenate([_c3, _c2], -1), deterministic)
        _c2 = resize_trilinear(_c2, c1.shape[1:4])
        _c1 = _LinearEmbed(e, self.dtype, name="linear_c1")(c1)
        _c1 = _FuseConv(e, self.dtype, name="linear_fuse_1")(
            jnp.concatenate([_c2, _c1], -1), deterministic)
        _c1 = resize_trilinear(_c1, c0.shape[1:4])
        _c0 = _LinearEmbed(e, self.dtype, name="linear_c0")(c0)
        _c = _FuseConv(e, self.dtype, name="linear_fuse_0")(
            jnp.concatenate([_c1, _c0], -1), deterministic)
        _c = resize_trilinear(_c, org_shape)

        _c = nn.Dropout(self.dropout_ratio)(_c, deterministic=deterministic)
        out = Conv3d(self.num_classes, (1, 1, 1), use_bias=True,
                     dtype=self.dtype, name="linear_pred")(_c)
        return out.astype(jnp.float32)


class SegFormerHeadOfficial(nn.Module):
    """Official SegFormer head: all scales to 1/4-res, concat, fuse once
    (reference: models/segmentors/segformer_head_official.py:38-91)."""

    encoder: nn.Module
    num_classes: int
    embedding_dim: int = 512
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> jnp.ndarray:
        org_shape = x_in[0].shape[1:4]
        z = self.encoder(x_in, deterministic=deterministic)
        c1, c2, c3, c4 = z[-4:]

        e = self.embedding_dim
        target = c1.shape[1:4]
        _c4 = resize_trilinear(_LinearEmbed(e, self.dtype, name="linear_c4")(c4), target)
        _c3 = resize_trilinear(_LinearEmbed(e, self.dtype, name="linear_c3")(c3), target)
        _c2 = resize_trilinear(_LinearEmbed(e, self.dtype, name="linear_c2")(c2), target)
        _c1 = _LinearEmbed(e, self.dtype, name="linear_c1")(c1)

        _c = _FuseConv(e, self.dtype, name="linear_fuse")(
            jnp.concatenate([_c4, _c3, _c2, _c1], -1), deterministic)
        _c = nn.Dropout(self.dropout_ratio)(_c, deterministic=deterministic)
        out = Conv3d(self.num_classes, (1, 1, 1), use_bias=True,
                     dtype=self.dtype, name="linear_pred")(_c)
        out = resize_trilinear(out, org_shape)
        return out.astype(jnp.float32)
