"""UNETR: ViT encoder + progressive-upsampling convolutional decoder.

Equivalent of the reference's vendored MONAI-official UNETR
(models/segmentors/unetr_official.py:20-185, UNETROC — dead code there,
SURVEY.md §2.2; the reference's *default* --model UNETR_Official builds None).
Here the name is a working factory entry.

Structure (feature size F, ViT hidden H, patch 16):
  enc1: res block on the raw volume -> F
  enc2: z3  -> PrUp x2 (deconv+conv) -> 2F @ 1/4
  enc3: z6  -> PrUp x1               -> 4F @ 1/8
  enc4: z9  -> PrUp x0 (deconv only) -> 8F @ 1/16 ... per MONAI UnetrPrUpBlock
  dec chain: transposed-conv up + skip concat + res block; 1x1x1 out head.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from medicalsemseg_tpu.models.decoders import (
    UnetOutBlock,
    UnetResBlock,
    UnetrUpBlock,
)
from medicalsemseg_tpu.models.layers import ConvTranspose3d
from medicalsemseg_tpu.models.vit import ViT3D

Dtype = Any


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class UnetrPrUpBlock(nn.Module):
    """Progressive upsampling: deconv, then `num_layer` (deconv + res conv)
    stages (MONAI UnetrPrUpBlock with res_block=True)."""

    out_channels: int
    num_layer: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = False) -> jnp.ndarray:
        x = ConvTranspose3d(self.out_channels, (2, 2, 2), (2, 2, 2),
                            use_bias=False, dtype=self.dtype,
                            name="transp_conv_init")(x, deterministic)
        for i in range(self.num_layer):
            x = ConvTranspose3d(self.out_channels, (2, 2, 2), (2, 2, 2),
                                use_bias=False, dtype=self.dtype,
                                name=f"up_{i}")(x, deterministic)
            x = UnetResBlock(self.out_channels, dtype=self.dtype,
                             name=f"res_{i}")(x)
        return x


class UNETR(nn.Module):
    """Tuple-input contract; (B, D, H, W, n_classes) fp32 logits."""

    out_channels: int
    in_chans: int = 1
    feature_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: Tuple[int, int, int] = (16, 16, 16)
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> jnp.ndarray:
        vol = x_in[0].astype(self.dtype)
        f = self.feature_size

        encoder = ViT3D(patch_size=self.patch_size, in_chans=self.in_chans,
                        hidden_size=self.hidden_size, depth=self.depth,
                        num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                        qkv_bias=self.qkv_bias,
                        drop_path_rate=self.drop_path_rate,
                        out_indices=(self.depth // 4, self.depth // 2,
                                     3 * self.depth // 4, self.depth),
                        use_pallas=self.use_pallas, dtype=self.dtype,
                        name="vit")
        z3, z6, z9, z12 = encoder(x_in, deterministic=deterministic)

        enc1 = UnetResBlock(f, dtype=self.dtype, name="encoder1")(vol)
        enc2 = UnetrPrUpBlock(2 * f, num_layer=2, dtype=self.dtype,
                              name="encoder2")(z3, deterministic)
        enc3 = UnetrPrUpBlock(4 * f, num_layer=1, dtype=self.dtype,
                              name="encoder3")(z6, deterministic)
        enc4 = UnetrPrUpBlock(8 * f, num_layer=0, dtype=self.dtype,
                              name="encoder4")(z9, deterministic)

        x = UnetrUpBlock(8 * f, dtype=self.dtype, name="decoder5")(z12, enc4, deterministic)
        x = UnetrUpBlock(4 * f, dtype=self.dtype, name="decoder4")(x, enc3, deterministic)
        x = UnetrUpBlock(2 * f, dtype=self.dtype, name="decoder3")(x, enc2, deterministic)
        x = UnetrUpBlock(f, dtype=self.dtype, name="decoder2")(x, enc1, deterministic)
        return UnetOutBlock(self.out_channels, dtype=self.dtype, name="out")(x)
