"""Shared model layers: stochastic depth, MLP variants, norms, inits.

Re-derivations of the reference's layer zoo in flax.linen with TPU-friendly
choices: channels-last convs (NDHWC/DHWIO), fp32 normalization statistics, and
compute-dtype casting at module boundaries.

References into /root/reference:
  * Mlp: models/backbones/swin_nnformer.py:24-42
  * DropPath: timm stochastic depth used at models/backbones/swin_nnformer.py:230
  * InceptionHead MLP: models/backbones/swinception.py:58-173
  * depthwise-conv MLP: models/backbones/swindepth.py:25-73
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

Dtype = Any

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def remat_module(cls, mode, static_argnums: Tuple[int, ...] = ()):
    """Wrap a module class in nn.remat according to a remat mode.

    Modes (Config.remat):
      * "none"/False — no rematerialization;
      * "conv" — checkpoint blocks but SAVE conv outputs (tagged with
        jax.ad_checkpoint.checkpoint_name below): the backward replay then
        recomputes only the cheap elementwise norm/activation chains, keeping
        compiler live-range pressure low without re-running any convolution;
      * "full" — classic full-block rematerialization (max memory savings,
        pays the full forward again in the backward);
      * "mixed" — "conv" here; the decoder promotes its FULL-RESOLUTION
        blocks (encoder0/decoder0, whose saved conv outputs are the bs8 HBM
        OOM: 21.26G of 15.75G under "conv") to "full" remat while every
        lower-resolution block keeps the cheap conv-saving policy.
    """
    if mode in (False, None, "none"):
        return cls
    policy = None
    if mode in ("conv", "mixed"):
        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
    elif mode != "full":
        raise ValueError(f"unknown remat mode {mode!r}")
    return nn.remat(cls, policy=policy, static_argnums=static_argnums)


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
              rng: Optional[jax.Array]) -> jnp.ndarray:
    """Per-sample stochastic depth (timm DropPath semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        rng = None
        if not deterministic and self.rate > 0.0:
            rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


class _DenseParams(nn.Module):
    """kernel/bias leaves under the scope an nn.Dense would own (same names,
    shapes, inits), so the param tree is unchanged when a fused kernel takes
    over the computation."""

    features_in: int
    features_out: int
    use_bias: bool = True
    kernel_init: Any = trunc_normal_init

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.features_in, self.features_out),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features_out,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class Mlp(nn.Module):
    """Linear -> GELU -> Linear token MLP (reference: swin_nnformer.py:24-42).

    With ``ln``/``residual`` (inference only) the whole chain — including the
    caller's pre-MLP LayerNorm and shortcut add — runs as ONE Pallas kernel
    over VMEM token tiles (ops/pallas/mlp.py); params keep the nn.Dense
    names (Dense_0/Dense_1)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 grid: Optional[Tuple[int, int, int]] = None,
                 ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 residual: bool = False) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        if ln is not None or residual:
            from medicalsemseg_tpu.ops.pallas.mlp import (
                fused_mlp,
                fused_mlp_trainable)

            w1, b1 = _DenseParams(x.shape[-1], self.hidden_dim,
                                  name="Dense_0")()
            w2, b2 = _DenseParams(self.hidden_dim, out_dim, name="Dense_1")()
            if not deterministic and ln is not None:
                # training: custom VJP recomputes the hidden activations
                # tile-by-tile in the backward (callers gate on dropout == 0)
                return fused_mlp_trainable(x.astype(self.dtype), ln[0],
                                           ln[1], w1, b1, w2, b2, residual)
            return fused_mlp(x.astype(self.dtype), w1, b1, w2, b2,
                             ln_scale=None if ln is None else ln[0],
                             ln_bias=None if ln is None else ln[1],
                             residual=residual)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class _LNParams(nn.Module):
    """scale/bias leaves under the child scope nn.LayerNorm used to own, so
    the param tree (<parent>/LayerNorm_0/{scale,bias}) is unchanged."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype.

    Computation replicates flax.linen.LayerNorm's fp32 fast-variance formula
    (var = max(0, E[x^2] - E[x]^2)) bit-for-bit; params stay at
    <name>/LayerNorm_0/{scale,bias}. ``params_only=True`` returns the raw
    (scale, bias) so kernels can absorb the normalization
    (ops/pallas/window_attention.py fused LN)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        scale, bias = _LNParams(x.shape[-1], name="LayerNorm_0")()
        if params_only:
            return scale, bias
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.maximum(0.0, (xf * xf).mean(axis=-1, keepdims=True)
                          - mu * mu)
        y = (xf - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        return y.astype(self.dtype)


class _FastConv3dS1(nn.Module):
    """nn.Conv drop-in for the 3x3x3 / stride-1 / SAME / dense case, routed
    through ops/convgrad.conv3x3x3_s1 (2.7x faster weight gradients on TPU).
    Param names/shapes/inits match nn.Conv so checkpoints are identical."""

    features: int
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        from medicalsemseg_tpu.ops.convgrad import conv3x3x3_s1

        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, c, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if params_only:
            return kernel, bias
        y = conv3x3x3_s1(x.astype(self.dtype), kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class _Fast1x1Conv(nn.Module):
    """nn.Conv drop-in for the 1x1x1 / stride-1 / dense case: pure channel
    mixing, computed as a reshape + matmul — no conv custom-call, none of
    the bf16 conv-layout re-tiling copies around it (TRAIN PROFILE, NOTES.md:
    'data formatting' is pure conv-layout copies). Params match nn.Conv."""

    features: int
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, c, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if params_only:
            return kernel, bias
        y = jnp.dot(x.astype(self.dtype),
                    kernel[0, 0, 0].astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class Conv3d(nn.Module):
    """Channels-last 3D conv; NDHWC x DHWIO -> NDHWC maps directly to the MXU."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        if (tuple(self.kernel_size) == (3, 3, 3)
                and tuple(self.strides) == (1, 1, 1)
                and self.padding == "SAME"
                and self.feature_group_count == 1):
            # same module name as nn.Conv's auto-name: param tree unchanged
            fast = _FastConv3dS1(self.features, self.use_bias, self.dtype,
                                 name="Conv_0")
            if params_only:
                return fast(x, params_only=True)
            y = fast(x)
        elif (tuple(self.kernel_size) == (1, 1, 1)
                and tuple(self.strides) == (1, 1, 1)
                and self.feature_group_count == 1):
            fast = _Fast1x1Conv(self.features, self.use_bias, self.dtype,
                                name="Conv_0")
            if params_only:
                return fast(x, params_only=True)
            y = fast(x)
        else:
            assert not params_only, "params_only needs the 3^3/s1 fast path"
            y = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                        padding=self.padding, use_bias=self.use_bias,
                        feature_group_count=self.feature_group_count,
                        dtype=self.dtype)(x)
        # identity outside remat; under remat_module("conv") marks this value
        # as saved so the backward replay never re-runs the convolution
        return checkpoint_name(y, "conv_out")


class _MatmulConvTranspose(nn.Module):
    """nn.ConvTranspose drop-in for the non-overlapping (kernel == strides,
    VALID) case. Each output voxel receives exactly one kernel tap, so the
    transposed conv IS a per-phase dense projection: one
    (M, Ci) @ (Ci, k^3*Co) matmul + depth-to-space. That form wins in
    TRAINING (the dW becomes a single wide-N contraction instead of XLA's
    slow grad-conv; flagship step 163.9 -> 157.3 ms) but its depth-to-space
    pass loses ~3% sliding-window throughput at inference, where XLA's
    native lowering fuses better — so ``deterministic=True`` routes to
    lax.conv_transpose over the SAME declared parameters. Param
    names/shapes/inits match nn.ConvTranspose (checkpoint-invisible)."""

    features: int
    kernel_size: Tuple[int, int, int]
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = False) -> jnp.ndarray:
        kd, kh, kw = self.kernel_size
        b, d, h, w, ci = x.shape
        co = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kd, kh, kw, ci, co), jnp.float32)
        if deterministic:
            y = jax.lax.conv_transpose(
                x.astype(self.dtype), kernel.astype(self.dtype),
                strides=tuple(self.kernel_size), padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        else:
            # nn.ConvTranspose applies taps spatially flipped:
            # y[k*i + p] = x[i] * w[k-1-p]
            wf = jnp.flip(kernel, (0, 1, 2)).transpose(3, 0, 1, 2, 4)
            wf = wf.reshape(ci, kd * kh * kw * co)
            y = jnp.dot(x.astype(self.dtype), wf.astype(self.dtype))
            y = y.reshape(b, d, h, w, kd, kh, kw, co)
            y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
                b, d * kd, h * kh, w * kw, co)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (co,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ConvTranspose3d(nn.Module):
    """Channels-last transposed conv used by the UNETR up blocks."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = False) -> jnp.ndarray:
        if tuple(self.kernel_size) == tuple(self.strides):
            # same module name as nn.ConvTranspose's auto-name: param tree
            # unchanged; the matmul/native lowering follows the mode
            y = _MatmulConvTranspose(self.features, tuple(self.kernel_size),
                                     self.use_bias, self.dtype,
                                     name="ConvTranspose_0")(x, deterministic)
        else:
            y = nn.ConvTranspose(self.features, self.kernel_size,
                                 strides=self.strides, padding="VALID",
                                 use_bias=self.use_bias, dtype=self.dtype)(x)
        return checkpoint_name(y, "conv_out")


class InstanceNorm(nn.Module):
    """InstanceNorm3d over spatial dims, per sample+channel, affine, fp32 stats.

    Equivalent of MONAI's norm_name='instance' in the UNETR blocks
    (reference: models/segmentors/swin_unetr.py:35).
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if params_only:
            return scale, bias
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        mean = xf.mean(axes, keepdims=True)
        var = xf.var(axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm3d equivalent (channels-last). Cross-shard stats are synced by
    the caller's pmean when running under a mesh — the SyncBatchNorm analogue
    (reference: run_training.py:83)."""

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)
        return nn.BatchNorm(use_running_average=ura, momentum=self.momentum,
                            epsilon=self.epsilon, dtype=self.dtype,
                            axis_name=self.axis_name)(x)


def tokens_to_volume(x: jnp.ndarray, grid: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, N, C) -> (B, D, H, W, C)."""
    b, _, c = x.shape
    return x.reshape(b, grid[0], grid[1], grid[2], c)


def volume_to_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, N, C)."""
    b, d, h, w, c = x.shape
    return x.reshape(b, d * h * w, c)


class DepthwiseConvMlp(nn.Module):
    """SwinDepth's MLP: Dense -> 3x(depthwise 3³ conv + BN + GELU) -> Dense.

    Token-MLP with volumetric depthwise mixing
    (reference: models/backbones/swindepth.py:25-73).
    """

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 grid: Optional[Tuple[int, int, int]] = None) -> jnp.ndarray:
        assert grid is not None, "DepthwiseConvMlp needs the token grid"
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init)(x)
        x = nn.gelu(x, approximate=False)
        v = tokens_to_volume(x, grid)
        for _ in range(3):
            v = Conv3d(self.hidden_dim, (3, 3, 3),
                       feature_group_count=self.hidden_dim, dtype=self.dtype)(v)
            v = BatchNorm(use_running_average=deterministic, epsilon=1e-3,
                          dtype=self.dtype)(v)
            v = nn.gelu(v, approximate=False)
        x = volume_to_tokens(v)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class BasicConv3d(nn.Module):
    """Conv3d (bias) + BatchNorm(eps 1e-3) + GELU (reference: swinception.py:45-56)."""

    features: int
    kernel_size: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = Conv3d(self.features, self.kernel_size, use_bias=True,
                   dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=deterministic, epsilon=1e-3,
                      dtype=self.dtype)(x)
        return nn.gelu(x, approximate=False)


class InceptionMlp(nn.Module):
    """SwInception's token MLP: 5 parallel conv branches, concat, Linear out.

    hidden_dim is split evenly over the 5 branches; the 3x3/5x5/7x7 branches
    bottleneck through in_features//8 channels
    (reference: models/backbones/swinception.py:58-173, branch_weights [1]*5,
    bottleneck_divisor=8).
    """

    hidden_dim: int  # total hidden width, split over 5 branches
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 grid: Optional[Tuple[int, int, int]] = None) -> jnp.ndarray:
        assert grid is not None, "InceptionMlp needs the token grid"
        out_dim = self.out_dim or x.shape[-1]
        bd = int(self.hidden_dim / 5)  # per-branch width
        bn_dim = max(x.shape[-1] // 8, 1)  # bottleneck width
        v = tokens_to_volume(x, grid)
        det = deterministic

        b1 = BasicConv3d(bd, (1, 1, 1), dtype=self.dtype)(v, deterministic=det)

        b3 = BasicConv3d(bn_dim, (1, 1, 1), dtype=self.dtype)(v, deterministic=det)
        b3 = BasicConv3d(bd, (3, 3, 3), dtype=self.dtype)(b3, deterministic=det)

        b5 = BasicConv3d(bn_dim, (1, 1, 1), dtype=self.dtype)(v, deterministic=det)
        b5 = BasicConv3d(bn_dim, (3, 3, 3), dtype=self.dtype)(b5, deterministic=det)
        b5 = BasicConv3d(bd, (3, 3, 3), dtype=self.dtype)(b5, deterministic=det)

        b7 = BasicConv3d(bn_dim, (1, 1, 1), dtype=self.dtype)(v, deterministic=det)
        b7 = BasicConv3d(bn_dim, (3, 3, 3), dtype=self.dtype)(b7, deterministic=det)
        b7 = BasicConv3d(bn_dim, (3, 3, 3), dtype=self.dtype)(b7, deterministic=det)
        b7 = BasicConv3d(bd, (3, 3, 3), dtype=self.dtype)(b7, deterministic=det)

        # torch AvgPool3d(padding=1) counts pad voxels (count_include_pad=True)
        bp = nn.avg_pool(v, (3, 3, 3), strides=(1, 1, 1), padding="SAME",
                         count_include_pad=True)
        bp = BasicConv3d(bd, (1, 1, 1), dtype=self.dtype)(bp, deterministic=det)

        cat = jnp.concatenate([b1, b3, b5, b7, bp], axis=-1)
        x = volume_to_tokens(cat)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=det)
        return x
