"""Golden parity for the FocalNet and SegFormer encoders against the
reference's own torch modules (same approach as test_reference_parity.py).

GCViT is intentionally excluded: this framework fixes two reference quirks
there (rel-pos index stride collisions and batch-mixing global queries), so
outputs differ by design (documented in models/gcvit.py).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference repo not mounted", allow_module_level=True)

from tests.test_reference_parity import (  # noqa: E402  (installs stubs)
    _install_monai_stub,
    _install_timm_stub,
    conv_params,
    dense_params,
    ln_params,
    t2j,
)

_install_timm_stub()
_install_monai_stub()
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_focal_modulation_block_parity():
    from models.backbones.focalnet_3d import FocalModulationBlock as RefBlock

    from medicalsemseg_tpu.models.focalnet import FocalModulationBlock

    torch.manual_seed(0)
    dim, fl, fw = 8, 2, 3
    ref = RefBlock(dim=dim, focal_level=fl, focal_window=fw,
                   drop_path=0.0).eval()
    ours = FocalModulationBlock(dim=dim, focal_level=fl, focal_window=fw,
                                drop_path_rate=0.0)

    params = {
        "norm1": ln_params(ref.norm1),
        "norm2": ln_params(ref.norm2),
        "modulation": {
            "f": dense_params(ref.modulation.f),
            "h": {"Conv_0": conv_params(ref.modulation.h)},
            "proj": dense_params(ref.modulation.proj),
        },
        "mlp": {"Dense_0": dense_params(ref.mlp.fc1),
                "Dense_1": dense_params(ref.mlp.fc2)},
    }
    for k in range(fl):
        params["modulation"][f"focal_layers_{k}"] = {
            "Conv_0": conv_params(ref.modulation.focal_layers[k][0])}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 6, 6, dim)).astype(np.float32)
    ref.S, ref.H, ref.W = 6, 6, 6
    with torch.no_grad():
        want = ref(torch.from_numpy(x.reshape(2, -1, dim))).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).reshape(2, -1, dim), want,
                               rtol=3e-4, atol=3e-5)


def _port_mixvit(ref, depths):
    params = {}
    for s in range(4):
        pe = getattr(ref, f"patch_embed{s + 1}")
        params[f"patch_embed{s + 1}"] = {
            "proj": {"Conv_0": conv_params(pe.proj)},
            "norm": ln_params(pe.norm),
        }
        params[f"norm{s + 1}"] = ln_params(getattr(ref, f"norm{s + 1}"))
        for i, blk in enumerate(getattr(ref, f"block{s + 1}")):
            attn = {
                "q": dense_params(blk.attn.q),
                "kv": dense_params(blk.attn.kv),
                "proj": dense_params(blk.attn.proj),
            }
            if hasattr(blk.attn, "sr"):
                attn["sr"] = {"Conv_0": conv_params(blk.attn.sr)}
                attn["norm"] = ln_params(blk.attn.norm)
            params[f"block{s + 1}_{i}"] = {
                "norm1": ln_params(blk.norm1),
                "norm2": ln_params(blk.norm2),
                "attn": attn,
                "mlp": {
                    "fc1": dense_params(blk.mlp.fc1),
                    "fc2": dense_params(blk.mlp.fc2),
                    "dwconv": {"Conv_0": conv_params(blk.mlp.dwconv.dwconv)},
                },
            }
    return params


def test_mixvision_transformer_parity():
    from models.backbones.segformer_backbone import MixVisionTransformer

    from medicalsemseg_tpu.models.segformer import MixVisionTransformer3D

    torch.manual_seed(1)
    depths = [1, 1, 1, 1]
    ref = MixVisionTransformer(img_size=32, in_chans=1, embed_dim=8,
                               num_heads=[1, 2, 4, 8], depths=depths,
                               sr_ratios=[8, 4, 2, 1], qkv_bias=True,
                               drop_path_rate=0.0).eval()
    ours = MixVisionTransformer3D(in_chans=1, embed_dim=8,
                                  depths=tuple(depths),
                                  num_heads=(1, 2, 4, 8),
                                  sr_ratios=(8, 4, 2, 1), qkv_bias=True,
                                  drop_path_rate=0.0)
    params = _port_mixvit(ref, depths)

    rng = np.random.default_rng(1)
    vol = rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref((torch.from_numpy(vol.transpose(0, 4, 1, 2, 3)), None, None))
    got = ours.apply({"params": params}, (jnp.asarray(vol), None, None))

    assert len(got) == len(want)
    # outs[0] in the reference is raw (B, N, C) stage-1 tokens; ours is the
    # volume form of the same tensor
    w0 = want[0].numpy().reshape(got[0].shape)
    np.testing.assert_allclose(np.asarray(got[0]), w0, rtol=3e-4, atol=3e-5)
    for g, w in zip(got[1:], want[1:]):
        np.testing.assert_allclose(np.asarray(g),
                                   w.numpy().transpose(0, 2, 3, 4, 1),
                                   rtol=3e-4, atol=3e-5)


def bn_params(bn):
    return ({"scale": t2j(bn.weight), "bias": t2j(bn.bias)},
            {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)})


def basic_conv_params(bc):
    p, s = bn_params(bc.bn)
    return ({"Conv3d_0": {"Conv_0": conv_params(bc.conv)}, "BatchNorm_0": {"BatchNorm_0": p}},
            {"BatchNorm_0": {"BatchNorm_0": s}})


def test_swinception_inception_mlp_parity():
    from models.backbones.swinception import InceptionHead

    from medicalsemseg_tpu.models.layers import InceptionMlp

    torch.manual_seed(2)
    dim, hidden = 8, 20  # 4 per branch
    ref = InceptionHead(in_features=dim, input_resolution=(4, 4, 4),
                        hidden_features=hidden).eval()
    ours = InceptionMlp(hidden_dim=hidden)

    params, stats = {}, {}
    # module order in our compact call: b1(1), b3(2), b5(3), b7(4), pool(1)
    ref_chains = [
        [ref.branches[0].branch1x1],
        [ref.branches[1].branch3x3_1, ref.branches[1].branch3x3_2],
        [ref.branches[2].branch3x3dbl_1, ref.branches[2].branch3x3dbl_2,
         ref.branches[2].branch3x3dbl_3],
        [ref.branches[3].branch3x3trpl_1, ref.branches[3].branch3x3trpl_2,
         ref.branches[3].branch3x3trpl_3, ref.branches[3].branch3x3trpl_4],
        [ref.branches[4].branch_pool_2],
    ]
    idx = 0
    for chain in ref_chains:
        for bc in chain:
            p, s = basic_conv_params(bc)
            params[f"BasicConv3d_{idx}"] = p
            stats[f"BasicConv3d_{idx}"] = s
            idx += 1
    params["Dense_0"] = dense_params(ref.fc)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 64, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), deterministic=True, grid=(4, 4, 4))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_swindepth_dwconv_mlp_parity():
    from models.backbones.swindepth import Mlp as RefMlp

    from medicalsemseg_tpu.models.layers import DepthwiseConvMlp

    torch.manual_seed(3)
    dim, hidden = 6, 12
    ref = RefMlp(in_features=dim, input_resolution=(4, 4, 4),
                 hidden_features=hidden).eval()
    ours = DepthwiseConvMlp(hidden_dim=hidden)

    params = {"Dense_0": dense_params(ref.fc1),
              "Dense_1": dense_params(ref.fc2)}
    stats = {}
    for i, (dwc, bn) in enumerate([(ref.dwc1, ref.bn1), (ref.dwc2, ref.bn2),
                                   (ref.dwc3, ref.bn3)]):
        params[f"Conv3d_{i}"] = {"Conv_0": conv_params(dwc)}
        p, s = bn_params(bn)
        params[f"BatchNorm_{i}"] = {"BatchNorm_0": p}
        stats[f"BatchNorm_{i}"] = {"BatchNorm_0": s}

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 64, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), deterministic=True, grid=(4, 4, 4))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_gcvit_subcomponents_parity():
    """GCViT SE / FeatExtract / ReduceSize match the reference (the attention
    deviations are documented; the conv machinery is faithful)."""
    from models.backbones.gc_vit_3d import SE as RefSE
    from models.backbones.gc_vit_3d import FeatExtract as RefFE
    from models.backbones.gc_vit_3d import ReduceSize as RefRS

    from medicalsemseg_tpu.models.gcvit import SE, FeatExtract, ReduceSize

    torch.manual_seed(4)
    dim = 8
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 6, 6, 6, dim)).astype(np.float32)
    x_t = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))

    # --- SE gate ---
    ref_se = RefSE(dim, dim).eval()
    se_params = {"Dense_0": dense_params(ref_se.fc[0]),
                 "Dense_1": dense_params(ref_se.fc[2])}
    with torch.no_grad():
        want = ref_se(x_t).numpy().transpose(0, 2, 3, 4, 1)
    got = SE(dim).apply({"params": se_params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-6)

    def conv_se_params(seq, se_prefix="_ConvSE_0"):
        return {se_prefix: {
            "Conv3d_0": {"Conv_0": conv_params(seq[0])},
            "SE_0": {"Dense_0": dense_params(seq[2].fc[0]),
                     "Dense_1": dense_params(seq[2].fc[2])},
            "Conv3d_1": {"Conv_0": conv_params(seq[3])},
        }}

    # --- FeatExtract (with pooling) ---
    ref_fe = RefFE(dim, keep_dim=False).eval()
    fe_params = conv_se_params(ref_fe.conv)
    with torch.no_grad():
        want = ref_fe(x_t).numpy().transpose(0, 2, 3, 4, 1)
    got = FeatExtract(dim, keep_dim=False).apply({"params": fe_params},
                                                 jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)

    # --- ReduceSize ---
    ref_rs = RefRS(dim).eval()
    rs_params = conv_se_params(ref_rs.conv)
    rs_params["norm1"] = ln_params(ref_rs.norm1)
    rs_params["norm2"] = ln_params(ref_rs.norm2)
    rs_params["reduction"] = {"Conv_0": conv_params(ref_rs.reduction)}
    with torch.no_grad():
        want = ref_rs(torch.from_numpy(x)).numpy()  # ref takes channels-last!
    got = ReduceSize(dim).apply({"params": rs_params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_nnformer_cross_attention_parity():
    """nnFormer WindowAttention_kv (K/V from skip, Q from upsampled path).

    Note: the reference's rel-pos index strides are the non-standard
    (3w-1, 2w-1) pair (nnformer_official.py:176-177); for parity the
    reference bias table is regathered through OUR (standard) index table —
    the comparison isolates the attention math itself.
    """
    # nnformer_official imports neural_network (batchgenerators + removed
    # scipy APIs); only the SegmentationNetwork base class is needed
    import types as _types
    nn_mod = _types.ModuleType(
        "models.segmentors.nnformer_official.neural_network")
    nn_mod.SegmentationNetwork = torch.nn.Module
    sys.modules.setdefault(
        "models.segmentors.nnformer_official.neural_network", nn_mod)
    from models.segmentors.nnformer_official.nnformer_official import (
        WindowAttention_kv as RefKV,
    )

    from medicalsemseg_tpu.models.nnformer import CrossWindowAttention
    from medicalsemseg_tpu.ops.window import relative_position_index

    torch.manual_seed(5)
    dim, nh, ws = 8, 2, (2, 2, 2)
    ref = RefKV(dim, ws, nh, qkv_bias=True).eval()
    ours = CrossWindowAttention(dim=dim, window_size=ws, num_heads=nh,
                                qkv_bias=True)

    # neutralize index-table differences: use a constant-per-entry table
    with torch.no_grad():
        ref.relative_position_bias_table.fill_(0.0)
        base = torch.randn(ref.relative_position_bias_table.shape) * 0.02
        ref.relative_position_bias_table.copy_(base)
    # build OUR gathered bias from the reference's table through the REF index
    ref_idx = ref.relative_position_index.numpy()
    our_idx = relative_position_index(ws)
    # construct a table such that our gather reproduces the ref's bias matrix:
    # possible exactly when our index is injective over used entries (it is
    # translation-structured); map our_idx entry -> ref bias value
    n = 8
    ref_bias = base.numpy()[ref_idx.reshape(-1)].reshape(n, n, nh)
    our_table = np.zeros(((2 * 2 - 1) ** 3, nh), np.float32)
    for i in range(n):
        for j in range(n):
            our_table[our_idx[i, j]] = ref_bias[i, j]

    params = {
        "kv": dense_params(ref.kv),
        "proj": dense_params(ref.proj),
        "relative_position_bias_table": jnp.asarray(our_table),
    }
    rng = np.random.default_rng(5)
    skip = rng.normal(size=(4, n, dim)).astype(np.float32)
    up = rng.normal(size=(4, n, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(skip), torch.from_numpy(up)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(skip), jnp.asarray(up))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_nnformer_cross_attention_ref_quirk_direct_parity():
    """--ref_quirk_rel_pos reproduces the reference's colliding index strides
    so the reference's bias table can be used verbatim (no regather)."""
    import types as _types
    nn_mod = _types.ModuleType(
        "models.segmentors.nnformer_official.neural_network")
    nn_mod.SegmentationNetwork = torch.nn.Module
    sys.modules.setdefault(
        "models.segmentors.nnformer_official.neural_network", nn_mod)
    from models.segmentors.nnformer_official.nnformer_official import (
        WindowAttention_kv as RefKV,
    )

    from medicalsemseg_tpu.models.nnformer import CrossWindowAttention
    from medicalsemseg_tpu.ops.window import relative_position_index_ref_quirk

    torch.manual_seed(7)
    dim, nh, ws = 8, 2, (2, 2, 2)
    ref = RefKV(dim, ws, nh, qkv_bias=True).eval()
    with torch.no_grad():
        ref.relative_position_bias_table.copy_(
            torch.randn(ref.relative_position_bias_table.shape) * 0.02)

    # sanity: our quirk index equals the reference's buffer
    np.testing.assert_array_equal(
        relative_position_index_ref_quirk(ws),
        ref.relative_position_index.numpy())

    ours = CrossWindowAttention(dim=dim, window_size=ws, num_heads=nh,
                                qkv_bias=True, ref_quirk_index=True)
    params = {
        "kv": dense_params(ref.kv),
        "proj": dense_params(ref.proj),
        "relative_position_bias_table": jnp.asarray(
            ref.relative_position_bias_table.detach().numpy()),
    }
    rng = np.random.default_rng(7)
    n = 8
    skip = rng.normal(size=(4, n, dim)).astype(np.float32)
    up = rng.normal(size=(4, n, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(skip), torch.from_numpy(up)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(skip), jnp.asarray(up))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_swin_window_attention_ref_quirk_parity():
    """--ref_quirk_rel_pos also reaches the REGULAR W-MSA attention used by
    NNFormer's non-cross blocks: the official nnFormer's plain WindowAttention
    (nnformer_official.py:254-255) uses the same colliding (3w-1, 2w-1)
    strides, so an imported bias table must be gathered through the quirk
    index there too (ADVICE r2, medium)."""
    import types as _types
    nn_mod = _types.ModuleType(
        "models.segmentors.nnformer_official.neural_network")
    nn_mod.SegmentationNetwork = torch.nn.Module
    sys.modules.setdefault(
        "models.segmentors.nnformer_official.neural_network", nn_mod)
    from models.segmentors.nnformer_official.nnformer_official import (
        WindowAttention as RefWA,
    )

    from medicalsemseg_tpu.models.swin import WindowAttention

    torch.manual_seed(11)
    dim, nh, ws = 8, 2, (2, 2, 2)
    ref = RefWA(dim, ws, nh, qkv_bias=True).eval()
    with torch.no_grad():
        ref.relative_position_bias_table.copy_(
            torch.randn(ref.relative_position_bias_table.shape) * 0.02)

    ours = WindowAttention(dim=dim, window_size=ws, num_heads=nh,
                           n_windows=4, qkv_bias=True, ref_quirk_index=True)
    params = {
        "qkv_kernel": t2j(ref.qkv.weight.T),
        "qkv_bias": t2j(ref.qkv.bias),
        "proj_kernel": t2j(ref.proj.weight.T),
        "proj_bias": t2j(ref.proj.bias),
        "relative_position_bias_table": jnp.asarray(
            ref.relative_position_bias_table.detach().numpy()),
    }
    rng = np.random.default_rng(11)
    n = 8
    x = rng.normal(size=(4, n, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got, _ = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)
