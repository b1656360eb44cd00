"""Train-STEP numeric parity against torch: loss, full-model gradients, and
the optimizer update.

The reference trains with MONAI DiceCELoss through torch autograd and a
timm-masked torch.optim.AdamW behind a per-epoch LR scheduler
(reference: run_training.py:92-105, engine/train.py:63-86). The inference
path already has full-model oracles (test_full_model_parity.py); this module
closes the TRAINING numerics loop:

  * the flagship's whole-model gradient (encoder + decoder, DiceCE) must
    match torch autograd's, leaf for leaf, through the same transplanted
    weights — the torch gradient state_dict maps into our parameter layout
    with the SAME importer as the weights (transposes/permutations are
    linear, so they carry gradients identically);
  * make_optimizer's clip -> AdamW(masked wd) chain driven by the epoch
    schedule must reproduce torch.nn.utils.clip_grad_norm_ +
    torch.optim.AdamW param-group semantics step for step.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from tests.test_full_model_parity import (DEPTHS, DIM, HEADS, NCLS, SIZE,
                                          WINDOW, _paired_models)


def _torch_dice_ce(logits: torch.Tensor, labels: torch.Tensor,
                   smooth: float = 1e-5) -> torch.Tensor:
    """MONAI DiceCELoss(to_onehot_y, softmax, squared_pred, smooth 1e-5)
    re-derived for the oracle (reference: run_training.py:104-105):
    mean-over-(batch, class) squared-pred Dice + mean-over-voxel CE."""
    probs = torch.softmax(logits, dim=1)
    n = logits.shape[1]
    target = F.one_hot(labels.long(), n).permute(0, 4, 1, 2, 3).float()
    dims = (2, 3, 4)
    inter = (probs * target).sum(dims)
    denom = (probs ** 2).sum(dims) + (target ** 2).sum(dims)
    dice = 1.0 - (2.0 * inter + smooth) / (denom + smooth)
    return dice.mean() + F.cross_entropy(logits, labels.long())


def _flat(tree):
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_train_step_loss_grads_and_update_match_torch():
    """One full training step on the flagship: loss, every parameter
    gradient, the global grad norm, and the post-AdamW parameters must match
    the torch chain (model backward + timm param groups + torch AdamW at the
    schedule's step-0 LR)."""
    from medicalsemseg_tpu.train.state import (create_train_state,
                                               make_train_step)
    from medicalsemseg_tpu.utils.torch_import import (
        import_swin_unetr_checkpoint)

    ref, ours, cfg, params = _paired_models(seed=17)
    # torch side runs eval-mode DropPath; warmup 0 so the step-0 LR is
    # nonzero and the optimizer-update comparison is not vacuous
    cfg = cfg.replace(drop_path_rate=0.0, warmup_epochs=0)
    from medicalsemseg_tpu.models import build_model
    ours = build_model(cfg)

    rng = np.random.default_rng(17)
    vol = rng.normal(size=(1, SIZE, SIZE, SIZE, 1)).astype(np.float32)
    labels = rng.integers(0, NCLS, size=(1, SIZE, SIZE, SIZE)).astype(np.int32)

    # --- torch: loss + backward + timm-masked AdamW step ------------------
    ref.zero_grad(set_to_none=False)
    t_logits = ref((torch.from_numpy(vol.transpose(0, 4, 1, 2, 3)),
                    None, None))
    t_loss = _torch_dice_ce(t_logits, torch.from_numpy(labels))
    t_loss.backward()
    t_norm = torch.sqrt(sum((p.grad ** 2).sum()
                            for p in ref.parameters() if p.grad is not None))

    # grads -> our layout via the same importer as the weights
    grads_sd = {k: torch.zeros_like(v) for k, v in ref.state_dict().items()}
    for name, p in ref.named_parameters():
        if p.grad is not None:
            grads_sd[name] = p.grad
    want_grads = import_swin_unetr_checkpoint(grads_sd,
                                              num_layers=len(DEPTHS))

    # --- ours: the real jitted train step ---------------------------------
    batch = {"image": jnp.asarray(vol), "label": jnp.asarray(labels),
             "crop_loc": jnp.zeros((1, 3)), "affine": jnp.ones((1, 3))}
    model_in = (batch["image"], batch["crop_loc"], batch["affine"])
    state, sched = create_train_state(cfg, ours, jax.random.PRNGKey(0),
                                      model_in, steps_per_epoch=5)
    state = state.replace(params=params, opt_state=state.tx.init(params))
    step = jax.jit(make_train_step(cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(metrics["loss"]), float(t_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(float(metrics["grad_norm"]), float(t_norm),
                               rtol=5e-3)

    # leaf-for-leaf gradient parity (direct value_and_grad, pre-optimizer)
    from medicalsemseg_tpu.train.losses import dice_ce_loss

    def loss_fn(p):
        logits = ours.apply({"params": p}, model_in, deterministic=True)
        return dice_ce_loss(logits, batch["label"])

    got_grads = jax.jit(jax.value_and_grad(loss_fn))(params)[1]
    got_f, want_f = _flat(got_grads), _flat(want_grads)
    assert set(got_f) == set(want_f)
    norm = lambda a: float(np.linalg.norm(a.ravel())) + 1e-12
    for k in sorted(got_f):
        rel = np.linalg.norm((got_f[k] - want_f[k]).ravel()) / norm(want_f[k])
        assert rel < 2e-2, f"{k}: grad rel-L2 {rel:.2e}"
    all_got = np.concatenate([got_f[k].ravel() for k in sorted(got_f)])
    all_want = np.concatenate([want_f[k].ravel() for k in sorted(got_f)])
    assert np.linalg.norm(all_got - all_want) / norm(all_want) < 5e-3

    # --- post-update parameters vs torch AdamW at the step-0 LR -----------
    lr0 = float(sched(0))
    assert lr0 > 0, "step-0 LR must be nonzero for a meaningful update test"
    decay = [p for _, p in ref.named_parameters() if p.ndim > 1]
    no_decay = [p for _, p in ref.named_parameters() if p.ndim <= 1]
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": cfg.weight_decay},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=lr0, betas=(0.9, 0.95), eps=1e-6)
    opt.step()
    want_p = _flat(import_swin_unetr_checkpoint(ref.state_dict(),
                                                num_layers=len(DEPTHS)))
    got_p = _flat(new_state.params)
    for k in sorted(got_p):
        # first-step Adam is sign(g)-like, so fp tolerance on tiny-|g|
        # elements bounds at ~lr0; everything above that is a real bug
        np.testing.assert_allclose(got_p[k], want_p[k], atol=max(2 * lr0, 1e-5),
                                   rtol=0, err_msg=k)
        assert float(np.abs(got_p[k] - want_p[k]).mean()) < lr0 / 10, k


@pytest.mark.parametrize("clip", [None, 0.05])
def test_make_optimizer_matches_torch_adamw(clip):
    """make_optimizer's (clip ->) AdamW(masked wd) under the epoch schedule ==
    torch clip_grad_norm_ + torch.optim.AdamW with timm param groups, exactly,
    over steps that cross a warmup->cosine epoch boundary
    (reference: run_training.py:92-98, engine/train.py:75-86)."""
    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.train.state import make_optimizer

    cfg = Config(lr=3e-3, weight_decay=1e-2, warmup_epochs=1, epochs=3,
                 gradient_clipping=clip)
    steps_per_epoch = 2
    tx, sched = make_optimizer(cfg, steps_per_epoch)

    rng = np.random.default_rng(5)
    w0 = rng.normal(size=(4, 5)).astype(np.float32)   # decayed (ndim > 1)
    b0 = rng.normal(size=(5,)).astype(np.float32)     # not decayed
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt_state = tx.init(params)

    tw = torch.tensor(w0, requires_grad=True)
    tb = torch.tensor(b0, requires_grad=True)
    opt = torch.optim.AdamW(
        [{"params": [tw], "weight_decay": cfg.weight_decay},
         {"params": [tb], "weight_decay": 0.0}],
        lr=1.0, betas=(0.9, 0.95), eps=1e-6)

    for step_i in range(6):
        gw = rng.normal(size=w0.shape).astype(np.float32)
        gb = rng.normal(size=b0.shape).astype(np.float32)

        updates, opt_state = tx.update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, opt_state, params)
        params = optax.apply_updates(params, updates)

        for group in opt.param_groups:
            group["lr"] = float(sched(step_i))
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        if clip is not None:
            torch.nn.utils.clip_grad_norm_([tw, tb], clip)
        opt.step()

        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), atol=5e-6, rtol=0,
                                   err_msg=f"step {step_i} kernel")
        np.testing.assert_allclose(np.asarray(params["b"]),
                                   tb.detach().numpy(), atol=5e-6, rtol=0,
                                   err_msg=f"step {step_i} bias")
