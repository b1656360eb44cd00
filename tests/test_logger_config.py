"""SmoothedValue/MetricLogger and config round-trip tests."""

import numpy as np

from medicalsemseg_tpu.config import Config, get_args
from medicalsemseg_tpu.utils.logger import MetricLogger, SmoothedValue


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.value == 4.0
    assert v.avg == 3.0          # window (2,3,4)
    assert v.median == 3.0
    assert v.global_avg == 2.5   # all four
    assert v.max == 4.0


def test_metric_logger_updates_and_format():
    ml = MetricLogger()
    ml.update(loss=1.0, mDice=0.5)
    ml.update(loss=3.0, mDice=np.nan)  # NaNs dropped
    assert ml.meters["loss"].global_avg == 2.0
    assert ml.meters["mDice"].count == 1
    s = ml.log_all_average()
    assert "loss" in s and "mDice" in s


def test_metric_logger_log_every_iterates():
    ml = MetricLogger()
    seen = list(ml.log_every(range(5), print_freq=2, header="t"))
    assert seen == [0, 1, 2, 3, 4]


def test_config_cli_roundtrip_defaults():
    cfg = get_args([])
    d = Config()
    assert cfg.model == d.model
    assert cfg.vol_size == 96
    assert cfg.lr == d.lr
    assert cfg.use_pallas_attention is True


def test_grad_accum_flag():
    cfg = get_args(["--grad_accum_steps", "4"])
    assert cfg.grad_accum_steps == 4


def test_grad_accum_optimizer_semantics():
    import jax
    import jax.numpy as jnp
    import optax

    from medicalsemseg_tpu.train.state import make_optimizer

    cfg = Config(grad_accum_steps=2, lr=1e-2, warmup_epochs=0, epochs=10,
                 gradient_clipping=None, weight_decay=0.0)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.ones((2, 2))}
    state = tx.init(params)
    g = {"w": jnp.full((2, 2), 0.5)}
    up1, state = tx.update(g, state, params)
    # first micro-step: no parameter change yet
    assert float(jnp.abs(up1["w"]).max()) == 0.0
    up2, state = tx.update(g, state, params)
    assert float(jnp.abs(up2["w"]).max()) > 0.0


def test_tag_builder_matches_reference_semantics():
    from medicalsemseg_tpu.utils.tags import tag_builder

    cfg = Config(model="nnFormerUNETR", task="Task03_Liver")
    assert tag_builder(cfg) == ["Finetuning", "nnFormerUNETR", "3D",
                                "Decathlon", "Task03_Liver"]
    cfg = Config(model="SwinDepth", task="Abdomen", input_dim=2)
    assert tag_builder(cfg) == ["Finetuning", "SwinDepth", "2D", "BTCV",
                                "Abdomen"]
