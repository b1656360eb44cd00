"""Orbax checkpointing with the reference's best/periodic/cleanup policy.

Reference behaviour (utils/misc.py:268-305, :443-451; run_training.py:145-163,
:186): rank-0 saves {model, optimizer, epoch, scaler, scheduler, cfg}; a
'best_model' file tracks the best val mDice; 'checkpoint-{epoch}' every
save_ckpt_freq epochs; all but the last periodic checkpoint deleted at run
end; --resume restores everything including start_epoch.

Here the whole TrainState pytree {params, batch_stats, opt_state, step} plus
{epoch} is one orbax save — the GradScaler and LR scheduler have no state to
save (bf16 needs no scaler; the LR schedule is a pure function of step).
"""

from __future__ import annotations

import os
import shutil
from typing import List, Tuple

import numpy as np
import orbax.checkpoint as ocp

from medicalsemseg_tpu.train.state import TrainState


def _ckpt_dir(output_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(output_dir, name))


def save_checkpoint(output_dir: str, name: str, state: TrainState,
                    epoch: int) -> str:
    """Save state+epoch under output_dir/name (overwrites)."""
    path = _ckpt_dir(output_dir, name)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(epoch, np.int32),
    }
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Restore into an existing (abstract) state; returns (state, next_epoch)
    — resume semantics of reference load_model (utils/misc.py:287-305)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(0, np.int32),
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
    return new_state, int(restored["epoch"]) + 1


def load_params_only(path: str, state: TrainState) -> TrainState:
    """Eval/test restore: params (+ batch stats) only
    (reference: run_test.py:47-49)."""
    new_state, _ = load_checkpoint(path, state)
    return state.replace(params=new_state.params,
                         batch_stats=new_state.batch_stats)


def cleanup_checkpoints(checkpoint_dirs: List[str]) -> None:
    """Delete all but the newest periodic checkpoint
    (reference: utils/misc.py:443-451)."""
    for p in checkpoint_dirs[:-1]:
        try:
            shutil.rmtree(p)
            print(f"Removed old checkpoint {p} successfully!")
        except OSError as e:
            print(f"Could not remove {p}: {e}")
