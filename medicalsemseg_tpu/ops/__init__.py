from medicalsemseg_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    shift_window_attn_mask,
    relative_position_index,
    pad_to_multiple,
)
