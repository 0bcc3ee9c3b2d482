from yolo_nano_tpu.ops.pallas.fused_conv import (  # noqa: F401
    fused_dw_pw,
    fused_dw_pw_reference,
    pallas_enabled,
    set_pallas_enabled,
)
