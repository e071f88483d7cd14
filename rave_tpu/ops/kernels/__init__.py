from rave_tpu.ops.kernels.dilated_unit import fused_dilated_unit

__all__ = ["fused_dilated_unit"]
