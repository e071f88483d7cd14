from rave_tpu.prior.core import DiagonalShift, QuantizedNormal
from rave_tpu.prior.model import Prior

__all__ = ["Prior", "QuantizedNormal", "DiagonalShift"]
