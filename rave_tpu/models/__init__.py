from rave_tpu.models import blocks, discriminators, quantization
from rave_tpu.models.rave import RAVE

__all__ = ["blocks", "discriminators", "quantization", "RAVE"]
