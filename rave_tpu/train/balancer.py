"""Loss-balancer tombstone.

The reference disabled its gradient-based loss balancer but keeps the
symbol for checkpoint compatibility (rave/balancer.py:5-11). Mirrored here
so configs referencing a balancer fail loudly with the same guidance.
"""
from __future__ import annotations


class Balancer:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "The loss balancer is disabled; remove `balancer` from the "
            "configuration (static loss weights in train.weights are used "
            "instead)."
        )
