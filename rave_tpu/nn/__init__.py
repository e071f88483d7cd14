from rave_tpu.nn.conv import Conv1d, ConvTranspose1d, get_padding
from rave_tpu.nn.combinators import AlignBranches, Residual, Sequential, StreamDelay
from rave_tpu.nn.gru import GRU
from rave_tpu.nn.streaming import init_stream_state, stream_apply, stream_chunks

__all__ = [
    "Conv1d",
    "ConvTranspose1d",
    "get_padding",
    "Sequential",
    "AlignBranches",
    "Residual",
    "StreamDelay",
    "GRU",
    "init_stream_state",
    "stream_apply",
    "stream_chunks",
]
