from rave_tpu.ops.dsp import (
    amp_to_impulse_response,
    fft_convolve,
    mean_difference,
    mod_sigmoid,
)
from rave_tpu.ops.pqmf import PQMFBank
from rave_tpu.ops.stft import MultiScaleSTFT, mel_filterbank, spectrogram

__all__ = [
    "mod_sigmoid",
    "amp_to_impulse_response",
    "fft_convolve",
    "mean_difference",
    "PQMFBank",
    "MultiScaleSTFT",
    "spectrogram",
    "mel_filterbank",
]
