"""Loader that executes dep-light PyTorch reference modules directly.

The parity oracle (tests/test_reference_parity.py) runs the reference's
actual code (torch CPU) against this framework. The reference's heavy
packaging deps (gin, lightning, lmdb, GPUtil, librosa, udls, cached_conv)
are stubbed — none of the stubbed symbols participate in the functions
under test. Two source-level substitutions adapt the reference to the
installed scipy (>=1.13 removed `scipy.signal.kaiser` and firwin's
`nyq=`); they change no math. torchaudio's Spectrogram is recreated on
torch.stft with its documented defaults (hann window, centered reflect
padding, power=None -> complex)."""
import sys, types
from pathlib import Path

REF = Path("/root/reference")

def _gin_stub():
    g = types.ModuleType("gin")
    def configurable(*a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f
    g.configurable = configurable
    g.register = configurable
    g.external_configurable = lambda *a, **k: (a[0] if a else None)
    return g

def _pl_stub():
    pl = types.ModuleType("pytorch_lightning")
    class Callback: pass
    class LightningModule: pass
    pl.Callback = Callback
    pl.LightningModule = LightningModule
    cb = __import__("types").ModuleType("pytorch_lightning.callbacks")
    class ModelCheckpoint:
        def __init__(self, *a, **k): pass
    cb.ModelCheckpoint = ModelCheckpoint
    pl.callbacks = cb
    import sys as _s; _s.modules["pytorch_lightning.callbacks"] = cb
    return pl

def _simple(name):
    return types.ModuleType(name)

def _cc_functional():
    """Functional offline-mode cached_conv shim: numerically identical to
    the real package with use_cached_conv(False) (drop-in nn.Conv1d /
    ConvTranspose1d with explicit (left, right) padding; sequential and
    branch combinators are plain containers with zero delay). state_dict
    key layout matches the real package (subclasses of the torch modules,
    `branches` ModuleList), so reference checkpoints map through
    rave_tpu/utils/import_torch.py unchanged."""
    import torch.nn as tnn
    import torch.nn.functional as F

    cc = types.ModuleType("cached_conv")
    cc.USE_BUFFER_CONV = False
    cc.MAX_BATCH_SIZE = 8
    cc.use_cached_conv = lambda b: setattr(cc, "USE_BUFFER_CONV", b)

    def get_padding(kernel_size, stride=1, dilation=1, mode="centered"):
        total = max(0, dilation * (kernel_size - 1) + 1 - stride)
        if mode == "centered":
            right = total // 2
            return (total - right, right)
        return (total, 0)

    cc.get_padding = get_padding

    class Conv1d(tnn.Conv1d):
        def __init__(self, *args, padding=0, cumulative_delay=0, **kwargs):
            super().__init__(*args, **kwargs)
            self._pad = (
                tuple(padding)
                if isinstance(padding, (tuple, list))
                else (padding, padding)
            )
            self.cumulative_delay = 0

        def forward(self, x):
            return super().forward(F.pad(x, self._pad))

    class ConvTranspose1d(tnn.ConvTranspose1d):
        def __init__(self, *args, cumulative_delay=0, **kwargs):
            super().__init__(*args, **kwargs)
            self.cumulative_delay = 0

    class CachedSequential(tnn.Sequential):
        def __init__(self, *modules, cumulative_delay=0, stride=1):
            super().__init__(*modules)
            self.cumulative_delay = 0

    class AlignBranches(tnn.Module):
        def __init__(self, *branches, delays=None, cumulative_delay=0,
                     stride=1, futures=None):
            super().__init__()
            self.branches = tnn.ModuleList(branches)
            self.cumulative_delay = 0

        def forward(self, x):
            return [b(x) for b in self.branches]

    class CachedPadding1d(tnn.Module):
        def __init__(self, padding, crop=False):
            super().__init__()
            self.padding = padding

        def forward(self, x):
            return F.pad(x, (self.padding, 0))

    cc.Conv1d = Conv1d
    cc.ConvTranspose1d = ConvTranspose1d
    cc.CachedSequential = CachedSequential
    cc.AlignBranches = AlignBranches
    cc.CachedPadding1d = CachedPadding1d
    return cc

def load_ref(relpath: str, modname: str):
    stubs = {
        "gin": _gin_stub(),
        "cached_conv": _cc_functional(),
        "GPUtil": _simple("GPUtil"),
        "librosa": _simple("librosa"),
        "lmdb": _simple("lmdb"),
        "pytorch_lightning": _pl_stub(),
        "torchaudio": _torchaudio_stub(),
        "udls": _simple("udls"),
    }
    inserted = []
    for n, m in stubs.items():
        if n not in sys.modules:
            sys.modules[n] = m
            inserted.append(n)
    src = (REF / relpath).read_text()
    if "from .core import" in src:
        # resolve the one relative import against an already-loaded core
        core = load_ref("rave/core.py", modname + "_core")
        sys.modules[modname + "_core"] = core
        src = src.replace("from .core import", f"from {modname}_core import")
    # scipy >= 1.13 moved kaiser to scipy.signal.windows
    src = src.replace(
        "from scipy.signal import firwin, kaiser, kaiser_beta, kaiserord",
        "from scipy.signal import firwin, kaiser_beta, kaiserord\n"
        "from scipy.signal.windows import kaiser",
    )
    # scipy >= 1.13 removed firwin's nyq= alias (fs = 2 * nyq)
    src = src.replace("nyq=np.pi", "fs=2 * np.pi")
    mod = types.ModuleType(modname)
    mod.__file__ = str(REF / relpath)
    exec(compile(src, str(REF / relpath), "exec"), mod.__dict__)
    return mod

def _torchaudio_stub():
    import torch
    ta = types.ModuleType("torchaudio")
    tr = types.ModuleType("torchaudio.transforms")
    class Spectrogram(torch.nn.Module):
        """torchaudio.transforms.Spectrogram semantics subset: hann window,
        center=True, reflect pad, power=None -> complex output."""
        def __init__(self, n_fft, win_length=None, hop_length=None,
                     normalized=False, power=None, center=True):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2
            self.normalized = normalized
            self.power = power
            self.center = center
            self.register_buffer("window", torch.hann_window(self.win_length))
        def forward(self, x):
            spec = torch.stft(
                x, self.n_fft, hop_length=self.hop_length,
                win_length=self.win_length, window=self.window,
                center=self.center, pad_mode="reflect",
                normalized=self.normalized, onesided=True,
                return_complex=True,
            )
            if self.power is not None:
                spec = spec.abs() ** self.power
            return spec
    tr.Spectrogram = Spectrogram
    ta.transforms = tr
    sys.modules["torchaudio.transforms"] = tr
    return ta
