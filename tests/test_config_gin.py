"""Reference .gin ingestion round trip.

The reference configures itself through gin files (scripts/train.py:153-156)
and re-instantiates exports from a run's config.gin
(scripts/export.py:497-500). rave_tpu/config_gin.py translates that grammar
onto the dataclass config; this suite proves the translation by parsing
every stock reference gin and asserting dataclass equality with the
matching preset, plus a hand-written custom gin and the compose() path.
"""
import dataclasses
from pathlib import Path

import pytest

from rave_tpu.config import PRESETS, RaveConfig, compose
from rave_tpu.config_gin import GinParseError, apply_gin_file, config_from_gin

REF_CONFIGS = Path("/root/reference/rave/configs")

STOCK = [
    "v1", "v2", "v2_small", "v2_nopqmf", "v2_nopqmf_small", "v2_with_augs",
    "v3", "discrete", "discrete_v3", "wasserstein", "spherical", "hybrid",
    "onnx", "raspberry", "causal", "snake", "adain", "noise",
    "spectral_discriminator", "descript_discriminator", "normalize_ambient",
]

needs_ref = pytest.mark.skipif(
    not REF_CONFIGS.is_dir(), reason="reference gin files not available"
)


def _diff(a: RaveConfig, b: RaveConfig) -> str:
    out = []

    def walk(x, y, prefix=""):
        if dataclasses.is_dataclass(x):
            for f in dataclasses.fields(x):
                walk(getattr(x, f.name), getattr(y, f.name), f"{prefix}{f.name}.")
        elif x != y:
            out.append(f"{prefix[:-1]}: gin={x!r} preset={y!r}")

    walk(a, b)
    return "\n".join(out)


@needs_ref
@pytest.mark.parametrize("name", STOCK)
def test_stock_gin_roundtrip(name):
    """Parsing each stock reference gin must reproduce the matching preset
    exactly (the Done criterion for gin ingestion)."""
    parsed = config_from_gin(str(REF_CONFIGS / f"{name}.gin"), strict=True)
    expected = compose([name])
    assert parsed == expected, f"{name}.gin diverges:\n{_diff(parsed, expected)}"


@needs_ref
def test_gin_stacking_matches_preset_stacking():
    """Multi-gin stacking (the reference's multi --config CLI) equals the
    preset stack for a representative combination."""
    cfg = config_from_gin(str(REF_CONFIGS / "v2.gin"))
    for overlay in ("causal", "snake"):
        apply_gin_file(cfg, str(REF_CONFIGS / f"{overlay}.gin"))
    assert cfg == compose(["v2", "causal", "snake"])


def test_custom_gin(tmp_path):
    """A hand-written user gin: include a stock config by name, override
    macros, bind fields the reference grammar allows."""
    gin = tmp_path / "mymodel.gin"
    gin.write_text(
        """
from __gin__ import dynamic_registration
import rave
from rave import blocks

include "configs/v2.gin"

CAPACITY = 32            # smaller model
LATENT_SIZE = 16
RATIOS = [4, 4, 2]

blocks.EncoderV2:
    dilations = [[1, 3], [1, 3], [1]]

rave.RAVE:
    update_discriminator_every = 2
    weights = {'feature_matching': 5}

rave.BetaWarmupCallback:
    initial_value = 1e-4
    target_value = 0.2
    warmup_len = 1000
"""
    )
    cfg = config_from_gin(str(gin))
    base = compose(["v2"])
    assert cfg.name == "mymodel"
    assert cfg.capacity == 32 and cfg.discriminator.capacity == 32
    assert cfg.latent_size == 16
    assert cfg.ratios == (4, 4, 2)
    assert cfg.encoder.dilations == ((1, 3), (1, 3), (1,))
    assert cfg.train.update_discriminator_every == 2
    assert cfg.train.weights["feature_matching"] == 5.0
    assert (cfg.train.beta_initial, cfg.train.beta_target,
            cfg.train.beta_warmup_len) == (1e-4, 0.2, 1000)
    # untouched fields still track the included stock config
    assert cfg.train.valid_signal_crop == base.train.valid_signal_crop
    assert cfg.kernel_size == base.kernel_size


def test_compose_accepts_gin_paths(tmp_path):
    """compose() (and therefore every CLI --config flag) ingests .gin
    paths in-place, stacking with presets and overrides."""
    gin = tmp_path / "tweak.gin"
    gin.write_text("CAPACITY = 24\n")
    cfg = compose(["v2", str(gin)], overrides=["latent_size=32"])
    assert cfg.capacity == 24 and cfg.discriminator.capacity == 24
    assert cfg.latent_size == 32
    assert cfg.name == "v2"  # a macro tweak is an overlay, not a model root


def test_undefined_macro_raises(tmp_path):
    gin = tmp_path / "bad.gin"
    gin.write_text("blocks.EncoderV2:\n    ratios = %UNDEFINED_THING\n")
    with pytest.raises(GinParseError):
        config_from_gin(str(gin))


def test_strict_flags_unknown_bindings(tmp_path):
    gin = tmp_path / "odd.gin"
    gin.write_text("some.unknown.Thing:\n    param = 3\n")
    with pytest.raises(GinParseError):
        config_from_gin(str(gin), strict=True)
    config_from_gin(str(gin))  # lenient mode skips it


@needs_ref
def test_all_presets_have_gin_or_are_native():
    """Every stock reference gin has a preset counterpart under the same
    name (inventory completeness both ways)."""
    stock = {p.stem for p in REF_CONFIGS.glob("*.gin")}
    assert stock <= set(STOCK)
    assert set(STOCK) <= set(PRESETS)


# ---------------------------------------------------------------------------
# augmentation + prior gin files (VERDICT r4 item 6: a reference user's
# literal `--augment mute.gin` and `configs/prior/prior_v1.gin` must work
# unchanged — reference scripts/train.py:127-132, prior_v1.gin:1-8)
# ---------------------------------------------------------------------------

AUG_GINS = REF_CONFIGS / "augmentations"


@needs_ref
@pytest.mark.parametrize("name,cls", [
    ("mute", "RandomMute"), ("compress", "RandomCompress"),
    ("gain", "RandomGain"),
])
def test_stock_augmentation_gin(name, cls):
    """Each stock augmentation gin parses to one instance of the right
    transform class with the reference class defaults."""
    from rave_tpu.config_gin import augmentations_from_gin
    from rave_tpu.data.transforms import get_augmentations

    specs = augmentations_from_gin(str(AUG_GINS / f"{name}.gin"))
    assert len(specs) == 1 and f'"{cls}"' in specs[0]
    (t,) = get_augmentations([str(AUG_GINS / f"{name}.gin")], sr=44100)
    assert type(t).__name__ == cls
    # reference class defaults carried through
    if cls == "RandomMute":
        assert t.p == 0.1
    elif cls == "RandomGain":
        assert t.prob == 0.5 and tuple(t.gain_range) == (-6, 3)
    elif cls == "RandomCompress":
        assert t.prob == 0.8 and t.threshold == -40


def test_custom_augmentation_gin(tmp_path):
    """A user gin with parameter bindings applies them onto the emitted
    transform; the last add_augmentation binding wins (the reference calls
    add_augmentation() once per file)."""
    from rave_tpu.data.transforms import get_augmentations

    g = tmp_path / "my.gin"
    g.write_text(
        "transforms.RandomGain.gain_range = (-12, 0)\n"
        "transforms.RandomGain.prob = 0.9\n"
        "add_augmentation:\n"
        "    aug = @augmentations/transforms.RandomGain()\n"
    )
    (t,) = get_augmentations([str(g)], sr=44100)
    assert type(t).__name__ == "RandomGain"
    assert tuple(t.gain_range) == (-12, 0) and t.prob == 0.9


def test_augment_gin_name_fallback():
    """`--augment mute.gin` with no such file resolves to the built-in."""
    from rave_tpu.data.transforms import get_augmentations

    (t,) = get_augmentations(["mute.gin"], sr=44100)
    assert type(t).__name__ == "RandomMute" and t.p == 0.1


@needs_ref
def test_prior_gin_roundtrip():
    """configs/prior/prior_v1.gin parses to exactly the stock train_prior
    architecture kwargs (sr is derived from the run dir, not the gin)."""
    from rave_tpu.config_gin import prior_kwargs_from_gin

    kw = prior_kwargs_from_gin(str(REF_CONFIGS / "prior" / "prior_v1.gin"))
    assert kw == dict(resolution=32, res_size=512, skp_size=256,
                      kernel_size=3, cycle_size=4, n_layers=10)


def test_prior_gin_rejects_empty(tmp_path):
    g = tmp_path / "empty.gin"
    g.write_text("# nothing here\n")
    with pytest.raises(GinParseError):
        from rave_tpu.config_gin import prior_kwargs_from_gin

        prior_kwargs_from_gin(str(g))
