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
