"""Numerical parity against the actual PyTorch reference (BASELINE.md
north star: "multiscale spectral distance within 1e-3 of reference;
encode/decode ops within fp32 tolerance").

The reference's dep-light modules (rave/core.py losses, rave/pqmf.py,
rave/quantization.py) are executed directly on torch CPU via
tests/_reference_oracle.py and compared with this framework's
implementations on identical inputs."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._reference_oracle import load_ref


@pytest.fixture(scope="module")
def ref_core():
    return load_ref("rave/core.py", "ref_core")


@pytest.fixture(scope="module")
def ref_pqmf():
    return load_ref("rave/pqmf.py", "ref_pqmf")


@pytest.fixture(scope="module")
def ref_quant():
    return load_ref("rave/quantization.py", "ref_quant")


def test_dsp_helpers_match_reference(ref_core):
    from rave_tpu.ops import dsp as our

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64)).astype(np.float32)
    np.testing.assert_allclose(
        ref_core.mod_sigmoid(torch.from_numpy(x)).numpy(),
        np.asarray(our.mod_sigmoid(jnp.asarray(x))),
        atol=1e-5,
    )
    amp = np.abs(rng.standard_normal((2, 8, 33)).astype(np.float32))
    np.testing.assert_allclose(
        ref_core.amp_to_impulse_response(torch.from_numpy(amp), 64).numpy(),
        np.asarray(our.amp_to_impulse_response(jnp.asarray(amp), 64)),
        atol=1e-6,
    )
    s1 = rng.standard_normal((2, 8, 64)).astype(np.float32)
    s2 = rng.standard_normal((2, 8, 64)).astype(np.float32)
    np.testing.assert_allclose(
        ref_core.fft_convolve(torch.from_numpy(s1), torch.from_numpy(s2)).numpy(),
        np.asarray(our.fft_convolve(jnp.asarray(s1), jnp.asarray(s2))),
        atol=2e-5,
    )


def test_audio_distance_within_1e3_of_reference(ref_core):
    """The v1/v2 training objective: relative-L2 linear + L1 log multiscale
    spectral distance over scales [2048..128] (reference core.py:322-344).
    Measured agreement is ~1e-7 relative; the north-star bar is 1e-3."""
    from rave_tpu.config import compose
    from rave_tpu.factory import build_audio_distance

    dist = build_audio_distance(compose(["v2"]))
    ad = ref_core.AudioDistanceV1(
        lambda: ref_core.MultiScaleSTFT(
            scales=[2048, 1024, 512, 256, 128], sample_rate=44100
        ),
        1e-7,
    )
    rng = np.random.default_rng(4)
    xa = (rng.standard_normal((2, 1, 16384)) * 0.3).astype(np.float32)
    xb = (xa + 0.05 * rng.standard_normal((2, 1, 16384))).astype(np.float32)
    with torch.no_grad():
        d_ref = float(
            ad(torch.from_numpy(xa), torch.from_numpy(xb))["spectral_distance"]
        )
    d_our = float(
        sum(
            dist(
                jnp.asarray(xa.transpose(0, 2, 1)),
                jnp.asarray(xb.transpose(0, 2, 1)),
            ).values()
        )
    )
    assert abs(d_ref - d_our) / d_ref < 1e-3, (d_ref, d_our)


def test_pqmf_matches_reference(ref_pqmf):
    """Prototype design is bit-identical; polyphase analysis and the full
    round trip agree with the reference's PQMF to fp32 tolerance."""
    from rave_tpu.ops import pqmf as our

    h_ref = np.asarray(ref_pqmf.get_prototype(100, 16))
    h_our = np.asarray(our.get_prototype(100, 16))
    np.testing.assert_array_equal(h_ref, h_our)

    m = ref_pqmf.PQMF(100, 16, polyphase=True)
    x = (np.random.default_rng(0).standard_normal((1, 1, 8192)) * 0.3).astype(
        np.float32
    )
    with torch.no_grad():
        z_ref = m(torch.from_numpy(x))
        y_ref = m.inverse(z_ref).numpy()
    bank = our.PQMFBank.build(100, 16)
    z_our = np.asarray(bank.analyze(jnp.asarray(x[:, 0, :])))
    y_our = np.asarray(bank.synthesize(jnp.asarray(z_our)))
    scale = np.abs(z_ref.numpy()).max()
    np.testing.assert_allclose(
        z_ref.numpy().transpose(0, 2, 1) / scale, z_our / scale, atol=2e-5
    )
    np.testing.assert_allclose(y_ref[:, 0, :], y_our, atol=1e-4)


def test_rvq_encode_decode_matches_reference(ref_quant):
    """Nearest-code search and residual decode agree index-for-index with
    the reference RVQ given identical codebooks."""
    from rave_tpu.models.quantization import ResidualVectorQuantization as RVQ

    D, CS, Q = 16, 64, 4
    rng = np.random.default_rng(1)
    embeds = [rng.standard_normal((CS, D)).astype(np.float32) for _ in range(Q)]

    rvq_ref = ref_quant.ResidualVectorQuantization(
        num_quantizers=Q, dim=D, codebook_size=CS, kmeans_init=False
    )
    rvq_ref.eval()
    with torch.no_grad():
        for i, layer in enumerate(rvq_ref.layers):
            layer._codebook.embed.copy_(torch.from_numpy(embeds[i]))
    x = rng.standard_normal((2, D, 32)).astype(np.float32)
    with torch.no_grad():
        idx_ref = rvq_ref.encode(torch.from_numpy(x)).numpy()  # [B, Q, T]
        dec_ref = rvq_ref.decode(torch.from_numpy(idx_ref)).numpy()  # [B, D, T]

    rvq = RVQ(num_quantizers=Q, dim=D, codebook_size=CS, kmeans_init=False)
    vars0 = rvq.init({"params": jax.random.key(0)}, jnp.zeros((1, 8, D)))
    cb = jax.tree_util.tree_map(lambda v: v, dict(vars0["codebook"]))
    for i in range(Q):
        cb[f"vq_{i}"]["codebook"]["embed"] = jnp.asarray(embeds[i])
    variables = {**vars0, "codebook": cb}
    # ours is channels-last [B, T, D]
    x_our = jnp.asarray(x.transpose(0, 2, 1))
    idx_our = rvq.apply(variables, x_our, method="encode")  # [B, Q, T]
    np.testing.assert_array_equal(idx_ref, np.asarray(idx_our))
    dec_our = rvq.apply(variables, idx_our, method="decode")  # [B, T, D]
    np.testing.assert_allclose(
        dec_ref, np.asarray(dec_our).transpose(0, 2, 1), atol=1e-6
    )


@pytest.fixture(scope="module")
def ref_prior_core():
    return load_ref("rave/prior/core.py", "ref_prior_core")


def test_prior_core_matches_reference(ref_prior_core):
    """QuantizedNormal (erf-CDF binning, one-hot stacking, dither-free
    decode) and DiagonalShift match rave/prior/core.py:6-75 exactly up to
    the channels-last transpose."""
    from rave_tpu.prior.core import DiagonalShift, QuantizedNormal

    rng = np.random.default_rng(7)
    D, R, B, T = 4, 16, 2, 12
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # reference is [B, D, T]

    qn = QuantizedNormal(R, dither=False)
    ref = ref_prior_core.QuantizedNormal(R, dither=False)
    ours_oh = np.asarray(qn.encode(jnp.asarray(x)))
    ref_oh = ref.encode(xt).numpy()
    np.testing.assert_array_equal(ours_oh, ref_oh.transpose(0, 2, 1))

    ours_dec = np.asarray(qn.decode(jnp.asarray(ours_oh)))
    ref_dec = ref.decode(torch.from_numpy(ref_oh)).numpy()
    np.testing.assert_allclose(
        ours_dec, ref_dec.transpose(0, 2, 1), atol=1e-5
    )

    ds, rds = DiagonalShift(), ref_prior_core.DiagonalShift()
    np.testing.assert_allclose(
        np.asarray(ds(jnp.asarray(x))),
        rds(xt).numpy().transpose(0, 2, 1),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(ds.inverse(jnp.asarray(x))),
        rds.inverse(xt).numpy().transpose(0, 2, 1),
        atol=0,
    )


def test_gan_losses_match_reference(ref_core):
    from rave_tpu.ops import dsp as our

    rng = np.random.default_rng(3)
    sr = rng.standard_normal((4, 33)).astype(np.float32)
    sf = rng.standard_normal((4, 33)).astype(np.float32)
    for name in ("hinge_gan", "ls_gan", "nonsaturating_gan"):
        rd, rg = getattr(ref_core, name)(
            torch.from_numpy(sr), torch.from_numpy(sf)
        )
        od, og = getattr(our, name)(jnp.asarray(sr), jnp.asarray(sf))
        np.testing.assert_allclose(float(od), float(rd), atol=1e-6)
        np.testing.assert_allclose(float(og), float(rg), atol=1e-6)
