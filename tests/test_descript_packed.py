"""Frequency-packed MRD critic == per-band reference formulation.

The packed path (ops/packed_conv.py, models/descript.py MRD.packed) is a
pure layout optimization: same parameters, same outputs, same gradients.
These tests pin that equivalence on the CPU mesh, including non-multiple-
of-4 band widths (mask/tail handling) and every (kernel, stride, pad)
combination the MRD spec uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.models.descript import MRD
from rave_tpu.ops import packed_conv as pc


@pytest.mark.parametrize(
    "K,stride,pad,F",
    [
        (9, 1, 4, 64),   # MRD conv0
        (9, 2, 4, 64),   # MRD conv1-3
        (3, 1, 1, 64),   # MRD conv4
        (9, 1, 4, 25),   # odd band widths (pack padding + masking)
        (9, 2, 4, 39),
        (3, 1, 1, 65),
        (9, 2, 4, 51),
    ],
)
def test_packed_conv_matches_direct(K, stride, pad, F):
    kx = jax.random.key(0)
    B, T, Ci, Co = 2, 11, 32, 32
    x = jax.random.normal(kx, (B, T, F, Ci), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, K, Ci, Co), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.key(2), (Co,), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, stride), ((1, 1), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b

    xp = pc.pack_freq(x)
    yp = pc.packed_conv(
        xp, w, b, n_bins_in=F, stride_t=1, stride_f=stride, pad_t=1, pad_f=pad
    )
    got = pc.unpack_freq(yp, pc.out_bins(F, K, stride, pad))

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("window", [512, 1024])
def test_mrd_packed_equivalence(window):
    """MRD(packed=True) == MRD(packed=False) with shared params: every
    fmap identical, end to end through the 5-band stack + post conv."""
    B, T = 2, 8192
    x = jax.random.normal(jax.random.key(0), (B, T, 1), jnp.float32) * 0.3

    ref_m = MRD(window_length=window, packed=False)
    pk_m = MRD(window_length=window, packed=True)
    variables = jax.jit(ref_m.init)(jax.random.key(1), x)

    ref = jax.jit(ref_m.apply)(variables, x)
    got = jax.jit(pk_m.apply)(variables, x)

    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_mrd_packed_fmaps_preserve_relative_loss():
    """packed_fmaps=True keeps packed (zero-masked) feature maps; the
    relative mean_difference (sum/sum) the descript configs use is exactly
    invariant to the zero pad bins, so the feature-matching and GAN losses
    are unchanged (train/steps.py:168-179 semantics)."""
    from rave_tpu.ops.dsp import mean_difference

    B, T, window = 2, 4096, 512
    x = jax.random.normal(jax.random.key(0), (2 * B, T, 1), jnp.float32) * 0.3
    ref_m = MRD(window_length=window, packed=False)
    pk_m = MRD(window_length=window, packed=True, packed_fmaps=True)
    variables = jax.jit(ref_m.init)(jax.random.key(1), x)

    ref = jax.jit(ref_m.apply)(variables, x)
    got = jax.jit(pk_m.apply)(variables, x)
    assert len(ref) == len(got)
    # final (post-conv) fmap — the GAN-loss input — is identical layout
    np.testing.assert_allclose(
        np.asarray(got[-1]), np.asarray(ref[-1]), atol=1e-4
    )
    # relative feature-matching distance per layer pair is preserved
    for a_ref, b_ref, a_pk, b_pk in zip(
        (f[:B] for f in ref), (f[B:] for f in ref),
        (f[:B] for f in got), (f[B:] for f in got),
    ):
        d_ref = mean_difference(a_ref, b_ref, norm="L1", relative=True)
        d_pk = mean_difference(a_pk, b_pk, norm="L1", relative=True)
        np.testing.assert_allclose(
            float(d_pk), float(d_ref), rtol=1e-5, atol=1e-6
        )


def test_mrd_packed_gradients_match():
    B, T, window = 2, 4096, 512
    x = jax.random.normal(jax.random.key(0), (B, T, 1), jnp.float32) * 0.3
    ref_m = MRD(window_length=window, packed=False)
    pk_m = MRD(window_length=window, packed=True)
    variables = jax.jit(ref_m.init)(jax.random.key(1), x)

    def loss(mod):
        def f(params, xi):
            fs = mod.apply({"params": params}, xi)
            return sum(jnp.sum(t**2) for t in fs)
        return jax.jit(jax.grad(f, argnums=(0, 1)))

    gp_ref, gx_ref = loss(ref_m)(variables["params"], x)
    gp_pk, gx_pk = loss(pk_m)(variables["params"], x)

    # elementwise: loose enough for fp32 cancellation noise (observed ~1e-3
    # relative on <0.1% of elements); a wrong kernel tap would be O(1) off
    np.testing.assert_allclose(
        np.asarray(gx_pk), np.asarray(gx_ref), rtol=5e-3, atol=5e-2
    )
    # and tight in aggregate
    num = np.linalg.norm(np.asarray(gx_pk) - np.asarray(gx_ref))
    den = np.linalg.norm(np.asarray(gx_ref))
    assert num / den < 1e-4
    # per-parameter norm agreement (measured ~3e-7; elementwise outliers are
    # fp32 cancellation noise on near-zero grads among 1e4-magnitude ones)
    for (path_r, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gp_ref)[0],
        jax.tree_util.tree_flatten_with_path(gp_pk)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        assert rel < 1e-5, f"{jax.tree_util.keystr(path_r)}: relnorm {rel}"
