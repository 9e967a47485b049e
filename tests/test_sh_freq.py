"""SH / frequency encoder tests: orthonormality + pinned reference values."""

import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.ops import freq_encode, freq_output_dim, sh_encode, sh_output_dim


def _uniform_sphere(n, rng):
    v = rng.standard_normal((n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.mark.parametrize("degree", [2, 4, 8])
def test_sh_orthonormal(degree, rng):
    """Real SH are orthonormal: 4*pi*E[Y_i Y_j] = delta_ij on the sphere."""
    d = _uniform_sphere(100_000, rng).astype(np.float32)
    Y = np.asarray(sh_encode(jnp.asarray(d), degree))
    assert Y.shape == (d.shape[0], sh_output_dim(degree))
    G = 4 * np.pi * (Y.T @ Y) / d.shape[0]
    np.testing.assert_allclose(G, np.eye(Y.shape[1]), atol=0.15)


def test_sh_pinned_values():
    """Spot-check signs/coefficients at cardinal directions
    (vs shencoder.cu:50-68 closed forms)."""
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    Y = np.asarray(sh_encode(d, 4))
    c0, c1 = 0.28209479177387814, 0.48860251190291987
    np.testing.assert_allclose(Y[:, 0], c0, rtol=1e-6)
    # component 1 = -c1*y, 2 = c1*z, 3 = -c1*x
    np.testing.assert_allclose(Y[0, 3], -c1, rtol=1e-6)
    np.testing.assert_allclose(Y[1, 1], -c1, rtol=1e-6)
    np.testing.assert_allclose(Y[2, 2], c1, rtol=1e-6)
    # component 6 = 0.9462*z^2 - 0.3154
    np.testing.assert_allclose(Y[2, 6], 0.94617469575755997 - 0.31539156525251999, rtol=1e-5)
    # component 12 = 0.3732*z*(5z^2-3)
    np.testing.assert_allclose(Y[2, 12], 0.3731763325901154 * 2.0, rtol=1e-5)


def test_freq_encode(rng):
    x = rng.standard_normal((5, 3)).astype(np.float32)
    out = np.asarray(freq_encode(jnp.asarray(x), degree=2))
    assert out.shape == (5, freq_output_dim(3, 2))
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    np.testing.assert_allclose(out[:, 3:6], np.sin(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 6:9], np.cos(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 9:12], np.sin(2 * x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 12:15], np.cos(2 * x), rtol=1e-5, atol=1e-6)
