"""Golden-value tests for positional encoding (ported from reference
``tests/nerf_model_test.py:41-63``)."""

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu.ops.encoding import normalize_coordinates, positional_encoding


def test_positional_encoding_shape():
    enc = positional_encoding(jnp.array([[1.0, 1.0, 1.0]]), dim=1)
    assert enc.shape == (1, 6)


def test_positional_encoding_values():
    # cos(pi * 1) = -1, sin(pi * 1) = 0; cos block before sin block.
    enc = positional_encoding(jnp.array([[1.0, 1.0, 1.0]]), dim=1)
    expected = np.array([[-1.0, -1.0, -1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(enc, expected, atol=1e-6)


def test_complex_positional_encoding_values():
    enc = positional_encoding(
        jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]), dim=1
    )
    expected = np.array(
        [[1.0, 1.0, 1.0, 0.0, 0.0, 0.0], [-1.0, -1.0, -1.0, 0.0, 0.0, 0.0]]
    )
    np.testing.assert_allclose(enc, expected, atol=1e-6)


def test_3d_positional_encoding_shape():
    samples = jax.random.uniform(jax.random.PRNGKey(0), (128, 64, 3))
    enc = positional_encoding(samples, dim=10)
    assert enc.shape == (128, 64, 60)


def test_frequency_major_layout():
    # channel layout must be (freq, [cos|sin], C): enc[..., 2*dim_block] order.
    x = jnp.array([[0.1, 0.2, 0.3]])
    dim = 3
    enc = np.asarray(positional_encoding(x, dim=dim))
    xf = np.asarray(x)
    manual = []
    for i in range(dim):
        manual.append(np.cos(2**i * np.pi * xf))
        manual.append(np.sin(2**i * np.pi * xf))
    manual = np.concatenate(manual, axis=-1)
    np.testing.assert_allclose(enc, manual, rtol=1e-5, atol=1e-6)


def test_normalize_coordinates():
    x = jnp.array([np.pi, -np.pi, 0.0])
    np.testing.assert_allclose(
        normalize_coordinates(x), np.array([1.0, -1.0, 0.0]), atol=1e-7
    )
