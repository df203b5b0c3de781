"""Oracle T-F mask ops (avsi/ops/masks.py) — incl. the silent-frame guard.

The reference's get_oracle_iam/ipsm (audio_processing.py:167-184) produce
NaN on 0/0 silent frames; avsi deliberately guards the division (documented
deviation).  These tests pin both the guard and the plain-ratio values.
"""

import numpy as np

import jax
import jax.numpy as jnp

from avsi.ops import masks as mask_ops


def _complex(rng, shape):
    return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(np.complex64)


def test_oracle_iam_values_and_clip():
    rng = np.random.RandomState(0)
    t = _complex(rng, (2, 5, 7))
    m = _complex(rng, (2, 5, 7)) * 0.01  # small denominator -> exercises clip
    got = np.asarray(mask_ops.oracle_iam(jnp.asarray(t), jnp.asarray(m), clip_value=10.0))
    want = np.clip(np.abs(t) / np.abs(m), 0.0, 10.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_oracle_masks_silent_frames_are_nan_free():
    rng = np.random.RandomState(1)
    t = _complex(rng, (1, 4, 3))
    m = _complex(rng, (1, 4, 3))
    t[0, 2] = 0.0
    m[0, 2] = 0.0  # digital silence in both -> reference would yield NaN
    iam = np.asarray(mask_ops.oracle_iam(jnp.asarray(t), jnp.asarray(m)))
    ipsm = np.asarray(mask_ops.oracle_ipsm(jnp.asarray(t), jnp.asarray(m)))
    assert np.isfinite(iam).all()
    assert np.isfinite(ipsm).all()
    np.testing.assert_array_equal(iam[0, 2], 0.0)
    np.testing.assert_array_equal(ipsm[0, 2], 0.0)


def test_oracle_iam_gradient_nan_free_at_zero_denominator():
    t = jnp.zeros((2, 3), jnp.complex64)
    m = jnp.zeros((2, 3), jnp.complex64)

    def loss(t_re):
        iam = mask_ops.oracle_iam(t_re.astype(jnp.complex64), m)
        return jnp.sum(iam)

    g = jax.grad(loss)(jnp.zeros((2, 3), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_sequence_mask_matches_tf_semantics():
    got = np.asarray(mask_ops.sequence_mask(jnp.asarray([0, 2, 4]), 4))
    want = np.array(
        [[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]], dtype=np.float32
    )
    np.testing.assert_array_equal(got, want)
