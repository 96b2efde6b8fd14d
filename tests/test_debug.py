import numpy as np
import jax.numpy as jnp
import pytest

from detectorch_tpu.utils.debug import assert_finite_tree, checked


def test_checked_passes_clean_fn():
    fn = checked(lambda x: jnp.sqrt(x) * 2)
    out = fn(jnp.asarray([1.0, 4.0]))
    np.testing.assert_allclose(np.asarray(out), [2.0, 4.0])


def test_checked_catches_nan():
    fn = checked(lambda x: jnp.log(x))
    with pytest.raises(Exception):
        fn(jnp.asarray([-1.0]))


def test_assert_finite_tree():
    assert_finite_tree({"a": np.ones(3), "b": [np.zeros(2)]})
    with pytest.raises(AssertionError):
        assert_finite_tree({"a": np.array([1.0, np.nan])})
