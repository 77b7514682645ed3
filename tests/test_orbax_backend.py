"""Optional orbax checkpoint backend (skips when orbax is unavailable)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.core import checkpoint

orbax = pytest.importorskip("orbax.checkpoint")


def test_orbax_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    path = str(tmp_path / "ckpt")
    assert checkpoint.save_pytree_orbax(tree, path)
    restored = checkpoint.load_pytree_orbax(
        {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))}, path)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(restored["b"]), np.ones((3,)))
