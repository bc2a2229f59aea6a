"""fetch_tree: packed-transfer pytree fetch (utils/transfer.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.utils.transfer import fetch_tree


def test_fetch_tree_roundtrip_dtypes():
    tree = {
        'f32': jnp.arange(12, dtype=jnp.float32).reshape(3, 4) * 1.5,
        'bf16': jnp.linspace(-2, 2, 8).astype(jnp.bfloat16).reshape(2, 4),
        'i32': jnp.arange(-3, 3, dtype=jnp.int32),
        'b': jnp.asarray([True, False, True]),
        'host': np.ones((2, 2), np.float32),
        'nested': [jnp.zeros((1,), jnp.float32),
                   {'u8': jnp.arange(5, dtype=jnp.uint8)}],
    }
    out = fetch_tree(tree)
    ref = jax.tree.map(np.asarray, tree)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        assert isinstance(a, np.ndarray)
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_fetch_tree_many_leaves_exact():
    # concurrent path (many device leaves): bit-exact vs sequential fetch
    rng = np.random.default_rng(0)
    tree = [jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
            for _ in range(9)]
    out = fetch_tree(tree, workers=4)
    for a, leaf in zip(out, tree):
        np.testing.assert_array_equal(a, np.asarray(leaf))


def test_fetch_tree_empty_and_host_only():
    assert fetch_tree({}) == {}
    t = {'x': np.arange(3)}
    out = fetch_tree(t)
    np.testing.assert_array_equal(out['x'], t['x'])
