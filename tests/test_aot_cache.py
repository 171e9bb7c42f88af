"""AOT executable cache round-trip (CPU backend)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from revisionllm_tpu.utils.aot_cache import LazyCachedProgram, load_or_compile


def _fn(x, w):
    return jnp.tanh(x @ w).sum(axis=-1)


class TestAotCache:
    def test_miss_then_hit(self, tmp_path):
        cache = str(tmp_path)
        x = jnp.ones((8, 16), jnp.float32)
        w = jnp.ones((16, 4), jnp.float32)
        c1 = load_or_compile(_fn, x, w, cache_dir=cache)
        out1 = np.asarray(c1(x, w))
        files = [f for f in os.listdir(cache) if f.endswith(".jaxexe")]
        assert len(files) == 1
        c2 = load_or_compile(_fn, x, w, cache_dir=cache)  # hit
        np.testing.assert_allclose(np.asarray(c2(x, w)), out1)
        assert len(os.listdir(cache)) == len(files)  # no second blob

    def test_key_changes_with_shape(self, tmp_path):
        cache = str(tmp_path)
        load_or_compile(_fn, jnp.ones((8, 16)), jnp.ones((16, 4)), cache_dir=cache)
        load_or_compile(_fn, jnp.ones((4, 16)), jnp.ones((16, 4)), cache_dir=cache)
        files = [f for f in os.listdir(cache) if f.endswith(".jaxexe")]
        assert len(files) == 2

    def test_none_dir_is_plain_jit(self):
        c = load_or_compile(_fn, cache_dir=None)
        out = c(jnp.ones((2, 16)), jnp.ones((16, 4)))
        assert out.shape == (2,)

    def test_lazy_program(self, tmp_path):
        prog = LazyCachedProgram(_fn, str(tmp_path))
        x, w = jnp.ones((8, 16)), jnp.ones((16, 4))
        out = np.asarray(prog(x, w))
        out2 = np.asarray(prog(x, w))
        np.testing.assert_allclose(out, out2)
        assert any(f.endswith(".jaxexe") for f in os.listdir(str(tmp_path)))

    def test_corrupt_blob_recompiles(self, tmp_path):
        cache = str(tmp_path)
        x, w = jnp.ones((8, 16)), jnp.ones((16, 4))
        load_or_compile(_fn, x, w, cache_dir=cache)
        (blob,) = [f for f in os.listdir(cache) if f.endswith(".jaxexe")]
        with open(os.path.join(cache, blob), "wb") as fh:
            fh.write(b"garbage")
        c = load_or_compile(_fn, x, w, cache_dir=cache)
        assert c(x, w).shape == (8,)
