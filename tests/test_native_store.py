"""Native C++ fstore reader tests (built with g++ at test time)."""

import numpy as np
import pytest

from revisionllm_tpu.data.feature_store import RvfsWriter
from revisionllm_tpu.data.native_store import (
    NativeRvfsStore,
    native_available,
    open_store_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    path = str(root / "feat.rvfs")
    rng = np.random.default_rng(0)
    with RvfsWriter(path) as w:
        for i in range(5):
            w.add(f"movie{i}", {"features": rng.normal(size=(100, 16)).astype(np.float32)})
        w.add("rec", {
            "token_features": rng.normal(size=(7, 16)).astype(np.float32),
            "cls_features": rng.normal(size=(16,)).astype(np.float32),
        })
    return path


class TestNativeStore:
    def test_read_matches_python_reader(self, store_path):
        from revisionllm_tpu.data.feature_store import RvfsStore

        py = RvfsStore(store_path)
        nat = NativeRvfsStore(store_path)
        for key in py.keys():
            for name, arr in py.get_record(key).items():
                np.testing.assert_array_equal(nat.get_record(key)[name], arr)
        nat.close()

    def test_prefetch_drains(self, store_path):
        import time

        nat = NativeRvfsStore(store_path)
        nat.prefetch([f"movie{i}" for i in range(5)])
        for _ in range(100):
            if nat.pending() == 0:
                break
            time.sleep(0.01)
        assert nat.pending() == 0
        # reads still correct after prefetch
        assert nat.get("movie0").shape == (100, 16)
        nat.close()

    def test_open_store_native_fallback(self, tmp_path):
        # a directory (npy store) silently falls back to the python reader
        s = open_store_native(str(tmp_path))
        assert s is not None
