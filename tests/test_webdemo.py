"""Web demo server: the gradio-parity HTTP surface (upload -> session,
SSE-streamed answers, reset), driven over real sockets.

Covers reference demo_gradio.py:120-148 behavior: one session at a time,
upload replaces the video, questions stream the growing answer, history
persists across turns until reset.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from revisionllm_tpu.webdemo import DemoServer


class StubSession:
    """Minimal ChatSession lookalike: streams a canned answer."""

    def __init__(self, path: str):
        self.path = path
        self.history = []

    def ask_stream(self, question: str):
        answer = ""
        for word in ("the", "event", "happens", "early"):
            answer = (answer + " " + word).strip()
            yield answer
        self.history.append((question, answer))


@pytest.fixture()
def server():
    made = []

    def make_session(path):
        s = StubSession(path)
        made.append(s)
        return s

    srv = DemoServer(make_session, host="127.0.0.1", port=0)
    srv.start_background()
    try:
        yield srv, made
    finally:
        srv.shutdown()


def _get(port, path):
    return urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10)


def _post(port, path, data=b""):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method="POST"
    )
    return urllib.request.urlopen(req, timeout=10)


def _sse_events(resp):
    events = []
    for raw in resp:
        line = raw.decode().strip()
        if line.startswith("data: "):
            events.append(line[len("data: "):])
    return events


class TestWebDemo:
    def test_index_page(self, server):
        srv, _ = server
        body = _get(srv.port, "/").read().decode()
        assert "ReVisionLLM" in body and "EventSource" in body

    def test_ask_without_video_is_409(self, server):
        srv, _ = server
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(srv.port, "/api/ask?q=hello")
        assert e.value.code == 409

    def test_upload_then_streamed_answer(self, server, tmp_path):
        srv, made = server
        feats = np.zeros((8, 16), np.float32)
        p = tmp_path / "feats.npy"
        np.save(p, feats)
        r = _post(srv.port, "/api/video?name=feats.npy", p.read_bytes())
        assert json.loads(r.read())["status"].startswith("video processed")
        assert len(made) == 1 and made[0].path.endswith(".npy")

        events = _sse_events(_get(srv.port, "/api/ask?q=when"))
        assert events[-1] == "[DONE]"
        partials = [json.loads(e) for e in events[:-1]]
        # growing prefixes, final answer complete
        assert partials[-1] == "the event happens early"
        for a, b in zip(partials, partials[1:]):
            assert b.startswith(a)
        assert made[0].history == [("when", "the event happens early")]

    def test_reset_clears_history(self, server, tmp_path):
        srv, made = server
        p = tmp_path / "f.npy"
        np.save(p, np.zeros((4, 16), np.float32))
        _post(srv.port, "/api/video?name=f.npy", p.read_bytes())
        _sse_events(_get(srv.port, "/api/ask?q=first"))
        assert made[0].history
        _post(srv.port, "/api/reset")
        assert made[0].history == []

    def test_upload_replaces_session(self, server, tmp_path):
        srv, made = server
        p = tmp_path / "f.npy"
        np.save(p, np.zeros((4, 16), np.float32))
        _post(srv.port, "/api/video?name=f.npy", p.read_bytes())
        _post(srv.port, "/api/video?name=f.npy", p.read_bytes())
        assert len(made) == 2

    def test_bad_upload_reports_500(self, tmp_path):
        def broken(path):
            raise ValueError("no decoder for this container")

        srv = DemoServer(broken, host="127.0.0.1", port=0)
        srv.start_background()
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(srv.port, "/api/video?name=x.mp4", b"\x00\x01")
            assert e.value.code == 500
            assert "no decoder" in json.loads(e.value.read())["error"]
        finally:
            srv.shutdown()


class TestWebDemoRealSession:
    def test_tiny_model_end_to_end(self, tmp_path):
        """Full stack: DemoServer -> demo.ChatSession -> inference_stream on
        a tiny float32 model, over a real socket."""
        import jax
        import jax.numpy as jnp

        from revisionllm_tpu.config import AdapterConfig, LlamaConfig
        from revisionllm_tpu.demo import ChatSession, load_video_features
        from revisionllm_tpu.models import llama, revisionllm

        from test_dataset import FakeTokenizer

        cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=False,
            hierarchy=False, feature_mode="temporal", kind="mlp",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(
            acfg, jax.random.PRNGKey(1), d_in=16
        )
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))

        def make_session(path):
            feats = load_video_features(path, num_frames=8)
            return ChatSession(
                (cfg, acfg, params, vision, tok), feats, max_new_tokens=3
            )

        srv = DemoServer(make_session, host="127.0.0.1", port=0)
        srv.start_background()
        try:
            p = tmp_path / "feats.npy"
            np.save(p, np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32))
            r = _post(srv.port, "/api/video?name=feats.npy", p.read_bytes())
            assert json.loads(r.read())["status"].startswith("video processed")
            events = _sse_events(_get(srv.port, "/api/ask?q=when+is+it"))
            assert events[-1] == "[DONE]"
            assert len(events) >= 2  # at least one token + DONE
        finally:
            srv.shutdown()
