"""OpenAI-compatible HTTP LLM backend against an in-process fake server."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from voxactb_tpu.voxposer.llm_http import (
    LLMTransportError,
    OpenAIChatBackend,
    VisionChatBackend,
    determine_dominant_hand_llm,
)


class _FakeOpenAI(BaseHTTPRequestHandler):
    """Scriptable chat-completions endpoint: pop the next canned behavior."""

    script = []       # list of ("ok", text) | ("fail", status)
    requests = []     # recorded payloads

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests.append((self.path, body))
        kind, arg = (type(self).script.pop(0) if type(self).script
                     else ("ok", "pass"))
        if kind == "fail":
            self.send_response(arg)
            self.end_headers()
            return
        out = {"choices": [{"message": {"content": arg}}]}
        data = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture
def fake_server():
    _FakeOpenAI.script = []
    _FakeOpenAI.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1", _FakeOpenAI
    srv.shutdown()


def test_chat_backend_happy_path(fake_server):
    url, fake = fake_server
    fake.script = [("ok", "ret_val = 42")]
    be = OpenAIChatBackend(base_url=url, api_key="k", _sleep=lambda s: None)
    out = be("compute the answer", stop=["# Query:"])
    assert out == "ret_val = 42"
    path, body = fake.requests[0]
    assert path.endswith("/chat/completions")
    assert body["messages"][0]["content"] == "compute the answer"
    assert body["stop"] == ["# Query:"]


def test_chat_backend_retries_then_succeeds(fake_server):
    url, fake = fake_server
    fake.script = [("fail", 500), ("fail", 503), ("ok", "done")]
    sleeps = []
    be = OpenAIChatBackend(base_url=url, api_key="k", max_retries=3,
                           retry_sleep_s=5.0, _sleep=sleeps.append)
    assert be("q", stop=[]) == "done"
    assert sleeps == [5.0, 5.0]  # slept between the failed attempts
    assert be.n_requests == 3


def test_chat_backend_exhausts_retries(fake_server):
    url, fake = fake_server
    fake.script = [("fail", 500)] * 3
    be = OpenAIChatBackend(base_url=url, api_key="k", max_retries=3,
                           _sleep=lambda s: None)
    with pytest.raises(LLMTransportError, match="after 3 attempts"):
        be("q", stop=[])


def test_backend_requires_api_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(LLMTransportError, match="no API key"):
        OpenAIChatBackend(base_url="http://x")


def test_lmp_runs_through_http_backend(fake_server, tmp_path):
    """Full stack: LMP prompt -> HTTP completion -> sandboxed exec."""
    from voxactb_tpu.voxposer.lmp import LMP, LMPConfig

    url, fake = fake_server
    fake.script = [("ok", "ret_val = 2 + 3")]
    be = OpenAIChatBackend(base_url=url, api_key="k", _sleep=lambda s: None)
    lmp = LMP("planner", LMPConfig(load_cache=False), be,
              cache_dir=str(tmp_path))
    assert lmp("add two and three") == 5


@pytest.mark.parametrize("answer,expect", [
    ("Reasoning... The jar is on the left. Use the right hand.", "right"),
    ("I think. The left arm should act.", "left"),
])
def test_vision_dominant_hand_parses_tail(fake_server, answer, expect):
    url, fake = fake_server
    fake.script = [("ok", answer)]
    be = VisionChatBackend(base_url=url, api_key="k", _sleep=lambda s: None)
    rgb = np.zeros((8, 8, 3), np.uint8)
    assert determine_dominant_hand_llm(rgb, "which arm?", be) == expect
    # the image went up as a data URL (rlbench_env.py:644-654 payload shape)
    _, body = fake.requests[0]
    parts = body["messages"][0]["content"]
    assert parts[0]["type"] == "text"
    assert parts[1]["image_url"]["url"].startswith("data:image/jpeg;base64,")


def test_vision_dominant_hand_gibberish_falls_back(fake_server):
    url, fake = fake_server
    fake.script = [("ok", "no arms mentioned here")]
    be = VisionChatBackend(base_url=url, api_key="k", _sleep=lambda s: None)
    rng = np.random.default_rng(0)
    arm = determine_dominant_hand_llm(
        np.zeros((4, 4, 3), np.uint8), "?", be, rng=rng)
    assert arm in ("right", "left")


def test_vision_caches_repeat_queries(fake_server):
    url, fake = fake_server
    fake.script = [("ok", "use the right hand.")]
    be = VisionChatBackend(base_url=url, api_key="k", _sleep=lambda s: None)
    rgb = np.zeros((4, 4, 3), np.uint8)
    a = be.ask_about_image(rgb, "which?")
    b = be.ask_about_image(rgb, "which?")
    assert a == b and be.n_requests == 1
