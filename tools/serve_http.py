"""HTTP TTS serving — the TPU-native analog of the reference's vLLM server
(/root/reference/tts/training/rlhf/run_rlhf_combine.sh:60, `trl vllm-serve`).

Stdlib-only (http.server + threading): a background worker thread drives the
continuous-batching PagedInferenceEngine; HTTP handlers submit requests and
block on a per-request event. Endpoints:

  POST /synthesize   {"text": ..., "prompt_wav"?: path, "prompt_transcript"?,
                      "max_tokens"?, "min_tokens"?, "temperature"?, "top_k"?,
                      "top_p"?, "repetition_penalty"?, "frequency_penalty"?,
                      "seed"?}
                     -> audio/wav bytes (16 kHz int16 mono)
  POST /generate     same body -> {"tokens": [...], "codes": [...],
                      "finish_reason": ...} (no vocoding)
  POST /stream       same body (+ chunk_codes?, context_codes?) ->
                      chunked-transfer audio/wav, emitted WHILE generating
                      (incremental codec decode with crossfade)
  GET  /stats        -> engine stats JSON (slots, blocks, prefix-cache hits)
  GET  /health       -> {"ok": true}

Usage:
  python tools/serve_http.py --model_dir serving --port 8400 \
      [--quantize int8] [--codec_decoder dec.pt --codec_encoder enc.pt]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import struct
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core import prompting
from tts_max_tpu.core.constants import CODEC_SAMPLE_RATE, CODEC_TOKEN_RATE
from tts_max_tpu.core.tokenization import build_byte_tokenizer, speech_vocab
from tts_max_tpu.data.audio_io import load_wav
from tts_max_tpu.inference.engine import InferenceEngine, PagedInferenceEngine
from tts_max_tpu.models import hf_import
from tts_max_tpu.ops.sampling import SamplingParams, sampling_from_overrides
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger("serve_http")

_SAMPLING_KEYS = ("temperature", "top_k", "top_p", "repetition_penalty",
                  "frequency_penalty")


def wav_bytes(wav: np.ndarray, sample_rate: int = CODEC_SAMPLE_RATE) -> bytes:
    """Mono 16-bit PCM WAV container (no scipy dependency at request time)."""
    pcm = (np.clip(np.asarray(wav, np.float32).ravel(), -1, 1) * 32767.0
           ).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
    hdr += struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def wav_stream_header(sample_rate: int = CODEC_SAMPLE_RATE) -> bytes:
    """WAV header for a stream of unknown length (RIFF/data sizes maxed —
    the convention players treat as 'read until EOF')."""
    hdr = b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
    hdr += struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", 0xFFFFFFFF)
    return hdr


def pcm_bytes(wav: np.ndarray) -> bytes:
    return (np.clip(np.asarray(wav, np.float32).ravel(), -1, 1) * 32767.0
            ).astype("<i2").tobytes()


class _StreamSub:
    """Per-request token subscription filled by the engine worker thread."""

    def __init__(self):
        import queue

        self.q: "queue.Queue" = queue.Queue()
        self.consumed = 0  # tokens already pushed


class TtsServer:
    """Engine + worker thread + synchronous request API."""

    def __init__(self, engine, tokenizer, sv, encoder, decoder,
                 default_max_tokens: int, max_len: int, normalizer=None):
        from tts_max_tpu.data import normalization

        self.engine = engine
        self.tokenizer = tokenizer
        self.sv = sv
        self.encoder = encoder
        self.decoder = decoder
        self.normalizer = normalizer or normalization.create()
        self.default_max_tokens = default_max_tokens
        self.max_len = max_len
        self._lock = threading.Lock()
        self._events: dict[int, threading.Event] = {}
        self._results: dict[int, object] = {}
        self._token_subs: dict[int, _StreamSub] = {}
        self._seed = 0
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while not self._stop:
            try:
                with self._lock:
                    work = self.engine.has_work()
                    # poll() pipelines K-step dispatches (issue N+1 before
                    # fetching N's blob) so the relay round-trip overlaps
                    # compute; submissions interleave between polls
                    done = self.engine.poll() if work else []
            except Exception:
                # keep serving: a failed step (e.g. a transient device
                # error) must not silently kill the only worker thread
                log.exception("engine step failed; worker continues")
                time.sleep(0.1)
                continue
            with self._lock:
                # push newly generated tokens to /stream subscribers
                for slot in self.engine._slots:
                    req = slot.request
                    if req is None:
                        continue
                    sub = self._token_subs.get(req.request_id)
                    if sub is not None and len(slot.generated) > sub.consumed:
                        sub.q.put(list(slot.generated[sub.consumed:]))
                        sub.consumed = len(slot.generated)
            for c in done:
                sub = self._token_subs.get(c.request_id)
                if sub is not None:
                    toks = np.asarray(c.tokens).tolist()
                    if len(toks) > sub.consumed:
                        sub.q.put(toks[sub.consumed:])
                        sub.consumed = len(toks)
                    sub.q.put(None)  # finished sentinel
                ev = self._events.pop(c.request_id, None)
                if ev:  # nobody waits after a timeout/cancel: drop result
                    self._results[c.request_id] = c
                    ev.set()
            if not work:
                time.sleep(0.005)

    def shutdown(self):
        self._stop = True
        self._worker.join(timeout=5)

    def _prepare(self, body: dict):
        """Compile the prompt; returns (input_ids, budget, sampling,
        prompt_speech_ids). Raises ValueError on bad input."""
        speech_ids: list[int] = []
        if body.get("prompt_wav"):
            wav, _ = load_wav(body["prompt_wav"], CODEC_SAMPLE_RATE)
            speech_ids = np.asarray(
                self.encoder.encode(body["prompt_wav"], wav)
            ).ravel().tolist()
        # normalize the free text, routing by the request's language tag or
        # detection (reference text_normalization.py:73-90): a zh sentence
        # posted without a tag gets zh verbalization, not English
        text = self.normalizer.normalize(
            body["text"], body.get("language") or None
        )
        prompt = prompting.compile_inference_prompt(
            body.get("prompt_transcript", ""), text, speech_ids,
            body.get("voice_description", ""), True,
        )
        input_ids = np.asarray(
            self.tokenizer.encode(prompt, add_special_tokens=True),
            dtype=np.int32,
        )
        budget = min(
            int(body.get("max_tokens", self.default_max_tokens)),
            self.max_len - len(input_ids),
        )
        if budget <= 0:
            raise ValueError(
                f"prompt is {len(input_ids)} tokens; no budget within "
                f"max_len {self.max_len}"
            )
        sampling = sampling_from_overrides(body, SamplingParams())
        return input_ids, budget, sampling, speech_ids

    def request(self, body: dict, timeout: float = 600.0):
        """Returns (completion, prompt_speech_ids). Raises on bad input."""
        input_ids, budget, sampling, speech_ids = self._prepare(body)
        ev = threading.Event()
        with self._lock:
            self._seed += 1
            rid = self.engine.submit(
                input_ids, budget, eos_id=self.sv.speech_end_id,
                sampling_seed=int(body.get("seed", self._seed)),
                sampling=sampling, min_tokens=int(body.get("min_tokens", 0)),
            )
            self._events[rid] = ev
        if not ev.wait(timeout):
            # free the slot/KV blocks and make sure no result leaks
            with self._lock:
                self.engine.cancel(rid)
                self._events.pop(rid, None)
                self._results.pop(rid, None)
            raise TimeoutError("generation timed out")
        return self._results.pop(rid), speech_ids

    def request_stream(self, body: dict):
        """Submit and subscribe: returns (rid, token subscription,
        prompt_speech_ids). The worker thread pushes token deltas to the
        subscription as each dispatch's blob lands; caller must
        ``finish_stream(rid)`` when done (success, error, or disconnect)."""
        input_ids, budget, sampling, speech_ids = self._prepare(body)
        sub = _StreamSub()
        with self._lock:
            self._seed += 1
            rid = self.engine.submit(
                input_ids, budget, eos_id=self.sv.speech_end_id,
                sampling_seed=int(body.get("seed", self._seed)),
                sampling=sampling, min_tokens=int(body.get("min_tokens", 0)),
            )
            self._token_subs[rid] = sub
        return rid, sub, speech_ids

    def finish_stream(self, rid: int) -> None:
        with self._lock:
            self._token_subs.pop(rid, None)
            self.engine.cancel(rid)  # no-op if already finished

    def stats(self) -> dict:
        # best-effort read of host-side counters; deliberately lock-free so
        # observability never queues behind an in-flight decode dispatch
        return self.engine.stats()


def make_handler(server: TtsServer):
    class Handler(BaseHTTPRequestHandler):
        # /stream uses chunked transfer encoding, which HTTP/1.0 does not
        # define — with the BaseHTTPRequestHandler default a strict client
        # would read the chunk-size framing bytes as WAV audio. Every other
        # response sends Content-Length, so keep-alive semantics are safe.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):  # route through our logger
            log.info("%s " + fmt, self.client_address[0], *a)

        def _json(self, code: int, obj):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                return self._json(200, {"ok": True})
            if self.path == "/stats":
                return self._json(200, server.stats())
            return self._json(404, {"error": "unknown endpoint"})

        def _stream(self, body: dict):
            """POST /stream: chunked-transfer WAV — audio is emitted while
            the SpeechLM is still generating (time-to-first-audio ~=
            (chunk+context)/50 s of speech instead of the full utterance).
            Body accepts the /synthesize fields plus chunk_codes /
            context_codes (StreamingDecoder granularity)."""
            from tts_max_tpu.inference.streaming import StreamingDecoder

            rid, sub, prompt_ids = server.request_stream(body)
            sd = StreamingDecoder(
                server.decoder,
                int(body.get("chunk_codes", 25)),
                int(body.get("context_codes", 50)),
                history=prompt_ids if prompt_ids else None,
            )
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def wchunk(b: bytes):
                if b:
                    self.wfile.write(
                        f"{len(b):X}\r\n".encode() + b + b"\r\n"
                    )

            import queue as _queue

            try:
                wchunk(wav_stream_header())
                while True:
                    try:
                        toks = sub.q.get(timeout=600.0)
                    except _queue.Empty:
                        break  # generation stalled: close the stream
                    if toks is None:  # finished
                        piece = sd.flush()
                        if len(piece):
                            wchunk(pcm_bytes(piece))
                        break
                    codes = server.sv.codes_from_tokens(
                        np.asarray(toks, dtype=np.int64)
                    )
                    if len(codes):
                        piece = sd.push(codes)
                        if len(piece):
                            wchunk(pcm_bytes(piece))
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away; cancel below frees the slot
            except Exception:
                # headers are already sent: a second response (do_POST's
                # _json error path) would emit corrupt framing mid-body —
                # log and just close the connection instead
                log.exception("stream failed mid-body; closing connection")
                self.close_connection = True
            finally:
                server.finish_stream(rid)

        def do_POST(self):
            try:
                if self.path not in ("/generate", "/synthesize", "/stream"):
                    return self._json(404, {"error": "unknown endpoint"})
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if "text" not in body:
                    return self._json(400, {"error": "missing 'text'"})
                if self.path == "/stream":
                    return self._stream(body)
                comp, prompt_ids = server.request(body)
                if self.path == "/generate":
                    codes = server.sv.codes_from_tokens(np.asarray(comp.tokens))
                    return self._json(200, {
                        "tokens": np.asarray(comp.tokens).tolist(),
                        "codes": codes.tolist(),
                        "finish_reason": comp.finish_reason,
                    })
                if self.path == "/synthesize":
                    codes = server.sv.codes_from_tokens(np.asarray(comp.tokens))
                    all_codes = np.concatenate(
                        [np.asarray(prompt_ids, dtype=np.int64), codes]
                    )
                    if len(all_codes) == 0:
                        return self._json(422, {"error": "no speech tokens"})
                    wav = server.decoder.decode(all_codes)
                    skip = int(
                        len(prompt_ids) / CODEC_TOKEN_RATE * CODEC_SAMPLE_RATE
                    )
                    data = wav_bytes(wav[:, skip:])
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                return self._json(404, {"error": "unknown endpoint"})
            except (ValueError, KeyError) as e:
                return self._json(400, {"error": str(e)})
            except TimeoutError as e:
                return self._json(504, {"error": str(e)})
            except Exception as e:  # keep serving on unexpected errors
                log.exception("request failed")
                return self._json(500, {"error": str(e)})

    return Handler


def build_server(args) -> TtsServer:
    from tools.serving_inference import build_codec

    tokenizer = build_byte_tokenizer()
    sv = speech_vocab(tokenizer)
    params, cfg = hf_import.load_serving_model(args.model_dir)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if args.quantize and hf_import.is_quantized_dir(args.model_dir):
        log.warning("model dir is pre-quantized; ignoring --quantize")
        args.quantize = ""
    if args.quantize:
        from tts_max_tpu.models import quantization

        params = quantization.quantize_for_serving(params, args.quantize)
        log.info("Quantized weights (%s).", args.quantize)
    encoder, decoder = build_codec(args)
    window = sv.generation_window()
    if args.no_constrain or window[0] + window[1] > cfg.vocab_size:
        window = None
    kw = dict(
        max_batch=args.max_batch, max_len=args.max_len,
        quantized_kv=args.quantized_kv, vocab_window=window,
        steps_per_dispatch=args.steps_per_dispatch or (
            32 if getattr(args, "prefill_ahead", False) else 16
        ),
        staged_cache=not getattr(args, "no_staged_cache", False),
        admission_policy=getattr(args, "admission_policy", "fifo"),
        prefill_ahead=getattr(args, "prefill_ahead", False),
        park_rows=getattr(args, "park_rows", 0) or None,
        park_len=getattr(args, "park_len", 0) or None,
        park_groups_per_poll=getattr(args, "park_groups_per_poll", 0),
    )
    if getattr(args, "engine", "contiguous") == "paged":
        engine = PagedInferenceEngine(
            params, cfg, block_size=args.block_size,
            enable_prefix_cache=True, **kw
        )
    else:
        # measured-fastest serving mode (BENCHMARKS.md serving table);
        # shared voice prompts re-prefill (prefix cache is paged-only)
        engine = InferenceEngine(params, cfg, **kw)
    if not getattr(args, "no_warmup", False):
        log.info("Warmup: compiling prefill/decode programs ...")
        t_w = time.time()
        engine.warmup()
        # streaming-chunk Vocos shapes: the /stream default granularity
        # (chunk 25 + crossfade 4, then context 50 + chunk + crossfade)
        # compiles the decoder at NEW shapes — ~160 s through the relay if
        # it happens on the first live stream (bench_logs r5)
        import numpy as _np

        for n in (29, 79):
            try:
                decoder.decode(_np.zeros((n,), _np.int64))
            except Exception:  # tiny smoke decoders may reject shapes
                break
        log.info("Warmup done in %.1fs", time.time() - t_w)
    return TtsServer(engine, tokenizer, sv, encoder, decoder,
                     args.max_tokens, args.max_len)


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8400)
    parser.add_argument("--codec_decoder", default="")
    parser.add_argument("--codec_encoder", default="")
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_len", type=int, default=2048)
    parser.add_argument("--block_size", type=int, default=64)
    parser.add_argument("--max_tokens", type=int, default=1792)
    parser.add_argument("--quantize", nargs="?", const="int8", default="",
                        choices=["", "int8", "int4", "int4-g64", "int4-g128"])
    parser.add_argument("--quantized_kv", action="store_true")
    parser.add_argument("--no_constrain", action="store_true")
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip the startup compile warmup")
    parser.add_argument(
        "--engine", choices=["contiguous", "paged"], default="contiguous",
        help="KV layout: 'contiguous' is the measured-fastest mode "
        "(BENCHMARKS.md serving table); 'paged' (vLLM block pool, "
        "~72%% of same-load contiguous throughput with delta-KV dispatches) "
        "admits more mixed-length traffic per GB and enables the "
        "prefix cache",
    )
    parser.add_argument(
        "--prefill_ahead", action="store_true",
        help="under saturation, prefill queued requests ahead of "
        "slot availability (park buffer) and emit their first token "
        "immediately — cuts TTFT; costs park-buffer HBM "
        "(BENCHMARKS.md round-5 serving rows)",
    )
    parser.add_argument("--park_rows", type=int, default=0,
                        help="prefill-ahead park rows (0 = max_batch); "
                        "size to the expected queue depth for lowest TTFT")
    parser.add_argument("--park_len", type=int, default=0,
                        help="park buffer token capacity "
                        "(0 = min(512, max_len))")
    parser.add_argument("--park_groups_per_poll", type=int, default=0,
                        help="throttle parking (0 = park the whole "
                        "eligible queue at once)")
    parser.add_argument(
        "--admission_policy", choices=["fifo", "shortest"], default="fifo",
        help="'shortest' = shortest-job-first admission (better TTFT "
        "under saturation; long requests can starve under overload)",
    )
    parser.add_argument("--no_staged_cache", action="store_true",
                        help="disable staged (occupancy-sized) dispatches")
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=0,
        help="decode steps per jitted dispatch (K-step lax.scan). >1 "
        "amortizes the ~28ms host round-trip and is required for int4 "
        "weights to run at speed; admission/TTFT granularity is K steps. "
        "0 = auto (16; 32 with --prefill_ahead — the measured "
        "optima, BENCHMARKS.md round 5)",
    )
    args = parser.parse_args(argv)
    setup_logging(0)

    server = build_server(args)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    log.info("Serving TTS on http://%s:%d", args.host, args.port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
