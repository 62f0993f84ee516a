"""Continuous-batching inference engine — the TPU-native vLLM replacement.

The reference serves RLHF generation and end-user inference through vLLM
(CUDA paged attention + continuous batching, reference inferencing.py:75-92,
run_rlhf_combine.sh:60). Here the same capability is built on the jitted
decode step:

- a fixed pool of ``max_batch`` slots shares one KV cache
  [L, max_batch, max_len, Hkv, D];
- new requests are admitted BETWEEN decode dispatches, in BATCHED groups:
  a FIFO run of queued requests prefills as one [k, bucket] program
  (``prefill_group_sizes``), which also scatters every per-slot state row
  (KV region, first logits, lengths, active, counters, RNG keys, request
  metadata, sampling rows) inside the same dispatch — admission costs ONE
  host round-trip per group and fetches nothing back;
- every decode step advances all active slots in lockstep (one jitted
  program; finished/empty slots are masked);
- finished sequences free their slot immediately.

Static shapes throughout: one prefill program per (prompt bucket, group
size), exactly one decode program. ``warmup()`` pre-compiles all of them
(vLLM-style startup warmup).

``steps_per_dispatch > 1`` batches K decode steps into one jitted
``lax.scan`` program per host round-trip: EOS/budget finish detection moves
in-program (a finished slot is masked for the rest of the dispatch and
re-admitted after it), and ONE packed int32 blob ([2K+1, B]: K token rows,
K emitted rows, final active row) comes back per fetch — a single
device->host transfer per dispatch. Because packed-int4 params are unpacked
to their S4 view ONCE at the top of the program, int4 weights run at full
speed here, not just in the single-program generate path. ``run()``
additionally PIPELINES dispatches: dispatch N+1 is issued before N's blob
is fetched (safe — N+1 consumes N's output state, so in-program finishes
are already masked), hiding the ~28 ms relay round-trip behind the next K
steps' compute. Costs: a freed slot idles at most K-1 steps, and pipelined
re-admission lags one dispatch.

On a relayed TPU per-step dispatch caps the pool at ~35 steps/s regardless
of compute; K-step pipelined dispatch amortizes the round-trip to nothing.
"""

from __future__ import annotations

import collections
import functools
import hashlib
import itertools
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.models import llama
from tts_max_tpu.ops import sampling
from tts_max_tpu.ops.sampling import SamplingParams


@dataclass
class Request:
    request_id: int
    prompt_tokens: np.ndarray  # [S] int32
    max_new_tokens: int
    eos_id: int
    sampling_seed: int = 0
    # vLLM-style per-request override of the engine's SamplingParams
    # (temperature / top_k / top_p / penalties); None = engine default.
    sampling: SamplingParams | None = None
    # vLLM min_tokens: EOS unsampleable until this many tokens generated.
    min_tokens: int = 0


@dataclass
class Completion:
    request_id: int
    tokens: np.ndarray  # generated ids (eos included if emitted)
    finish_reason: str  # "eos" | "length"


@dataclass
class _Slot:
    request: Request | None = None
    generated: list[int] = field(default_factory=list)
    # attach-from-park: the first generated token was already emitted at
    # park time (preview-sampled); the next matching blob row re-delivers
    # the same token and must be consumed without appending.
    skip_preview: bool = False


@dataclass
class _Parked:
    """A request whose prompt was prefilled ahead of slot availability:
    its KV lives in park row ``row`` and its first token is already
    emitted (prefill_ahead — see InferenceEngine.__init__)."""

    row: int
    request: Request
    first_token: int


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


class InferenceEngine:
    def __init__(
        self,
        params: Any,
        cfg: llama.LlamaConfig,
        *,
        max_batch: int = 8,
        max_len: int = 2048,
        sp: SamplingParams = SamplingParams(),
        pad_id: int = 0,
        quantized_kv: bool = False,
        vocab_window: tuple[int, int] | None = None,
        max_top_k: int = 64,
        steps_per_dispatch: int = 1,
        prefill_group_sizes: tuple[int, ...] = (8, 4, 2, 1),
        mesh=None,
        staged_cache: bool = True,
        min_stage: int = 256,
        admission_policy: str = "fifo",
        delta_kv: bool = True,
        prefill_ahead: bool = False,
        park_rows: int | None = None,
        park_len: int | None = None,
        park_groups_per_poll: int = 0,
    ):
        """``prefill_ahead``: when the pool is saturated, prefill queued
        requests AHEAD of slot availability into a separate park buffer
        ([L, park_rows, park_len] contiguous KV) and emit their first
        token immediately — preview-sampled with exactly the inputs the
        decode's first step will see (same seeded key split, same prompt
        counts, same logits), so the decode deterministically re-derives
        it and the host consumes the duplicate. When a slot frees, the
        parked KV ATTACHES with a row-sized copy (no recompute). TTFT
        under saturation then follows prefill latency instead of
        slot-wait (round-5 item; measured in BENCHMARKS.md). Requests
        with min_tokens > 0, prompts longer than ``park_len``, or a
        prefix-cache hit take the normal queued path.

        ``mesh``: a jax.sharding.Mesh for tensor-parallel serving (the
        reference's vLLM --tensor_parallel_size role). Pass TP-sharded
        params (parallel.sharding.params_shardings); the engine shards its
        KV cache over the mesh's ``tensor`` axis (kv heads) and replicates
        per-slot state — GSPMD propagates the rest and inserts the
        collectives. Paged engines fall back to the XLA block-gather
        attention under a mesh (the Pallas kernels do not SPMD-partition).

        ``staged_cache``: right-size each decode dispatch's KV-cache read
        to the pool's occupancy high-water mark instead of always reading
        the full ``max_len`` reservation (the engine analog of the generate
        path's staged cache, +48-73% long-form there). Per dispatch the
        host picks the smallest stage in {min_stage, 2*min_stage, ...,
        max_len} covering every active slot's length plus the dispatch's
        worst-case growth; the K-step program slices the cache to that
        stage, decodes, and scatters the region back (2 stage-sized copies
        amortized over K steps). Attention/HBM traffic per step then
        follows occupancy, not the worst case — the round-3 probe measured
        14.0 ms/step at a fixed 768-slot cache vs ~6.6 ms at 192 slots for
        the same model. Paged engines instead slice the BLOCK TABLE to the
        stage's width (no copies; the kernels' page walk shortens).
        Stages above max_len collapse, so max_len <= min_stage disables
        staging. Numerically exact either way: attention is masked by
        per-slot lengths.

        ``admission_policy``: ``"fifo"`` (default, vLLM-style arrival
        order) or ``"shortest"`` — shortest-job-first by prompt + budget,
        which under saturation admits cheap requests ahead of long ones
        and cuts TTFT p50/p95 (long requests can starve under sustained
        overload; use with a client-side timeout).

        ``delta_kv``: multi-step dispatches keep the big cache READ-ONLY
        inside the K-step scan (new rows ride a small delta buffer; one
        commit scatter per dispatch) — removes the per-step full-cache
        copy XLA makes for the conventional scatter (_decode_multi_delta).
        Paged engines additionally gather the block table's span of the
        pool into a contiguous read cache once per dispatch and commit the
        delta back through the table (llama.commit_delta_paged). int8-KV
        note: delta rows are attended unquantized within their dispatch
        (quantized at commit) — equal or better accuracy, bitwise
        different from delta_kv=False."""
        self._mesh = mesh
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.sp = sp
        self.pad_id = pad_id
        self.quantized_kv = quantized_kv
        self.steps_per_dispatch = steps_per_dispatch
        if admission_policy not in ("fifo", "shortest"):
            raise ValueError(f"unknown admission_policy {admission_policy!r}")
        self.admission_policy = admission_policy
        self.delta_kv = delta_kv and steps_per_dispatch > 1
        # staged-dispatch schedule: doubling from min_stage up to 1024, then
        # arithmetic +512 — beyond 1 K slots the read cost per step is large
        # enough that a 2x-granular ladder wastes up to ~50% of it, while
        # each extra stage costs only one (persistently cached) compile
        self.staged_cache = staged_cache and min_stage < max_len
        sizes = [min(min_stage, max_len)]
        while sizes[-1] < max_len:
            nxt = sizes[-1] * 2 if sizes[-1] < 1024 else sizes[-1] + 512
            sizes.append(min(max_len, nxt))
        self._stages: tuple[int, ...] = tuple(sizes)
        # Batched admission: queued requests prefill together in groups of
        # these sizes (largest fitting first; must include 1). Each batch-1
        # prefill costs a full host->device round-trip (~30 ms on a relayed
        # TPU) plus an un-amortized weight sweep; grouping is what makes a
        # saturation burst of admissions cheap (vLLM batches its prefills
        # for the same reason).
        self.prefill_group_sizes = tuple(
            sorted({g for g in prefill_group_sizes if g <= max_batch} | {1},
                   reverse=True)
        )
        # Constrain sampling to a contiguous vocab window (lo, size) —
        # SpeechVocab.generation_window() for TTS serving. Logits / penalty
        # buffers shrink to window size; emitted ids stay global.
        self.vocab_window = vocab_window
        logits_width = vocab_window[1] if vocab_window else cfg.vocab_size

        # Device-owned state. ALL per-slot state lives on-device and is
        # updated INSIDE the prefill/decode programs: on a relayed TPU every
        # separate host<->device transfer is a ~30 ms round-trip, so
        # admission scatters its rows inside the prefill dispatch and the
        # decode dispatch returns one packed host blob (tokens + emitted +
        # active) instead of three fetches.
        self.cache = self._make_cache()
        # Paged engines with a persistent read cache keep a contiguous
        # [L, B, max_len] mirror of every slot's KV alive across dispatches
        # (None otherwise) — see PagedInferenceEngine.persistent_read_cache.
        self.read_cache = self._make_read_cache()
        self.lengths = jnp.zeros((max_batch,), jnp.int32)
        self.last_logits = jnp.zeros((max_batch, logits_width), jnp.float32)
        self.active = jnp.zeros((max_batch,), dtype=bool)
        self.token_counts = jnp.zeros((max_batch, logits_width), jnp.int32)
        self.gen_counts = jnp.zeros((max_batch, logits_width), jnp.int32)
        self.rngs = jax.random.split(jax.random.PRNGKey(0), max_batch)
        self.eos_ids = jnp.full((max_batch,), -1, jnp.int32)
        self.budgets = jnp.zeros((max_batch,), jnp.int32)
        self.min_tokens = jnp.zeros((max_batch,), jnp.int32)
        self.prompt_lens = jnp.zeros((max_batch,), jnp.int32)
        # one row of sampling params per slot (per-request overrides)
        self.bsp = sampling.BatchedSamplingParams.broadcast(
            sp, max_batch, max_top_k=max(max_top_k, sp.top_k, 1)
        )
        # prefill-ahead park buffer (see __init__ docstring)
        self.prefill_ahead = prefill_ahead
        self.first_token_times: dict[int, float] = {}
        self._parked_entries: collections.deque[_Parked] = collections.deque()
        # in-flight park groups: list of (preview-tokens future, group)
        self._pending_parks: list = []
        self._parked_total = 0  # lifetime requests prefilled ahead
        if prefill_ahead:
            # 0 = park the whole eligible queue at once (lowest TTFT; the
            # park prologue delays early decode dispatches); N>0 = at most
            # N park groups per poll, interleaving parks with decode
            # dispatches (higher throughput, TTFT still ~park time)
            self.park_groups_per_poll = park_groups_per_poll
            self.park_rows = park_rows or max_batch
            pl = min(park_len or min(512, max_len), max_len)
            step = self._bucket_step()
            self.park_len = max(step, (pl // step) * step)
            self.park_cache = llama.init_kv_cache(
                self.cfg, self.park_rows, self.park_len,
                quantized=self.quantized_kv,
            )
            self.park_counts = jnp.zeros(
                (self.park_rows, logits_width), jnp.int32
            )
            # preview tokens land in ONE fixed-shape device buffer so the
            # host drains any number of pending park groups with a single
            # [park_rows] fetch (per-group fetches cost ~28 ms relay RTT
            # each; concatenating varying group counts recompiled mid-run)
            self.park_preview = jnp.zeros((self.park_rows,), jnp.int32)
            self._free_park_rows = list(range(self.park_rows))
            self._park_cache_jits: dict = {}
            self._attach_cache_jits: dict = {}
        self._shard_state_for_mesh()

        from tts_max_tpu.models.quantization import is_packed4

        if steps_per_dispatch == 1 and any(
            is_packed4(leaf)
            for leaf in jax.tree_util.tree_leaves(
                params, is_leaf=is_packed4
            )
        ):
            import warnings

            warnings.warn(
                "packed int4 params with steps_per_dispatch=1 unpack on "
                "EVERY decode step (the S4 view cannot persist across jit "
                "boundaries on this platform) — set steps_per_dispatch>1 "
                "(the multi-step program unpacks once per dispatch) or use "
                "int8",
                stacklevel=2,
            )
        self._slots = [_Slot() for _ in range(max_batch)]
        self._queue: collections.deque[Request] = collections.deque()
        self._finished: list[Completion] = []
        # lifetime counters + dispatch-stage histogram (stats())
        self._total_tokens = 0
        self._total_completions = 0
        self._stage_counts: collections.Counter = collections.Counter()
        # in-flight (blob, slot snapshot) when poll() pipelines dispatches
        self._pending_dispatch = None
        self._ids = itertools.count()
        self._prefill_cache: dict[int, Callable] = {}
        # one decode program per cache stage (stage=None reads full max_len);
        # multi-step: donate the cache (at 8B pool sizes two live copies of
        # the KV pool do not fit HBM) — self.cache is reassigned each call
        self._decode_cache: dict = {}
        self._decode_k_cache: dict = {}

    def _decode_jit(self, stage):
        if stage not in self._decode_cache:
            self._decode_cache[stage] = jax.jit(
                functools.partial(self._decode_step, stage=stage)
            )
        return self._decode_cache[stage]

    def _decode_k_jit(self, stage):
        if stage not in self._decode_k_cache:
            # donate both the pool/cache (1) and the persistent read cache
            # (2) — each is a GB-scale buffer the dispatch rewrites a few
            # rows of; an empty/None read cache donates nothing
            self._decode_k_cache[stage] = jax.jit(
                functools.partial(self._decode_multi, stage=stage),
                donate_argnums=(1, 2),
            )
        return self._decode_k_cache[stage]

    def _dispatch_stage(self) -> int | None:
        """Smallest cache stage covering every active slot's length plus
        this dispatch's worst-case growth (host-side views lag the device
        by up to K tokens per in-flight dispatch). None = full max_len
        (staging disabled or the top stage)."""
        if not self.staged_cache:
            return None
        margin = self.steps_per_dispatch * (
            2 if self._pending_dispatch is not None else 1
        )
        need = 1
        for s in self._slots:
            if s.request is None:
                continue
            r = s.request
            cur = len(r.prompt_tokens) + len(s.generated)
            cap = len(r.prompt_tokens) + r.max_new_tokens
            need = max(need, min(cur + margin, cap))
        for size in self._stages:
            if size >= need:
                return None if size >= self.max_len else size
        return None

    def _shard_state_for_mesh(self) -> None:
        """TP serving: place the KV cache sharded over the ``tensor`` mesh
        axis along its kv-head dim and replicate all per-slot state, so the
        jitted prefill/decode programs see consistently-committed operands
        (GSPMD propagates from the param shardings)."""
        if self._mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh
        rep = NamedSharding(mesh, P())
        tp = int(mesh.shape.get("tensor", 1))
        heads_divide = self.cfg.n_kv_heads % max(tp, 1) == 0

        def shard_kv(entry):
            if not heads_divide:  # e.g. tiny test models: replicate the KV
                return jax.tree.map(
                    lambda x: jax.device_put(x, rep), entry
                )
            if isinstance(entry, dict):  # int8 KV {"q", "scale"}
                nq = entry["q"].ndim
                return {
                    "q": jax.device_put(
                        entry["q"],
                        NamedSharding(mesh, P(*([None] * (nq - 2) + ["tensor", None]))),
                    ),
                    "scale": jax.device_put(
                        entry["scale"],
                        NamedSharding(
                            mesh,
                            P(*([None] * (entry["scale"].ndim - 1) + ["tensor"])),
                        ),
                    ),
                }
            n = entry.ndim
            return jax.device_put(
                entry, NamedSharding(mesh, P(*([None] * (n - 2) + ["tensor", None])))
            )

        self.cache = {k: shard_kv(v) for k, v in self.cache.items()}
        if self.read_cache is not None:
            self.read_cache = {
                k: shard_kv(v) for k, v in self.read_cache.items()
            }
        if self.prefill_ahead:
            self.park_cache = {
                k: shard_kv(v) for k, v in self.park_cache.items()
            }
            self.park_counts = jax.device_put(self.park_counts, rep)
            self.park_preview = jax.device_put(self.park_preview, rep)
        for name in ("lengths", "last_logits", "active", "token_counts",
                     "gen_counts", "rngs", "eos_ids", "budgets",
                     "min_tokens", "prompt_lens"):
            setattr(self, name, jax.device_put(getattr(self, name), rep))
        self.bsp = jax.tree.map(
            lambda x: jax.device_put(x, rep), self.bsp
        )

    # --- public API ---------------------------------------------------------

    def submit(
        self,
        prompt_tokens,
        max_new_tokens: int,
        eos_id: int,
        sampling_seed: int = 0,
        sampling: SamplingParams | None = None,
        min_tokens: int = 0,
    ) -> int:
        rid = next(self._ids)
        self._queue.append(
            Request(
                rid,
                np.asarray(prompt_tokens, dtype=np.int32),
                max_new_tokens,
                eos_id,
                sampling_seed,
                sampling,
                min_tokens,
            )
        )
        return rid

    def has_work(self) -> bool:
        return (
            bool(self._queue)
            or bool(self._parked_entries)
            or bool(self._pending_parks)
            or any(s.request for s in self._slots)
            or self._pending_dispatch is not None
        )

    def cancel(self, request_id: int) -> bool:
        """Abort a request (vLLM abort_request parity): drop it from the
        queue, or free its slot mid-flight (partial output is discarded).
        Returns False if the id is unknown/already finished."""
        for i, req in enumerate(self._queue):
            if req.request_id == request_id:
                del self._queue[i]
                return True
        for i, entry in enumerate(self._parked_entries):
            if entry.request.request_id == request_id:
                del self._parked_entries[i]
                self._free_park_rows.append(entry.row)
                return True
        for group in self._pending_parks:
            for j, (row, req) in enumerate(group):
                if req.request_id == request_id:
                    # in-flight park group (preview not yet fetched): the
                    # preview lookup is row-keyed, so dropping the member
                    # is safe; its park program's writes become dead rows
                    del group[j]
                    self._free_park_rows.append(row)
                    return True
        for i, slot in enumerate(self._slots):
            if slot.request is not None and slot.request.request_id == request_id:
                slot.request = None
                slot.generated = []
                slot.skip_preview = False
                self.active = self.active.at[i].set(False)
                if self._pending_dispatch is not None:
                    # The in-flight pipelined dispatch snapshotted this slot
                    # as ACTIVE and keeps scattering its KV through the old
                    # block-table row; the blocks must not be reallocated
                    # until that dispatch's blob is processed (the NEXT
                    # dispatch consumes active=False and the zeroed table
                    # row, routing writes to the sink block).
                    self._defer_release(i)
                else:
                    self._release_slot(i)
                return True
        return False

    def step(self) -> list[Completion]:
        """Admit queued requests into free slots, run ONE decode step for all
        active slots, collect finished completions."""
        self._admit()
        self._process_pending_park()
        if any(s.request for s in self._slots):
            self._run_decode()
        out, self._finished = self._finished, []
        return out

    def poll(self) -> list[Completion]:
        """One PIPELINED serving iteration: admit queued requests, issue the
        next K-step decode dispatch, then process the PREVIOUS dispatch's
        token blob. Because dispatch N+1 is enqueued before blocking on N's
        blob, the ~30 ms relay round-trip overlaps the next K steps'
        compute. Safe: finish detection is in-program (dispatch N+1
        consumes N's output state, so freed slots are already masked); the
        only cost is that re-admission of a freed slot lags one dispatch.

        The in-flight dispatch lives on the engine (``has_work()`` counts
        it), so external serving loops (the HTTP worker thread) can
        interleave ``submit``/``cancel`` between polls."""
        if self.steps_per_dispatch <= 1:
            return self.step()
        self._admit()
        dispatched = None
        if any(s.request for s in self._slots):
            dispatched = self._dispatch_decode()
        pending, self._pending_dispatch = self._pending_dispatch, dispatched
        if pending is not None:
            self._process_decode_blob(np.asarray(pending[0]), pending[1])
            # blocks parked by cancel() during that dispatch are now safe
            self._flush_deferred_releases()
        # drain the park-preview future AFTER the next dispatch went out
        # (its program ran right behind the previous dispatch on device,
        # so this fetch does not stall the pipeline)
        self._process_pending_park()
        out, self._finished = self._finished, []
        return out

    def run_iter(self):
        """Drive to completion, yielding each poll's completions (may be
        empty). Callers that need per-iteration observability (TTFT
        measurement, streaming emission) iterate this; ``run()`` is the
        collect-everything form."""
        while self.has_work():
            yield self.poll()

    def run(self) -> list[Completion]:
        """Drive to completion (pipelined when steps_per_dispatch > 1)."""
        done: list[Completion] = []
        for batch in self.run_iter():
            done.extend(batch)
        return done

    def stats(self) -> dict:
        """Serving observability: slot/queue occupancy and token counters."""
        active = sum(1 for s in self._slots if s.request is not None)
        out = {
            "active_slots": active,
            "max_batch": self.max_batch,
            "queued_requests": len(self._queue),
            "tokens_in_flight": sum(
                len(s.generated) for s in self._slots if s.request
            ),
            "completed_requests": self._total_completions,
            "generated_tokens": self._total_tokens,
            "dispatches_per_stage": dict(self._stage_counts),
        }
        if self.prefill_ahead:
            out.update(
                parked_requests=len(self._parked_entries),
                free_park_rows=len(self._free_park_rows),
                park_rows=self.park_rows,
                parked_total=self._parked_total,
            )
        if hasattr(self, "_refs"):  # paged subclass
            out.update(
                free_blocks=len(self._free_blocks),
                cached_blocks=len(self._evictable),
                used_blocks=int((self._refs > 0).sum()),
                num_blocks=self.num_blocks,
                prefix_cache_hits=self.prefix_cache_hits,
                prefix_cache_misses=self.prefix_cache_misses,
            )
        return out

    def generate_all(self, prompts, max_new_tokens: int, eos_id: int,
                     seed: int = 0) -> list[Completion]:
        ids = [
            self.submit(p, max_new_tokens, eos_id, sampling_seed=seed + i)
            for i, p in enumerate(prompts)
        ]
        by_id = {c.request_id: c for c in self.run()}
        return [by_id[i] for i in ids]

    # --- internals ----------------------------------------------------------

    def _make_cache(self):
        return llama.init_kv_cache(
            self.cfg, self.max_batch, self.max_len, quantized=self.quantized_kv
        )

    def _make_read_cache(self):
        """Persistent contiguous read cache (paged subclasses only)."""
        return None

    def _can_admit(self, req: Request) -> bool:
        return True

    def _release_slot(self, slot_idx: int) -> None:
        pass

    def _defer_release(self, slot_idx: int) -> None:
        """Release a cancelled slot whose KV may still be written by the
        in-flight pipelined dispatch (no-op for contiguous KV: per-slot
        regions are only re-read after being rewritten)."""
        self._release_slot(slot_idx)

    def _flush_deferred_releases(self) -> None:
        pass

    def _table_device(self, stage=None):
        """Block table for paged subclasses; None selects contiguous decode."""
        return None

    def _prefill_fn(self, bucket: int, k: int):
        """One jitted program per (prompt bucket, group size): prefill ``k``
        prompts together and scatter every per-slot admission state row —
        KV region, first logits, lengths, active, counters, RNG keys, and
        the request metadata (eos/budget/min_tokens/sampling rows) — in the
        same program (one device round-trip per admitted GROUP, nothing
        fetched back)."""
        key = (bucket, k)
        if key not in self._prefill_cache:

            def fn(params, cache, read_cache, tokens, ns, slots, seeds,
                   meta_rows, last_logits, lengths, active, token_counts,
                   gen_counts, rngs, eos_ids, budgets, min_tokens,
                   prompt_lens, bsp, *extra):
                import dataclasses

                small = llama.init_kv_cache(
                    self.cfg, k, bucket, quantized=self.quantized_kv
                )
                logits, small = llama.prefill(
                    params, self.cfg, tokens, ns, small,
                    logits_head=self._logits_head(params),
                )
                cache = self._scatter_prefill(
                    cache, small, slots, bucket, *extra
                )
                read_cache = self._scatter_read_cache(
                    read_cache, small, slots, bucket
                )
                mask = jnp.arange(bucket)[None, :] < ns[:, None]
                counts = self._prompt_counts(tokens, mask)
                token_counts = token_counts.at[slots].set(counts)
                gen_counts = gen_counts.at[slots].set(0)
                last_logits = last_logits.at[slots].set(logits)
                lengths = lengths.at[slots].set(ns)
                active = active.at[slots].set(True)
                keys = jnp.stack(
                    [jnp.zeros_like(seeds), seeds], axis=-1
                ).astype(jnp.uint32)  # == PRNGKey(seed) for 32-bit seeds
                rngs = rngs.at[slots].set(keys)
                eos_ids = eos_ids.at[slots].set(meta_rows["eos"])
                budgets = budgets.at[slots].set(meta_rows["budget"])
                min_tokens = min_tokens.at[slots].set(meta_rows["min"])
                prompt_lens = prompt_lens.at[slots].set(ns)
                bsp = dataclasses.replace(
                    bsp,
                    temperature=bsp.temperature.at[slots].set(
                        meta_rows["temperature"]
                    ),
                    top_k=bsp.top_k.at[slots].set(meta_rows["top_k"]),
                    top_p=bsp.top_p.at[slots].set(meta_rows["top_p"]),
                    repetition_penalty=bsp.repetition_penalty.at[slots].set(
                        meta_rows["repetition_penalty"]
                    ),
                    frequency_penalty=bsp.frequency_penalty.at[slots].set(
                        meta_rows["frequency_penalty"]
                    ),
                )
                return (cache, read_cache, last_logits, lengths, active,
                        token_counts, gen_counts, rngs, eos_ids, budgets,
                        min_tokens, prompt_lens, bsp)

            # donate the cache (and the persistent read cache): the
            # admission scatter writes a few rows of a GB-scale buffer, and
            # without donation XLA materializes a full cache copy per
            # prefill group (warmup() adopts the outputs so the donated
            # buffer is never reused)
            self._prefill_cache[key] = jax.jit(fn, donate_argnums=(1, 2))
        return self._prefill_cache[key]

    def _meta_rows(self, reqs) -> dict:
        """Per-row request metadata for the admission scatter."""

        def arr(f, dt):
            return np.asarray([f(r) for r in reqs], dtype=dt)

        def sp_of(r):
            return r.sampling or self.sp

        return {
            "eos": arr(lambda r: r.eos_id, np.int32),
            "budget": arr(lambda r: r.max_new_tokens, np.int32),
            "min": arr(lambda r: r.min_tokens, np.int32),
            "temperature": arr(lambda r: sp_of(r).temperature, np.float32),
            "top_k": arr(lambda r: sp_of(r).top_k, np.int32),
            "top_p": arr(lambda r: sp_of(r).top_p, np.float32),
            "repetition_penalty": arr(
                lambda r: sp_of(r).repetition_penalty, np.float32
            ),
            "frequency_penalty": arr(
                lambda r: sp_of(r).frequency_penalty, np.float32
            ),
        }

    def _scatter_prefill(self, cache, small, slots, bucket: int, *extra):
        """Write small cache rows into pool slots (contiguous layout)."""
        return jax.tree.map(
            lambda big, little: big.at[:, slots, :bucket].set(
                little.astype(big.dtype)
            ),
            cache, small,
        )

    def _scatter_read_cache(self, read_cache, small, slots, bucket: int):
        """Mirror a group prefill's KV rows into the persistent contiguous
        read cache (paged engines; None passes through for everyone else).
        Identical writes to the pool scatter keep the mirror bit-exact."""
        if read_cache is None:
            return None
        return jax.tree.map(
            lambda big, little: big.at[:, slots, :bucket].set(
                little.astype(big.dtype)
            ),
            read_cache, small,
        )

    def _prepare_slot(self, slot_idx: int, req: Request) -> dict:
        """Reserve host-side resources for an admission (paged: KV blocks).
        Runs BEFORE the device prefill so later _can_admit calls in the same
        batch see the truth."""
        return {}

    def _wants_suffix(self, req: Request) -> bool:
        """True when this request must take the batch-1 prefix-cache path."""
        return False

    def _register_prefix(self, slot_idx: int, req: Request, ctx: dict):
        pass

    def _group_scatter_args(self, items, bucket: int) -> tuple:
        return ()

    def _activate_host(self, slot_idx: int, req: Request) -> None:
        sp = req.sampling or self.sp
        if sp.top_p < 1.0 and not self.bsp.use_top_p:
            # static flag flip: re-jits the decode program once
            import dataclasses

            self.bsp = dataclasses.replace(self.bsp, use_top_p=True)
        slot = self._slots[slot_idx]
        slot.request = req
        slot.generated = []
        slot.skip_preview = False

    def _prefill_group(self, items: list[tuple[int, "Request", dict]]) -> None:
        """One batched device prefill for ``items`` (all plain, non-prefix
        admissions), then host-side activation."""
        step = self._bucket_step()
        bucket = max(
            _bucket(len(r.prompt_tokens), step) for _, r, _ in items
        )
        k = len(items)
        padded = np.zeros((k, bucket), dtype=np.int32)
        ns = np.zeros((k,), dtype=np.int32)
        for row, (_, req, _) in enumerate(items):
            n = len(req.prompt_tokens)
            padded[row, :n] = req.prompt_tokens
            ns[row] = n
        slots = np.asarray([s for s, _, _ in items], dtype=np.int32)
        seeds = np.asarray(
            [r.sampling_seed & 0xFFFFFFFF for _, r, _ in items],
            dtype=np.uint32,
        ).astype(np.int32)
        meta = self._meta_rows([r for _, r, _ in items])
        extra = self._group_scatter_args(items, bucket)
        for slot_idx, req, ctx in items:
            self._activate_host(slot_idx, req)  # may flip bsp.use_top_p
        (self.cache, self.read_cache, self.last_logits, self.lengths,
         self.active, self.token_counts, self.gen_counts, self.rngs,
         self.eos_ids, self.budgets, self.min_tokens, self.prompt_lens,
         self.bsp) = self._prefill_fn(bucket, k)(
            self.params, self.cache, self.read_cache, padded, ns, slots,
            seeds, meta, self.last_logits, self.lengths, self.active,
            self.token_counts, self.gen_counts, self.rngs, self.eos_ids,
            self.budgets, self.min_tokens, self.prompt_lens, self.bsp,
            *extra,
        )
        for slot_idx, req, ctx in items:
            self._register_prefix(slot_idx, req, ctx)

    def _admit_suffix(self, slot_idx: int, req: Request) -> None:
        raise NotImplementedError  # paged-only path

    def _admit(self) -> None:
        if self.admission_policy == "shortest" and len(self._queue) > 1:
            # shortest-job-first: cheap requests stop queueing behind long
            # ones, cutting TTFT under saturation (stable sort preserves
            # arrival order within a size class)
            self._queue = collections.deque(sorted(
                self._queue,
                key=lambda r: len(r.prompt_tokens) + r.max_new_tokens,
            ))
        # parked requests were popped from the queue earlier, so they sit
        # conceptually at its front: attach them into free slots first
        self._attach_parked()
        if not self._parked_entries:
            self._admit_queue()
        # else: strict FIFO — parked entries are blocked (no free slot, or
        # paged block exhaustion); the queue must not jump ahead of them
        # pool still saturated + queue non-empty: prefill ahead into park
        self._park_ahead()

    def _admit_queue(self) -> None:
        while self._queue:
            free = [i for i, s in enumerate(self._slots) if s.request is None]
            if not free:
                return
            head = self._queue[0]
            n = len(head.prompt_tokens)
            if n + head.max_new_tokens > self.max_len:
                self._queue.popleft()
                raise ValueError(
                    f"request {head.request_id}: prompt {n} + budget "
                    f"{head.max_new_tokens} exceeds max_len {self.max_len}"
                )
            if not self._can_admit(head):
                return  # FIFO: wait for resources rather than skip ahead
            if self._wants_suffix(head):
                self._queue.popleft()
                self._admit_suffix(free[0], head)
                continue
            # pull a FIFO run of plain admissible requests; resources are
            # reserved per-request (so _can_admit stays truthful mid-batch)
            group: list[tuple[int, Request, dict]] = []
            cap = min(len(free), max(self.prefill_group_sizes))
            while self._queue and len(group) < cap:
                req = self._queue[0]
                if (len(req.prompt_tokens) + req.max_new_tokens
                        > self.max_len):
                    break  # raised on the next outer iteration
                if self._wants_suffix(req) or not self._can_admit(req):
                    break
                self._queue.popleft()
                slot_idx = free[len(group)]
                ctx = self._prepare_slot(slot_idx, req)
                group.append((slot_idx, req, ctx))
            i = 0
            while i < len(group):
                g = next(
                    s for s in self.prefill_group_sizes
                    if s <= len(group) - i
                )
                self._prefill_group(group[i : i + g])
                i += g

    # --- prefill-ahead (park) -----------------------------------------------

    def _park_eligible(self, req: Request) -> bool:
        return (
            len(req.prompt_tokens) <= self.park_len
            and req.min_tokens == 0
            and len(req.prompt_tokens) + req.max_new_tokens <= self.max_len
            and not self._wants_suffix(req)
        )

    def _park_fn(self, bucket: int, g: int):
        """One program per (prompt bucket, group): prefill into park rows,
        store prompt counts, and sample the FIRST token with the inputs
        the decode's first step would see — same seeded key split, same
        prompt counts, gen_counts=0. The attach later FORCES the decode to
        emit this exact token (one-hot last_logits), so no cross-program
        float determinism is assumed: fp32 sampling compiled into two
        different XLA programs is NOT bitwise-reproducible on TPU
        (measured round 5 — reduction/FMA layout differs per program)."""
        key = (bucket, g, self.bsp.use_top_p)
        if key not in self._park_cache_jits:
            lo = self.vocab_window[0] if self.vocab_window else 0

            def fn(params, park_cache, park_counts, park_preview, tokens,
                   ns, rows, seeds, meta_rows):
                small = llama.init_kv_cache(
                    self.cfg, g, bucket, quantized=self.quantized_kv
                )
                logits, small = llama.prefill(
                    params, self.cfg, tokens, ns, small,
                    logits_head=self._logits_head(params),
                )
                park_cache = jax.tree.map(
                    lambda big, little: big.at[:, rows, :bucket].set(
                        little.astype(big.dtype)
                    ),
                    park_cache, small,
                )
                mask = jnp.arange(bucket)[None, :] < ns[:, None]
                counts = self._prompt_counts(tokens, mask)
                park_counts = park_counts.at[rows].set(counts)
                # preview sample == decode step 0 for these rows: rng is
                # PRNGKey(seed) (what attach scatters), split exactly as
                # the decode scan does; min_tokens==0 by eligibility so
                # the eos-blocking branch is the identity
                keys0 = jnp.stack(
                    [jnp.zeros_like(seeds), seeds], axis=-1
                ).astype(jnp.uint32)
                sample_keys = jax.vmap(
                    lambda k: jax.random.split(k)
                )(keys0)[:, 1]
                bsp_g = sampling.BatchedSamplingParams(
                    temperature=meta_rows["temperature"],
                    top_k=meta_rows["top_k"],
                    top_p=meta_rows["top_p"],
                    repetition_penalty=meta_rows["repetition_penalty"],
                    frequency_penalty=meta_rows["frequency_penalty"],
                    max_top_k=self.bsp.max_top_k,
                    use_top_p=self.bsp.use_top_p,
                )
                toks_w = sampling.sample_token_batched(
                    sample_keys, logits, bsp_g, counts,
                    jnp.zeros_like(counts),
                )
                park_preview = park_preview.at[rows].set(toks_w + lo)
                return park_cache, park_counts, park_preview

            self._park_cache_jits[key] = jax.jit(
                fn, donate_argnums=(1, 2, 3)
            )
        return self._park_cache_jits[key]

    def _park_ahead(self) -> None:
        """Pool saturated (or paged block exhaustion): prefill the queue
        into park rows and emit first tokens. Parks AGGRESSIVELY — every
        eligible queued request a free park row can hold, multiple groups
        per call — so under deep overload first tokens for ALL waiting
        requests arrive at prefill latency instead of slot-wait latency
        (work-conserving: these are the same prefills the pool would run
        later; only the attach copies are extra). Requests whose preview
        token already finishes them (eos, or budget 1) complete right here
        and never occupy a slot."""
        if not self.prefill_ahead:
            return
        n = 0
        while self._queue and self._free_park_rows:
            if not self._park_eligible(self._queue[0]):
                return
            if self.park_groups_per_poll and n >= self.park_groups_per_poll:
                return
            self._park_one_group()
            n += 1

    def _park_one_group(self) -> None:
        group: list[tuple[int, Request]] = []
        cap = min(len(self._free_park_rows), max(self.prefill_group_sizes))
        while self._queue and len(group) < cap:
            req = self._queue[0]
            if not self._park_eligible(req):
                break
            self._queue.popleft()
            group.append((self._free_park_rows.pop(), req))
        if not group:
            return
        step = self._bucket_step()
        bucket = min(
            self.park_len,
            max(_bucket(len(r.prompt_tokens), step) for _, r in group),
        )
        g = len(group)
        padded = np.zeros((g, bucket), dtype=np.int32)
        ns = np.zeros((g,), dtype=np.int32)
        for i, (_, req) in enumerate(group):
            n = len(req.prompt_tokens)
            padded[i, :n] = req.prompt_tokens
            ns[i] = n
        rows = np.asarray([r for r, _ in group], dtype=np.int32)
        seeds = np.asarray(
            [r.sampling_seed & 0xFFFFFFFF for _, r in group], dtype=np.uint32
        ).astype(np.int32)
        meta = self._meta_rows([r for _, r in group])
        for _, req in group:
            # a top_p request must flip the STATIC nucleus flag before the
            # preview so park and decode sample identically
            sp = req.sampling or self.sp
            if sp.top_p < 1.0 and not self.bsp.use_top_p:
                import dataclasses

                self.bsp = dataclasses.replace(self.bsp, use_top_p=True)
        (self.park_cache, self.park_counts,
         self.park_preview) = self._park_fn(bucket, g)(
            self.params, self.park_cache,
            self.park_counts, self.park_preview, padded, ns, rows, seeds,
            meta,
        )
        # do NOT fetch the preview tokens here: the fetch would block on
        # the in-flight decode dispatch and stall the pipeline. The shared
        # preview buffer is drained by _process_pending_park AFTER the
        # next dispatch is issued (poll()) — one fixed-shape fetch covers
        # every pending group.
        self._pending_parks.append(group)

    def _process_pending_park(self) -> None:
        if not self._pending_parks:
            return
        pending, self._pending_parks = self._pending_parks, []
        # one [park_rows] fetch serves all pending groups (waits for the
        # last park program, which was enqueued before the next decode)
        preview = np.asarray(self.park_preview)
        for group in pending:
            self._process_one_park(
                preview[[row for row, _ in group]], group
            )

    def _process_one_park(self, toks_np, group) -> None:
        self._parked_total += len(group)
        now = time.perf_counter()
        for i, (row, req) in enumerate(group):
            tok = int(toks_np[i])
            self.first_token_times.setdefault(req.request_id, now)
            self._total_tokens += 1
            if tok == req.eos_id or req.max_new_tokens <= 1:
                self._total_completions += 1
                self._finished.append(Completion(
                    req.request_id,
                    np.asarray([tok], dtype=np.int32),
                    "eos" if tok == req.eos_id else "length",
                ))
                self._free_park_rows.append(row)
            else:
                self._parked_entries.append(_Parked(row, req, tok))

    def _can_attach(self, req: Request) -> bool:
        return True  # contiguous: a free slot is the only resource

    def _prepare_attach(self, slot_idx: int, req: Request) -> dict:
        return {}

    def _attach_scatter_args(self, items) -> tuple:
        return ()

    def _attach_scatter(self, cache, park_cache, rows, slots, *extra):
        """Copy park rows' KV into slot regions (contiguous layout)."""
        return jax.tree.map(
            lambda big, parked: big.at[:, slots, : self.park_len].set(
                parked[:, rows].astype(big.dtype)
            ),
            cache, park_cache,
        )

    def _attach_fn(self, g: int):
        """One program per group size: copy park-row KV into freed slots
        and scatter every per-slot admission state row — exactly
        _prefill_fn minus the forward pass (the KV is already computed).

        The slot's last_logits row becomes a ONE-HOT over the park-preview
        token (0 there, -inf elsewhere): the decode's first step then
        emits that token regardless of sampling params/keys (penalties,
        top-k/p, and gumbel noise all preserve a single finite entry) and
        forwards it to compute real step-2 logits — the already-emitted
        preview is exact BY CONSTRUCTION, with no cross-program float
        determinism assumption."""
        if g not in self._attach_cache_jits:

            def fn(cache, read_cache, park_cache, park_counts,
                   rows, slots, ns, seeds, first_toks_w, meta_rows,
                   last_logits, lengths,
                   active, token_counts, gen_counts, rngs, eos_ids, budgets,
                   min_tokens, prompt_lens, bsp, *extra):
                import dataclasses

                cache = self._attach_scatter(
                    cache, park_cache, rows, slots, *extra
                )
                if read_cache is not None:
                    read_cache = jax.tree.map(
                        lambda big, parked: big.at[
                            :, slots, : self.park_len
                        ].set(parked[:, rows].astype(big.dtype)),
                        read_cache, park_cache,
                    )
                token_counts = token_counts.at[slots].set(park_counts[rows])
                gen_counts = gen_counts.at[slots].set(0)
                w = last_logits.shape[-1]
                onehot = jnp.full((g, w), -jnp.inf, jnp.float32).at[
                    jnp.arange(g), first_toks_w
                ].set(0.0)
                last_logits = last_logits.at[slots].set(onehot)
                lengths = lengths.at[slots].set(ns)
                active = active.at[slots].set(True)
                keys = jnp.stack(
                    [jnp.zeros_like(seeds), seeds], axis=-1
                ).astype(jnp.uint32)
                rngs = rngs.at[slots].set(keys)
                eos_ids = eos_ids.at[slots].set(meta_rows["eos"])
                budgets = budgets.at[slots].set(meta_rows["budget"])
                min_tokens = min_tokens.at[slots].set(meta_rows["min"])
                prompt_lens = prompt_lens.at[slots].set(ns)
                bsp = dataclasses.replace(
                    bsp,
                    temperature=bsp.temperature.at[slots].set(
                        meta_rows["temperature"]
                    ),
                    top_k=bsp.top_k.at[slots].set(meta_rows["top_k"]),
                    top_p=bsp.top_p.at[slots].set(meta_rows["top_p"]),
                    repetition_penalty=bsp.repetition_penalty.at[slots].set(
                        meta_rows["repetition_penalty"]
                    ),
                    frequency_penalty=bsp.frequency_penalty.at[slots].set(
                        meta_rows["frequency_penalty"]
                    ),
                )
                return (cache, read_cache, last_logits, lengths, active,
                        token_counts, gen_counts, rngs, eos_ids, budgets,
                        min_tokens, prompt_lens, bsp)

            # donate the big KV buffers (park_cache is read-only here)
            self._attach_cache_jits[g] = jax.jit(fn, donate_argnums=(0, 1))
        return self._attach_cache_jits[g]

    def _attach_parked(self) -> None:
        if not self._parked_entries:
            return
        while self._parked_entries:
            free = [i for i, s in enumerate(self._slots) if s.request is None]
            if not free:
                return
            group: list[tuple[int, _Parked, dict]] = []
            while (self._parked_entries and len(group) < len(free)
                   and len(group) < max(self.prefill_group_sizes)):
                entry = self._parked_entries[0]
                if not self._can_attach(entry.request):
                    break
                self._parked_entries.popleft()
                slot_idx = free[len(group)]
                ctx = self._prepare_attach(slot_idx, entry.request)
                group.append((slot_idx, entry, ctx))
            if not group:
                return
            self._attach_group(group)

    def _attach_group(self, group) -> None:
        g = len(group)
        rows = np.asarray([e.row for _, e, _ in group], dtype=np.int32)
        slots = np.asarray([s for s, _, _ in group], dtype=np.int32)
        ns = np.asarray(
            [len(e.request.prompt_tokens) for _, e, _ in group],
            dtype=np.int32,
        )
        seeds = np.asarray(
            [e.request.sampling_seed & 0xFFFFFFFF for _, e, _ in group],
            dtype=np.uint32,
        ).astype(np.int32)
        lo = self.vocab_window[0] if self.vocab_window else 0
        first_w = np.asarray(
            [e.first_token - lo for _, e, _ in group], dtype=np.int32
        )
        meta = self._meta_rows([e.request for _, e, _ in group])
        extra = self._attach_scatter_args(group)
        for slot_idx, entry, _ in group:
            self._activate_host(slot_idx, entry.request)
            slot = self._slots[slot_idx]
            slot.generated = [entry.first_token]
            slot.skip_preview = True
        (self.cache, self.read_cache, self.last_logits, self.lengths,
         self.active, self.token_counts, self.gen_counts, self.rngs,
         self.eos_ids, self.budgets, self.min_tokens, self.prompt_lens,
         self.bsp) = self._attach_fn(g)(
            self.cache, self.read_cache, self.park_cache,
            self.park_counts, rows, slots, ns, seeds, first_w, meta,
            self.last_logits, self.lengths, self.active, self.token_counts,
            self.gen_counts, self.rngs, self.eos_ids, self.budgets,
            self.min_tokens, self.prompt_lens, self.bsp, *extra,
        )
        for slot_idx, entry, ctx in group:
            self._free_park_rows.append(entry.row)
            self._register_attach(slot_idx, entry.request, ctx)

    def _register_attach(self, slot_idx: int, req: Request, ctx: dict):
        pass

    def warmup(self, prompt_buckets: tuple[int, ...] = (64, 256)) -> None:
        """Compile every program the serving loop will hit (vLLM-style
        startup warmup): each (prompt bucket, group size) prefill variant
        plus the decode program. Dummy prefill outputs are discarded (the
        functions are pure); the decode warmup runs one real dispatch over
        the all-idle pool, which is harmless — idle slots' KV writes land in
        their own masked region (contiguous) or the reserved sink block 0
        (paged)."""
        step = self._bucket_step()
        buckets = sorted({_bucket(b, step) for b in prompt_buckets})
        for bucket in buckets:
            for g in self.prefill_group_sizes:
                fn = self._prefill_fn(bucket, g)
                tokens = np.zeros((g, bucket), np.int32)
                ns = np.full((g,), 1, np.int32)
                slots = np.zeros((g,), np.int32)
                seeds = np.zeros((g,), np.int32)
                dummies = [
                    Request(-1, np.zeros(1, np.int32), 1, -1)
                    for _ in range(g)
                ]
                extra = self._warmup_scatter_args(g, bucket)
                # adopt the outputs (the cache is DONATED — the old buffer
                # is dead after the call): the dummy rows it activates are
                # harmless, since every admission fully rewrites its slot's
                # state and the decode warmup below budget-finishes them
                (self.cache, self.read_cache, self.last_logits,
                 self.lengths, self.active, self.token_counts,
                 self.gen_counts, self.rngs, self.eos_ids, self.budgets,
                 self.min_tokens, self.prompt_lens, self.bsp) = fn(
                    self.params, self.cache, self.read_cache, tokens, ns,
                    slots, seeds, self._meta_rows(dummies),
                    self.last_logits, self.lengths, self.active,
                    self.token_counts, self.gen_counts, self.rngs,
                    self.eos_ids, self.budgets, self.min_tokens,
                    self.prompt_lens, self.bsp, *extra,
                )
                np.asarray(self.lengths)  # fetch a small leaf: completion
        if self.prefill_ahead:
            # park + attach programs (adopting donated outputs, as above)
            park_buckets = sorted({min(b, self.park_len) for b in buckets})
            for bucket in park_buckets:
                for g in self.prefill_group_sizes:
                    if g > self.park_rows:
                        continue
                    dummies = [
                        Request(-1, np.zeros(1, np.int32), 2, -1)
                        for _ in range(g)
                    ]
                    (self.park_cache, self.park_counts,
                     self.park_preview) = self._park_fn(bucket, g)(
                        self.params, self.park_cache,
                        self.park_counts, self.park_preview,
                        np.zeros((g, bucket), np.int32),
                        np.full((g,), 1, np.int32),
                        np.arange(g, dtype=np.int32),
                        np.zeros((g,), np.int32), self._meta_rows(dummies),
                    )
                    np.asarray(self.park_preview)
            for g in self.prefill_group_sizes:
                if g > self.park_rows or g > self.max_batch:
                    continue
                dummies = [
                    Request(-1, np.zeros(1, np.int32), 2, -1)
                    for _ in range(g)
                ]
                (self.cache, self.read_cache, self.last_logits,
                 self.lengths, self.active, self.token_counts,
                 self.gen_counts, self.rngs, self.eos_ids, self.budgets,
                 self.min_tokens, self.prompt_lens,
                 self.bsp) = self._attach_fn(g)(
                    self.cache, self.read_cache, self.park_cache,
                    self.park_counts,
                    np.arange(g, dtype=np.int32),
                    np.arange(g, dtype=np.int32),
                    np.full((g,), 1, np.int32), np.zeros((g,), np.int32),
                    np.zeros((g,), np.int32),
                    self._meta_rows(dummies), self.last_logits,
                    self.lengths, self.active, self.token_counts,
                    self.gen_counts, self.rngs, self.eos_ids, self.budgets,
                    self.min_tokens, self.prompt_lens, self.bsp,
                    *self._warmup_attach_args(g),
                )
                np.asarray(self.lengths)
            # the dummy attach rows sit device-active with budget 2; the
            # decode warmup below emits their 2 tokens and budget-finishes
            # them in-program (host slots are empty, so blob rows are
            # skipped — same contract as the prefill warmup dummies)
        # compile + run the decode program at EVERY stage the staged
        # dispatcher can pick (all-idle pool: harmless, see above) so no
        # serving-time dispatch hits a cold compile
        stages = ([s for s in self._stages if s < self.max_len] + [None]
                  if self.staged_cache else [None])
        for stage in stages:
            self._run_decode(stage)

    def _warmup_scatter_args(self, g: int, bucket: int) -> tuple:
        return ()

    def _warmup_attach_args(self, g: int) -> tuple:
        return ()

    def _bucket_step(self) -> int:
        return 64

    def _logits_head(self, params):
        if self.vocab_window is None:
            return None
        return llama.slice_logits_head(params, self.cfg, *self.vocab_window)

    def _prompt_counts(self, tokens, mask):
        if self.vocab_window is not None:
            return sampling.counts_from_tokens_windowed(
                tokens, mask, self.vocab_window
            )
        return sampling.counts_from_tokens(tokens, mask, self.cfg.vocab_size)

    @staticmethod
    def _slice_stage(cache, stage):
        """[:, :, :stage] of every cache leaf (token axis 2)."""
        return jax.tree.map(
            lambda x: jax.lax.slice_in_dim(x, 0, stage, axis=2), cache
        )

    @staticmethod
    def _unslice_stage(full, staged):
        """Scatter the staged region back into the full-size cache."""
        return jax.tree.map(
            lambda big, s: jax.lax.dynamic_update_slice_in_dim(
                big, s.astype(big.dtype), 0, axis=2
            ),
            full, staged,
        )

    @staticmethod
    def _guard_lengths(cache, lengths, active, table):
        """Write-index guard for INACTIVE slots (finished/cancelled — their
        KV is dead until re-prefill, but the lockstep program still scatters
        a row for them): a stagnant length may exceed a staged dispatch's
        cache slice / table width and must never index out of range.
        Contiguous: route the dead write to row 0 of the slot's own region.
        Paged: clamp to the (possibly stage-sliced) table's range — row 0
        could be a SHARED prefix-cache block, while the clamped position is
        at or past the slot's own generated region (active slots are under
        the limit by the stage invariant, so this is the identity for
        them)."""
        if table is None:
            return jnp.where(active, lengths, 0)
        limit = table.shape[1] * llama.paged_block_size(cache)
        return jnp.minimum(lengths, limit - 1)

    def _decode_step(self, params, cache, last_logits, lengths, active,
                     token_counts, gen_counts, rngs, bsp, eos_ids,
                     min_tokens, prompt_lens, table=None, *, stage=None):
        """One lockstep decode over the whole pool (masked inactive slots).

        ``stage`` is ignored for the cache here: slicing it costs 2
        stage-sized copies per program, which only amortizes over
        multi-step dispatches. The paged table still narrows to the
        stage's page span (static in-program slice; the table arrives
        full-width — see _table_device)."""
        if table is not None and stage is not None:
            w = -(-stage // llama.paged_block_size(cache))
            table = table[:, :w]
        b = self.max_batch
        lo = self.vocab_window[0] if self.vocab_window else 0
        keys = jax.vmap(lambda k: jax.random.split(k))(rngs)
        rngs, sample_keys = keys[:, 0], keys[:, 1]
        # per-row sampling params (window space under a vocab_window;
        # emitted ids are global). Per-slot RNG streams stay independent of
        # pool composition: categorical == argmax(logits + gumbel), with the
        # gumbel drawn from each slot's own key.
        # vLLM min_tokens: mask each row's EOS column on the RAW logits
        # (before penalties/top-k, matching generate.py and vLLM's
        # logits-processor-before-sampling order) while that row has
        # generated fewer than min_tokens
        eos_w = eos_ids - lo
        in_range = (eos_w >= 0) & (eos_w < last_logits.shape[-1])
        n_gen = lengths - prompt_lens
        blocked = in_range & (n_gen < min_tokens)
        rows = jnp.arange(b)
        cols = jnp.clip(eos_w, 0, last_logits.shape[-1] - 1)
        last_logits = last_logits.at[rows, cols].set(
            jnp.where(blocked, -jnp.inf, last_logits[rows, cols])
        )
        toks_w = sampling.sample_token_batched(
            sample_keys, last_logits, bsp, token_counts, gen_counts
        )
        toks = jnp.where(active, toks_w + lo, self.pad_id).astype(jnp.int32)
        inc = active.astype(jnp.int32)
        idx = jnp.arange(b)
        cidx = jnp.where(active, toks_w, 0)  # in-range; inc=0 when inactive
        token_counts = token_counts.at[idx, cidx].add(inc)
        gen_counts = gen_counts.at[idx, cidx].add(inc)
        head = self._logits_head(params)
        lengths_w = self._guard_lengths(cache, lengths, active, table)
        if table is None:
            logits, cache = llama.decode_step(
                params, self.cfg, cache, toks, lengths_w, logits_head=head
            )
        else:
            logits, cache = llama.decode_step_paged(
                params, self.cfg, cache, toks, lengths_w, table,
                logits_head=head,
                use_pallas=False if self._mesh is not None else None,
            )
        lengths = lengths + inc
        # one packed host blob: [2, B] = (tokens, pre-step active mask) —
        # a single fetch instead of two relay round-trips
        packed = jnp.stack([toks, active.astype(jnp.int32)])
        return packed, logits, cache, lengths, token_counts, gen_counts, rngs

    def _decode_multi(self, params, cache, read_cache, last_logits, lengths,
                      active, token_counts, gen_counts, rngs, bsp, eos_ids,
                      min_tokens, prompt_lens, budgets, table=None, *,
                      stage=None):
        """``steps_per_dispatch`` lockstep decode steps in ONE program.

        Finish detection (EOS sampled, or budget exhausted) runs in-program:
        a finished slot flips inactive for the remaining steps of the scan
        and the host re-admits it after the dispatch. Emits [K, B] tokens
        plus the was-active mask the host needs to attribute them.

        Packed int4 params unpack to their S4 view once here, amortized over
        all K steps — this is what makes int4 serving-engine-viable
        (models/quantization.unpack_packed_params).

        ``stage`` (contiguous engines): slice the cache's token axis to the
        dispatch's occupancy high-water stage, run the K steps against the
        slice, and scatter the region back — every step's attention/HBM read
        then covers ``stage`` slots instead of ``max_len`` at the cost of 2
        stage-sized copies per dispatch (~2/K per step). Paged engines get
        the same effect from the pre-sliced block table instead.
        """
        from tts_max_tpu.models.quantization import unpack_packed_params

        params = unpack_packed_params(params)
        if table is not None and stage is not None:
            # static in-program slice to the stage's page span (the table
            # arrives full-width; see _table_device)
            w = -(-stage // llama.paged_block_size(cache))
            table = table[:, :w]
        if self.delta_kv:
            return self._decode_multi_delta(
                params, cache, read_cache, last_logits, lengths, active,
                token_counts, gen_counts, rngs, bsp, eos_ids, min_tokens,
                prompt_lens, budgets, stage=stage, table=table,
            )
        full_cache = None
        if stage is not None and table is None:
            full_cache = cache
            cache = self._slice_stage(cache, stage)
        b = self.max_batch
        lo = self.vocab_window[0] if self.vocab_window else 0
        head = self._logits_head(params)
        rows = jnp.arange(b)

        def step(carry, _):
            (cache, last_logits, lengths, active, token_counts, gen_counts,
             rngs) = carry
            keys = jax.vmap(lambda k: jax.random.split(k))(rngs)
            rngs, sample_keys = keys[:, 0], keys[:, 1]
            eos_w = eos_ids - lo
            in_range = (eos_w >= 0) & (eos_w < last_logits.shape[-1])
            n_gen = lengths - prompt_lens
            blocked = in_range & (n_gen < min_tokens)
            cols = jnp.clip(eos_w, 0, last_logits.shape[-1] - 1)
            ll = last_logits.at[rows, cols].set(
                jnp.where(blocked, -jnp.inf, last_logits[rows, cols])
            )
            toks_w = sampling.sample_token_batched(
                sample_keys, ll, bsp, token_counts, gen_counts
            )
            toks = jnp.where(active, toks_w + lo, self.pad_id).astype(
                jnp.int32
            )
            emitted = active
            inc = active.astype(jnp.int32)
            cidx = jnp.where(active, toks_w, 0)
            token_counts = token_counts.at[rows, cidx].add(inc)
            gen_counts = gen_counts.at[rows, cidx].add(inc)
            # in-program finish: the emitted token ends the request
            finished = emitted & (
                (toks == eos_ids) | (n_gen + inc >= budgets)
            )
            active = active & ~finished
            lengths_w = self._guard_lengths(cache, lengths, active, table)
            if table is None:
                logits, cache = llama.decode_step(
                    params, self.cfg, cache, toks, lengths_w,
                    logits_head=head
                )
            else:
                logits, cache = llama.decode_step_paged(
                    params, self.cfg, cache, toks, lengths_w, table,
                    logits_head=head,
                    use_pallas=False if self._mesh is not None else None,
                )
            lengths = lengths + inc
            return (
                cache, logits, lengths, active, token_counts, gen_counts,
                rngs,
            ), (toks, emitted)

        carry = (cache, last_logits, lengths, active, token_counts,
                 gen_counts, rngs)
        carry, (toks_k, emitted_k) = jax.lax.scan(
            step, carry, None, length=self.steps_per_dispatch
        )
        if full_cache is not None:
            carry = (self._unslice_stage(full_cache, carry[0]),) + carry[1:]
        # one packed host blob: [2K+1, B] = (K token rows, K emitted rows,
        # final active row) — a single fetch instead of three
        packed = jnp.concatenate(
            [toks_k, emitted_k.astype(jnp.int32),
             carry[3].astype(jnp.int32)[None]], axis=0
        )
        # non-delta paths never read the persistent read cache; pass it
        # through untouched (stale is fine — only delta dispatches read it)
        return (carry[0], read_cache) + carry[1:] + (packed,)

    def _decode_multi_delta(self, params, cache, read_cache, last_logits,
                            lengths, active, token_counts, gen_counts, rngs,
                            bsp, eos_ids, min_tokens, prompt_lens, budgets, *,
                            stage=None, table=None):
        """Delta-KV form of the K-step dispatch (contiguous AND paged).

        The big cache is READ-ONLY inside the scan — each step's K/V rows
        land in a [L, B, K, Hkv, D] delta buffer and attention runs jointly
        over cache[:base_lengths] + the masked delta
        (llama.decode_step_delta); ONE commit scatter per dispatch writes
        the delta back. This removes the full-cache copy XLA makes for the
        per-step scatter (round-4 ablation: the write cost 2.5x the
        attention read at 768 slots), and makes stage slicing free (a pure
        read fuses; no write-back needed).

        Paged engines (``table`` given, stage-sliced by the caller): the
        table's span of the block pool is gathered ONCE per dispatch into a
        contiguous [L, B, W*bs, Hkv, D] read cache, the scan runs the exact
        contiguous delta step against it, and ``commit_delta_paged``
        scatters the delta back through the table. This replaces the
        per-step paged pool scatter — which forced XLA to copy the whole
        pool every step, the bulk of round 3's ~8 ms/step paged premium —
        with ~2 stage-sized copies per K steps.

        Paged engines with ``read_cache`` (persistent_read_cache=True, the
        round-5 default): the per-dispatch gather above is eliminated
        entirely — the engine keeps a contiguous [L, B, max_len] mirror of
        every slot's KV alive ACROSS dispatches, refreshed by the same
        cheap row-sized writes that maintain the pool (prefill scatters
        write both; each dispatch's delta commits to both). The scan reads
        a pure stage slice of the mirror (free, fuses) exactly like the
        contiguous engine, so the paged decode step costs what contiguous
        costs plus one row-sized paged commit per dispatch. Bit-exact vs
        the gather mode: both buffers receive identical writes and garbage
        rows are masked by base_lengths. Cost: B×max_len extra KV HBM."""
        b = self.max_batch
        kk = self.steps_per_dispatch
        lo = self.vocab_window[0] if self.vocab_window else 0
        head = self._logits_head(params)
        rows = jnp.arange(b)
        base_lengths = lengths
        if table is not None:
            if read_cache is not None:
                limit = table.shape[1] * llama.paged_block_size(cache)
                read = (
                    self._slice_stage(read_cache, limit)
                    if limit < llama.cache_max_len(read_cache)
                    else read_cache
                )
            else:
                read = llama.gather_paged_read_cache(cache, table)
        else:
            read = (
                self._slice_stage(cache, stage) if stage is not None
                else cache
            )
        delta = llama.init_delta(self.cfg, b, kk)
        delta_mask = jnp.zeros((b, kk), dtype=bool)

        def step(carry, j):
            (delta, delta_mask, last_logits, lengths, active, token_counts,
             gen_counts, rngs) = carry
            keys = jax.vmap(lambda k: jax.random.split(k))(rngs)
            rngs, sample_keys = keys[:, 0], keys[:, 1]
            eos_w = eos_ids - lo
            in_range = (eos_w >= 0) & (eos_w < last_logits.shape[-1])
            n_gen = lengths - prompt_lens
            blocked = in_range & (n_gen < min_tokens)
            cols = jnp.clip(eos_w, 0, last_logits.shape[-1] - 1)
            ll = last_logits.at[rows, cols].set(
                jnp.where(blocked, -jnp.inf, last_logits[rows, cols])
            )
            toks_w = sampling.sample_token_batched(
                sample_keys, ll, bsp, token_counts, gen_counts
            )
            toks = jnp.where(active, toks_w + lo, self.pad_id).astype(
                jnp.int32
            )
            emitted = active
            inc = active.astype(jnp.int32)
            cidx = jnp.where(active, toks_w, 0)
            token_counts = token_counts.at[rows, cidx].add(inc)
            gen_counts = gen_counts.at[rows, cidx].add(inc)
            finished = emitted & (
                (toks == eos_ids) | (n_gen + inc >= budgets)
            )
            active = active & ~finished
            delta_mask = delta_mask.at[:, j].set(emitted)
            # rope/delta positions: inactive slots re-use row j with their
            # stagnant length (masked out of attention; commit lands in
            # their dead region)
            logits, delta = llama.decode_step_delta(
                params, self.cfg, read, delta, toks,
                jnp.minimum(lengths, llama.cache_max_len(read) - 1),
                base_lengths, delta_mask, j, logits_head=head,
            )
            lengths = lengths + inc
            return (
                delta, delta_mask, logits, lengths, active, token_counts,
                gen_counts, rngs,
            ), (toks, emitted)

        carry = (delta, delta_mask, last_logits, lengths, active,
                 token_counts, gen_counts, rngs)
        carry, (toks_k, emitted_k) = jax.lax.scan(
            step, carry, jnp.arange(kk)
        )
        (delta, delta_mask, last_logits, lengths, active, token_counts,
         gen_counts, rngs) = carry
        if table is not None:
            if read_cache is not None:
                # persistent mirror: decode rows live ONLY in the mirror.
                # Nothing ever reads them back out of the pool — prefix
                # caching registers full PROMPT blocks only, suffix
                # admissions gather prompt blocks only, and gather-mode is
                # mutually exclusive with the mirror — so the paged pool
                # commit is skipped entirely (the pool stays the prompt
                # store + block accounting).
                read_cache = llama.commit_delta(
                    read_cache, delta, base_lengths
                )
            else:
                cache = llama.commit_delta_paged(cache, delta, base_lengths,
                                                 table)
        else:
            cache = llama.commit_delta(cache, delta, base_lengths)
        packed = jnp.concatenate(
            [toks_k, emitted_k.astype(jnp.int32),
             active.astype(jnp.int32)[None]], axis=0
        )
        return (cache, read_cache, last_logits, lengths, active,
                token_counts, gen_counts, rngs, packed)

    def _finish_token(self, slot_idx: int, tok: int) -> bool:
        """Append ``tok`` to the slot; finalize the completion if it ends the
        request. Returns True when the slot was freed."""
        slot = self._slots[slot_idx]
        req = slot.request
        slot.generated.append(tok)
        if len(slot.generated) == 1:
            self.first_token_times.setdefault(
                req.request_id, time.perf_counter()
            )
        self._total_tokens += 1
        if tok == req.eos_id or len(slot.generated) >= req.max_new_tokens:
            reason = "eos" if tok == req.eos_id else "length"
            self._total_completions += 1
            self._finished.append(
                Completion(
                    req.request_id,
                    np.asarray(slot.generated, dtype=np.int32),
                    reason,
                )
            )
            slot.request = None
            slot.generated = []
            self._release_slot(slot_idx)
            return True
        return False

    def _dispatch_decode(self, stage="auto"):
        """Issue one multi-step decode dispatch (async); chain the device
        state to its outputs. Returns (packed blob future, snapshot of the
        request id occupying each slot at dispatch time) — under pipelining
        a blob is processed AFTER later admissions, so its rows must be
        attributed to the occupants it was dispatched for."""
        if stage == "auto":
            stage = self._dispatch_stage()
        self._stage_counts[stage if stage is not None else self.max_len] += 1
        snapshot = [
            s.request.request_id if s.request is not None else None
            for s in self._slots
        ]
        (self.cache, self.read_cache, self.last_logits, self.lengths,
         self.active, self.token_counts, self.gen_counts, self.rngs,
         packed) = self._decode_k_jit(stage)(
            self.params, self.cache, self.read_cache, self.last_logits,
            self.lengths, self.active, self.token_counts, self.gen_counts,
            self.rngs, self.bsp, self.eos_ids, self.min_tokens,
            self.prompt_lens, self.budgets, self._table_device(stage),
        )
        return packed, snapshot

    def _run_decode_multi(self, stage="auto") -> None:
        packed, snapshot = self._dispatch_decode(stage)
        self._process_decode_blob(np.asarray(packed), snapshot)

    def _process_decode_blob(self, blob: np.ndarray, snapshot) -> None:
        ksteps = self.steps_per_dispatch
        toks_np = blob[:ksteps]
        emitted_np = blob[ksteps : 2 * ksteps].astype(bool)
        active_np = blob[2 * ksteps].astype(bool)
        freed = []
        for i, slot in enumerate(self._slots):
            if slot.request is None or slot.request.request_id != snapshot[i]:
                continue  # slot re-admitted since this blob was dispatched
            for k in range(toks_np.shape[0]):
                if not emitted_np[k, i]:
                    continue
                if slot.skip_preview:
                    # attach-from-park: this row re-derives the token the
                    # park preview already emitted (deterministic — same
                    # rng split, logits, counts); consume without
                    # appending. It cannot finish the request: park
                    # completes eos/budget-1 previews without attaching.
                    slot.skip_preview = False
                    tok = int(toks_np[k, i])
                    assert tok == slot.generated[0], (
                        f"park preview token {slot.generated[0]} != decode "
                        f"re-derivation {tok} for request "
                        f"{slot.request.request_id} (slot {i})"
                    )
                    continue
                if self._finish_token(i, int(toks_np[k, i])):
                    freed.append(i)
                    break
        # the device already flipped finished slots inactive; verify both
        # directions of host/device agreement (a mismatch means budgets/eos
        # drifted between the two and would otherwise spin or drop output)
        assert not any(active_np[i] for i in freed), (
            "device/host finish disagreement: host freed a slot the device "
            "still considers active"
        )
        stuck = [
            i for i, slot in enumerate(self._slots)
            if slot.request is not None and i not in freed
            and slot.request.request_id == snapshot[i]
            and not active_np[i]
        ]
        if stuck:
            raise RuntimeError(
                f"device/host finish disagreement: device deactivated "
                f"slot(s) {stuck} but the host never saw a finishing token "
                f"(requests "
                f"{[self._slots[i].request.request_id for i in stuck]}) — "
                f"run() would spin forever"
            )

    def _run_decode(self, stage="auto") -> None:
        if self.steps_per_dispatch > 1:
            self._run_decode_multi(stage)
            return
        if stage == "auto":
            stage = self._dispatch_stage()
        (packed, logits, self.cache, self.lengths, self.token_counts,
         self.gen_counts, self.rngs) = self._decode_jit(stage)(
            self.params, self.cache, self.last_logits, self.lengths,
            self.active, self.token_counts, self.gen_counts, self.rngs,
            self.bsp, self.eos_ids, self.min_tokens, self.prompt_lens,
            self._table_device(stage),
        )
        self.last_logits = logits
        blob = np.asarray(packed)  # ONE fetch: [2, B]
        toks_np, active_np = blob[0], blob[1].astype(bool)
        for i, slot in enumerate(self._slots):
            if slot.request is None or not active_np[i]:
                continue
            if slot.skip_preview:  # see _process_decode_blob
                slot.skip_preview = False
                assert int(toks_np[i]) == slot.generated[0]
                continue
            if self._finish_token(i, int(toks_np[i])):
                self.active = self.active.at[i].set(False)


class PagedInferenceEngine(InferenceEngine):
    """Continuous batching over a block-pool KV cache (vLLM paging).

    Instead of a contiguous ``max_len`` reservation per slot, KV lives in
    ``num_blocks`` blocks of ``block_size`` tokens; each request reserves
    only ``ceil((prompt + budget) / block_size)`` blocks at admission (so a
    mid-flight request can never run out), and frees them the moment it
    finishes. The same pool therefore admits far more mixed-length traffic
    than ``max_batch × max_len`` sizing: the memory high-water mark follows
    actual prompt+budget, not the worst case.

    Decode attention reads KV straight through the block table (Pallas
    kernel on TPU, gather fallback on CPU — ops/paged_attention.py).

    ``enable_prefix_cache=True`` adds vLLM-style automatic prefix caching:
    full prompt blocks are content-addressed by a chained hash; an admitted
    request reuses every cached leading block (refcounted, shared across
    concurrent slots — TTS requests with the same voice-prompt prefix share
    one copy of its KV) and only forwards the uncovered suffix, which for a
    long voice prompt removes most of the prefill compute. Freed blocks stay
    cached (zero-ref, LRU-evicted) until the pool needs them.
    """

    def __init__(
        self,
        params: Any,
        cfg: llama.LlamaConfig,
        *,
        num_blocks: int | None = None,
        block_size: int = 64,
        max_batch: int = 8,
        max_len: int = 2048,
        sp: SamplingParams = SamplingParams(),
        pad_id: int = 0,
        quantized_kv: bool = False,
        vocab_window: tuple[int, int] | None = None,
        enable_prefix_cache: bool = False,
        max_top_k: int = 64,
        steps_per_dispatch: int = 1,
        mesh=None,
        staged_cache: bool = True,
        min_stage: int = 256,
        admission_policy: str = "fifo",
        delta_kv: bool = True,
        persistent_read_cache: bool = True,
        prefill_ahead: bool = False,
        park_rows: int | None = None,
        park_len: int | None = None,
        park_groups_per_poll: int = 0,
    ):
        """``persistent_read_cache`` (delta-KV dispatches only): keep a
        contiguous [L, B, max_len] mirror of every slot's KV alive across
        dispatches instead of re-gathering the block table's span of the
        pool every K steps. The mirror is maintained by the same row-sized
        writes as the pool (prefill + delta commits), so decode dispatches
        run the exact contiguous delta program — this closes most of the
        paged engine's throughput gap vs contiguous at the cost of
        B×max_len extra KV HBM (the pool stays authoritative: prefix
        caching, cancel, and block accounting are unchanged). Disable to
        trade that HBM back for the per-dispatch gather."""
        if max_len % block_size:
            raise ValueError("max_len must be a multiple of block_size")
        self.persistent_read_cache = persistent_read_cache
        self.block_size = block_size
        # +1: block 0 is the reserved write sink (below), so default sizing
        # still fits max_batch full-length requests
        self.num_blocks = num_blocks or (
            (max_batch * max_len) // block_size + 1
        )
        self.table_width = max_len // block_size
        # Block 0 is a RESERVED WRITE SINK, never allocated or cached: the
        # lockstep decode program scatters KV for every pool row, including
        # idle/released slots (all-zero table rows) and budget-finished slots
        # whose length crossed one block past their allocation (table entry
        # 0).  Those dangling writes must land somewhere no live request or
        # cached prefix can ever read, else they silently corrupt another
        # request's KV.
        self._free_blocks = list(range(1, self.num_blocks))
        self._deferred_free: list[int] = []
        self._slot_blocks: list[list[int]] = [[] for _ in range(max_batch)]
        # unallocated entries stay 0 = the sink (attention masks by length)
        self._table = np.zeros((max_batch, self.table_width), dtype=np.int32)
        self._table_dirty = True
        self._table_dev = None
        # --- prefix cache state ---
        self.enable_prefix_cache = enable_prefix_cache
        self._refs = np.zeros((self.num_blocks,), dtype=np.int64)
        self._hash_of: dict[int, bytes] = {}  # block id -> chain hash
        self._block_of: dict[bytes, int] = {}  # chain hash -> block id
        # zero-ref blocks still holding cached KV, in LRU order
        self._evictable: "collections.OrderedDict[int, bytes]" = (
            collections.OrderedDict()
        )
        self._suffix_prefill_cache: dict[tuple[int, int], Callable] = {}
        self.prefix_cache_hits = 0  # full blocks reused (stats)
        self.prefix_cache_misses = 0
        super().__init__(
            params, cfg, max_batch=max_batch, max_len=max_len, sp=sp,
            pad_id=pad_id, quantized_kv=quantized_kv,
            vocab_window=vocab_window, max_top_k=max_top_k,
            steps_per_dispatch=steps_per_dispatch, mesh=mesh,
            staged_cache=staged_cache, min_stage=min_stage,
            admission_policy=admission_policy, delta_kv=delta_kv,
            prefill_ahead=prefill_ahead, park_rows=park_rows,
            park_len=park_len, park_groups_per_poll=park_groups_per_poll,
        )

    def _make_cache(self):
        return llama.init_paged_kv_cache(
            self.cfg, self.num_blocks, self.block_size,
            quantized=self.quantized_kv,
        )

    def _make_read_cache(self):
        # only delta-KV multi-step dispatches ever read the mirror; skip
        # the allocation otherwise (self.delta_kv is already normalized to
        # require steps_per_dispatch > 1 by the base __init__)
        if not (self.persistent_read_cache and self.delta_kv):
            return None
        return llama.init_kv_cache(
            self.cfg, self.max_batch, self.max_len,
            quantized=self.quantized_kv,
        )

    def _bucket_step(self) -> int:
        # prompt buckets must tile exactly into blocks for the prefill scatter
        step = 64
        while step % self.block_size:
            step += 64
        return step

    def _blocks_needed(self, req: Request) -> int:
        total = len(req.prompt_tokens) + req.max_new_tokens
        bucket = _bucket(len(req.prompt_tokens), self._bucket_step())
        return (max(total, bucket) + self.block_size - 1) // self.block_size

    # --- prefix-cache bookkeeping -------------------------------------------

    def _block_hashes(self, toks: np.ndarray) -> list[bytes]:
        """Chained content hash per FULL block of the prompt."""
        bs = self.block_size
        out: list[bytes] = []
        h = b""
        for i in range(len(toks) // bs):
            h = hashlib.blake2b(
                h + np.ascontiguousarray(toks[i * bs : (i + 1) * bs]).tobytes(),
                digest_size=16,
            ).digest()
            out.append(h)
        return out

    def _prefix_hits(self, req: Request) -> tuple[list[bytes], int]:
        """(all full-block hashes, number of leading cached blocks). Capped
        so at least one real prompt token is always forwarded (the engine
        needs the last-position logits)."""
        if not self.enable_prefix_cache:
            return [], 0
        hashes = self._block_hashes(req.prompt_tokens)
        m = 0
        for h in hashes:
            if h not in self._block_of:
                break
            m += 1
        return hashes, min(m, (len(req.prompt_tokens) - 1) // self.block_size)

    def _alloc_block(self) -> int:
        if self._free_blocks:
            return self._free_blocks.pop()
        blk, h = self._evictable.popitem(last=False)  # LRU eviction
        del self._block_of[h]
        del self._hash_of[blk]
        return blk

    def _can_admit(self, req: Request) -> bool:
        hashes, m = self._prefix_hits(req)
        reused_evictable = sum(
            1 for h in hashes[:m] if self._refs[self._block_of[h]] == 0
        )
        available = (
            len(self._free_blocks) + len(self._evictable) - reused_evictable
        )
        return self._blocks_needed(req) - m <= available

    def _release_slot(self, slot_idx: int) -> None:
        blocks = self._slot_blocks[slot_idx]
        self._slot_blocks[slot_idx] = []
        self._table[slot_idx] = 0
        self._table_dirty = True
        self._free_block_list(blocks)

    def _free_block_list(self, blocks) -> None:
        for blk in blocks:
            self._refs[blk] -= 1
            if self._refs[blk] == 0:
                if blk in self._hash_of:
                    self._evictable[blk] = self._hash_of[blk]
                else:
                    self._free_blocks.append(blk)

    def _defer_release(self, slot_idx: int) -> None:
        """Cancel under an in-flight pipelined dispatch: zero the table row
        (next dispatch routes this slot's writes to the sink block) but keep
        the block refs until the in-flight blob is processed — the old
        dispatch still scatters KV through the snapshotted table, so the
        blocks must not be reallocated in this window."""
        self._deferred_free.extend(self._slot_blocks[slot_idx])
        self._slot_blocks[slot_idx] = []
        self._table[slot_idx] = 0
        self._table_dirty = True

    def _flush_deferred_releases(self) -> None:
        blocks, self._deferred_free = self._deferred_free, []
        self._free_block_list(blocks)

    def _table_device(self, stage=None):
        # upload the FULL-width block table, and only when it changed: the
        # per-stage width used to be sliced host-side, which re-uploaded
        # the table whenever the dispatch stage oscillated (~25 ms of
        # relay round-trip per dispatch — most of the paged K=16
        # regression measured round 5). The decode programs now slice the
        # static per-stage width in-program (free), so the narrow page
        # walk is preserved without any host traffic.
        if self._table_dirty:
            self._table_dev = jnp.asarray(
                np.ascontiguousarray(self._table)
            )
            self._table_dirty = False
        return self._table_dev

    def _scatter_prefill(self, cache, small, slots, bucket: int, *extra):
        """Scatter small cache rows through per-row block tables [k, nb].
        Rows whose request owns fewer than ``nb`` blocks route the surplus
        bucket padding to the reserved sink block 0."""
        if self.read_cache is not None and not self.enable_prefix_cache:
            # persistent mirror + no prefix cache: nothing ever reads the
            # pool's PROMPT rows either (suffix admissions exist only with
            # the prefix cache), so the pool is pure block accounting and
            # the through-table scatter is skipped — paged admission then
            # costs what contiguous admission costs (round-5 probe: the
            # table scatter was +24 ms per group-8 prefill)
            return cache
        (tables,) = extra
        bs = self.block_size
        nb = bucket // bs

        def scatter(big, little):
            lit = little.reshape(
                little.shape[0], little.shape[1], nb, bs, *little.shape[3:]
            )
            return big.at[:, tables].set(lit.astype(big.dtype))

        return jax.tree.map(scatter, cache, small)

    def _prepare_slot(self, slot_idx: int, req: Request) -> dict:
        """Allocate this request's KV blocks and point its table row at
        them (host state only — the KV itself is written by the group's
        device prefill that follows)."""
        hashes, m = self._prefix_hits(req)
        reused = [self._block_of[h] for h in hashes[:m]]
        for blk in reused:
            if self._refs[blk] == 0:
                self._evictable.pop(blk, None)
            self._refs[blk] += 1
        fresh = [self._alloc_block()
                 for _ in range(self._blocks_needed(req) - m)]
        for blk in fresh:
            self._refs[blk] += 1
        blocks = reused + fresh
        self._slot_blocks[slot_idx] = blocks
        self._table[slot_idx] = 0
        self._table[slot_idx, : len(blocks)] = blocks
        self._table_dirty = True
        return {"hashes": hashes, "m": m, "reused": reused, "blocks": blocks}

    def _wants_suffix(self, req: Request) -> bool:
        return self._prefix_hits(req)[1] > 0

    def _register_prefix(self, slot_idx: int, req: Request, ctx: dict):
        if not self.enable_prefix_cache:
            return
        m, hashes, blocks = ctx["m"], ctx["hashes"], ctx["blocks"]
        self.prefix_cache_hits += m
        covered = len(req.prompt_tokens) // self.block_size  # FULL blocks
        self.prefix_cache_misses += covered - m
        for i in range(m, covered):
            h = hashes[i]
            if h not in self._block_of:
                self._block_of[h] = blocks[i]
                self._hash_of[blocks[i]] = h

    def _group_scatter_args(self, items, bucket: int) -> tuple:
        nb = bucket // self.block_size
        tables = np.zeros((len(items), nb), dtype=np.int32)
        for row, (_, _, ctx) in enumerate(items):
            blocks = ctx["blocks"][:nb]
            tables[row, : len(blocks)] = blocks  # remainder -> sink block 0
        return (tables,)

    def _warmup_scatter_args(self, g: int, bucket: int) -> tuple:
        # all-zero tables: warmup KV lands in the sink block
        return (np.zeros((g, bucket // self.block_size), dtype=np.int32),)

    def _warmup_attach_args(self, g: int) -> tuple:
        return (
            np.zeros((g, self.park_len // self.block_size), dtype=np.int32),
        )

    # --- prefill-ahead, paged form ------------------------------------------
    # (a prefix-cache hit stays on the queued suffix path — the base
    # _park_eligible excludes _wants_suffix requests, since parking does a
    # full prefill and cannot scatter onto shared cached blocks)

    def _can_attach(self, req: Request) -> bool:
        # fresh allocation, no prefix reuse: shared cached blocks cannot be
        # scatter targets for the park copy (other requests read them)
        return self._blocks_needed(req) <= (
            len(self._free_blocks) + len(self._evictable)
        )

    def _prepare_attach(self, slot_idx: int, req: Request) -> dict:
        hashes = (
            self._block_hashes(req.prompt_tokens)
            if self.enable_prefix_cache else []
        )
        blocks = [self._alloc_block() for _ in range(self._blocks_needed(req))]
        for blk in blocks:
            self._refs[blk] += 1
        self._slot_blocks[slot_idx] = blocks
        self._table[slot_idx] = 0
        self._table[slot_idx, : len(blocks)] = blocks
        self._table_dirty = True
        return {"hashes": hashes, "m": 0, "reused": [], "blocks": blocks}

    def _attach_scatter_args(self, items) -> tuple:
        nb = self.park_len // self.block_size
        tables = np.zeros((len(items), nb), dtype=np.int32)
        for row, (_, _, ctx) in enumerate(items):
            blocks = ctx["blocks"][:nb]
            tables[row, : len(blocks)] = blocks  # remainder -> sink block 0
        return (tables,)

    def _attach_scatter(self, cache, park_cache, rows, slots, *extra):
        """Scatter park rows' KV through the slots' fresh block tables
        (columns past a short allocation route to the sink block)."""
        if self.read_cache is not None and not self.enable_prefix_cache:
            return cache  # accounting-only pool — see _scatter_prefill
        (tables,) = extra
        bs = self.block_size
        nb = self.park_len // bs

        def scatter(big, parked):
            lit = parked[:, rows]  # [L, g, park_len, ...]
            lit = lit.reshape(
                lit.shape[0], lit.shape[1], nb, bs, *lit.shape[3:]
            )
            return big.at[:, tables].set(lit.astype(big.dtype))

        return jax.tree.map(scatter, cache, park_cache)

    def _register_attach(self, slot_idx: int, req: Request, ctx: dict):
        # the attached blocks hold the exact prompt KV: populate the
        # prefix cache from them like a normal prefill admission
        self._register_prefix(slot_idx, req, ctx)

    def _suffix_prefill_fn(self, m: int, bucket: int, suffix_bucket: int):
        """One program per (cached-prefix blocks, suffix bucket): gather the
        shared prefix KV from the pool, forward ONLY the suffix through
        decode_window, scatter the new blocks back, and write every per-slot
        admission state row in the same program."""
        key = (m, suffix_bucket)
        if key not in self._suffix_prefill_cache:
            prefix_len = m * self.block_size

            def fn(params, cache, read_cache, prompt_tokens, length,
                   suffix_tokens, suffix_len, prefix_blocks, new_blocks,
                   slot, seed, meta, last_logits, lengths, active,
                   token_counts, gen_counts, rngs, eos_ids, budgets,
                   min_tokens, prompt_lens, bsp):
                import dataclasses

                small = llama.gather_blocks_to_cache(cache, prefix_blocks)
                small = llama.grow_cache(small, prefix_len + suffix_bucket)
                logits, small = llama.decode_window(
                    params, self.cfg, small, suffix_tokens,
                    jnp.full((1,), prefix_len, jnp.int32),
                    logits_head=self._logits_head(params),
                )
                cache = llama.scatter_suffix_to_blocks(
                    cache, small, new_blocks, prefix_len
                )
                if read_cache is not None:
                    # mirror the slot's FULL prompt KV (gathered prefix +
                    # fresh suffix) into the persistent contiguous cache
                    def upd(big, little):
                        start = (0, slot, 0) + (0,) * (big.ndim - 3)
                        return jax.lax.dynamic_update_slice(
                            big, little.astype(big.dtype), start
                        )

                    read_cache = jax.tree.map(upd, read_cache, small)
                last = jnp.take_along_axis(
                    logits, (suffix_len - 1)[:, None, None], axis=1
                )[:, 0]
                mask = jnp.arange(bucket)[None, :] < length[:, None]
                counts = self._prompt_counts(prompt_tokens, mask)
                token_counts = jax.lax.dynamic_update_slice(
                    token_counts, counts, (slot, 0)
                )
                gen_counts = gen_counts.at[slot].set(0)
                last_logits = last_logits.at[slot].set(last[0])
                lengths = lengths.at[slot].set(length[0])
                active = active.at[slot].set(True)
                key_arr = jnp.stack(
                    [jnp.zeros_like(seed), seed]
                ).astype(jnp.uint32)
                rngs = rngs.at[slot].set(key_arr)
                sl = jnp.asarray([slot])
                eos_ids = eos_ids.at[sl].set(meta["eos"])
                budgets = budgets.at[sl].set(meta["budget"])
                min_tokens = min_tokens.at[sl].set(meta["min"])
                prompt_lens = prompt_lens.at[sl].set(length)
                bsp = dataclasses.replace(
                    bsp,
                    temperature=bsp.temperature.at[sl].set(
                        meta["temperature"]
                    ),
                    top_k=bsp.top_k.at[sl].set(meta["top_k"]),
                    top_p=bsp.top_p.at[sl].set(meta["top_p"]),
                    repetition_penalty=bsp.repetition_penalty.at[sl].set(
                        meta["repetition_penalty"]
                    ),
                    frequency_penalty=bsp.frequency_penalty.at[sl].set(
                        meta["frequency_penalty"]
                    ),
                )
                return (cache, read_cache, last_logits, lengths, active,
                        token_counts, gen_counts, rngs, eos_ids, budgets,
                        min_tokens, prompt_lens, bsp)

            # cache + read cache donated for the same reason as _prefill_fn
            # (never called from warmup, so no discarded-output hazard)
            self._suffix_prefill_cache[key] = jax.jit(
                fn, donate_argnums=(1, 2)
            )
        return self._suffix_prefill_cache[key]

    def _admit_suffix(self, slot_idx: int, req: Request) -> None:
        ctx = self._prepare_slot(slot_idx, req)
        m, bs = ctx["m"], self.block_size
        n = len(req.prompt_tokens)
        bucket = _bucket(n, self._bucket_step())
        padded = np.zeros((1, bucket), dtype=np.int32)
        padded[0, :n] = req.prompt_tokens
        suffix_bucket = bucket - m * bs
        self._activate_host(slot_idx, req)  # may flip bsp.use_top_p
        (self.cache, self.read_cache, self.last_logits, self.lengths,
         self.active, self.token_counts, self.gen_counts, self.rngs,
         self.eos_ids, self.budgets, self.min_tokens, self.prompt_lens,
         self.bsp) = (
            self._suffix_prefill_fn(m, bucket, suffix_bucket)(
                self.params,
                self.cache,
                self.read_cache,
                padded,
                np.asarray([n], np.int32),
                padded[:, m * bs : bucket],
                np.asarray([n - m * bs], np.int32),
                np.asarray(ctx["reused"], np.int32),
                np.asarray(ctx["blocks"][m : bucket // bs], np.int32),
                slot_idx,
                np.int32(req.sampling_seed & 0x7FFFFFFF),
                self._meta_rows([req]),
                self.last_logits, self.lengths, self.active,
                self.token_counts, self.gen_counts, self.rngs,
                self.eos_ids, self.budgets, self.min_tokens,
                self.prompt_lens, self.bsp,
            )
        )
        self._register_prefix(slot_idx, req, ctx)
