"""Native GRPO trainer — TPU-resident sampler + jitted policy update.

Replaces trl.GRPOTrainer + the vLLM generation server
(/root/reference/tts/training/rlhf/rlhf_main.py:110-164,
run_rlhf_combine.sh:45-61): instead of HTTP round-trips to a second node,
the SAME mesh time-multiplexes sampling (the jitted while_loop generator)
and training (a jitted GRPO step). Weight "sync" is passing the updated
params pytree to the sampler — a no-op device-side.

Pod-scale alternative (``topology=``): a
:class:`~tts_max_tpu.training.rlhf.topology.TrainerSamplerTopology` splits
the device set into a trainer sub-mesh (FSDP/DP-sharded update) and a
sampler sub-mesh (TP serving). The weight sync then becomes an explicit
cross-mesh reshard (``push_to_sampler`` — the reference's NCCL weight
broadcast) before every rollout round, and ``rollout_via_engine=True``
generates through the continuous-batching serving engine on the sampler
mesh (the vLLM-server role) instead of the one-shot generate program.

Objective (GRPO, group-relative advantages, TRL num_iterations=1 semantics):
  adv_i = (r_i - mean_group) [/ std_group if scale_rewards]
  L = -E_tokens[ exp(logp - sg(logp)) · adv ] + β · KL_k3(policy ‖ ref)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tts_max_tpu.core.config import RLHFConfig
from tts_max_tpu.inference.generate import make_generate_fn
from tts_max_tpu.models import llama
from tts_max_tpu.ops.sampling import SamplingParams
from tts_max_tpu.utils.logging import get_logger

log = get_logger(__name__)


# --- logprobs / loss --------------------------------------------------------


def sequence_logprobs(params, cfg: llama.LlamaConfig, tokens: jnp.ndarray,
                      chunk_size: int = 256):
    """Per-token logprobs of tokens[t] given tokens[<t]: [B, L-1] (fp32).

    ``chunk_size > 0`` computes the head blockwise (the GRPO analog of
    train_step.chunked_causal_lm_loss): the naive form materializes
    [B, L, 193856] fp32 logprobs — ~3.8 GB at 8 rollouts × 600 tokens,
    which OOM'd the 1B on-chip GRPO smoke (round 4) once grads joined it.
    Each chunk's logits reduce to ``target - logsumexp`` immediately and
    the chunk body is checkpointed so backward recomputes them."""
    if chunk_size <= 0:
        logits = llama.forward(params, cfg, tokens)[:, :-1]
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(
            logprobs, tokens[:, 1:, None], axis=-1
        )[..., 0]
    hidden = llama.forward_hidden(params, cfg, tokens)
    h = hidden[:, :-1]
    t = tokens[:, 1:]
    b, n_t, d = h.shape
    c = min(chunk_size, n_t)
    n_chunks = -(-n_t // c)
    pad = n_chunks * c - n_t
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        t = jnp.pad(t, ((0, 0), (0, pad)))
    hs = h.reshape(b, n_chunks, c, d).transpose(1, 0, 2, 3)
    ts = t.reshape(b, n_chunks, c).transpose(1, 0, 2)

    def chunk_lp(hc, tc):
        logits = llama._logits(hc, params, cfg)  # fp32 [B, C, V]
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, tc[..., None], axis=-1)[..., 0]
        return tgt - lse

    chunk_lp = jax.checkpoint(chunk_lp, prevent_cse=False)

    def body(_, xs):
        return None, chunk_lp(*xs)

    _, lps = jax.lax.scan(body, None, (hs, ts))  # [n, B, C]
    return lps.transpose(1, 0, 2).reshape(b, n_chunks * c)[:, :n_t]


def grpo_loss(
    params,
    tokens: jnp.ndarray,  # [B, L] prompt+completion, right padded
    completion_mask: jnp.ndarray,  # [B, L] True on completion tokens
    advantages: jnp.ndarray,  # [B]
    ref_logps: jnp.ndarray | None,  # [B, L-1] or None
    *,
    cfg: llama.LlamaConfig,
    beta: float = 0.0,
):
    logps = sequence_logprobs(params, cfg, tokens)
    mask = completion_mask[:, 1:].astype(jnp.float32)
    # ratio form: value 1, gradient d(logp) — TRL num_iterations=1 semantics
    ratio = jnp.exp(logps - jax.lax.stop_gradient(logps))
    per_token = -ratio * advantages[:, None]
    if beta > 0.0 and ref_logps is not None:
        # k3 KL estimator (Schulman): exp(ref-logp) - (ref-logp) - 1
        delta = ref_logps - logps
        per_token = per_token + beta * (jnp.exp(delta) - delta - 1.0)
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (per_token * mask).sum() / denom
    mean_logp = (jax.lax.stop_gradient(logps) * mask).sum() / denom
    return loss, mean_logp


def compute_advantages(
    rewards: np.ndarray, num_generations: int, scale_rewards: bool = True
) -> np.ndarray:
    """Group-relative advantages: [B] rewards with groups of G consecutive
    completions per prompt."""
    r = np.asarray(rewards, dtype=np.float64).reshape(-1, num_generations)
    adv = r - r.mean(axis=1, keepdims=True)
    if scale_rewards:
        adv = adv / (r.std(axis=1, keepdims=True) + 1e-4)
    return adv.reshape(-1).astype(np.float32)


class GRPOMetrics(NamedTuple):
    loss: jnp.ndarray
    mean_logp: jnp.ndarray
    grad_norm: jnp.ndarray


def make_grpo_step(cfg: llama.LlamaConfig, tx, beta: float,
                   grad_clip: float = 1.0):
    def step(params, opt_state, tokens, completion_mask, advantages, ref_logps):
        (loss, mean_logp), grads = jax.value_and_grad(grpo_loss, has_aux=True)(
            params, tokens, completion_mask, advantages, ref_logps,
            cfg=cfg, beta=beta,
        )
        gnorm = optax.global_norm(grads)
        scale = jnp.where(
            jnp.isfinite(gnorm) & (gnorm > grad_clip), grad_clip / gnorm, 1.0
        )
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, GRPOMetrics(loss, mean_logp, gnorm)

    return jax.jit(step)


# --- trainer ----------------------------------------------------------------


@dataclass
class GRPOBatch:
    tokens: np.ndarray
    completion_mask: np.ndarray
    rewards: np.ndarray
    advantages: np.ndarray


class GRPOTrainer:
    """Rollout → reward → update loop on one mesh (no generation server)."""

    def __init__(
        self,
        params: Any,
        model_cfg: llama.LlamaConfig,
        tokenizer,
        speech_vocab,
        reward_funcs: Sequence[Callable],
        rlhf_cfg: RLHFConfig,
        learning_rate: float = 1e-6,
        reward_weights: Sequence[float] | None = None,
        scale_rewards: bool = True,
        seed: int = 0,
        topology: "Any | None" = None,
        rollout_via_engine: bool = False,
        engine_max_batch: int = 8,
    ):
        self.topology = topology
        self._rollout_via_engine = rollout_via_engine
        self._engine_max_batch = engine_max_batch
        self._engine = None
        self._sampler_params = None
        if topology is not None:
            # trainer sub-mesh placement: the GRPO update's grad/optimizer
            # collectives come from these shardings (GSPMD), exactly like
            # the SFT train step
            params = topology.shard_for_trainer(params)
        self.params = params
        self.cfg = model_cfg
        self.tokenizer = tokenizer
        self.sv = speech_vocab
        self.reward_funcs = list(reward_funcs)
        self.rlhf = rlhf_cfg
        weights = list(reward_weights or rlhf_cfg.reward_weights)
        if len(weights) != len(self.reward_funcs):
            weights = [1.0] * len(self.reward_funcs)
        self.reward_weights = np.asarray(weights, dtype=np.float64)
        self.scale_rewards = scale_rewards
        # bf16 Adam mu — the repo's single-chip 1B recipe (fp32 m+v alone
        # is 10 GB at 1B and OOMs a 16 GB chip next to params + grads)
        self.tx = optax.adamw(learning_rate, b1=0.9, b2=0.95,
                              weight_decay=0.1, mu_dtype=jnp.bfloat16)
        if topology is not None:
            # init under the trainer mesh so the optimizer state adopts the
            # params' FSDP shardings (GSPMD propagates through tx.init)
            with topology.trainer_mesh:
                self.opt_state = jax.jit(self.tx.init)(params)
        else:
            self.opt_state = self.tx.init(params)
        self.beta = rlhf_cfg.kl_beta
        self.ref_params = (
            jax.tree_util.tree_map(jnp.copy, params) if self.beta > 0 else None
        )
        self._step_fn = make_grpo_step(model_cfg, self.tx, self.beta)
        self._logps_fn = jax.jit(
            functools.partial(sequence_logprobs, cfg=model_cfg)
        )
        sp = SamplingParams(
            temperature=rlhf_cfg.temperature,
            top_k=rlhf_cfg.top_k,
            repetition_penalty=rlhf_cfg.repetition_penalty,
            frequency_penalty=0.0,
        )
        self._gen_cache: dict[int, Callable] = {}
        self._sp = sp
        self._rng = jax.random.PRNGKey(seed)
        self.step = 0
        if topology is not None:
            # initial weight push (the reference broadcasts the starting
            # policy to the vLLM server before the first rollout)
            self._sampler_params = topology.push_to_sampler(self.params)

    def _generate_fn(self, bucket: int):
        if bucket not in self._gen_cache:
            self._gen_cache[bucket] = make_generate_fn(
                self.cfg, self._sp,
                max_new_tokens=self.rlhf.max_completion_length,
                eos_id=self.sv.speech_end_id,
                cache_len=bucket + self.rlhf.max_completion_length,
                vocab_window=(
                    self.sv.generation_window()
                    if getattr(self.rlhf, "constrain_to_speech", False)
                    else None
                ),
            )
        return self._gen_cache[bucket]

    def _ensure_engine(self):
        """Lazily build the sampler-side serving engine (the vLLM role).
        Its params attribute is swapped on every weight push — shapes and
        shardings are stable, so the engine's cached jits never recompile."""
        if self._engine is None:
            from tts_max_tpu.inference.engine import InferenceEngine

            max_len = self.rlhf.max_prompt_length + \
                self.rlhf.max_completion_length
            max_len = ((max_len + 63) // 64) * 64
            params = (
                self._sampler_params if self.topology is not None
                else self.params
            )
            self._engine = InferenceEngine(
                params, self.cfg,
                max_batch=self._engine_max_batch,
                max_len=max_len,
                sp=self._sp,
                steps_per_dispatch=4,
                mesh=self.topology.sampler_mesh
                if self.topology is not None else None,
                vocab_window=(
                    self.sv.generation_window()
                    if getattr(self.rlhf, "constrain_to_speech", False)
                    else None
                ),
            )
        return self._engine

    def _engine_rollout(self, enc: list[np.ndarray], G: int, key):
        """Generate G completions per prompt through the continuous-batching
        engine (greedy-identical to the one-shot generate program; sampled
        rollouts draw from per-request seeded streams instead of the batch
        key). Returns (completions [B, max_completion_length], n_gen [B])."""
        eng = self._ensure_engine()
        B = len(enc) * G
        seeds = np.asarray(
            jax.random.randint(key, (B,), 0, np.iinfo(np.int32).max)
        )
        ids = []
        for e in enc:
            for _ in range(G):
                ids.append(eng.submit(
                    e, self.rlhf.max_completion_length,
                    eos_id=self.sv.speech_end_id,
                    sampling_seed=int(seeds[len(ids)]),
                ))
        by_id = {c.request_id: c for c in eng.run()}
        comps = [by_id[r].tokens for r in ids]
        n_gen = np.asarray([len(c) for c in comps], dtype=np.int32)
        completions = np.zeros(
            (B, self.rlhf.max_completion_length), dtype=np.int32
        )
        for b, c in enumerate(comps):
            completions[b, : len(c)] = c
        return completions, n_gen

    def rollout(self, prompts: list[dict]) -> tuple[GRPOBatch, dict]:
        """Generate G completions per prompt, score, build the train batch."""
        G = self.rlhf.num_generations
        enc = [
            np.asarray(
                self.tokenizer.encode(p["prompt"], add_special_tokens=True),
                dtype=np.int32,
            )[: self.rlhf.max_prompt_length]
            for p in prompts
        ]
        max_len = max(len(e) for e in enc)
        bucket = ((max_len + 63) // 64) * 64
        B = len(prompts) * G
        prompt_tokens = np.zeros((B, bucket), dtype=np.int32)
        prompt_lengths = np.zeros((B,), dtype=np.int32)
        for i, e in enumerate(enc):
            for g in range(G):
                prompt_tokens[i * G + g, : len(e)] = e
                prompt_lengths[i * G + g] = len(e)

        self._rng, k = jax.random.split(self._rng)
        if self._rollout_via_engine:
            completions, n_gen = self._engine_rollout(enc, G, k)
        else:
            gen_params = (
                self._sampler_params if self.topology is not None
                else self.params
            )
            if self.topology is not None:
                with self.topology.sampler_mesh:
                    res = self._generate_fn(bucket)(
                        gen_params, jnp.asarray(prompt_tokens),
                        jnp.asarray(prompt_lengths), k,
                    )
            else:
                res = self._generate_fn(bucket)(
                    gen_params, jnp.asarray(prompt_tokens),
                    jnp.asarray(prompt_lengths), k,
                )
            completions = np.asarray(res.tokens)
            n_gen = np.asarray(res.num_generated)

        # rewards (host-side)
        kwargs = {
            "prompt_speech_ids": [
                prompts[i // G]["prompt_speech_ids"] for i in range(B)
            ],
            "completion_truth": [
                prompts[i // G]["completion_truth"] for i in range(B)
            ],
            "language": [prompts[i // G].get("language", "en") for i in range(B)],
            "prompt_wav_path": [
                prompts[i // G].get("prompt_wav_path", "") for i in range(B)
            ],
        }
        completion_list = [completions[i, : n_gen[i]] for i in range(B)]
        total_rewards = np.zeros((B,), dtype=np.float64)
        per_func = {}
        for func, w in zip(self.reward_funcs, self.reward_weights):
            r = np.asarray(func(completion_list, **kwargs), dtype=np.float64)
            per_func[func.__name__] = float(r.mean())
            total_rewards += w * r
        advantages = compute_advantages(total_rewards, G, self.scale_rewards)

        # train batch: prompt + completion, right padded to a FIXED length —
        # a per-bucket length would recompile the (remat + chunked-logprob)
        # update program every time the batch's prompt bucket changes, which
        # measured ~15 min/step on the relayed chip (round 4)
        L = max(self.rlhf.max_prompt_length,
                bucket) + self.rlhf.max_completion_length
        tokens = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=bool)
        for i in range(B):
            pl = prompt_lengths[i]
            tokens[i, :pl] = prompt_tokens[i, :pl]
            ng = int(n_gen[i])
            tokens[i, pl : pl + ng] = completions[i, :ng]
            mask[i, pl : pl + ng] = True
        batch = GRPOBatch(tokens, mask, total_rewards, advantages)
        stats = {
            "reward_mean": float(total_rewards.mean()),
            "reward_std": float(total_rewards.std()),
            "completion_len": float(n_gen.mean()),
            **per_func,
        }
        return batch, stats

    def train_step(self, prompts: list[dict]) -> dict:
        if self.topology is not None and self.step > 0:
            # weight push between rollout rounds — the reference's NCCL
            # broadcast to the vLLM server (run_rlhf_combine.sh:45-61):
            # cross-mesh reshard trainer FSDP shards -> sampler TP shards
            self._sampler_params = self.topology.push_to_sampler(self.params)
            if self._engine is not None:
                self._engine.params = self._sampler_params
        batch, stats = self.rollout(prompts)
        import contextlib

        mesh_ctx = (
            self.topology.trainer_mesh if self.topology is not None
            else contextlib.nullcontext()
        )
        with mesh_ctx:
            ref_logps = (
                self._logps_fn(
                    self.ref_params, tokens=jnp.asarray(batch.tokens)
                )
                if self.beta > 0
                else None
            )
            self.params, self.opt_state, m = self._step_fn(
                self.params, self.opt_state, jnp.asarray(batch.tokens),
                jnp.asarray(batch.completion_mask),
                jnp.asarray(batch.advantages),
                ref_logps,
            )
        self.step += 1
        stats.update(
            loss=float(m.loss), mean_logp=float(m.mean_logp),
            grad_norm=float(m.grad_norm), step=self.step,
        )
        return stats
