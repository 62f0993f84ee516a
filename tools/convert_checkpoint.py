"""Training checkpoint → HF-format serving directory.

Reference parity (/root/reference/tools/serving/convert_checkpoint.py):
optional LoRA merge, optional nonverbal-token addition with the vocab
rounded up to a multiple of 64, eos switched to <|speech_end|>, safetensors
export — the contract between training and the serving world.

Usage:
  python tools/convert_checkpoint.py --checkpoint_dir out/checkpoints \
      --output_dir serving [--architecture llama-1b] [--add_nonverbal]
      [--lora_adapter adapter.npz --lora_r 16 --lora_alpha 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tts_max_tpu.core import constants
from tts_max_tpu.core.tokenization import build_byte_tokenizer
from tts_max_tpu.models import hf_import, llama, lora
from tts_max_tpu.training.checkpointing import load_final_model
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger("convert")


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", required=True,
                        help="orbax final_model dir or checkpoints root")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--architecture", default="llama-tiny")
    parser.add_argument("--vocab_size", type=int, default=0)
    parser.add_argument("--add_nonverbal", action="store_true")
    parser.add_argument("--lora_adapter", default="")
    parser.add_argument("--lora_r", type=int, default=16)
    parser.add_argument("--lora_alpha", type=int, default=32)
    parser.add_argument("--quantize", nargs="?", const="int8", default="",
                        choices=["", "int8", "int4", "int4-g64", "int4-g128"],
                        help="also write a pre-quantized serving dir "
                             "(<output_dir>/quantized-<mode>): 2x/4x "
                             "smaller artifact + load, no startup "
                             "quantization pass")
    args = parser.parse_args(argv)
    setup_logging(0)

    tokenizer = build_byte_tokenizer()
    vocab = args.vocab_size or len(tokenizer)
    cfg = llama.config_for_architecture(args.architecture, vocab_size=vocab)
    template = llama.init_params(jax.random.PRNGKey(0), cfg)
    path = args.checkpoint_dir
    if os.path.isdir(os.path.join(path, "final_model")):
        path = os.path.join(path, "final_model")
    params = load_final_model(path, template)
    log.info("Loaded %d params from %s", llama.param_count(params), path)

    if args.lora_adapter:
        template_lora = lora.init_lora(jax.random.PRNGKey(0), params, r=args.lora_r)
        adapter = lora.load_adapter(args.lora_adapter, template_lora)
        params = lora.merge(params, adapter, args.lora_alpha, args.lora_r)
        log.info("Merged LoRA adapter from %s", args.lora_adapter)

    if args.add_nonverbal:
        # add nonverbal tokens and round vocab to x64 (reference :37-67)
        tokenizer.add_tokens(constants.NONVERBAL_TOKENS)
        new_vocab = round_up(len(tokenizer), 64)
        params, cfg = hf_import.resize_embeddings(params, cfg, new_vocab)
        log.info("Vocab extended to %d (+nonverbal, x64 rounded)", new_vocab)

    # eos -> <|speech_end|> (reference :70-77)
    eos_id = int(tokenizer.convert_tokens_to_ids(constants.SPEECH_END_TOKEN))
    hf_import.save_model_to_hf_dir(params, cfg, args.output_dir, eos_token_id=eos_id)
    log.info("Serving model written to %s (eos=%d)", args.output_dir, eos_id)

    if args.quantize:
        from tts_max_tpu.models import quantization

        bits = 4 if args.quantize.startswith("int4") else 8
        qdir = os.path.join(args.output_dir, f"quantized-{args.quantize}")
        qparams = quantization.quantize_for_serving(params, args.quantize)
        hf_import.save_quantized_dir(
            jax.device_get(qparams), cfg, qdir, bits
        )
        log.info("Quantized serving dir written to %s", qdir)


if __name__ == "__main__":
    main()
