"""End-user synthesis CLI (reference /root/reference/tools/serving/inference.py).

Loads a serving-format model dir (HF safetensors, tools/convert_checkpoint.py)
+ codec encoder/decoder checkpoints, synthesizes text into a wav file.

Usage:
  python tools/serving_inference.py --model_dir serving \
      --text "Hello world" --output out.wav \
      [--prompt_wav voice.wav --prompt_transcript "..."] \
      [--codec_decoder dec.pt --codec_encoder enc.pt] [--tiny_codec]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core.constants import CODEC_SAMPLE_RATE
from tts_max_tpu.core.tokenization import build_byte_tokenizer, speech_vocab
from tts_max_tpu.data.audio_io import load_wav, save_wav
from tts_max_tpu.inference.synthesize import InferenceSettings, LocalTtsModel
from tts_max_tpu.models import hf_import
from tts_max_tpu.models.codec import api, encoder as enc, vocos
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger("serving")


def build_codec(args):
    if args.codec_decoder:
        decoder = api.create_decoder(args.codec_decoder)
    else:
        cfg = vocos.tiny_vocos_config()
        decoder = api.AudioDecoder(
            vocos.init_decoder(jax.random.PRNGKey(1), cfg), cfg, api.DecoderConfig()
        )
        log.warning("No decoder checkpoint: random decoder (smoke mode).")
    if args.codec_encoder:
        encoder = api.create_encoder(args.codec_encoder)
    else:
        cfg = enc.tiny_encoder_config()
        encoder = api.AudioEncoder(
            enc.init_encoder(jax.random.PRNGKey(2), cfg),
            cfg,
            lambda w: jnp.zeros(
                (w.shape[0], w.shape[1] // cfg.hop_length, cfg.semantic_input_dim)
            ),
        )
        log.warning("No encoder checkpoint: random encoder (smoke mode).")
    return api.CachingAudioEncoder(encoder), decoder


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--text", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--prompt_wav", default="")
    parser.add_argument("--prompt_transcript", default="")
    parser.add_argument("--voice_description", default="")
    parser.add_argument("--codec_decoder", default="")
    parser.add_argument("--codec_encoder", default="")
    parser.add_argument("--max_tokens", type=int, default=1792)
    parser.add_argument("--quantize", nargs="?", const="int8", default="",
                        choices=["", "int8", "int4", "int4-g64", "int4-g128"],
                        help="weight-only quantization: int8 (2x decode "
                             "throughput) or int4 (another +36%%, coarser)")
    parser.add_argument("--temperature", type=float, default=0.8)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)
    setup_logging(0)

    tokenizer = build_byte_tokenizer()
    sv = speech_vocab(tokenizer)
    params, cfg = hf_import.load_serving_model(args.model_dir)
    log.info("Loaded model from %s (vocab %d)", args.model_dir, cfg.vocab_size)
    if args.quantize and hf_import.is_quantized_dir(args.model_dir):
        log.warning("model dir is pre-quantized; ignoring --quantize")
        args.quantize = ""
    if args.quantize:
        from tts_max_tpu.models import quantization

        params = quantization.quantize_for_serving(
            jax.tree_util.tree_map(jnp.asarray, params), args.quantize
        )
        log.info("Quantized weights (%s, per-channel).", args.quantize)
    encoder, decoder = build_codec(args)
    model = LocalTtsModel(
        jax.tree_util.tree_map(jnp.asarray, params), cfg, tokenizer, sv, encoder,
        decoder,
    )

    if args.prompt_wav:
        wav, _ = load_wav(args.prompt_wav, CODEC_SAMPLE_RATE)
        prompt_wav = wav[0]
    else:
        prompt_wav = np.zeros(CODEC_SAMPLE_RATE, dtype=np.float32)

    settings = InferenceSettings(
        max_tokens=args.max_tokens, temperature=args.temperature, seed=args.seed
    )
    res = model.synthesize_speech(
        settings,
        text_to_synthesize=args.text,
        prompt_id=args.prompt_wav or "silence",
        prompt_wav=prompt_wav,
        audio_prompt_transcription=args.prompt_transcript,
        voice_description=args.voice_description,
    )
    save_wav(args.output, res.wav, decoder.sample_rate)
    log.info(
        "Wrote %s: %.2fs audio (encode %.2fs, generate %.2fs, decode %.2fs)",
        args.output,
        res.wav.shape[1] / decoder.sample_rate,
        res.encoding_time,
        res.inference_time,
        res.decoding_time,
    )


if __name__ == "__main__":
    main()
