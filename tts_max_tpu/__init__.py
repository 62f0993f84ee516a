"""tts_max_tpu — a TPU-native SpeechLM TTS framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of the Inworld TTS-1 trainer
(reference: ishine/tts-max) for TPU hardware:

- audio codec (xcodec2-compatible FSQ codec; encoder + Vocos/ISTFT decoder)
- SpeechLM (Llama-architecture causal LM with a 65536-entry speech vocab)
- SFT / pretraining with GSPMD sharding (data / fsdp / tensor mesh axes)
- KV-cached autoregressive inference with on-device sampling
- codec GAN training, GRPO RLHF alignment, data vectorization tools

The compute path is pure JAX (jit / pjit / shard_map / Pallas); host-side
runtime pieces (data loading, shard IO) are numpy/C++.
"""

__version__ = "0.1.0"
