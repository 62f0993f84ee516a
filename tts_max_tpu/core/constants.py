"""Token-vocabulary and codec constants for the SpeechLM TTS pipeline.

Functional parity with the reference constants module
(/root/reference/tts/core/constants.py:5-61): speech-token templates, special
markers, codec rates, nonverbal vocabulary, and reward-function names.
"""

# --- speech token templates -------------------------------------------------
# Speech tokens are "<|s_N|>" for N in [0, codebook_size).
SPEECH_TOKEN_TEMPLATE = "<|s_{}|>"

# Special structural markers added to the tokenizer.
SPEECH_START_TOKEN = "<|speech_start|>"
SPEECH_END_TOKEN = "<|speech_end|>"
TEXT_PROMPT_START_TOKEN = "<|text_prompt_start|>"
TEXT_PROMPT_END_TOKEN = "<|text_prompt_end|>"
VOICE_DESCRIPTION_START_TOKEN = "<|voice_description_start|>"
VOICE_DESCRIPTION_END_TOKEN = "<|voice_description_end|>"
AUDIO_PROMPT_START_TOKEN = "<|audio_prompt_start|>"
AUDIO_PROMPT_END_TOKEN = "<|audio_prompt_end|>"

SPECIAL_TOKENS = [
    SPEECH_START_TOKEN,
    SPEECH_END_TOKEN,
    TEXT_PROMPT_START_TOKEN,
    TEXT_PROMPT_END_TOKEN,
    VOICE_DESCRIPTION_START_TOKEN,
    VOICE_DESCRIPTION_END_TOKEN,
    AUDIO_PROMPT_START_TOKEN,
    AUDIO_PROMPT_END_TOKEN,
]

# Template used to pad the vocabulary up to a fixed size.
EXTRA_TOKEN_TEMPLATE = "<|extra_token_{}|>"

# Fixed final tokenizer vocabulary size (reference tokenization.py:8).
FIXED_VOCAB_SIZE = 193856

# --- codec rates ------------------------------------------------------------
# 50 discrete codes per second of audio at 16 kHz (reference constants.py:20-21).
CODEC_TOKEN_RATE = 50
CODEC_SAMPLE_RATE = 16000
# hop length in samples: 16000 / 50 (reference encoder.py:13-14).
CODEC_HOP_LENGTH = 320
# FSQ codebook: levels [4]*8 -> 4**8 entries.
CODEBOOK_SIZE = 65536
FSQ_LEVELS = (4, 4, 4, 4, 4, 4, 4, 4)

# --- task prompt ------------------------------------------------------------
TTS_TASK_PROMPT = "Convert the text to speech:"

# --- nonverbal tokens (reference constants.py:39-61) ------------------------
NONVERBAL_TOKENS = [
    "<|breathe|>",
    "<|clear_throat|>",
    "<|cough|>",
    "<|cry|>",
    "<|gasp|>",
    "<|groan|>",
    "<|gulp|>",
    "<|laugh|>",
    "<|mumble|>",
    "<|scream|>",
    "<|sigh|>",
    "<|sneeze|>",
    "<|snort|>",
    "<|surprised|>",
    "<|whisper|>",
    "<|yawn|>",
    "<|giggle|>",
    "<|chuckle|>",
    "<|sob|>",
    "<|exhale|>",
    "<|inhale|>",
]

# --- reward function names (reference constants.py:34-36) -------------------
WER_REWARD_NAME = "wer"
DNSMOS_REWARD_NAME = "dnsmos"
SIMILARITY_REWARD_NAME = "similarity"
