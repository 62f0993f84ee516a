// ttsmax_native — C++ hot paths for the host-side runtime.
//
// The TPU compute path is JAX/XLA; these are the host loops that feed it:
//   - byte/speech-token prompt tokenization (the per-sample hot loop of the
//     fine-tuning dataset: a 2048-token prompt contains hundreds of
//     "<|s_N|>" speech tokens whose Python regex scan dominates)
//   - Levenshtein distance (WER/CER reward scoring over long transcripts,
//     O(n*m) and called per completion in the GRPO loop)
//
// Exposed with a plain C ABI for ctypes; Python falls back to pure-Python
// implementations when the library is absent.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Levenshtein distance over int32 token sequences.
// ---------------------------------------------------------------------------
int32_t ttsmax_levenshtein(const int32_t* ref, int32_t ref_len,
                           const int32_t* hyp, int32_t hyp_len) {
  if (ref_len == 0) return hyp_len;
  if (hyp_len == 0) return ref_len;
  std::vector<int32_t> prev(hyp_len + 1), cur(hyp_len + 1);
  for (int32_t j = 0; j <= hyp_len; ++j) prev[j] = j;
  for (int32_t i = 1; i <= ref_len; ++i) {
    cur[0] = i;
    const int32_t r = ref[i - 1];
    for (int32_t j = 1; j <= hyp_len; ++j) {
      const int32_t sub = prev[j - 1] + (r == hyp[j - 1] ? 0 : 1);
      const int32_t del = prev[j] + 1;
      const int32_t ins = cur[j - 1] + 1;
      int32_t best = sub < del ? sub : del;
      cur[j] = best < ins ? best : ins;
    }
    std::swap(prev, cur);
  }
  return prev[hyp_len];
}

// ---------------------------------------------------------------------------
// Byte-level tokenizer with atomic special tokens.
//
// Vocabulary layout (mirrors tts_max_tpu.core.tokenization.ByteTokenizer):
//   0 pad, 1 bos, 2 eos, 3..258 bytes, then added tokens.
// Speech tokens "<|s_N|>" are resolved arithmetically through a dense
// code->id table; other added tokens through a hash table loaded once.
// ---------------------------------------------------------------------------

struct Tokenizer {
  std::unordered_map<std::string, int32_t> added;
  std::vector<int32_t> speech_ids;  // code -> token id (dense), may be empty
};

void* ttsmax_tokenizer_new() { return new Tokenizer(); }

void ttsmax_tokenizer_free(void* t) { delete static_cast<Tokenizer*>(t); }

void ttsmax_tokenizer_add_token(void* t, const char* token, int32_t id) {
  static_cast<Tokenizer*>(t)->added.emplace(token, id);
}

void ttsmax_tokenizer_set_speech_table(void* t, const int32_t* ids,
                                       int32_t n) {
  auto* tok = static_cast<Tokenizer*>(t);
  tok->speech_ids.assign(ids, ids + n);
}

// Encode text into out (capacity out_cap). Returns number of ids, or -1 if
// out_cap is too small.
int32_t ttsmax_tokenizer_encode(void* t, const uint8_t* text, int32_t n,
                                int32_t* out, int32_t out_cap) {
  const auto* tok = static_cast<Tokenizer*>(t);
  int32_t m = 0;
  int32_t i = 0;
  while (i < n) {
    // try to match "<|...|>" starting here
    if (text[i] == '<' && i + 1 < n && text[i + 1] == '|') {
      // find closing "|>" (special tokens are short; cap the scan)
      int32_t j = i + 2;
      int32_t end = -1;
      const int32_t limit = i + 64 < n ? i + 64 : n;
      for (; j + 1 < limit + 1 && j + 1 < n + 1; ++j) {
        if (j + 1 < n + 1 && j < n && text[j] == '|' && j + 1 < n &&
            text[j + 1] == '>') {
          end = j + 2;  // one past token
          break;
        }
        if (j < n && (text[j] == '<' || text[j] == '>')) break;
      }
      if (end > 0) {
        // speech token fast path: "<|s_DIGITS|>"
        if (!tok->speech_ids.empty() && end - i > 6 && text[i + 2] == 's' &&
            text[i + 3] == '_') {
          int64_t code = 0;
          bool digits = end - i > 6;
          for (int32_t k = i + 4; k < end - 2; ++k) {
            if (text[k] < '0' || text[k] > '9') {
              digits = false;
              break;
            }
            code = code * 10 + (text[k] - '0');
          }
          if (digits && code < (int64_t)tok->speech_ids.size()) {
            if (m >= out_cap) return -1;
            out[m++] = tok->speech_ids[code];
            i = end;
            continue;
          }
        }
        std::string key(reinterpret_cast<const char*>(text + i), end - i);
        auto it = tok->added.find(key);
        if (it != tok->added.end()) {
          if (m >= out_cap) return -1;
          out[m++] = it->second;
          i = end;
          continue;
        }
      }
    }
    // plain byte
    if (m >= out_cap) return -1;
    out[m++] = 3 + text[i];
    ++i;
  }
  return m;
}

}  // extern "C"
