// Unigram-LM Viterbi encoder (the sentencepiece-C++ equivalent for the
// host tokenization path — SURVEY.md §2.5). Python trains the vocabulary
// (data/tokenizer.py); this provides the hot encode loop: Viterbi
// segmentation over UTF-8 codepoints against a piece table.
//
// Exposed via ctypes:
//   void* satpu_tok_create(const char** pieces, const double* lps, int n)
//   void  satpu_tok_destroy(void*)
//   long  satpu_tok_encode(void*, const char* text, int* out, long max_out)
// Returned ids are PIECE INDICES (python adds the reserved-id offset);
// -1 marks an unknown single codepoint (python maps it to <unk>).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int> piece_ids;
  std::unordered_map<std::string, double> log_probs;
  int max_piece_cp = 1;  // longest piece in codepoints
};

// split UTF-8 into codepoint byte offsets; offsets.size() = n_cp + 1
void utf8_offsets(const char* s, std::vector<int>& offsets) {
  offsets.clear();
  int i = 0;
  offsets.push_back(0);
  while (s[i]) {
    unsigned char c = s[i];
    int len = c < 0x80 ? 1 : (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4;
    i += len;
    offsets.push_back(i);
  }
}

int count_codepoints(const std::string& s) {
  int n = 0;
  for (size_t i = 0; i < s.size();) {
    unsigned char c = s[i];
    i += c < 0x80 ? 1 : (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4;
    ++n;
  }
  return n;
}

}  // namespace

extern "C" {

void* satpu_tok_create(const char** pieces, const double* lps, int n) {
  auto* tok = new Tokenizer();
  for (int i = 0; i < n; ++i) {
    std::string p(pieces[i]);
    tok->piece_ids[p] = i;
    tok->log_probs[p] = lps[i];
    int cp = count_codepoints(p);
    if (cp > tok->max_piece_cp) tok->max_piece_cp = cp;
  }
  return tok;
}

void satpu_tok_destroy(void* h) { delete static_cast<Tokenizer*>(h); }

long satpu_tok_encode(void* h, const char* text, int* out, long max_out) {
  auto* tok = static_cast<Tokenizer*>(h);
  std::vector<int> off;
  utf8_offsets(text, off);
  int n = (int)off.size() - 1;  // codepoints
  if (n <= 0) return 0;

  const double NEG = -1e18;
  std::vector<double> best(n + 1, NEG);
  std::vector<int> back(n + 1, 0);
  best[0] = 0.0;
  for (int j = 1; j <= n; ++j) {
    int i_min = j - tok->max_piece_cp;
    if (i_min < 0) i_min = 0;
    for (int i = i_min; i < j; ++i) {
      if (best[i] <= NEG / 2) continue;
      std::string piece(text + off[i], off[j] - off[i]);
      auto it = tok->log_probs.find(piece);
      double score;
      if (it != tok->log_probs.end()) {
        score = it->second;
      } else if (j - i == 1) {
        score = -100.0;  // unknown single codepoint fallback
      } else {
        continue;
      }
      double cand = best[i] + score;
      if (cand > best[j]) {
        best[j] = cand;
        back[j] = i;
      }
    }
  }
  // backtrace
  std::vector<int> rev;
  for (int j = n; j > 0; j = back[j]) {
    std::string piece(text + off[back[j]], off[j] - off[back[j]]);
    auto it = tok->piece_ids.find(piece);
    rev.push_back(it != tok->piece_ids.end() ? it->second : -1);
  }
  long m = (long)rev.size();
  if (m > max_out) m = max_out;
  for (long k = 0; k < m; ++k) out[k] = rev[rev.size() - 1 - k];
  return m;
}

}  // extern "C"
