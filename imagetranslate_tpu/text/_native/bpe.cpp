// First-party C++ BPE encoder — the tokenization hot path.
//
// The reference delegates this to HF `tokenizers` (Rust,
// textprocessor.py:7,14-17). This is a from-scratch implementation of the
// same SentencePiece-BPE encode algorithm, exposed over a C ABI for ctypes:
// Metaspace pre-tokenization (space -> U+2581, prefix space), greedy
// lowest-rank-first merges, vocab lookup with fused-unk fallback. NFKC
// normalization happens on the Python side (unicodedata) before the call.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libbpe.so bpe.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Bpe {
  std::unordered_map<std::string, int> vocab;
  std::unordered_map<std::string, int> ranks;  // key: a + '\x01' + b
  std::unordered_map<std::string, std::vector<int>> cache;
  int unk_id = -1;
};

const std::string kMetaspace = "\xe2\x96\x81";  // U+2581

inline std::string pair_key(const std::string& a, const std::string& b) {
  std::string k;
  k.reserve(a.size() + b.size() + 1);
  k += a;
  k += '\x01';
  k += b;
  return k;
}

// Split UTF-8 string into codepoint substrings.
void utf8_chars(const std::string& s, std::vector<std::string>* out) {
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t len = 1;
    if ((c & 0x80) == 0) len = 1;
    else if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    if (i + len > s.size()) len = 1;  // malformed tail: byte-by-byte
    out->emplace_back(s.substr(i, len));
    i += len;
  }
}

// Greedy BPE merge: repeatedly apply the lowest-rank adjacent pair.
void merge_word(Bpe* bpe, const std::string& word,
                std::vector<std::string>* parts) {
  utf8_chars(word, parts);
  while (parts->size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts->size(); ++i) {
      auto it = bpe->ranks.find(pair_key((*parts)[i], (*parts)[i + 1]));
      if (it != bpe->ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    const std::string a = (*parts)[best_i];
    const std::string b = (*parts)[best_i + 1];
    const std::string merged = a + b;
    std::vector<std::string> out;
    out.reserve(parts->size());
    size_t i = 0;
    while (i < parts->size()) {
      if (i + 1 < parts->size() && (*parts)[i] == a && (*parts)[i + 1] == b) {
        out.push_back(merged);
        i += 2;
      } else {
        out.push_back((*parts)[i]);
        i += 1;
      }
    }
    parts->swap(out);
  }
}

void encode_word(Bpe* bpe, const std::string& word, std::vector<int>* ids) {
  auto cit = bpe->cache.find(word);
  if (cit != bpe->cache.end()) {
    ids->insert(ids->end(), cit->second.begin(), cit->second.end());
    return;
  }
  std::vector<std::string> parts;
  merge_word(bpe, word, &parts);
  std::vector<int> word_ids;
  bool prev_unk = false;
  for (const auto& tok : parts) {
    auto it = bpe->vocab.find(tok);
    if (it != bpe->vocab.end()) {
      word_ids.push_back(it->second);
      prev_unk = false;
    } else {
      // fuse_unk over unknown characters inside an unknown piece
      std::vector<std::string> chars;
      utf8_chars(tok, &chars);
      for (const auto& ch : chars) {
        auto ct = bpe->vocab.find(ch);
        if (ct != bpe->vocab.end()) {
          word_ids.push_back(ct->second);
          prev_unk = false;
        } else if (!prev_unk && bpe->unk_id >= 0) {
          word_ids.push_back(bpe->unk_id);
          prev_unk = true;
        }
      }
    }
  }
  if (bpe->cache.size() < 4000000) bpe->cache.emplace(word, word_ids);
  ids->insert(ids->end(), word_ids.begin(), word_ids.end());
}

}  // namespace

extern "C" {

void* bpe_new() { return new Bpe(); }

void bpe_free(void* h) { delete static_cast<Bpe*>(h); }

void bpe_add_token(void* h, const char* tok, int id) {
  static_cast<Bpe*>(h)->vocab.emplace(tok, id);
}

void bpe_add_merge(void* h, const char* a, const char* b, int rank) {
  static_cast<Bpe*>(h)->ranks.emplace(pair_key(a, b), rank);
}

void bpe_set_unk(void* h, int unk_id) {
  static_cast<Bpe*>(h)->unk_id = unk_id;
}

// text: NFKC-normalized UTF-8 (spaces intact). Writes ids to out, returns
// count (truncated at max_out).
int bpe_encode(void* h, const char* text, int32_t* out, int max_out) {
  Bpe* bpe = static_cast<Bpe*>(h);
  std::string s(text);
  // Metaspace: replace spaces; prefix one only if the text doesn't already
  // start with a space/metaspace (matches Python metaspace_split).
  std::string meta;
  meta.reserve(s.size() + 3);
  bool starts_meta = s.size() >= kMetaspace.size() &&
                     s.compare(0, kMetaspace.size(), kMetaspace) == 0;
  if (!(starts_meta || (!s.empty() && s[0] == ' '))) meta += kMetaspace;
  for (size_t i = 0; i < s.size(); ++i) {
    if (s[i] == ' ') {
      meta += kMetaspace;
    } else {
      meta += s[i];
    }
  }
  // Split into pieces starting at each metaspace.
  std::vector<int> ids;
  size_t start = 0;
  size_t i = kMetaspace.size();
  while (i < meta.size()) {
    if (meta.compare(i, kMetaspace.size(), kMetaspace) == 0) {
      encode_word(bpe, meta.substr(start, i - start), &ids);
      start = i;
      i += kMetaspace.size();
    } else {
      ++i;
    }
  }
  if (start < meta.size()) encode_word(bpe, meta.substr(start), &ids);
  int n = static_cast<int>(ids.size());
  if (n > max_out) n = max_out;
  std::memcpy(out, ids.data(), n * sizeof(int32_t));
  return n;
}

}  // extern "C"
