// Native BPE encoder: the merge loop of CLIP's byte-BPE tokenizer.
//
// The Python SimpleTokenizer (distillclip_tpu/data/tokenizer.py) keeps the
// unicode regex pre-tokenization and byte->proxy-char encoding; this library
// replicates the vocabulary construction and the (quirky, order-sensitive)
// merge loop exactly, so ids match the Python implementation bit-for-bit.
// Exposed via ctypes (no pybind11 in this environment).
//
// Token units are the proxy characters produced by bytes_to_unicode(),
// handled here as UTF-8 substrings.

#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// Split a UTF-8 string into code points (as byte substrings).
std::vector<std::string> Utf8Split(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t len = 1;
    if ((c & 0x80) == 0) len = 1;
    else if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    out.push_back(s.substr(i, len));
    i += len;
  }
  return out;
}

struct Bpe {
  std::unordered_map<std::string, int> encoder;          // token -> id
  std::unordered_map<std::string, int> ranks;            // "a\x01b" -> rank
  std::unordered_map<std::string, std::vector<int>> cache;
};

std::string PairKey(const std::string& a, const std::string& b) {
  std::string k = a;
  k.push_back('\x01');
  k += b;
  return k;
}

// bytes_to_unicode values in order (GPT-2 table): needed to build the vocab
// with the same ids as the Python side.
std::vector<std::string> ByteUnicodeValues() {
  std::vector<int> bs;
  for (int b = int('!'); b <= int('~'); ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<int> cs = bs;
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    bool found = false;
    for (int x : bs)
      if (x == b) { found = true; break; }
    if (!found) {
      bs.push_back(b);
      cs.push_back(256 + n);
      ++n;
    }
  }
  std::vector<std::string> out(bs.size());
  for (size_t i = 0; i < bs.size(); ++i) {
    // encode code point cs[i] as UTF-8
    int cp = cs[i];
    std::string u;
    if (cp < 0x80) u.push_back(char(cp));
    else if (cp < 0x800) {
      u.push_back(char(0xC0 | (cp >> 6)));
      u.push_back(char(0x80 | (cp & 0x3F)));
    } else {
      u.push_back(char(0xE0 | (cp >> 12)));
      u.push_back(char(0x80 | ((cp >> 6) & 0x3F)));
      u.push_back(char(0x80 | (cp & 0x3F)));
    }
    out[i] = u;
  }
  return out;
}

}  // namespace

extern "C" {

// merges_text: newline-separated merge lines (the content AFTER the version
// header line, already decompressed and truncated by the caller).
void* dc_bpe_create(const char* merges_text) {
  auto* bpe = new Bpe();
  std::vector<std::pair<std::string, std::string>> merges;
  const char* p = merges_text;
  while (*p) {
    const char* nl = strchr(p, '\n');
    size_t len = nl ? size_t(nl - p) : strlen(p);
    std::string line(p, len);
    p += len + (nl ? 1 : 0);
    size_t sp = line.find(' ');
    if (sp == std::string::npos) continue;
    std::string a = line.substr(0, sp);
    std::string b = line.substr(sp + 1);
    if (a.empty() || b.empty() || b.find(' ') != std::string::npos) continue;
    merges.emplace_back(a, b);
  }

  int id = 0;
  for (const auto& v : ByteUnicodeValues()) bpe->encoder[v] = id++;
  for (const auto& v : ByteUnicodeValues()) bpe->encoder[v + "</w>"] = id++;
  for (size_t i = 0; i < merges.size(); ++i) {
    bpe->ranks[PairKey(merges[i].first, merges[i].second)] = int(i);
    bpe->encoder[merges[i].first + merges[i].second] = id++;
  }
  bpe->encoder["<|startoftext|>"] = id++;
  bpe->encoder["<|endoftext|>"] = id++;
  return bpe;
}

int dc_bpe_vocab_size(void* handle) {
  return int(static_cast<Bpe*>(handle)->encoder.size());
}

// word: proxy-char UTF-8 string (output of the Python byte_encoder).
// Returns the number of ids written (or -1 on unknown token).
int dc_bpe_encode_word(void* handle, const char* word_c, int32_t* out, int cap) {
  auto* bpe = static_cast<Bpe*>(handle);
  std::string word(word_c);
  auto it = bpe->cache.find(word);
  if (it != bpe->cache.end()) {
    int n = int(it->second.size());
    for (int i = 0; i < n && i < cap; ++i) out[i] = it->second[i];
    return n;
  }

  std::vector<std::string> parts = Utf8Split(word);
  if (parts.empty()) return 0;
  parts.back() += "</w>";

  // the CLIP merge loop, ported verbatim (tokenizer.py SimpleTokenizer.bpe)
  while (parts.size() > 1) {
    int best_rank = std::numeric_limits<int>::max();
    std::string first, second;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto r = bpe->ranks.find(PairKey(parts[i], parts[i + 1]));
      if (r != bpe->ranks.end() && r->second < best_rank) {
        best_rank = r->second;
        first = parts[i];
        second = parts[i + 1];
      }
    }
    if (best_rank == std::numeric_limits<int>::max()) break;

    std::vector<std::string> next;
    size_t i = 0;
    while (i < parts.size()) {
      // find next occurrence of `first` at or after i
      size_t j = i;
      while (j < parts.size() && parts[j] != first) ++j;
      for (size_t k = i; k < j && k < parts.size(); ++k) next.push_back(parts[k]);
      if (j >= parts.size()) break;
      if (j + 1 < parts.size() && parts[j + 1] == second) {
        next.push_back(first + second);
        i = j + 2;
      } else {
        next.push_back(parts[j]);
        i = j + 1;
      }
    }
    parts.swap(next);
  }

  std::vector<int> ids;
  ids.reserve(parts.size());
  for (const auto& t : parts) {
    auto e = bpe->encoder.find(t);
    if (e == bpe->encoder.end()) return -1;
    ids.push_back(e->second);
  }
  bpe->cache[word] = ids;
  int n = int(ids.size());
  for (int i = 0; i < n && i < cap; ++i) out[i] = ids[i];
  return n;
}

void dc_bpe_destroy(void* handle) { delete static_cast<Bpe*>(handle); }

}  // extern "C"
