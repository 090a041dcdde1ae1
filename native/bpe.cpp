// Byte-level BPE tokenizer core (GPT-2 / RoBERTa / CLIP merge loop).
//
// The host-side hot loop of dataset sweeps: 500 prompts × (caption + N local
// prompts + alignment) per run.  The Python implementation
// (utils/tokenizer.py) is the reference; this C++ core is an optional
// drop-in accelerator bound via ctypes (utils/native_bpe.py) and verified
// against the Python path in tests.
//
// Interface is buffer-based (no file parsing in C++): Python loads
// vocab.json/merges.txt and hands over newline-joined token strings.
//
// Build: make -C native   (produces libbpe.so)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003u ^
           std::hash<std::string>()(p.second);
  }
};

struct BPE {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      ranks;
  std::string byte_enc[256];  // GPT-2 byte -> unicode codepoint (utf-8)
  // tokenization results cache
  std::unordered_map<std::string, std::vector<std::string>> cache;
};

std::string cp_utf8(int cp) {
  std::string s;
  if (cp < 0x80) {
    s += static_cast<char>(cp);
  } else if (cp < 0x800) {
    s += static_cast<char>(0xC0 | (cp >> 6));
    s += static_cast<char>(0x80 | (cp & 0x3F));
  } else {
    s += static_cast<char>(0xE0 | (cp >> 12));
    s += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
    s += static_cast<char>(0x80 | (cp & 0x3F));
  }
  return s;
}

void init_byte_enc(BPE* b) {
  // GPT-2 bytes_to_unicode
  std::vector<int> bs, cs;
  for (int i = '!'; i <= '~'; i++) bs.push_back(i);
  for (int i = 0xA1; i <= 0xAC; i++) bs.push_back(i);
  for (int i = 0xAE; i <= 0xFF; i++) bs.push_back(i);
  cs = bs;
  int n = 0;
  for (int i = 0; i < 256; i++) {
    bool found = false;
    for (int x : bs)
      if (x == i) { found = true; break; }
    if (!found) {
      bs.push_back(i);
      cs.push_back(256 + n++);
    }
  }
  for (size_t i = 0; i < bs.size(); i++) b->byte_enc[bs[i]] = cp_utf8(cs[i]);
}

// split a byte-encoded word into BPE tokens
const std::vector<std::string>& bpe_word(BPE* b, const std::string& token) {
  auto it = b->cache.find(token);
  if (it != b->cache.end()) return it->second;

  // split into unicode codepoints (utf-8 aware)
  std::vector<std::string> word;
  for (size_t i = 0; i < token.size();) {
    size_t len = 1;
    unsigned char c = token[i];
    if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    word.push_back(token.substr(i, len));
    i += len;
  }
  while (word.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < word.size(); i++) {
      auto r = b->ranks.find({word[i], word[i + 1]});
      if (r != b->ranks.end() && r->second < best_rank) {
        best_rank = r->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    // merge ALL occurrences of the best pair (left to right)
    const std::string a = word[best_i], c = word[best_i + 1];
    std::vector<std::string> out;
    for (size_t i = 0; i < word.size();) {
      if (i + 1 < word.size() && word[i] == a && word[i + 1] == c) {
        out.push_back(a + c);
        i += 2;
      } else {
        out.push_back(word[i]);
        i += 1;
      }
    }
    word.swap(out);
  }
  return b->cache.emplace(token, std::move(word)).first->second;
}

bool is_word_byte(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_' || c >= 0x80;
}

bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

}  // namespace

extern "C" {

// tokens_blob: n_tokens token strings joined by '\n' (ids are implicit:
// position i holds the token whose id is ids[i]).
// merges_blob: m lines "left right" joined by '\n'.
void* bpe_create(const char* tokens_blob, const int32_t* ids, int32_t n,
                 const char* merges_blob, int32_t m) {
  BPE* b = new BPE();
  init_byte_enc(b);
  {
    const char* p = tokens_blob;
    for (int32_t i = 0; i < n; i++) {
      const char* e = strchr(p, '\n');
      size_t len = e ? static_cast<size_t>(e - p) : strlen(p);
      b->vocab.emplace(std::string(p, len), ids[i]);
      if (!e) break;
      p = e + 1;
    }
  }
  {
    const char* p = merges_blob;
    for (int32_t i = 0; i < m; i++) {
      const char* e = strchr(p, '\n');
      size_t len = e ? static_cast<size_t>(e - p) : strlen(p);
      std::string line(p, len);
      size_t sp = line.find(' ');
      if (sp != std::string::npos) {
        b->ranks.emplace(
            std::make_pair(line.substr(0, sp), line.substr(sp + 1)), i);
      }
      if (!e) break;
      p = e + 1;
    }
  }
  return b;
}

void bpe_free(void* handle) { delete static_cast<BPE*>(handle); }

// GPT-2 style pre-tokenization (ASCII contraction rules + word/number/punct
// runs with a leading space attached), then per-chunk BPE.
// Returns the number of ids written (or needed, if > max_ids).
int32_t bpe_encode(void* handle, const char* text, int32_t* out,
                   int32_t max_ids) {
  BPE* b = static_cast<BPE*>(handle);
  const size_t n = strlen(text);
  int32_t count = 0;
  size_t i = 0;
  static const char* kContr[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
  while (i < n) {
    size_t start = i;
    // contractions
    bool contr = false;
    if (text[i] == '\'') {
      for (const char* c : kContr) {
        size_t cl = strlen(c);
        if (strncmp(text + i, c, cl) == 0) {
          i += cl;
          contr = true;
          break;
        }
      }
    }
    if (!contr) {
      size_t j = i;
      if (is_space(static_cast<unsigned char>(text[j])) && j + 1 < n &&
          !is_space(static_cast<unsigned char>(text[j + 1])))
        j++;  // optional single leading space joins the next chunk
      if (j < n && is_word_byte(static_cast<unsigned char>(text[j]))) {
        do { j++; } while (j < n && is_word_byte(static_cast<unsigned char>(text[j])));
      } else if (j < n && !is_space(static_cast<unsigned char>(text[j]))) {
        do { j++; } while (j < n &&
                           !is_space(static_cast<unsigned char>(text[j])) &&
                           !is_word_byte(static_cast<unsigned char>(text[j])));
      } else {  // run of whitespace
        do { j++; } while (j < n && is_space(static_cast<unsigned char>(text[j])));
        // trailing single space before non-space belongs to next chunk
        if (j < n && j - start > 1) j--;
      }
      i = j;
    }
    std::string chunk(text + start, i - start);
    // byte-encode
    std::string enc;
    for (unsigned char c : chunk) enc += b->byte_enc[c];
    for (const std::string& t : bpe_word(b, enc)) {
      auto v = b->vocab.find(t);
      int32_t id = v == b->vocab.end() ? 3 /*unk*/ : v->second;
      if (count < max_ids) out[count] = id;
      count++;
    }
  }
  return count;
}

}  // extern "C"
