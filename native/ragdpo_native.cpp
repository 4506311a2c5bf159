// ragdpo_native — host-side ingestion runtime (C++17, no external deps).
//
// The TPU owns scoring; the host owns corpus preparation. At 1M-chunk
// scale the Python tokenize+BM25 build loop (rag_dpo_tpu/tokenize/french.py
// + retrieval/bm25.py) is minutes of pure-Python regex/Counter work — this
// library is its drop-in native replacement, exposed through ctypes
// (no pybind11 in the image). It implements, with identical semantics:
//
//   * French lexical tokenization: UTF-8 decode, lowercase, accent fold
//     (French Latin-1/Latin-Extended coverage incl. œ→oe / æ→ae),
//     [a-z0-9]+(-[a-z0-9]+)* token shape, stopword + 1-char filtering;
//   * BM25-Okapi statistics: vocab, df, idf = ln((N-df+.5)/(df+.5)) with
//     negatives floored to epsilon·avg_idf (rank_bm25 parameterization);
//   * ELL impact arrays: per-doc top-tf terms, impact =
//     tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).
//
// Interface: one opaque builder handle; documents arrive as a single
// UTF-8 blob separated by '\x01' (one memcpy across the FFI, no
// per-string overhead).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------- unicode

// Decode one UTF-8 codepoint; advances i. Invalid bytes yield U+FFFD.
inline uint32_t decode_utf8(const unsigned char* s, int64_t len,
                            int64_t& i) {
  unsigned char c = s[i];
  if (c < 0x80) { i += 1; return c; }
  if ((c >> 5) == 0x6 && i + 1 < len) {
    uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
    i += 2; return cp;
  }
  if ((c >> 4) == 0xE && i + 2 < len) {
    uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6)
                  | (s[i + 2] & 0x3F);
    i += 3; return cp;
  }
  if ((c >> 3) == 0x1E && i + 3 < len) {
    uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12)
                  | ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
    i += 4; return cp;
  }
  i += 1; return 0xFFFD;
}

// Lowercase + accent-fold a codepoint into 0-2 ASCII chars ([a-z0-9] or
// separator). Returns number of chars written to out[2].
inline int fold_codepoint(uint32_t cp, char out[2]) {
  if (cp >= 'A' && cp <= 'Z') { out[0] = char(cp - 'A' + 'a'); return 1; }
  if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) {
    out[0] = char(cp); return 1;
  }
  if (cp == '-') { out[0] = '-'; return 1; }
  struct Fold { uint32_t lo, hi; char to; };
  // Latin-1 Supplement + Latin Extended-A accent folds (French coverage)
  static const Fold folds[] = {
      {0xC0, 0xC5, 'a'}, {0xE0, 0xE5, 'a'}, {0x100, 0x105, 'a'},
      {0xC7, 0xC7, 'c'}, {0xE7, 0xE7, 'c'}, {0x106, 0x10D, 'c'},
      {0xC8, 0xCB, 'e'}, {0xE8, 0xEB, 'e'}, {0x112, 0x11B, 'e'},
      {0xCC, 0xCF, 'i'}, {0xEC, 0xEF, 'i'}, {0x128, 0x131, 'i'},
      {0xD1, 0xD1, 'n'}, {0xF1, 0xF1, 'n'}, {0x143, 0x148, 'n'},
      {0xD2, 0xD6, 'o'}, {0xF2, 0xF6, 'o'}, {0x14C, 0x151, 'o'},
      {0xD8, 0xD8, 'o'}, {0xF8, 0xF8, 'o'},
      {0xD9, 0xDC, 'u'}, {0xF9, 0xFC, 'u'}, {0x168, 0x173, 'u'},
      {0xDD, 0xDD, 'y'}, {0xFD, 0xFD, 'y'}, {0xFF, 0xFF, 'y'},
      {0x178, 0x178, 'y'},
  };
  for (const auto& f : folds) {
    if (cp >= f.lo && cp <= f.hi) { out[0] = f.to; return 1; }
  }
  if (cp == 0x152 || cp == 0x153) { out[0] = 'o'; out[1] = 'e'; return 2; }
  if (cp == 0xC6 || cp == 0xE6)   { out[0] = 'a'; out[1] = 'e'; return 2; }
  if (cp == 0xDF) { out[0] = 's'; out[1] = 's'; return 2; }
  return 0;  // anything else: token separator
}

// -------------------------------------------------------------- stopwords

const char* kStopwords =
    "le la les un une des de du au aux et ou mais donc or ni car que qui "
    "quoi dont ce cette ces cet se sa son ses leur leurs mon ma mes ton "
    "ta tes notre nos votre vos il elle ils elles nous vous je tu on ne "
    "pas plus moins tres dans par pour sur sous avec sans chez vers "
    "entre jusque pendant avant apres est sont etre avoir fait faire a "
    "ont aussi comme si alors ainsi tout tous toute toutes meme memes "
    "autre autres peut peuvent doit doivent etait etaient sera seront "
    "cela ca y en l d s n qu j c m t";

const std::unordered_set<std::string>& stopwords() {
  static const std::unordered_set<std::string>* set = [] {
    auto* s = new std::unordered_set<std::string>();
    std::string word;
    for (const char* p = kStopwords;; ++p) {
      if (*p == ' ' || *p == '\0') {
        if (!word.empty()) s->insert(word);
        word.clear();
        if (*p == '\0') break;
      } else {
        word.push_back(*p);
      }
    }
    return s;
  }();
  return *set;
}

// -------------------------------------------------------------- tokenizer

// Matches tokenize_french_text: fold, split on non-[a-z0-9-], trim
// leading/trailing '-', drop 1-char non-digit tokens and stopwords.
void tokenize(const char* text, int64_t len,
              std::vector<std::string>* out) {
  const auto* s = reinterpret_cast<const unsigned char*>(text);
  std::string cur;
  int64_t i = 0;
  auto flush = [&] {
    while (!cur.empty() && cur.front() == '-') cur.erase(cur.begin());
    while (!cur.empty() && cur.back() == '-') cur.pop_back();
    if (!cur.empty()) {
      bool single = cur.size() == 1;
      bool digit = single && cur[0] >= '0' && cur[0] <= '9';
      if ((!single || digit) && !stopwords().count(cur)) {
        // split interior '--' runs like the regex would reject them:
        // the regex [a-z0-9]+(-[a-z0-9]+)* never produces "a--b", so
        // break on double hyphens.
        size_t pos;
        while ((pos = cur.find("--")) != std::string::npos) {
          std::string head = cur.substr(0, pos);
          // same keep rule as whole tokens: multi-char, or single DIGIT
          bool keep = head.size() > 1 ||
                      (head.size() == 1 && head[0] >= '0' &&
                       head[0] <= '9');
          if (keep && !stopwords().count(head)) out->push_back(head);
          cur.erase(0, pos + 2);
        }
        if (!cur.empty() && (cur.size() > 1 ||
                             (cur[0] >= '0' && cur[0] <= '9'))
            && !stopwords().count(cur))
          out->push_back(cur);
      }
    }
    cur.clear();
  };
  while (i < len) {
    uint32_t cp = decode_utf8(s, len, i);
    char folded[2];
    int n = fold_codepoint(cp, folded);
    if (n == 0) {
      flush();
    } else {
      cur.append(folded, n);
    }
  }
  flush();
}

// ------------------------------------------------------------ ELL builder

struct EllBuilder {
  int32_t ell_width;
  float k1, b, epsilon;
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> terms;                  // id → term
  std::vector<int64_t> df;
  std::vector<std::vector<std::pair<int32_t, int32_t>>> doc_tf;  // id, tf
  std::vector<int64_t> doc_len;
  std::vector<float> idf;
  double avgdl = 0.0;

  int32_t term_id(const std::string& t) {
    auto it = vocab.find(t);
    if (it != vocab.end()) return it->second;
    int32_t id = int32_t(terms.size());
    vocab.emplace(t, id);
    terms.push_back(t);
    df.push_back(0);
    return id;
  }

  void add_doc(const char* text, int64_t len) {
    std::vector<std::string> toks;
    tokenize(text, len, &toks);
    std::unordered_map<int32_t, int32_t> tf;
    for (const auto& t : toks) tf[term_id(t)]++;
    std::vector<std::pair<int32_t, int32_t>> entries(tf.begin(), tf.end());
    for (const auto& e : entries) df[e.first]++;
    doc_tf.push_back(std::move(entries));
    doc_len.push_back(int64_t(toks.size()));
  }

  void finalize() {
    const int64_t n = int64_t(doc_tf.size());
    int64_t total = 0;
    for (int64_t l : doc_len) total += l;
    avgdl = n ? double(total) / double(n) : 0.0;
    idf.resize(terms.size());
    double sum = 0.0;
    std::vector<size_t> neg;
    for (size_t t = 0; t < terms.size(); ++t) {
      double v = std::log((double(n) - double(df[t]) + 0.5)
                          / (double(df[t]) + 0.5));
      idf[t] = float(v);
      sum += v;
      if (v < 0) neg.push_back(t);
    }
    if (!terms.empty()) {
      float avg = float(sum / double(terms.size()));
      for (size_t t : neg) idf[t] = epsilon * avg;
    }
  }

  // out_tf/out_dl may be null; slot ordering (tf desc, id asc) is shared
  // with the impact fill so the python-side tf arrays stay aligned.
  void fill(int32_t* out_terms, float* out_impacts, int32_t* out_tf,
            int32_t* out_dl) const {
    const int64_t n = int64_t(doc_tf.size());
    const int32_t L = ell_width;
    std::fill(out_terms, out_terms + n * L, -1);
    if (out_impacts) std::fill(out_impacts, out_impacts + n * L, 0.0f);
    if (out_tf) std::fill(out_tf, out_tf + n * L, 0);
    for (int64_t d = 0; d < n; ++d) {
      auto entries = doc_tf[d];  // copy: sorted by tf desc, id asc
      std::sort(entries.begin(), entries.end(),
                [](const auto& a, const auto& b) {
                  if (a.second != b.second) return a.second > b.second;
                  return a.first < b.first;
                });
      const double norm =
          k1 * (1.0 - b + b * double(doc_len[d])
                / std::max(avgdl, 1e-9));
      const int32_t m = std::min<int32_t>(L, int32_t(entries.size()));
      for (int32_t s = 0; s < m; ++s) {
        out_terms[d * L + s] = entries[s].first;
        const double f = entries[s].second;
        if (out_impacts)
          out_impacts[d * L + s] =
              float(f * (k1 + 1.0) / (f + norm));
        if (out_tf) out_tf[d * L + s] = entries[s].second;
      }
      if (out_dl) out_dl[d] = int32_t(doc_len[d]);
    }
  }
};

}  // namespace

extern "C" {

void* ell_create(int32_t ell_width, float k1, float b, float epsilon) {
  auto* builder = new EllBuilder();
  builder->ell_width = ell_width;
  builder->k1 = k1;
  builder->b = b;
  builder->epsilon = epsilon;
  return builder;
}

// blob: documents separated by '\x01'.
void ell_add_blob(void* h, const char* blob, int64_t blob_len) {
  auto* builder = static_cast<EllBuilder*>(h);
  int64_t start = 0;
  for (int64_t i = 0; i <= blob_len; ++i) {
    if (i == blob_len || blob[i] == '\x01') {
      builder->add_doc(blob + start, i - start);
      start = i + 1;
    }
  }
}

void ell_finalize(void* h) { static_cast<EllBuilder*>(h)->finalize(); }

int64_t ell_n_docs(void* h) {
  return int64_t(static_cast<EllBuilder*>(h)->doc_tf.size());
}
int64_t ell_vocab_size(void* h) {
  return int64_t(static_cast<EllBuilder*>(h)->terms.size());
}
double ell_avgdl(void* h) { return static_cast<EllBuilder*>(h)->avgdl; }

void ell_fill(void* h, int32_t* terms, float* impacts) {
  static_cast<EllBuilder*>(h)->fill(terms, impacts, nullptr, nullptr);
}
// Raw tf/doc-length export: lets the host recompute impacts exactly when
// stats shift on incremental appends (same slot order as ell_fill).
void ell_fill_tf(void* h, int32_t* terms, int32_t* tf, int32_t* dl) {
  static_cast<EllBuilder*>(h)->fill(terms, nullptr, tf, dl);
}
void ell_idf(void* h, float* out) {
  auto* builder = static_cast<EllBuilder*>(h);
  std::memcpy(out, builder->idf.data(),
              builder->idf.size() * sizeof(float));
}
void ell_df(void* h, int64_t* out) {
  auto* builder = static_cast<EllBuilder*>(h);
  std::memcpy(out, builder->df.data(),
              builder->df.size() * sizeof(int64_t));
}

int64_t ell_vocab_blob_len(void* h) {
  auto* builder = static_cast<EllBuilder*>(h);
  int64_t total = 0;
  for (const auto& t : builder->terms) total += int64_t(t.size()) + 1;
  return total;
}
void ell_vocab_blob(void* h, char* out) {
  auto* builder = static_cast<EllBuilder*>(h);
  for (const auto& t : builder->terms) {
    std::memcpy(out, t.data(), t.size());
    out += t.size();
    *out++ = '\n';
  }
}

void ell_free(void* h) { delete static_cast<EllBuilder*>(h); }

// ---------------------------------------------------------------- invert
// Dense posting-table inversion (ops/postings.py PostingsIndex.build):
// ELL arrays [N, L] → per-term [V, cap] doc/impact tables, rows sorted by
// descending impact, truncated at cap, SENTINEL-padded. Two counting
// passes + per-term partial sort — ~4× faster than numpy's lexsort path.
void ell_invert(const int32_t* terms, const float* impacts,
                int64_t n_docs, int32_t l, int32_t vocab, int32_t cap,
                int32_t* out_docs, float* out_impacts) {
  const int32_t kSentinel = 0x7FFFFFFF;
  std::vector<int64_t> counts(size_t(vocab) + 1, 0);
  const int64_t total = n_docs * l;
  for (int64_t i = 0; i < total; ++i) {
    int32_t t = terms[i];
    if (t >= 0 && t < vocab) counts[size_t(t) + 1]++;
  }
  for (size_t v = 1; v <= size_t(vocab); ++v) counts[v] += counts[v - 1];
  std::vector<int32_t> docs(size_t(counts[vocab]));
  std::vector<float> imps(size_t(counts[vocab]));
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t i = 0; i < total; ++i) {
    int32_t t = terms[i];
    if (t < 0 || t >= vocab) continue;
    int64_t pos = cursor[t]++;
    docs[size_t(pos)] = int32_t(i / l);
    imps[size_t(pos)] = impacts[i];
  }
  std::fill(out_docs, out_docs + int64_t(vocab) * cap, kSentinel);
  std::fill(out_impacts, out_impacts + int64_t(vocab) * cap, 0.0f);
  std::vector<int64_t> order;
  for (int32_t t = 0; t < vocab; ++t) {
    const int64_t start = counts[t], end = counts[size_t(t) + 1];
    const int64_t len = end - start;
    if (len == 0) continue;
    order.resize(size_t(len));
    for (int64_t i = 0; i < len; ++i) order[size_t(i)] = start + i;
    const int64_t keep = std::min<int64_t>(len, cap);
    std::partial_sort(
        order.begin(), order.begin() + keep, order.end(),
        [&](int64_t a, int64_t b) {
          if (imps[size_t(a)] != imps[size_t(b)])
            return imps[size_t(a)] > imps[size_t(b)];
          return docs[size_t(a)] < docs[size_t(b)];
        });
    for (int64_t s = 0; s < keep; ++s) {
      out_docs[int64_t(t) * cap + s] = docs[size_t(order[size_t(s)])];
      out_impacts[int64_t(t) * cap + s] = imps[size_t(order[size_t(s)])];
    }
  }
}

// Standalone tokenizer: writes '\n'-joined tokens; returns bytes written
// (excluding terminator) or -1 if out_cap too small.
int64_t tokenize_utf8(const char* text, int64_t len, char* out,
                      int64_t out_cap) {
  std::vector<std::string> toks;
  tokenize(text, len, &toks);
  int64_t written = 0;
  for (const auto& t : toks) {
    int64_t need = int64_t(t.size()) + 1;
    if (written + need > out_cap) return -1;
    std::memcpy(out + written, t.data(), t.size());
    written += int64_t(t.size());
    out[written++] = '\n';
  }
  return written;
}

}  // extern "C"
