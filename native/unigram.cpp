// Native Unigram (SentencePiece) tokenizer — the host-side hot loop of the
// multilingual embedding pipeline (pipeline/fast_unigram.py is the ctypes
// wrapper).
//
// The Python Unigram tokenizer (pipeline/unigram.py) measures ~1.4K texts/s
// on this image's 1-core host, far below the TPU encoder's device
// throughput — host tokenization, not the model, bounds end-to-end encode
// for the XLM-RoBERTa/e5 family exactly as it did for BERT before
// native/wordpiece.cpp. This implementation runs the two hot stages on raw
// UTF-8 bytes: Metaspace pre-tokenization (space -> "▁" marker,
// marker-start splits) and Viterbi maximum-likelihood segmentation over the
// scored vocab with HF's unknown handling (per-codepoint unk at
// min_score - 10, consecutive unks fused). Unicode normalization stays in
// the Python wrapper (unicodedata.normalize is a single C call per text),
// so the full multilingual input space — not just ASCII — takes this path.
// Byte-position Viterbi equals the Python char-position Viterbi because
// vocab pieces are valid UTF-8: a piece match starting on a codepoint
// boundary always ends on one. Parity is fuzz-tested id-for-id against the
// Python implementation (itself golden vs the Rust `tokenizers` crate) in
// tests/test_fast_unigram.py. Reference capability: the mlx pipeline
// tokenized through HF's Rust tokenizers
// (integrations/mlx_lm_pipeline.py:247-263).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC (see fast_unigram.py).

#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

struct PieceInfo {
    int32_t id;
    double score;
};

struct SvHash {
    size_t operator()(std::string_view s) const noexcept {
        return std::hash<std::string_view>{}(s);
    }
};

struct Tokenizer {
    std::string blob;  // stable backing storage for the piece string_views
    std::unordered_map<std::string_view, PieceInfo, SvHash> vocab;
    std::string marker;      // metaspace replacement, UTF-8 (usually "▁")
    double unk_score = 0.0;  // min vocab score - 10 (HF kUnkPenalty)
    int32_t unk_id = 0, cls_id = 0, sep_id = 0, pad_id = 0;
    size_t max_piece_bytes = 1;
    // pre-tokenizer pipeline flags (validated by the wrapper against
    // tokenizer.json; unsupported configs never reach this code)
    bool whitespace_split = false;
    bool metaspace = true;
    bool metaspace_split = true;
    int prepend = 1;  // 0=never, 1=always, 2=first
};

inline bool is_py_space(unsigned char c) {
    // bytes str.split() treats as whitespace in the ASCII plane
    return c == ' ' || (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f);
}

inline size_t cp_len(unsigned char lead) {
    if (lead < 0x80) return 1;
    if ((lead >> 5) == 0x6) return 2;
    if ((lead >> 4) == 0xe) return 3;
    if ((lead >> 3) == 0x1e) return 4;
    return 1;  // invalid lead byte: step one byte (wrapper feeds valid UTF-8)
}

// Maximum-score segmentation of one word; appends ids to out. Mirrors
// UnigramTokenizer._viterbi exactly (same update order, strict->greater
// tie-breaks, unk transition after the vocab scan at each position,
// consecutive-unk fusion during backtrack).
void viterbi(const Tokenizer& t, std::string_view word,
             std::vector<int32_t>& out) {
    const size_t n = word.size();
    std::vector<double> best(n + 1, kNegInf);
    std::vector<int32_t> back_prev(n + 1, -1);
    std::vector<int32_t> back_id(n + 1, -1);
    best[0] = 0.0;
    for (size_t i = 0; i < n; ++i) {
        const double bi = best[i];
        if (bi == kNegInf) continue;
        const size_t hi = std::min(n, i + t.max_piece_bytes);
        for (size_t j = i + 1; j <= hi; ++j) {
            auto it = t.vocab.find(word.substr(i, j - i));
            if (it != t.vocab.end() && bi + it->second.score > best[j]) {
                best[j] = bi + it->second.score;
                back_prev[j] = static_cast<int32_t>(i);
                back_id[j] = it->second.id;
            }
        }
        const size_t cl = std::min(cp_len(word[i]), n - i);
        if (t.vocab.find(word.substr(i, cl)) == t.vocab.end()) {
            if (bi + t.unk_score > best[i + cl]) {
                best[i + cl] = bi + t.unk_score;
                back_prev[i + cl] = static_cast<int32_t>(i);
                back_id[i + cl] = t.unk_id;
            }
        }
    }
    if (best[n] == kNegInf) {  // unreachable (unk covers every cp) — guard
        out.push_back(t.unk_id);
        return;
    }
    size_t mark = out.size();
    size_t pos = n;
    while (pos > 0) {
        int32_t tid = back_id[pos];
        // fuse consecutive unknown tokens (fuse_unk); out holds the
        // reversed ids past `mark`, so the previously appended id is the
        // one FOLLOWING tid in text order
        if (!(tid == t.unk_id && out.size() > mark && out.back() == t.unk_id))
            out.push_back(tid);
        pos = static_cast<size_t>(back_prev[pos]);
    }
    for (size_t a = mark, b = out.size() - 1; a < b; ++a, --b)
        std::swap(out[a], out[b]);
}

// Metaspace over one whitespace piece: replace ' ' with the marker,
// optionally prepend it, then split chunks at marker starts and run
// Viterbi per chunk. Mirrors UnigramTokenizer.pre_tokenize + tokenize_ids.
void metaspace_piece(const Tokenizer& t, std::string_view piece,
                     bool prepend_here, std::string& buf,
                     std::vector<int32_t>& out) {
    buf.clear();
    // Python checks startswith(marker) AFTER the space->marker replace, so
    // a leading ' ' also suppresses the prepend
    bool starts_with_marker =
        (!piece.empty() && piece[0] == ' ') ||
        piece.substr(0, t.marker.size()) == std::string_view(t.marker);
    if (prepend_here && !starts_with_marker) buf += t.marker;
    for (size_t i = 0; i < piece.size();) {
        if (piece[i] == ' ') {
            buf += t.marker;
            ++i;
        } else {
            size_t cl = std::min(cp_len(piece[i]), piece.size() - i);
            buf.append(piece.data() + i, cl);
            i += cl;
        }
    }
    if (!t.metaspace_split) {
        if (!buf.empty()) viterbi(t, buf, out);
        return;
    }
    // MergedWithNext: each marker begins a new chunk (the first chunk may
    // lack a marker)
    std::string_view s(buf);
    size_t start = 0, i = 0;
    const std::string& m = t.marker;
    while (i < s.size()) {
        size_t cl = std::min(cp_len(s[i]), s.size() - i);
        if (i > start && cl == m.size() &&
            std::memcmp(s.data() + i, m.data(), m.size()) == 0) {
            viterbi(t, s.substr(start, i - start), out);
            start = i;
        }
        i += cl;
    }
    if (start < s.size()) viterbi(t, s.substr(start), out);
}

// normalized text -> piece ids (no framing)
void tokenize(const Tokenizer& t, std::string_view text,
              std::vector<int32_t>& out) {
    std::string buf;
    if (!t.metaspace && !t.whitespace_split) {
        // bare sentencepiece: one sequence, marker prepended
        // unconditionally (even for empty text), no marker splitting
        // (pre_tokenize fallback in unigram.py)
        buf = t.marker;
        for (char c : text) {
            if (c == ' ') buf += t.marker;
            else buf.push_back(c);
        }
        viterbi(t, buf, out);
        return;
    }
    if (!t.whitespace_split) {
        if (text.empty()) return;
        metaspace_piece(t, text, t.prepend != 0, buf, out);
        return;
    }
    // WhitespaceSplit then (optionally) Metaspace per word
    size_t i = 0, pi = 0;
    while (i < text.size()) {
        while (i < text.size() && is_py_space(text[i])) ++i;
        size_t start = i;
        while (i < text.size() && !is_py_space(text[i])) ++i;
        if (i == start) break;
        std::string_view word = text.substr(start, i - start);
        if (t.metaspace) {
            bool prepend_here =
                t.prepend == 1 || (t.prepend == 2 && pi == 0);
            metaspace_piece(t, word, prepend_here, buf, out);
        } else {
            viterbi(t, word, out);
        }
        ++pi;
    }
}

}  // namespace

extern "C" {

// pieces_blob: n NUL-terminated UTF-8 strings back to back; id = order.
// scores: n doubles. marker: the Metaspace replacement string.
void* un_create(const char* pieces_blob, int64_t blob_len, int32_t n,
                const double* scores, const char* marker, int32_t marker_len,
                double unk_score, int32_t unk_id, int32_t cls_id,
                int32_t sep_id, int32_t pad_id, int32_t whitespace_split,
                int32_t metaspace, int32_t metaspace_split,
                int32_t prepend) {
    auto* t = new Tokenizer();
    t->blob.assign(pieces_blob, static_cast<size_t>(blob_len));
    t->marker.assign(marker, static_cast<size_t>(marker_len));
    t->unk_score = unk_score;
    t->unk_id = unk_id;
    t->cls_id = cls_id;
    t->sep_id = sep_id;
    t->pad_id = pad_id;
    t->whitespace_split = whitespace_split != 0;
    t->metaspace = metaspace != 0;
    t->metaspace_split = metaspace_split != 0;
    t->prepend = prepend;
    t->vocab.reserve(static_cast<size_t>(n) * 2);
    const char* p = t->blob.data();
    const char* end = p + t->blob.size();
    for (int32_t i = 0; i < n && p < end; ++i) {
        size_t len = strnlen(p, static_cast<size_t>(end - p));
        // last writer wins on duplicates — matches the Python dict build
        t->vocab[std::string_view(p, len)] = PieceInfo{i, scores[i]};
        if (len > t->max_piece_bytes) t->max_piece_bytes = len;
        p += len + 1;
    }
    return t;
}

void un_destroy(void* h) { delete static_cast<Tokenizer*>(h); }

// One normalized text -> piece ids (no framing). Returns the piece count
// (only the first max_out are written).
int32_t un_tokenize(void* h, const char* text, int64_t text_len,
                    int32_t* out, int32_t max_out) {
    const auto& t = *static_cast<Tokenizer*>(h);
    std::vector<int32_t> ids;
    ids.reserve(64);
    tokenize(t, std::string_view(text, static_cast<size_t>(text_len)), ids);
    int32_t n = static_cast<int32_t>(ids.size());
    int32_t w = n < max_out ? n : max_out;
    std::memcpy(out, ids.data(), static_cast<size_t>(w) * sizeof(int32_t));
    return n;
}

// Batch encode with framing: texts_blob = n NUL-terminated normalized
// strings. ids/mask: (n, seq_len) int32, row i = <s> pieces.. </s> pad..
// (truncation keeps the trailing </s> — the HF convention the parity
// tests pin).
int32_t un_encode_batch(void* h, const char* texts_blob, int64_t blob_len,
                        int32_t n_texts, int32_t seq_len,
                        int32_t* ids, int32_t* mask) {
    const auto& t = *static_cast<Tokenizer*>(h);
    const char* p = texts_blob;
    const char* end = texts_blob + blob_len;
    std::vector<int32_t> pieces;
    for (int32_t i = 0; i < n_texts; ++i) {
        if (p > end) return -1;
        size_t len = strnlen(p, static_cast<size_t>(end - p));
        pieces.clear();
        tokenize(t, std::string_view(p, len), pieces);
        p += len + 1;
        int32_t body = static_cast<int32_t>(pieces.size());
        if (body > seq_len - 2) body = seq_len - 2;
        int32_t* row = ids + static_cast<int64_t>(i) * seq_len;
        int32_t* mrow = mask + static_cast<int64_t>(i) * seq_len;
        row[0] = t.cls_id;
        for (int32_t j = 0; j < body; ++j) row[1 + j] = pieces[j];
        row[1 + body] = t.sep_id;
        int32_t live = body + 2;
        for (int32_t j = live; j < seq_len; ++j) row[j] = t.pad_id;
        for (int32_t j = 0; j < seq_len; ++j) mrow[j] = j < live ? 1 : 0;
    }
    return 0;
}

}  // extern "C"
