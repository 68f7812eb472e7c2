// Native WordPiece tokenizer — the host-side hot loop of the embedding
// pipeline (pipeline/fast_wordpiece.py is the ctypes wrapper).
//
// The Python WordPiece (pipeline/wordpiece.py) measures ~1.7K texts/s on
// this image's 1-core host, BELOW the TPU encoder's device throughput
// (17.9K texts/s) — tokenization, not the model, bounds end-to-end encode.
// This implementation covers the ASCII fast path exactly (byte-for-byte
// the same algorithm: clean -> whitespace split -> lowercase -> ASCII
// punctuation split -> greedy longest-match-first WordPiece with "##"
// continuations); the wrapper routes any text containing a non-ASCII byte
// to the Python tokenizer, so parity is by construction, not by
// approximation. Reference capability: the mlx pipeline tokenized through
// HF's Rust tokenizers (integrations/mlx_lm_pipeline.py:247-263).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC (see fast_wordpiece.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
    std::unordered_map<std::string, int32_t> vocab;
    bool lowercase = true;
    int32_t pad_id = 0, unk_id = 0, cls_id = 0, sep_id = 0;
    int max_input_chars = 100;
    size_t max_piece_len = 1;  // longest vocab entry (caps the match scan)
};

inline bool is_ws(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

inline bool is_control(unsigned char c) {
    // ASCII controls except \t\n\r (mirrors wordpiece.py _is_control for
    // the ASCII plane; 0x7f is DEL, category Cc)
    return (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f;
}

inline bool is_punct(unsigned char c) {
    // the exact ASCII ranges BERT treats as punctuation
    // (wordpiece.py _is_punctuation)
    return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
           (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// greedy longest-match-first over one word; appends piece ids to out.
// Any unmatchable remainder voids the whole word to [UNK].
void wordpiece(const Tokenizer& t, std::string_view word,
               std::vector<int32_t>& out) {
    if (word.size() > static_cast<size_t>(t.max_input_chars)) {
        out.push_back(t.unk_id);
        return;
    }
    size_t mark = out.size();
    std::string sub;
    size_t start = 0;
    while (start < word.size()) {
        size_t best_end = 0;
        int32_t best_id = -1;
        size_t cap = word.size();
        if (start > 0 && cap - start + 2 > t.max_piece_len)
            cap = start + (t.max_piece_len > 2 ? t.max_piece_len - 2 : 0);
        else if (start == 0 && cap > t.max_piece_len)
            cap = t.max_piece_len;
        for (size_t end = cap; end > start; --end) {
            sub.clear();
            if (start > 0) sub += "##";
            sub.append(word.data() + start, end - start);
            auto it = t.vocab.find(sub);
            if (it != t.vocab.end()) {
                best_end = end;
                best_id = it->second;
                break;
            }
        }
        if (best_id < 0) {
            out.resize(mark);
            out.push_back(t.unk_id);
            return;
        }
        out.push_back(best_id);
        start = best_end;
    }
}

// clean + split + lowercase + punct-split + wordpiece, ASCII input only.
void tokenize(const Tokenizer& t, std::string_view text,
              std::vector<int32_t>& out) {
    std::string word;
    auto flush = [&]() {
        if (!word.empty()) {
            wordpiece(t, word, out);
            word.clear();
        }
    };
    for (unsigned char c : text) {
        if (c == 0 || is_control(c)) continue;
        if (is_ws(c)) {
            flush();
            continue;
        }
        if (t.lowercase && c >= 'A' && c <= 'Z') c += 32;
        if (is_punct(c)) {
            flush();
            word.assign(1, static_cast<char>(c));
            flush();
            continue;
        }
        word.push_back(static_cast<char>(c));
    }
    flush();
}

}  // namespace

extern "C" {

// vocab_blob: n_tokens NUL-terminated strings back to back; id = order.
void* wp_create(const char* vocab_blob, int64_t blob_len, int32_t n_tokens,
                int32_t lowercase, int32_t pad_id, int32_t unk_id,
                int32_t cls_id, int32_t sep_id) {
    auto* t = new Tokenizer();
    t->lowercase = lowercase != 0;
    t->pad_id = pad_id;
    t->unk_id = unk_id;
    t->cls_id = cls_id;
    t->sep_id = sep_id;
    const char* p = vocab_blob;
    const char* end = vocab_blob + blob_len;
    for (int32_t i = 0; i < n_tokens && p < end; ++i) {
        size_t len = strnlen(p, end - p);
        t->vocab.emplace(std::string(p, len), i);
        if (len > t->max_piece_len) t->max_piece_len = len;
        p += len + 1;
    }
    return t;
}

void wp_destroy(void* h) { delete static_cast<Tokenizer*>(h); }

// One text -> piece ids (no CLS/SEP framing). Returns the piece count
// (may exceed max_out; only the first max_out are written).
int32_t wp_tokenize(void* h, const char* text, int64_t text_len,
                    int32_t* out, int32_t max_out) {
    const auto& t = *static_cast<Tokenizer*>(h);
    std::vector<int32_t> ids;
    ids.reserve(64);
    tokenize(t, std::string_view(text, text_len), ids);
    int32_t n = static_cast<int32_t>(ids.size());
    int32_t w = n < max_out ? n : max_out;
    std::memcpy(out, ids.data(), w * sizeof(int32_t));
    return n;
}

// Batch encode with framing: texts_blob = n NUL-terminated strings.
// ids/mask: (n, seq_len) int32, row i = [CLS] pieces.. [SEP] pad..
// (truncation keeps the SEP — the HF convention the store tests pin).
int32_t wp_encode_batch(void* h, const char* texts_blob, int64_t blob_len,
                        int32_t n_texts, int32_t seq_len,
                        int32_t* ids, int32_t* mask) {
    const auto& t = *static_cast<Tokenizer*>(h);
    const char* p = texts_blob;
    const char* end = texts_blob + blob_len;
    std::vector<int32_t> pieces;
    for (int32_t i = 0; i < n_texts; ++i) {
        if (p > end) return -1;
        size_t len = strnlen(p, end - p);
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
