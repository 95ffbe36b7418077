// Native host-side featurization: tokenizing + hashing text/tags into
// fixed-width count/multi-hot vectors.
//
// This is the host hot loop of the ingest path (the equivalent of the
// reference's per-window TfidfVectorizer / tag-set construction,
// reference matrix_operations.py:84-89, 102-105): for a 2000-row window it
// touches every byte of every title/description/tag.  The Python fallback
// (data/features.py) does the same work ~30x slower.
//
// Hash = CRC32 (zlib polynomial), bit-for-bit identical to the Python
// fallback's zlib.crc32, so both paths produce identical tensors and the
// parity tests can assert exact equality.
//
// Build: make -C mused_tpu/native   (produces libmused_hasher.so)
// ABI: plain C, consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

namespace {

uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
    if (crc_init_done) return;
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_table[i] = c;
    }
    crc_init_done = true;
}

inline uint32_t crc32_bytes(const char* data, size_t len) {
    uint32_t c = 0xFFFFFFFFu;
    for (size_t i = 0; i < len; i++)
        c = crc_table[(c ^ static_cast<unsigned char>(data[i])) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

inline bool is_token_char(char ch) {
    return (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9');
}

inline char to_lower_ascii(char ch) {
    return (ch >= 'A' && ch <= 'Z') ? char(ch + 32) : ch;
}

}  // namespace

extern "C" {

// Tokenize each document ([a-z0-9]+ runs of the lowercased text, tokens of
// length >= 2 like sklearn's \w\w+ default) and accumulate hashed counts.
// texts: n C strings; out: (n, dim) float32 row-major, pre-zeroed by caller.
void mused_hash_text_counts(const char** texts, int64_t n, int64_t dim,
                            float* out) {
    crc_init();
    for (int64_t i = 0; i < n; i++) {
        const char* s = texts[i];
        if (!s) continue;
        float* row = out + i * dim;
        uint32_t crc = 0xFFFFFFFFu;   // streaming CRC, any token length
        size_t tok_len = 0;
        for (size_t p = 0;; p++) {
            char ch = s[p] ? to_lower_ascii(s[p]) : '\0';
            if (ch && is_token_char(ch)) {
                crc = crc_table[(crc ^ static_cast<unsigned char>(ch)) & 0xFF]
                      ^ (crc >> 8);
                tok_len++;
            } else {
                if (tok_len >= 2)
                    row[(crc ^ 0xFFFFFFFFu) % dim] += 1.0f;
                crc = 0xFFFFFFFFu;
                tok_len = 0;
                if (!s[p]) break;
            }
        }
    }
}

// Tags arrive as one string per row with tags separated by '\x1f'; each tag
// hashes as a whole (the reference treats tags as set elements, not words).
// out: (n, dim) float32, pre-zeroed; entries set to 1.0 (multi-hot).
void mused_multihot_tags(const char** rows, int64_t n, int64_t dim,
                         float* out) {
    crc_init();
    for (int64_t i = 0; i < n; i++) {
        const char* s = rows[i];
        if (!s || !s[0]) continue;
        float* row = out + i * dim;
        const char* start = s;
        for (const char* p = s;; p++) {
            if (*p == '\x1f' || *p == '\0') {
                size_t len = size_t(p - start);
                if (len > 0)
                    row[crc32_bytes(start, len) % dim] = 1.0f;
                if (*p == '\0') break;
                start = p + 1;
            }
        }
    }
}

// Sparse emitters: per row, up to T distinct hashed token ids (+ counts for
// text).  A tiny open-addressing table dedups within the row.  Overflowing
// rows drop extra DISTINCT tokens (rare: T is sized above realistic token
// counts); out_ids is pre-filled with -1 by the caller.

static const int kProbe = 2;   // linear probing stride

void mused_hash_text_sparse(const char** texts, int64_t n, int64_t dim,
                            int64_t t_cap, int32_t* out_ids,
                            uint16_t* out_cnt) {
    crc_init();
    const int64_t tab_size = t_cap * 4;
    int32_t* tab_id = new int32_t[tab_size];
    int32_t* tab_slot = new int32_t[tab_size];
    for (int64_t i = 0; i < n; i++) {
        const char* s = texts[i];
        int32_t* ids = out_ids + i * t_cap;
        uint16_t* cnt = out_cnt + i * t_cap;
        if (!s) continue;
        for (int64_t q = 0; q < tab_size; q++) tab_id[q] = -1;
        int64_t used = 0;
        uint32_t crc = 0xFFFFFFFFu;
        size_t tok_len = 0;
        for (size_t p = 0;; p++) {
            char ch = s[p] ? to_lower_ascii(s[p]) : '\0';
            if (ch && is_token_char(ch)) {
                crc = crc_table[(crc ^ static_cast<unsigned char>(ch)) & 0xFF]
                      ^ (crc >> 8);
                tok_len++;
            } else {
                if (tok_len >= 2) {
                    int32_t id = int32_t((crc ^ 0xFFFFFFFFu) % uint32_t(dim));
                    int64_t h = (uint32_t(id) * 2654435761u) % tab_size;
                    for (;;) {
                        if (tab_id[h] == id) {
                            if (cnt[tab_slot[h]] < 65535) cnt[tab_slot[h]]++;
                            break;
                        }
                        if (tab_id[h] == -1) {
                            if (used < t_cap) {
                                tab_id[h] = id;
                                tab_slot[h] = int32_t(used);
                                ids[used] = id;
                                cnt[used] = 1;
                                used++;
                            }
                            break;
                        }
                        h = (h + kProbe) % tab_size;
                    }
                }
                crc = 0xFFFFFFFFu;
                tok_len = 0;
                if (!s[p]) break;
            }
        }
    }
    delete[] tab_id;
    delete[] tab_slot;
}

void mused_multihot_tags_sparse(const char** rows, int64_t n, int64_t dim,
                                int64_t t_cap, int32_t* out_ids) {
    crc_init();
    for (int64_t i = 0; i < n; i++) {
        const char* s = rows[i];
        int32_t* ids = out_ids + i * t_cap;
        if (!s || !s[0]) continue;
        int64_t used = 0;
        const char* start = s;
        for (const char* p = s;; p++) {
            if (*p == '\x1f' || *p == '\0') {
                size_t len = size_t(p - start);
                if (len > 0 && used < t_cap) {
                    int32_t id = int32_t(crc32_bytes(start, len)
                                         % uint32_t(dim));
                    bool dup = false;
                    for (int64_t q = 0; q < used; q++)
                        if (ids[q] == id) { dup = true; break; }
                    if (!dup) ids[used++] = id;
                }
                if (*p == '\0') break;
                start = p + 1;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Packed-blob ABI (v2): one NUL-separated UTF-8 blob for all n rows instead
// of an array of n C-string pointers.  The per-string ctypes c_char_p
// marshalling (a Python object + pointer per row) dominated the v1 call cost
// at window scale; here Python does ONE join + ONE encode and passes two
// scalars and one buffer.  Row walk: rows are separated by '\0' (n rows,
// n-1 separators; the caller guarantees no embedded NULs).
// ---------------------------------------------------------------------------

namespace {

// advance to the end of the current row: [*pos, end) of blob
inline int64_t row_end(const char* blob, int64_t blob_len, int64_t start) {
    int64_t p = start;
    while (p < blob_len && blob[p] != '\0') p++;
    return p;
}

}  // namespace

void mused_hash_text_counts_packed(const char* blob, int64_t blob_len,
                                   int64_t n, int64_t dim, float* out) {
    crc_init();
    int64_t pos = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t end = row_end(blob, blob_len, pos);
        float* row = out + i * dim;
        uint32_t crc = 0xFFFFFFFFu;
        size_t tok_len = 0;
        for (int64_t p = pos; p <= end; p++) {
            char ch = (p < end) ? to_lower_ascii(blob[p]) : '\0';
            if (ch && is_token_char(ch)) {
                crc = crc_table[(crc ^ static_cast<unsigned char>(ch)) & 0xFF]
                      ^ (crc >> 8);
                tok_len++;
            } else {
                if (tok_len >= 2)
                    row[(crc ^ 0xFFFFFFFFu) % dim] += 1.0f;
                crc = 0xFFFFFFFFu;
                tok_len = 0;
            }
        }
        pos = end + 1;
    }
}

void mused_multihot_tags_packed(const char* blob, int64_t blob_len,
                                int64_t n, int64_t dim, float* out) {
    crc_init();
    int64_t pos = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t end = row_end(blob, blob_len, pos);
        float* row = out + i * dim;
        int64_t start = pos;
        for (int64_t p = pos; p <= end; p++) {
            if (p == end || blob[p] == '\x1f') {
                if (p > start)
                    row[crc32_bytes(blob + start, size_t(p - start)) % dim]
                        = 1.0f;
                start = p + 1;
            }
        }
        pos = end + 1;
    }
}

void mused_hash_text_sparse_packed(const char* blob, int64_t blob_len,
                                   int64_t n, int64_t dim, int64_t t_cap,
                                   int32_t* out_ids, uint16_t* out_cnt) {
    crc_init();
    const int64_t tab_size = t_cap * 4;
    int32_t* tab_id = new int32_t[tab_size];
    int32_t* tab_slot = new int32_t[tab_size];
    int64_t pos = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t end = row_end(blob, blob_len, pos);
        int32_t* ids = out_ids + i * t_cap;
        uint16_t* cnt = out_cnt + i * t_cap;
        for (int64_t q = 0; q < tab_size; q++) tab_id[q] = -1;
        int64_t used = 0;
        uint32_t crc = 0xFFFFFFFFu;
        size_t tok_len = 0;
        for (int64_t p = pos; p <= end; p++) {
            char ch = (p < end) ? to_lower_ascii(blob[p]) : '\0';
            if (ch && is_token_char(ch)) {
                crc = crc_table[(crc ^ static_cast<unsigned char>(ch)) & 0xFF]
                      ^ (crc >> 8);
                tok_len++;
            } else {
                if (tok_len >= 2) {
                    int32_t id = int32_t((crc ^ 0xFFFFFFFFu) % uint32_t(dim));
                    int64_t h = (uint32_t(id) * 2654435761u) % tab_size;
                    for (;;) {
                        if (tab_id[h] == id) {
                            if (cnt[tab_slot[h]] < 65535) cnt[tab_slot[h]]++;
                            break;
                        }
                        if (tab_id[h] == -1) {
                            if (used < t_cap) {
                                tab_id[h] = id;
                                tab_slot[h] = int32_t(used);
                                ids[used] = id;
                                cnt[used] = 1;
                                used++;
                            }
                            break;
                        }
                        h = (h + kProbe) % tab_size;
                    }
                }
                crc = 0xFFFFFFFFu;
                tok_len = 0;
            }
        }
        pos = end + 1;
    }
    delete[] tab_id;
    delete[] tab_slot;
}

void mused_multihot_tags_sparse_packed(const char* blob, int64_t blob_len,
                                       int64_t n, int64_t dim, int64_t t_cap,
                                       int32_t* out_ids) {
    crc_init();
    int64_t pos = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t end = row_end(blob, blob_len, pos);
        int32_t* ids = out_ids + i * t_cap;
        int64_t used = 0;
        int64_t start = pos;
        for (int64_t p = pos; p <= end; p++) {
            if (p == end || blob[p] == '\x1f') {
                if (p > start && used < t_cap) {
                    int32_t id = int32_t(
                        crc32_bytes(blob + start, size_t(p - start))
                        % uint32_t(dim));
                    bool dup = false;
                    for (int64_t q = 0; q < used; q++)
                        if (ids[q] == id) { dup = true; break; }
                    if (!dup) ids[used++] = id;
                }
                start = p + 1;
            }
        }
        pos = end + 1;
    }
}

}  // extern "C"
