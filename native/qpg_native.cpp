// qpg_native: host-side native runtime for qpgesture_tpu.
//
// Native equivalents of the reference's performance-relevant C dependencies
// (SURVEY §2.9):
//   * python-Levenshtein  -> batched fixed-length edit distance (the host
//     oracle / fallback for the device wavefront kernel);
//   * LMDB + pyarrow      -> a memory-mapped append-only record store with
//     a trailing index (the training-sample cache);
//   * BVH motion parsing  -> bulk ASCII float parsing (strtod loop), the
//     hot path of BVH ingestion.
//
// Exposed as a plain C ABI consumed via ctypes (utils/native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// Batched Levenshtein over fixed-length int32 code strings.
// a: (Q, L), b: (N, L), out: (Q, N) int32.
// ---------------------------------------------------------------------------
void qpg_levenshtein_matrix(const int32_t* a, int64_t q, const int32_t* b,
                            int64_t n, int64_t len, int32_t* out) {
    std::vector<int32_t> prev(len + 1), cur(len + 1);
    for (int64_t qi = 0; qi < q; ++qi) {
        const int32_t* sa = a + qi * len;
        for (int64_t ni = 0; ni < n; ++ni) {
            const int32_t* sb = b + ni * len;
            for (int64_t j = 0; j <= len; ++j) prev[j] = (int32_t)j;
            for (int64_t i = 1; i <= len; ++i) {
                cur[0] = (int32_t)i;
                const int32_t ca = sa[i - 1];
                for (int64_t j = 1; j <= len; ++j) {
                    int32_t cost = (ca == sb[j - 1]) ? 0 : 1;
                    int32_t v = prev[j] + 1;
                    int32_t w = cur[j - 1] + 1;
                    if (w < v) v = w;
                    int32_t d = prev[j - 1] + cost;
                    if (d < v) v = d;
                    cur[j] = v;
                }
                std::swap(prev, cur);
            }
            out[qi * n + ni] = prev[len];
        }
    }
}

// Variable-length pair variant (general oracle).
int32_t qpg_levenshtein(const int32_t* a, int64_t la, const int32_t* b,
                        int64_t lb) {
    std::vector<int32_t> prev(lb + 1), cur(lb + 1);
    for (int64_t j = 0; j <= lb; ++j) prev[j] = (int32_t)j;
    for (int64_t i = 1; i <= la; ++i) {
        cur[0] = (int32_t)i;
        for (int64_t j = 1; j <= lb; ++j) {
            int32_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
            int32_t v = prev[j] + 1;
            if (cur[j - 1] + 1 < v) v = cur[j - 1] + 1;
            if (prev[j - 1] + cost < v) v = prev[j - 1] + cost;
            cur[j] = v;
        }
        std::swap(prev, cur);
    }
    return prev[lb];
}

// ---------------------------------------------------------------------------
// Bulk ASCII float parsing: whitespace-separated doubles from a text buffer.
// Returns the number parsed (up to max_out).
// ---------------------------------------------------------------------------
int64_t qpg_parse_floats(const char* text, int64_t text_len, double* out,
                         int64_t max_out) {
    const char* p = text;
    const char* end = text + text_len;
    int64_t count = 0;
    while (p < end && count < max_out) {
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) {  // not a number: skip one char
            ++p;
            continue;
        }
        out[count++] = v;
        p = next;
    }
    return count;
}

// ---------------------------------------------------------------------------
// Record store: append-only records + trailing index, mmap'd reads.
// Layout: [magic u64][records...][index: u64 offsets, u64 lengths]
//         [n_records u64][index_offset u64]
// ---------------------------------------------------------------------------
struct QpgWriter {
    FILE* f;
    std::vector<uint64_t> offsets;
    std::vector<uint64_t> lengths;
    uint64_t pos;
};

static const uint64_t QPG_MAGIC = 0x51504753544f5245ULL;  // "QPGSTORE"

void* qpg_store_create(const char* path) {
    FILE* f = fopen(path, "wb");
    if (!f) return nullptr;
    QpgWriter* w = new QpgWriter{f, {}, {}, 0};
    fwrite(&QPG_MAGIC, 8, 1, f);
    w->pos = 8;
    return w;
}

int64_t qpg_store_append(void* handle, const void* data, int64_t len) {
    QpgWriter* w = (QpgWriter*)handle;
    w->offsets.push_back(w->pos);
    w->lengths.push_back((uint64_t)len);
    if (fwrite(data, 1, (size_t)len, w->f) != (size_t)len) return -1;
    w->pos += (uint64_t)len;
    return (int64_t)w->offsets.size() - 1;
}

int64_t qpg_store_finalize(void* handle) {
    QpgWriter* w = (QpgWriter*)handle;
    uint64_t index_off = w->pos;
    uint64_t n = w->offsets.size();
    fwrite(w->offsets.data(), 8, n, w->f);
    fwrite(w->lengths.data(), 8, n, w->f);
    fwrite(&n, 8, 1, w->f);
    fwrite(&index_off, 8, 1, w->f);
    fclose(w->f);
    delete w;
    return (int64_t)n;
}

struct QpgReader {
    int fd;
    uint8_t* base;
    uint64_t size;
    uint64_t n;
    const uint64_t* offsets;
    const uint64_t* lengths;
};

void* qpg_store_open(const char* path) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size < 24) { close(fd); return nullptr; }
    uint64_t size = (uint64_t)st.st_size;
    uint8_t* base = (uint8_t*)mmap(nullptr, size, PROT_READ, MAP_SHARED, fd,
                                   0);
    if (base == MAP_FAILED) { close(fd); return nullptr; }
    uint64_t magic;
    memcpy(&magic, base, 8);
    if (magic != QPG_MAGIC) { munmap(base, size); close(fd); return nullptr; }
    uint64_t n, index_off;
    memcpy(&n, base + size - 16, 8);
    memcpy(&index_off, base + size - 8, 8);
    // Validate the tail-of-file index against the mapped size before
    // dereferencing: a truncated or corrupt store must fail to open, not
    // read out of bounds. Layout: [data][offsets 8n][lengths 8n][n][off].
    if (index_off < 8 || index_off > size ||
        n > (size - index_off) / 16 ||
        index_off + 16 * n + 16 != size) {
        munmap(base, size); close(fd); return nullptr;
    }
    const uint64_t* offsets = (const uint64_t*)(base + index_off);
    const uint64_t* lengths = (const uint64_t*)(base + index_off + 8 * n);
    for (uint64_t i = 0; i < n; ++i) {
        if (offsets[i] > index_off || lengths[i] > index_off - offsets[i]) {
            munmap(base, size); close(fd); return nullptr;
        }
    }
    QpgReader* r = new QpgReader{fd, base, size, n, offsets, lengths};
    return r;
}

int64_t qpg_store_count(void* handle) {
    return (int64_t)((QpgReader*)handle)->n;
}

int64_t qpg_store_record_len(void* handle, int64_t i) {
    QpgReader* r = (QpgReader*)handle;
    if (i < 0 || (uint64_t)i >= r->n) return -1;
    return (int64_t)r->lengths[i];
}

int64_t qpg_store_read(void* handle, int64_t i, void* out, int64_t cap) {
    QpgReader* r = (QpgReader*)handle;
    if (i < 0 || (uint64_t)i >= r->n) return -1;
    uint64_t len = r->lengths[i];
    if ((int64_t)len > cap) return -1;
    memcpy(out, r->base + r->offsets[i], len);
    return (int64_t)len;
}

// Zero-copy pointer access (valid while the store stays open).
const void* qpg_store_record_ptr(void* handle, int64_t i) {
    QpgReader* r = (QpgReader*)handle;
    if (i < 0 || (uint64_t)i >= r->n) return nullptr;
    return r->base + r->offsets[i];
}

void qpg_store_close(void* handle) {
    QpgReader* r = (QpgReader*)handle;
    munmap(r->base, r->size);
    close(r->fd);
    delete r;
}

}  // extern "C"
