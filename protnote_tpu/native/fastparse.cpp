// Native helpers for the protnote_tpu input pipeline.
//
// The reference framework does all FASTA parsing and residue tokenisation in
// Python (protnote/utils/data.py:81-96, protnote/data/datasets.py:345-409).
// On TPU the input pipeline runs on few host cores, so the per-character work
// is moved here: a single-pass FASTA parser and a LUT-based residue encoder
// that writes padded int8 id arrays directly into caller-provided buffers.
//
// Exposed via ctypes (see protnote_tpu/native/__init__.py). C ABI only.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Reads a whole file into a malloc'd buffer. Returns size, or -1 on error.
static int64_t read_file(const char* path, char** out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char* buf = (char*)std::malloc((size_t)size + 1);
    if (!buf) { std::fclose(f); return -1; }
    size_t got = std::fread(buf, 1, (size_t)size, f);
    std::fclose(f);
    buf[got] = '\0';
    *out = buf;
    return (int64_t)got;
}

// Parses FASTA at `path`. Produces a normalised record stream in a single
// malloc'd buffer: for each record "HEADER\tSEQUENCE\n" where HEADER is the
// raw description line (without '>') and SEQUENCE has all whitespace removed.
// Returns the buffer (caller frees with fp_free) and sets *out_len /
// *out_nrecords.  Returns NULL on IO error.
char* fp_parse_fasta(const char* path, int64_t* out_len, int64_t* out_nrecords) {
    char* data = nullptr;
    int64_t n = read_file(path, &data);
    if (n < 0) return nullptr;

    // Output can never exceed input size + 1 per record separator bound.
    char* out = (char*)std::malloc((size_t)n + 2);
    if (!out) { std::free(data); return nullptr; }
    int64_t o = 0, nrec = 0;
    bool in_header = false;
    bool any = false;
    for (int64_t i = 0; i < n; ++i) {
        char c = data[i];
        if (c == '>') {
            // only counts as a header if at line start
            if (i == 0 || data[i - 1] == '\n') {
                if (any) out[o++] = '\n';
                any = true;
                ++nrec;
                in_header = true;
                continue;
            }
        }
        if (in_header) {
            if (c == '\n' || c == '\r') {
                // strip trailing CR/whitespace, then switch to sequence mode
                while (o > 0 && (out[o - 1] == ' ' || out[o - 1] == '\t' || out[o - 1] == '\r'))
                    --o;
                out[o++] = '\t';
                in_header = false;
            } else {
                out[o++] = c;
            }
        } else if (any) {
            if (c != '\n' && c != '\r' && c != ' ' && c != '\t') out[o++] = c;
        }
    }
    if (any) out[o++] = '\n';
    out[o] = '\0';
    std::free(data);
    *out_len = o;
    *out_nrecords = nrec;
    return out;
}

void fp_free(char* p) { std::free(p); }

// Encodes residues to int8 ids using a 256-entry lookup table.
//   seqs:     concatenated sequence bytes
//   offsets:  n+1 offsets into seqs
//   lut:      256 int8 entries; unknown chars map to `unknown_id`
//   out:      (n, padded_len) int8 buffer, pre-filled is NOT required
//   pad_id:   value for positions >= length
// Sequences longer than padded_len are truncated.
void fp_encode_batch(const char* seqs, const int64_t* offsets, int64_t n,
                     const int8_t* lut, int8_t unknown_id, int8_t pad_id,
                     int64_t padded_len, int8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const char* s = seqs + offsets[i];
        int64_t len = offsets[i + 1] - offsets[i];
        if (len > padded_len) len = padded_len;
        int8_t* row = out + i * padded_len;
        for (int64_t j = 0; j < len; ++j) {
            int8_t v = lut[(uint8_t)s[j]];
            row[j] = (v < 0) ? unknown_id : v;
        }
        for (int64_t j = len; j < padded_len; ++j) row[j] = pad_id;
    }
}

// Builds a multi-hot uint8 matrix from flattened label-id lists.
//   label_ids: concatenated int32 label indices
//   offsets:   n+1 offsets
//   out:       (n, num_labels) uint8, must be zero-initialised by caller
void fp_multihot(const int32_t* label_ids, const int64_t* offsets, int64_t n,
                 int64_t num_labels, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        uint8_t* row = out + i * num_labels;
        for (int64_t j = offsets[i]; j < offsets[i + 1]; ++j) {
            int32_t id = label_ids[j];
            if (id >= 0 && id < num_labels) row[id] = 1;
        }
    }
}

}  // extern "C"
