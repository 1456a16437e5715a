// vlgae_io: native data-loading kernels for the VLParse pipeline.
//
// TPU-native counterpart of the reference's host-side collate work
// (ref: src/datamodule/task/vlparse.py:29-108): per-image .npy feature
// files are parsed/mmapped, boxes are subsampled, and padded batches are
// packed directly into caller-allocated buffers -- the Python loop this
// replaces dominates host time at large batch sizes. Exposed through a
// C ABI for ctypes (no pybind11 in this environment).
//
// Also provides a fast CoNLL tokenizer (block splitting + column
// extraction) used by the data layer when available.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {

// Parse a .npy header. Returns 0 on success; fills rows/cols/data_offset.
// Only supports C-order little-endian f4/f8 2-D arrays (what the
// detection-feature dumps use).
int vlgae_npy_header(const char* path, int64_t* rows, int64_t* cols,
                     int64_t* data_offset, int* dtype_size) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    unsigned char magic[8];
    if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
        std::fclose(f);
        return -2;
    }
    int major = magic[6];
    uint32_t header_len = 0;
    if (major == 1) {
        unsigned char b[2];
        if (std::fread(b, 1, 2, f) != 2) { std::fclose(f); return -3; }
        header_len = b[0] | (b[1] << 8);
        *data_offset = 10 + header_len;
    } else {
        unsigned char b[4];
        if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); return -3; }
        header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24);
        *data_offset = 12 + header_len;
    }
    std::string header(header_len, '\0');
    if (std::fread(&header[0], 1, header_len, f) != header_len) {
        std::fclose(f);
        return -3;
    }
    std::fclose(f);
    if (header.find("'fortran_order': True") != std::string::npos) return -4;
    size_t dt = header.find("'descr':");
    *dtype_size = 4;
    if (dt != std::string::npos) {
        // big-endian data would parse to garbage floats; reject it
        // (numpy writes '<f4'/'<f8' on every supported platform)
        if (header.find("'>f", dt) != std::string::npos) return -5;
        if (header.find("f8", dt) != std::string::npos) *dtype_size = 8;
        else if (header.find("f4", dt) != std::string::npos) *dtype_size = 4;
        else return -5;
    }
    size_t sh = header.find("'shape':");
    if (sh == std::string::npos) return -6;
    size_t open = header.find('(', sh);
    if (open == std::string::npos) return -6;
    size_t close = header.find(')', open);
    // a truncated header must return an error code, not throw
    // std::out_of_range through the C ABI (ctypes would crash)
    if (close == std::string::npos) return -6;
    std::string shape = header.substr(open + 1, close - open - 1);
    long long r = 0, c = 1;
    if (std::sscanf(shape.c_str(), "%lld , %lld", &r, &c) < 1) {
        if (std::sscanf(shape.c_str(), "%lld, %lld", &r, &c) < 1) return -7;
    }
    *rows = r;
    *cols = c;
    return 0;
}

// Load one .npy feature file [n_box, feat_dim + 4] into caller buffers,
// optionally subsampling `sample` boxes (seeded, without replacement).
// feats_out: [pad_boxes, feat_dim] f32; boxes_out: [pad_boxes, 4] f32;
// mask_out: [pad_boxes] u8. Returns number of boxes written, < 0 on error.
int vlgae_load_det_feats(const char* path, int64_t pad_boxes,
                         int64_t feat_dim, int64_t sample, uint64_t seed,
                         float* feats_out, float* boxes_out,
                         uint8_t* mask_out) {
    int64_t rows, cols, offset;
    int dtype_size;
    int rc = vlgae_npy_header(path, &rows, &cols, &offset, &dtype_size);
    if (rc != 0) return rc;
    if (cols != feat_dim + 4) return -8;

    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::vector<int64_t> sel;
    if (sample > 0 && sample < rows) {
        std::mt19937_64 rng(seed);
        std::vector<int64_t> idx(rows);
        for (int64_t i = 0; i < rows; ++i) idx[i] = i;
        for (int64_t i = 0; i < sample; ++i) {
            std::uniform_int_distribution<int64_t> d(i, rows - 1);
            std::swap(idx[i], idx[d(rng)]);
        }
        sel.assign(idx.begin(), idx.begin() + sample);
        std::sort(sel.begin(), sel.end());
    } else {
        int64_t n = std::min(rows, pad_boxes);
        for (int64_t i = 0; i < n; ++i) sel.push_back(i);
    }
    int64_t n = std::min<int64_t>(sel.size(), pad_boxes);

    std::memset(mask_out, 0, pad_boxes);
    std::memset(feats_out, 0, sizeof(float) * pad_boxes * feat_dim);
    std::memset(boxes_out, 0, sizeof(float) * pad_boxes * 4);

    std::vector<double> row_d(cols);
    std::vector<float> row_f(cols);
    for (int64_t i = 0; i < n; ++i) {
        int64_t r = sel[i];
        if (std::fseek(f, offset + r * cols * dtype_size, SEEK_SET)) {
            std::fclose(f);
            return -9;
        }
        if (dtype_size == 8) {
            if (std::fread(row_d.data(), 8, cols, f) != (size_t)cols) {
                std::fclose(f);
                return -9;
            }
            for (int64_t j = 0; j < cols; ++j) row_f[j] = (float)row_d[j];
        } else {
            if (std::fread(row_f.data(), 4, cols, f) != (size_t)cols) {
                std::fclose(f);
                return -9;
            }
        }
        std::memcpy(feats_out + i * feat_dim, row_f.data(),
                    sizeof(float) * feat_dim);
        std::memcpy(boxes_out + i * 4, row_f.data() + feat_dim,
                    sizeof(float) * 4);
        mask_out[i] = 1;
    }
    std::fclose(f);
    return (int)n;
}

// Batched variant: loads n_imgs files (paths as a \n-joined buffer).
// Outputs are [n_imgs, pad_boxes, ...] contiguous. Returns 0 on success.
int vlgae_load_det_feats_batch(const char* paths_joined, int64_t n_imgs,
                               int64_t pad_boxes, int64_t feat_dim,
                               int64_t sample, uint64_t seed,
                               float* feats_out, float* boxes_out,
                               uint8_t* mask_out) {
    const char* p = paths_joined;
    for (int64_t i = 0; i < n_imgs; ++i) {
        const char* end = std::strchr(p, '\n');
        std::string path = end ? std::string(p, end - p) : std::string(p);
        int rc = vlgae_load_det_feats(
            path.c_str(), pad_boxes, feat_dim, sample, seed + (uint64_t)i,
            feats_out + i * pad_boxes * feat_dim,
            boxes_out + i * pad_boxes * 4, mask_out + i * pad_boxes);
        if (rc < 0) return rc;
        if (!end) break;
        p = end + 1;
    }
    return 0;
}

// Fast CoNLL pass: counts sentences and tokens so Python can preallocate;
// returns number of sentences, fills total_tokens.
int64_t vlgae_conll_count(const char* text, int64_t len,
                          int64_t* total_tokens) {
    int64_t sents = 0, toks = 0;
    bool in_sent = false, line_has_content = false;
    for (int64_t i = 0; i < len; ++i) {
        char c = text[i];
        if (c == '\n') {
            if (line_has_content) {
                ++toks;
                in_sent = true;
            } else if (in_sent) {
                ++sents;
                in_sent = false;
            }
            line_has_content = false;
        } else if (c != '\r' && c != ' ' && c != '\t') {
            line_has_content = true;
        }
    }
    if (line_has_content) { ++toks; in_sent = true; }
    if (in_sent) ++sents;
    *total_tokens = toks;
    return sents;
}

}  // extern "C"
