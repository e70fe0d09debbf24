// Native row codec + partition splitter — the data-loader hot path of the
// coordinator, C++ like the reference's streamed splitter
// (reference src/service/storage_service.cpp:100-150 and the row framing at
// :19-28: [u32 LE size][payload], stored rows include the header).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

extern "C" {

// Splits a chunk of framed rows across partition files.
//   data/size:    the chunk
//   frame_dir:    directory holding partition files named "0", "1", ...
//   state:        [current_partition, rows_stored_in_partition] (in/out)
//   max_rows:     per-partition row capacities, length `partitions`
// Returns rows consumed, or -1 on a truncated row, -2 on overrun, -3 on IO
// error.
int64_t hm_split_rows(const char* data, size_t size, const char* frame_dir,
                      int64_t* state, const int64_t* max_rows,
                      int64_t partitions) {
    int64_t current = state[0];
    int64_t stored = state[1];
    int64_t rows_read = 0;
    size_t off = 0;

    while (off < size) {
        if (current >= partitions) return -2;

        std::string path = std::string(frame_dir) + "/" +
                           std::to_string(current);
        FILE* f = std::fopen(path.c_str(), "ab");
        if (!f) return -3;

        const int64_t cap = max_rows[current];
        while (off < size) {
            if (off + 4 > size) { std::fclose(f); return -1; }
            uint32_t row_size;
            std::memcpy(&row_size, data + off, 4);
            const size_t total = 4 + static_cast<size_t>(row_size);
            if (off + total > size) { std::fclose(f); return -1; }
            if (std::fwrite(data + off, 1, total, f) != total) {
                std::fclose(f);
                return -3;
            }
            off += total;
            ++rows_read;
            ++stored;
            if (stored == cap) {
                ++current;
                stored = 0;
                break;
            }
        }
        std::fclose(f);
    }

    state[0] = current;
    state[1] = stored;
    return rows_read;
}

// Parses framed rows; writes payload offsets/sizes into out arrays
// (capacity max_rows). Returns row count, or -1 on truncation, -4 if more
// rows than capacity.
int64_t hm_parse_rows(const char* data, size_t size, int64_t* offsets,
                      int64_t* sizes, int64_t max_rows) {
    size_t off = 0;
    int64_t n = 0;
    while (off < size) {
        if (off + 4 > size) return -1;
        uint32_t row_size;
        std::memcpy(&row_size, data + off, 4);
        if (off + 4 + row_size > size) return -1;
        if (n >= max_rows) return -4;
        offsets[n] = static_cast<int64_t>(off + 4);
        sizes[n] = static_cast<int64_t>(row_size);
        off += 4 + row_size;
        ++n;
    }
    return n;
}

}  // extern "C"
