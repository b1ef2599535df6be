// Native CSV fast path for the ETL layer.
//
// The reference loads every table with pandas read_csv (reference
// dataset.py:290-328); for multi-million-row interaction files the parse
// dominates dataset preparation. Two-pass scan: pass 1 counts rows
// (memchr), pass 2 tokenizes the memory-resident file — float columns via
// std::from_chars, token columns interned with string_view keys pointing
// INTO the file buffer (zero per-token allocation; the profiled v1 spent
// ~20 s of a 23 s 10M-row parse constructing std::string keys and in
// strtod). Unique strings are emitted once through a (ptr, len) callback.
// No quoting support: the Python wrapper falls back to pandas when it
// sniffs quote characters or multi-char separators.
//
// C ABI for ctypes (no pybind11 in this environment).

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string_view>
#include <unordered_map>
#include <vector>

extern "C" {

typedef void (*emit_unique_fn)(int32_t col, const char* s, int64_t len,
                               int64_t id);

// Count data rows (newline-terminated, last line counted even without \n).
int64_t csv_count_rows(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    std::vector<char> buf(1 << 22);
    int64_t rows = 0;
    size_t got;
    char last = '\n';
    while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
        const char* p = buf.data();
        const char* end = p + got;
        while ((p = (const char*)memchr(p, '\n', end - p)) != nullptr) {
            rows++;
            p++;
        }
        last = buf[got - 1];
    }
    fclose(f);
    if (last != '\n') rows++;  // unterminated final line
    return rows;
}

// Parse the file. Returns number of data rows written, or a negative error:
//   -1 io error, -2 column-count mismatch, -3 capacity exceeded.
//   is_float[c]: 1 -> float_out[c] (double*), else token_out[c] (int32*)
//   Empty fields: NaN for float, code -1 for token.
int64_t csv_parse(const char* path, char sep, int32_t skip_rows,
                  int64_t ncols, const uint8_t* is_float,
                  double** float_out, int32_t** token_out,
                  int64_t cap, emit_unique_fn emit) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    // read whole file (host ETL is offline; simplest and fastest)
    fseek(f, 0, SEEK_END);
    int64_t size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> data(size + 1);
    if (size > 0 && fread(data.data(), 1, size, f) != (size_t)size) {
        fclose(f);
        return -1;
    }
    fclose(f);
    data[size] = '\0';

    // string_view keys reference `data`, which outlives the parse
    std::vector<std::unordered_map<std::string_view, int32_t>> interner(ncols);
    for (auto& m : interner) m.reserve(1 << 12);
    int64_t row = 0;
    int64_t pos = 0;
    int32_t skipped = 0;
    while (pos < size) {
        // line [pos, eol)
        const char* nl = (const char*)memchr(data.data() + pos, '\n', size - pos);
        int64_t eol = nl ? (nl - data.data()) : size;
        int64_t end = eol;
        if (end > pos && data[end - 1] == '\r') end--;
        if (skipped < skip_rows) {
            skipped++;
            pos = eol + 1;
            continue;
        }
        if (end == pos && eol >= size) break;  // trailing blank line
        if (row >= cap) return -3;
        int64_t field_start = pos;
        int64_t col = 0;
        for (int64_t i = pos; i <= end; ++i) {
            if (i == end || data[i] == sep) {
                if (col >= ncols) return -2;
                int64_t len = i - field_start;
                if (is_float[col]) {
                    if (len == 0) {
                        float_out[col][row] = NAN;
                    } else {
                        double v;
                        auto [p, ec] = std::from_chars(
                            &data[field_start], &data[i], v);
                        if (ec != std::errc()) {
                            // from_chars rejects leading '+' / whitespace;
                            // strtod is the permissive fallback
                            char saved = data[i];
                            data[i] = '\0';
                            v = strtod(&data[field_start], nullptr);
                            data[i] = saved;
                        }
                        float_out[col][row] = v;
                    }
                } else {
                    if (len == 0) {
                        token_out[col][row] = -1;
                    } else {
                        std::string_view key(&data[field_start], (size_t)len);
                        auto it = interner[col].find(key);
                        int32_t code;
                        if (it == interner[col].end()) {
                            code = (int32_t)interner[col].size();
                            interner[col].emplace(key, code);
                            emit((int32_t)col, key.data(), len, code);
                        } else {
                            code = it->second;
                        }
                        token_out[col][row] = code;
                    }
                }
                col++;
                field_start = i + 1;
            }
        }
        if (col != ncols) return -2;
        row++;
        pos = eol + 1;
    }
    return row;
}

}  // extern "C"
