// Native graph builder for ldpc_tpu.
//
// Host-side construction of Tanner-graph edge layouts: base-matrix parsing
// and the O(sum d^2) neighbor-table build that backs the flat (reference-
// compatible) edge layout.  The Python/numpy implementation in
// ldpc_tpu/codes/edge_layout.py is the semantic reference; this library is
// the production path for large lifted graphs (E ~ 10^5 edges at Z = 384,
// where the Python loop costs seconds per code and this costs milliseconds).
//
// C ABI only (consumed via ctypes, ldpc_tpu/runtime/native.py).  All output
// buffers are caller-allocated; functions return 0 on success, negative on
// error.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse a whitespace base-matrix text file (shift values, -1 = no edge).
// out: caller buffer of capacity max_cells int32.  On success *rows/*cols
// hold the matrix shape.  Returns 0, or -1 (io error), -2 (overflow),
// -3 (ragged rows).
int ldpc_parse_base_matrix(const char* path, int32_t* out, int64_t max_cells,
                           int32_t* rows, int32_t* cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  buf[size] = '\0';

  int64_t count = 0;
  int32_t ncols = -1, cur_cols = 0, nrows = 0;
  char* p = buf.data();
  char* line_end = nullptr;
  for (char* line = p; line && *line; line = line_end) {
    line_end = std::strchr(line, '\n');
    if (line_end) *line_end++ = '\0';
    cur_cols = 0;
    char* tok = line;
    while (*tok) {
      while (*tok == ' ' || *tok == '\t' || *tok == '\r') ++tok;
      if (!*tok) break;
      char* end = nullptr;
      double v = std::strtod(tok, &end);
      if (end == tok) return -3;
      // Non-finite or out-of-int32-range tokens ('nan', '1e20') would be UB
      // under a raw cast; reject them like the Python parser's ValueError.
      if (!std::isfinite(v) || v < -2147483648.0 || v > 2147483647.0) return -3;
      if (count >= max_cells) return -2;
      out[count++] = static_cast<int32_t>(v);
      ++cur_cols;
      tok = end;
    }
    if (cur_cols > 0) {
      if (ncols < 0) ncols = cur_cols;
      else if (cur_cols != ncols) return -3;
      ++nrows;
    }
  }
  *rows = nrows;
  *cols = ncols;
  return 0;
}

// Enumerate edges of a dense binary H (row-major int8, m x n) in the
// reference order — nonzeros of H^T row-major, i.e. sorted by (var, check).
// Two sequential row-major passes + a counting sort by variable (rows are
// visited in order, so within each variable the checks come out sorted);
// a naive column-major scan is ~50x slower at lifted scale from the
// stride-n access pattern alone.
// edge_var/edge_check: capacity max_edges.  Returns edge count or -2.
int64_t ldpc_enumerate_edges(const int8_t* H, int32_t m, int32_t n,
                             int32_t* edge_var, int32_t* edge_check,
                             int64_t max_edges) {
  std::vector<int64_t> col_count(n + 1, 0);
  for (int32_t c = 0; c < m; ++c) {
    const int8_t* row = H + static_cast<int64_t>(c) * n;
    for (int32_t v = 0; v < n; ++v) {
      if (row[v]) ++col_count[v + 1];
    }
  }
  for (int32_t v = 0; v < n; ++v) col_count[v + 1] += col_count[v];
  const int64_t e = col_count[n];
  if (e > max_edges) return -2;
  std::vector<int64_t> fill(col_count.begin(), col_count.end() - 1);
  for (int32_t c = 0; c < m; ++c) {
    const int8_t* row = H + static_cast<int64_t>(c) * n;
    for (int32_t v = 0; v < n; ++v) {
      if (row[v]) {
        const int64_t slot = fill[v]++;
        edge_var[slot] = v;
        edge_check[slot] = c;
      }
    }
  }
  return e;
}

// For each edge, the ids of all *other* edges in the same group, padded
// with -1 to `width` columns (the reference's check/var index tensors,
// utils/ldpc_utils.py:5-60).  width must be >= max group size - 1.
// Returns 0, or -2 if width is too small.
int ldpc_neighbor_tables(const int32_t* group_of_edge, int64_t E,
                         int32_t num_groups, int32_t width, int32_t* out) {
  std::vector<int32_t> counts(num_groups, 0);
  for (int64_t e = 0; e < E; ++e) counts[group_of_edge[e]]++;
  std::vector<int64_t> offsets(num_groups + 1, 0);
  for (int32_t g = 0; g < num_groups; ++g) offsets[g + 1] = offsets[g] + counts[g];
  std::vector<int32_t> members(E);
  std::vector<int64_t> fill(offsets.begin(), offsets.end() - 1);
  for (int64_t e = 0; e < E; ++e) members[fill[group_of_edge[e]]++] = static_cast<int32_t>(e);

  for (int64_t i = 0; i < E * width; ++i) out[i] = -1;
  for (int32_t g = 0; g < num_groups; ++g) {
    int64_t lo = offsets[g], hi = offsets[g + 1];
    int64_t d = hi - lo;
    if (d - 1 > width) return -2;
    for (int64_t i = lo; i < hi; ++i) {
      int32_t e = members[i];
      int32_t k = 0;
      for (int64_t j = lo; j < hi; ++j) {
        if (j == i) continue;
        out[static_cast<int64_t>(e) * width + k++] = members[j];
      }
    }
  }
  return 0;
}

// Max group size given an edge -> group map (to size neighbor tables).
int32_t ldpc_max_group_size(const int32_t* group_of_edge, int64_t E,
                            int32_t num_groups) {
  std::vector<int32_t> counts(num_groups, 0);
  int32_t best = 0;
  for (int64_t e = 0; e < E; ++e) {
    int32_t c = ++counts[group_of_edge[e]];
    if (c > best) best = c;
  }
  return best;
}

}  // extern "C"
