// Standalone stress driver for the sampling/slicing service, meant for
// sanitizer builds (no CPython in the process, so TSAN/ASAN reports are
// all ours):
//
//   make tsan-stress && ./stress_tsan
//   make asan-stress && ./stress_asan
//
// Exercises the full concurrent surface: multi-worker sampling+slicing
// with cache routing (compact maps), emit-range sharding, reservoir
// draws (fanout > 64 in the wide config), ordered delivery under
// out-of-order completion, and clean shutdown with work in flight.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
void* occ_create(int64_t num_nodes, const int64_t* indptr,
                 const int64_t* indices, const int32_t* wmap, int32_t P,
                 int32_t L, const int32_t* fanouts, const int64_t* frame_caps,
                 const int64_t* edge_caps, const int64_t* dst_caps,
                 const int64_t* out_caps, const int64_t* shuffle_caps,
                 const int64_t* deg_caps, const int32_t* owner_local,
                 const int64_t* foreign_off, const int64_t* foreign_nodes,
                 const int32_t* foreign_local, int64_t tail_start,
                 int64_t refresh_cap, int32_t num_workers,
                 int32_t queue_depth, uint64_t seed, int32_t sample_replace,
                 int32_t emit_lo, int32_t emit_hi);
void occ_submit(void* handle, const int64_t* nodes, int64_t n, int64_t seq);
int32_t occ_next(void* handle, void** field_ptrs, int64_t* seq_out);
void occ_stats(void* handle, double* out3);
void occ_destroy(void* handle);
}

int main(int argc, char** argv) {
  const int64_t N = 8000;
  const int P = 4;
  const int L = 2;
  const int64_t deg = 8;
  const int batches = 10;
  const int64_t bs = 128;
  const int workers = 3;
  std::mt19937_64 rng(7);

  std::vector<int64_t> indptr(N + 1);
  for (int64_t i = 0; i <= N; i++) indptr[i] = i * deg;
  std::vector<int64_t> indices(N * deg);
  for (auto& v : indices) v = (int64_t)(rng() % N);
  std::vector<int32_t> wmap(N);
  for (int64_t i = 0; i < N; i++) wmap[i] = (int32_t)(i % P);

  int32_t fanouts[2] = {4, 70};  // 70 > 64 exercises reservoir sampling
  // generous caps (worst-case-ish)
  int64_t frame_caps[3] = {60000, 1024, 256};
  int64_t edge_caps[2] = {60000, 1280};
  int64_t dst_caps[2] = {2048, 384};
  int64_t out_caps[2] = {1024, 256};
  int64_t shuffle_caps[2] = {1024, 256};
  int64_t deg_caps[2] = {71, 5};

  // compact cache maps: 10% of each partition's nodes statically cached
  std::vector<int32_t> owner_local(N, -1);
  std::vector<int64_t> cnt(P, 0);
  for (int64_t i = 0; i < N; i++)
    if ((i / P) % 10 == 0) owner_local[i] = (int32_t)cnt[wmap[i]]++;
  int64_t foreign_off[P + 1] = {0, 0, 0, 0, 0};
  int64_t tail_start = 2400;
  int64_t refresh_cap = 50000;
  frame_caps[0] = tail_start + refresh_cap + 1;

  // two emit configs: full emission and a 2-host-style shard
  for (int cfg = 0; cfg < 2; cfg++) {
    int emit_lo = cfg == 0 ? 0 : 2;
    int emit_hi = cfg == 0 ? P : 4;
    int PE = emit_hi - emit_lo;
    void* svc = occ_create(
        N, indptr.data(), indices.data(), wmap.data(), P, L, fanouts,
        frame_caps, edge_caps, dst_caps, out_caps, shuffle_caps, deg_caps,
        owner_local.data(), foreign_off, nullptr, nullptr, tail_start,
        refresh_cap, workers, 4, 42, /*replace=*/0, emit_lo, emit_hi);

    // receive buffers
    std::vector<std::vector<int32_t>> bufs;
    std::vector<void*> ptrs;
    auto add = [&](size_t words) {
      bufs.emplace_back(words);
      ptrs.push_back(bufs.back().data());
    };
    for (int l = 0; l < L; l++) {
      add((size_t)PE * edge_caps[l]);                 // edge_src
      add((size_t)PE * edge_caps[l]);                 // edge_dst
      add((size_t)PE * P * shuffle_caps[l]);          // push
      add((size_t)PE * P * shuffle_caps[l]);          // recv
      add((size_t)PE * out_caps[l]);                  // owned_idx
      add((size_t)PE * out_caps[l]);                  // owned_deg (f32)
      add((size_t)PE * out_caps[l]);                  // self_idx
      add(((size_t)PE * out_caps[l] + 3) / 4);        // owned_mask u8
      add((size_t)PE);                                // num_owned
      if (deg_caps[l] > 0) add((size_t)PE * deg_caps[l] * dst_caps[l]);
    }
    add((size_t)PE * frame_caps[0]);                  // input_nodes
    add((size_t)PE * out_caps[L - 1]);                // targets
    add((size_t)P * refresh_cap);                     // refresh (all-P)

    for (int b = 0; b < batches; b++) {
      std::vector<int64_t> nodes(bs);
      for (auto& v : nodes) v = (int64_t)(rng() % N);
      occ_submit(svc, nodes.data(), bs, b);
    }
    // NOTE: completion order is worker-dependent; seq tags let the caller
    // reorder (here we just check every error code).
    for (int b = 0; b < batches; b++) {
      int64_t seq = -1;
      int32_t err = occ_next(svc, ptrs.data(), &seq);
      if (err != 0) {
        std::fprintf(stderr, "batch seq %lld error %d\n",
                     (long long)seq, err);
        return 1;
      }
    }
    double st[3];
    occ_stats(svc, st);
    std::printf("cfg %d: %d batches ok, sample %.3fs slice %.3fs\n", cfg,
                batches, st[0], st[1]);
    // leave one batch in flight to exercise shutdown with queued work
    std::vector<int64_t> extra(bs, 1);
    occ_submit(svc, extra.data(), bs, batches);
    occ_destroy(svc);
  }
  std::puts("STRESS OK");
  return 0;
}
