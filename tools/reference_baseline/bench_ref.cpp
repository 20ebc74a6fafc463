// Reference-engine baseline: builds the UNMODIFIED flatnav headers from
// /root/reference and measures single-core QPS at a target recall@K on a
// caller-provided workload. Output: one JSON line compatible with
// baseline_ref.json.
//
// This is a baseline-MEASUREMENT harness (it measures the thing bench.py
// compares against); it intentionally #includes the reference headers and
// is not part of the flatnav_tpu package.
//
// Usage:
//   bench_ref data queries gt.i32 N NQ DIM TARGET [M] [EFC] [K] [DTYPE]
// where data/queries are raw little-endian row-major [N,DIM]/[NQ,DIM] of
// DTYPE ("float32" default, or "uint8" for the BigANN-class workloads)
// and gt.i32 is raw int32 [NQ,K] exact neighbors — the SAME arrays the
// bench scripts build/query with, so the comparison is apples-to-apples
// on identical data.
//
// Build: see build_baseline.sh. The reference's own benchmark protocol
// (experiments/Makefile) uses 1 search thread; this machine has 1 core, so
// the build is also single-threaded (build time reported for context).

#include <flatnav/index/Index.h>
#include <flatnav/distances/SquaredL2Distance.h>
#include <flatnav/distances/InnerProductDistance.h>

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <set>
#include <string>
#include <vector>

using flatnav::Index;
using flatnav::distances::SquaredL2Distance;
using flatnav::distances::InnerProductDistance;

static std::vector<char> read_file(const char* path, size_t expect) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
  std::vector<char> buf(expect);
  size_t got = fread(buf.data(), 1, expect, f);
  fclose(f);
  if (got != expect) {
    fprintf(stderr, "%s: expected %zu bytes, got %zu\n", path, expect, got);
    exit(2);
  }
  return buf;
}

template <typename DistT, typename ctype>
static int run(char** argv, int N, int NQ, int DIM, double TARGET, int M,
               int EFC, int K) {
  auto data_buf = read_file(argv[1], (size_t)N * DIM * sizeof(ctype));
  auto query_buf = read_file(argv[2], (size_t)NQ * DIM * sizeof(ctype));
  auto gt_buf = read_file(argv[3], (size_t)NQ * K * 4);
  const ctype* data = reinterpret_cast<const ctype*>(data_buf.data());
  const ctype* queries = reinterpret_cast<const ctype*>(query_buf.data());
  const int* gt = reinterpret_cast<const int*>(gt_buf.data());

  auto distance = DistT::create(DIM);
  auto index = new Index<DistT, int>(std::move(distance), N, M);
  index->setNumThreads(1);

  std::vector<int> labels(N);
  for (int i = 0; i < N; i++) labels[i] = i;
  auto t0 = std::chrono::steady_clock::now();
  index->template addBatch<ctype>(const_cast<ctype*>(data), labels, EFC);
  double build_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  fprintf(stderr, "build done in %.1fs\n", build_s);

  int chosen_ef = 3072;
  double recall = 0, qps = 0;
  for (int ef : {32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536,
                 2048, 3072}) {
    size_t hits = 0;
    auto ts = std::chrono::steady_clock::now();
    for (int q = 0; q < NQ; q++) {
      auto res = index->search(&queries[(size_t)q * DIM], K, ef);
      std::set<int> found;
      for (auto& [d, l] : res) found.insert(l);
      for (int j = 0; j < K; j++) hits += found.count(gt[(size_t)q * K + j]);
    }
    double el =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - ts)
            .count();
    recall = (double)hits / ((double)NQ * K);
    qps = NQ / el;
    fprintf(stderr, "ef=%d recall=%.4f qps=%.0f\n", ef, recall, qps);
    if (recall >= TARGET) {
      chosen_ef = ef;
      break;
    }
  }
  // re-time at the operating point (steady state)
  double best = 1e30;
  for (int rep = 0; rep < 3; rep++) {
    auto ts = std::chrono::steady_clock::now();
    for (int q = 0; q < NQ; q++) {
      volatile auto res =
          index->search(&queries[(size_t)q * DIM], K, chosen_ef);
    }
    double el =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - ts)
            .count();
    best = std::min(best, el);
  }
  qps = NQ / best;

  printf(
      "{\"qps\": %.1f, \"recall\": %.4f, \"ef_search\": %d, "
      "\"build_seconds\": %.1f, \"n\": %d, \"dim\": %d, \"m\": %d, "
      "\"engine\": \"reference-cpp-avx512-1core\"}\n",
      qps, recall, chosen_ef, build_s, N, DIM, M);
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 8) {
    fprintf(stderr,
            "usage: %s data queries gt.i32 N NQ DIM TARGET "
            "[M=32] [EFC=100] [K=10] [DTYPE=float32|uint8] [METRIC=l2|ip]\n",
            argv[0]);
    return 2;
  }
  const int N = atoi(argv[4]);
  const int NQ = atoi(argv[5]);
  const int DIM = atoi(argv[6]);
  const double TARGET = atof(argv[7]);
  const int M = argc > 8 ? atoi(argv[8]) : 32;
  const int EFC = argc > 9 ? atoi(argv[9]) : 100;
  const int K = argc > 10 ? atoi(argv[10]) : 10;
  const std::string dtype = argc > 11 ? argv[11] : "float32";
  const std::string metric = argc > 12 ? argv[12] : "l2";

  if (dtype == "uint8") {
    if (metric == "ip")
      return run<InnerProductDistance<flatnav::util::DataType::uint8>,
                 uint8_t>(argv, N, NQ, DIM, TARGET, M, EFC, K);
    return run<SquaredL2Distance<flatnav::util::DataType::uint8>, uint8_t>(
        argv, N, NQ, DIM, TARGET, M, EFC, K);
  }
  if (metric == "ip")
    return run<InnerProductDistance<flatnav::util::DataType::float32>,
               float>(argv, N, NQ, DIM, TARGET, M, EFC, K);
  return run<SquaredL2Distance<flatnav::util::DataType::float32>, float>(
      argv, N, NQ, DIM, TARGET, M, EFC, K);
}
