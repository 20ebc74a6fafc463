// Reference-engine baseline: builds the UNMODIFIED flatnav headers from
// /root/reference and measures single-core QPS at recall@10 >= 0.95 on the
// same random-100K workload as bench.py. Output: one JSON line compatible
// with baseline_ref.json.
//
// Build: see build_baseline.sh. The reference's own benchmark protocol
// (experiments/Makefile) uses 1 search thread; this machine has 1 core, so
// the build is also single-threaded (build time reported for context, not
// comparison).

#include <flatnav/index/Index.h>
#include <flatnav/distances/SquaredL2Distance.h>

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <random>
#include <set>
#include <vector>

using flatnav::Index;
using flatnav::distances::SquaredL2Distance;

int main(int argc, char** argv) {
  const int N = argc > 1 ? atoi(argv[1]) : 100000;
  const int DIM = argc > 3 ? atoi(argv[3]) : 128;
  const int M = argc > 4 ? atoi(argv[4]) : 32;
  const int EFC = argc > 5 ? atoi(argv[5]) : 100;
  const int K = 10, NQ = 2000;
  const double TARGET = argc > 2 ? atof(argv[2]) : 0.85;

  std::mt19937 gen(0x5EED);
  std::normal_distribution<float> dist(0.f, 1.f);
  std::vector<float> data((size_t)N * DIM), queries((size_t)NQ * DIM);
  for (auto& x : data) x = dist(gen);
  for (auto& x : queries) x = dist(gen);

  auto distance = SquaredL2Distance<flatnav::util::DataType::float32>::create(DIM);
  auto index = new Index<SquaredL2Distance<flatnav::util::DataType::float32>, int>(
      std::move(distance), N, M);
  index->setNumThreads(1);

  std::vector<int> labels(N);
  for (int i = 0; i < N; i++) labels[i] = i;
  auto t0 = std::chrono::steady_clock::now();
  index->template addBatch<float>(data.data(), labels, EFC);
  double build_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();

  // exact ground truth (brute force, single core)
  std::vector<std::vector<int>> gt(NQ);
  for (int q = 0; q < NQ; q++) {
    std::vector<std::pair<float, int>> all(N);
    const float* qv = &queries[(size_t)q * DIM];
    for (int i = 0; i < N; i++) {
      const float* v = &data[(size_t)i * DIM];
      float d = 0;
      for (int j = 0; j < DIM; j++) {
        float t = qv[j] - v[j];
        d += t * t;
      }
      all[i] = {d, i};
    }
    std::partial_sort(all.begin(), all.begin() + K, all.end());
    for (int j = 0; j < K; j++) gt[q].push_back(all[j].second);
  }

  int chosen_ef = 512;
  double recall = 0, qps = 0;
  for (int ef : {32, 48, 64, 96, 128, 192, 256, 384, 512}) {
    size_t hits = 0;
    auto ts = std::chrono::steady_clock::now();
    for (int q = 0; q < NQ; q++) {
      auto res = index->search(&queries[(size_t)q * DIM], K, ef);
      std::set<int> found;
      for (auto& [d, l] : res) found.insert(l);
      for (int g_ : gt[q]) hits += found.count(g_);
    }
    double el = std::chrono::duration<double>(std::chrono::steady_clock::now() - ts).count();
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
      volatile auto res = index->search(&queries[(size_t)q * DIM], K, chosen_ef);
    }
    double el = std::chrono::duration<double>(std::chrono::steady_clock::now() - ts).count();
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
