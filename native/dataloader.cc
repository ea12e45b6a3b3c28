// DCTA native data loader: multi-threaded record-shard reader with a
// bounded prefetch queue.
//
// Role: the host-side input pipeline for datasets that do not fit in HBM
// (the reference delegates this to torch DataLoader worker processes,
// datasets.py:87-100). Design: fixed-size uint8 image records in simple
// binary shards; worker threads read+shuffle+batch; consumers pop fully
// assembled contiguous batches (zero Python-side per-sample work — the
// device does augmentation/normalization in-jit).
//
// Shard format (little endian):
//   magic  u32 = 0x44435441 ("DCTA")
//   count  u32, height u32, width u32, channels u32
//   count * { label i32, image u8[h*w*c] }
//
// C API (ctypes):
//   void* dcta_loader_create(const char** paths, int n_paths, int batch,
//                            int workers, int prefetch, uint64 seed,
//                            int drop_last, int loop);
//   void* dcta_loader_create_strided(..., int stride, int offset);
//        same, but serves only rows offset::stride of the global sample
//        index (disjoint per-process partitions from shared shard files);
//   int  dcta_loader_batch_spec(void*, int* h, int* w, int* c);
//   long dcta_loader_total(void*);
//   int  dcta_loader_next(void*, uint8_t* images, int32_t* labels);
//        returns number of valid samples in the batch, 0 on end-of-data.
//   void dcta_loader_destroy(void*);

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x44435441u;

struct Shard {
  std::string path;
  uint32_t count = 0;
  uint64_t data_offset = 0;
};

struct Batch {
  std::vector<uint8_t> images;
  std::vector<int32_t> labels;
  int n = 0;
};

class Loader {
 public:
  Loader(std::vector<std::string> paths, int batch, int workers, int prefetch,
         uint64_t seed, bool drop_last, bool loop, int stride = 1,
         int offset = 0)
      : batch_(batch), prefetch_(prefetch), drop_last_(drop_last), loop_(loop),
        rng_(seed) {
    for (auto& p : paths) {
      FILE* f = std::fopen(p.c_str(), "rb");
      if (!f) { ok_ = false; return; }
      uint32_t hdr[5];
      if (std::fread(hdr, 4, 5, f) != 5 || hdr[0] != kMagic) {
        std::fclose(f); ok_ = false; return;
      }
      if (h_ == 0) { h_ = hdr[2]; w_ = hdr[3]; c_ = hdr[4]; }
      if (hdr[2] != h_ || hdr[3] != w_ || hdr[4] != c_) { std::fclose(f); ok_ = false; return; }
      Shard s; s.path = p; s.count = hdr[1]; s.data_offset = 20;
      total_ += s.count;
      shards_.push_back(std::move(s));
      std::fclose(f);
    }
    rec_size_ = 4 + (uint64_t)h_ * w_ * c_;
    // global sample index space: (shard, idx)
    index_.reserve(total_);
    for (uint32_t si = 0; si < shards_.size(); ++si)
      for (uint32_t i = 0; i < shards_[si].count; ++i)
        index_.push_back(((uint64_t)si << 32) | i);
    // sample-level strided partition (DistributedSampler disjointness when
    // there are fewer shard files than processes): keep rows
    // offset::stride of the unshuffled global index, shuffle per epoch
    if (stride > 1) {
      std::vector<uint64_t> part;
      part.reserve(index_.size() / stride + 1);
      for (uint64_t i = offset; i < index_.size(); i += stride)
        part.push_back(index_[i]);
      index_.swap(part);
      total_ = index_.size();
    }
    start_epoch();
    for (int i = 0; i < workers; ++i)
      threads_.emplace_back([this] { worker(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    for (auto& t : threads_) t.join();
  }

  bool ok() const { return ok_; }
  uint32_t h() const { return h_; }
  uint32_t w() const { return w_; }
  uint32_t c() const { return c_; }
  uint64_t total() const { return total_; }

  int next(uint8_t* images, int32_t* labels) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] { return !queue_.empty() || done_ || stop_; });
    if (queue_.empty()) return 0;
    Batch b = std::move(queue_.front());
    queue_.pop_front();
    lk.unlock();
    cv_space_.notify_one();
    std::memcpy(images, b.images.data(), b.images.size());
    std::memcpy(labels, b.labels.data(), b.labels.size() * 4);
    return b.n;
  }

 private:
  void start_epoch() {
    std::shuffle(index_.begin(), index_.end(), rng_);
    cursor_ = 0;
  }

  // claims the next batch's worth of sample ids; empty when epoch exhausted
  std::vector<uint64_t> claim() {
    std::lock_guard<std::mutex> lk(cursor_mu_);
    std::vector<uint64_t> ids;
    if (cursor_ >= index_.size()) {
      if (!loop_) return ids;
      start_epoch();
    }
    uint64_t end = std::min<uint64_t>(cursor_ + batch_, index_.size());
    if (drop_last_ && end - cursor_ < (uint64_t)batch_ && !loop_) {
      cursor_ = end;
      return ids;
    }
    for (uint64_t i = cursor_; i < end; ++i) ids.push_back(index_[i]);
    cursor_ = end;
    return ids;
  }

  void worker() {
    uint64_t img_size = (uint64_t)h_ * w_ * c_;
    // per-thread shard file handles
    std::vector<FILE*> files(shards_.size(), nullptr);
    while (true) {
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stop_) break;
      }
      auto ids = claim();
      if (ids.empty()) {
        std::lock_guard<std::mutex> lk(mu_);
        if (++idle_workers_ >= (int)threads_.size()) done_ = true;
        cv_data_.notify_all();
        break;
      }
      Batch b;
      b.n = (int)ids.size();
      b.images.resize((uint64_t)batch_ * img_size, 0);
      b.labels.resize(batch_, 0);
      for (int j = 0; j < b.n; ++j) {
        uint32_t si = (uint32_t)(ids[j] >> 32);
        uint32_t ri = (uint32_t)ids[j];
        if (!files[si]) files[si] = std::fopen(shards_[si].path.c_str(), "rb");
        FILE* f = files[si];
        std::fseek(f, (long)(shards_[si].data_offset + (uint64_t)ri * rec_size_),
                   SEEK_SET);
        int32_t label;
        if (std::fread(&label, 4, 1, f) != 1) label = -1;
        b.labels[j] = label;
        if (std::fread(b.images.data() + (uint64_t)j * img_size, 1, img_size,
                       f) != img_size) { /* short read -> zeros */ }
      }
      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] { return (int)queue_.size() < prefetch_ || stop_; });
      if (stop_) { for (auto* f : files) if (f) std::fclose(f); return; }
      queue_.push_back(std::move(b));
      cv_data_.notify_one();
    }
    for (auto* f : files) if (f) std::fclose(f);
  }

  bool ok_ = true;
  int batch_, prefetch_;
  bool drop_last_, loop_;
  uint32_t h_ = 0, w_ = 0, c_ = 0;
  uint64_t total_ = 0, rec_size_ = 0;
  std::vector<Shard> shards_;
  std::vector<uint64_t> index_;
  uint64_t cursor_ = 0;
  std::mutex cursor_mu_;
  std::mt19937_64 rng_;

  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::deque<Batch> queue_;
  std::vector<std::thread> threads_;
  bool stop_ = false, done_ = false;
  int idle_workers_ = 0;
};

}  // namespace

extern "C" {

void* dcta_loader_create(const char** paths, int n_paths, int batch,
                         int workers, int prefetch, uint64_t seed,
                         int drop_last, int loop) {
  std::vector<std::string> ps(paths, paths + n_paths);
  auto* l = new Loader(std::move(ps), batch, workers, prefetch, seed,
                       drop_last != 0, loop != 0);
  if (!l->ok()) { delete l; return nullptr; }
  return l;
}

// strided variant: each caller sees rows offset::stride of the global
// sample index (disjoint across offsets; DistributedSampler role)
void* dcta_loader_create_strided(const char** paths, int n_paths, int batch,
                                 int workers, int prefetch, uint64_t seed,
                                 int drop_last, int loop, int stride,
                                 int offset) {
  std::vector<std::string> ps(paths, paths + n_paths);
  auto* l = new Loader(std::move(ps), batch, workers, prefetch, seed,
                       drop_last != 0, loop != 0, stride, offset);
  if (!l->ok()) { delete l; return nullptr; }
  return l;
}

int dcta_loader_batch_spec(void* p, int* h, int* w, int* c) {
  auto* l = static_cast<Loader*>(p);
  *h = (int)l->h(); *w = (int)l->w(); *c = (int)l->c();
  return 0;
}

long dcta_loader_total(void* p) {
  return (long)static_cast<Loader*>(p)->total();
}

int dcta_loader_next(void* p, uint8_t* images, int32_t* labels) {
  return static_cast<Loader*>(p)->next(images, labels);
}

void dcta_loader_destroy(void* p) { delete static_cast<Loader*>(p); }

}  // extern "C"
