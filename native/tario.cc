// tario: multi-threaded tar-shard sample streamer for the training data path.
//
// Native equivalent of the reference's webdataset pipeline backbone
// (training/data.py:64-100: tar expansion + nothrow sample grouping), built
// for TPU hosts where Python tarfile + GIL becomes the input bottleneck.
// N reader threads each stream whole tar shards, group members by key
// (basename without extension), and push complete samples into a bounded
// ring buffer; the consumer (Python via ctypes, mmada_tpu/data/native.py)
// pops samples without holding the GIL during IO.
//
// C ABI:
//   tario_open(paths, n, threads, capacity, loop)  -> handle
//   tario_next(handle, &sample)                    -> 1 sample / 0 end / -1 err
//   tario_free_sample(&sample)
//   tario_close(handle)
//
// Corrupt members/shards are skipped with a counter (nothrow semantics).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Entry {
  std::string ext;
  std::vector<uint8_t> data;
};

struct Sample {
  std::string key;
  std::vector<Entry> entries;
};

// ---------------------------------------------------------------- tar parse

constexpr size_t kBlock = 512;

uint64_t ParseOctal(const char* p, size_t n) {
  uint64_t v = 0;
  for (size_t i = 0; i < n && p[i]; ++i) {
    if (p[i] < '0' || p[i] > '7') continue;
    v = v * 8 + static_cast<uint64_t>(p[i] - '0');
  }
  return v;
}

struct TarHeader {
  char name[100];
  char mode[8];
  char uid[8];
  char gid[8];
  char size[12];
  char mtime[12];
  char chksum[8];
  char typeflag;
  char linkname[100];
  char magic[6];
  char version[2];
  char uname[32];
  char gname[32];
  char devmajor[8];
  char devminor[8];
  char prefix[155];
  char pad[12];
};
static_assert(sizeof(TarHeader) == kBlock, "tar header must be 512 bytes");

bool IsZeroBlock(const char* p) {
  for (size_t i = 0; i < kBlock; ++i)
    if (p[i]) return false;
  return true;
}

// ------------------------------------------------------------------ queue

class BoundedQueue {
 public:
  explicit BoundedQueue(size_t capacity) : capacity_(capacity) {}

  void Push(Sample&& s) {
    std::unique_lock<std::mutex> lk(mu_);
    not_full_.wait(lk, [&] { return q_.size() < capacity_ || closed_; });
    if (closed_) return;
    q_.push_back(std::move(s));
    not_empty_.notify_one();
  }

  bool Pop(Sample* out) {
    std::unique_lock<std::mutex> lk(mu_);
    not_empty_.wait(lk, [&] { return !q_.empty() || done_ || closed_; });
    if (!q_.empty()) {
      *out = std::move(q_.front());
      q_.pop_front();
      not_full_.notify_one();
      return true;
    }
    return false;  // done and drained
  }

  void MarkDone() {
    std::lock_guard<std::mutex> lk(mu_);
    done_ = true;
    not_empty_.notify_all();
  }

  void Close() {
    std::lock_guard<std::mutex> lk(mu_);
    closed_ = true;
    not_empty_.notify_all();
    not_full_.notify_all();
  }

 private:
  size_t capacity_;
  std::mutex mu_;
  std::condition_variable not_empty_, not_full_;
  std::deque<Sample> q_;
  bool done_ = false;
  bool closed_ = false;
};

// ----------------------------------------------------------------- reader

struct Context {
  std::vector<std::string> shards;
  std::atomic<size_t> next_shard{0};
  std::atomic<uint64_t> bad_members{0};
  std::atomic<uint64_t> bad_shards{0};
  std::atomic<uint64_t> samples_emitted{0};
  std::atomic<int> active_readers{0};
  std::atomic<bool> loop{false};
  std::atomic<bool> stopping{false};
  BoundedQueue* queue = nullptr;
  std::vector<std::thread> threads;
};

// members larger than this are treated as corrupt headers (a flipped size
// field in a damaged shard would otherwise trigger a multi-GB allocation)
constexpr uint64_t kMaxMemberBytes = 1ull << 29;  // 512 MB

void ReadShardImpl(Context* ctx, const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    ctx->bad_shards.fetch_add(1);
    return;
  }
  Sample current;
  bool sample_damaged = false;
  char header_buf[kBlock];
  std::string pending_longname;
  while (!ctx->stopping.load(std::memory_order_relaxed) &&
         std::fread(header_buf, 1, kBlock, f) == kBlock) {
    if (IsZeroBlock(header_buf)) break;
    const TarHeader* h = reinterpret_cast<const TarHeader*>(header_buf);
    uint64_t size = ParseOctal(h->size, sizeof(h->size));
    uint64_t padded = (size + kBlock - 1) / kBlock * kBlock;
    if (size > kMaxMemberBytes) {  // corrupt size field
      ctx->bad_members.fetch_add(1);
      ctx->bad_shards.fetch_add(1);
      sample_damaged = true;
      break;
    }

    std::string name;
    if (!pending_longname.empty()) {
      name = pending_longname;
      pending_longname.clear();
    } else {
      if (h->prefix[0]) {
        name.assign(h->prefix, strnlen(h->prefix, sizeof(h->prefix)));
        name += '/';
      }
      name.append(h->name, strnlen(h->name, sizeof(h->name)));
    }

    if (h->typeflag == 'L') {  // GNU longname
      std::vector<char> buf(padded);
      if (std::fread(buf.data(), 1, padded, f) != padded) break;
      pending_longname.assign(buf.data(), size);
      if (!pending_longname.empty() && pending_longname.back() == '\0')
        pending_longname.pop_back();
      continue;
    }
    if (h->typeflag != '0' && h->typeflag != '\0') {  // not a regular file
      if (std::fseek(f, static_cast<long>(padded), SEEK_CUR) != 0) break;
      continue;
    }

    // webdataset keying: FIRST dot of the basename
    // (`dir/000123.caption.txt` -> key `dir/000123`, ext `caption.txt`)
    auto slash = name.rfind('/');
    auto dot = name.find('.', slash == std::string::npos ? 0 : slash + 1);
    if (dot == std::string::npos) {
      ctx->bad_members.fetch_add(1);
      if (std::fseek(f, static_cast<long>(padded), SEEK_CUR) != 0) break;
      continue;
    }
    std::string key = name.substr(0, dot);
    std::string ext = name.substr(dot + 1);
    for (auto& c : ext) c = static_cast<char>(tolower(c));

    std::vector<uint8_t> data(padded);
    if (std::fread(data.data(), 1, padded, f) != padded) {
      // truncated shard: the in-flight sample is incomplete — discard it
      ctx->bad_members.fetch_add(1);
      sample_damaged = true;
      break;
    }
    data.resize(size);

    if (!current.key.empty() && key != current.key) {
      ctx->samples_emitted.fetch_add(1);
      ctx->queue->Push(std::move(current));
      current = Sample{};
    }
    current.key = key;
    current.entries.push_back(Entry{std::move(ext), std::move(data)});
  }
  if (!current.key.empty() && !sample_damaged) {
    ctx->samples_emitted.fetch_add(1);
    ctx->queue->Push(std::move(current));
  }
  std::fclose(f);
}

void ReadShard(Context* ctx, const std::string& path) {
  // nothrow contract: allocation or parse failures count as a bad shard
  // instead of escaping the reader thread (std::terminate)
  try {
    ReadShardImpl(ctx, path);
  } catch (const std::exception&) {
    ctx->bad_shards.fetch_add(1);
  }
}

void ReaderLoop(Context* ctx) {
  do {
    size_t idx;
    while (!ctx->stopping.load(std::memory_order_relaxed) &&
           (idx = ctx->next_shard.fetch_add(1)) < ctx->shards.size()) {
      ReadShard(ctx, ctx->shards[idx]);
    }
    if (ctx->loop.load()) {
      // one thread resets the shard cursor for the next epoch
      size_t expected = ctx->next_shard.load();
      if (expected >= ctx->shards.size()) {
        ctx->next_shard.compare_exchange_strong(expected, 0);
      }
    }
  } while (ctx->loop.load() && !ctx->stopping.load());
  if (ctx->active_readers.fetch_sub(1) == 1) {
    ctx->queue->MarkDone();
  }
}

}  // namespace

// -------------------------------------------------------------------- C ABI

extern "C" {

struct TarioEntryView {
  const char* ext;
  const uint8_t* data;
  uint64_t size;
};

struct TarioSampleView {
  const char* key;
  TarioEntryView* entries;
  uint64_t num_entries;
  void* owner;  // opaque Sample*
};

void* tario_open(const char** paths, int64_t n, int32_t threads,
                 int64_t capacity, int32_t loop) {
  if (n <= 0 || threads <= 0) return nullptr;
  auto* ctx = new Context();
  ctx->shards.assign(paths, paths + n);
  ctx->loop.store(loop != 0);
  ctx->queue = new BoundedQueue(static_cast<size_t>(capacity > 0 ? capacity : 256));
  ctx->active_readers.store(threads);
  for (int32_t i = 0; i < threads; ++i) {
    ctx->threads.emplace_back(ReaderLoop, ctx);
  }
  return ctx;
}

int32_t tario_next(void* handle, TarioSampleView* out) {
  auto* ctx = static_cast<Context*>(handle);
  if (!ctx || !out) return -1;
  auto* sample = new Sample();
  if (!ctx->queue->Pop(sample)) {
    delete sample;
    return 0;  // end of stream
  }
  auto* views = new TarioEntryView[sample->entries.size()];
  for (size_t i = 0; i < sample->entries.size(); ++i) {
    views[i].ext = sample->entries[i].ext.c_str();
    views[i].data = sample->entries[i].data.data();
    views[i].size = sample->entries[i].data.size();
  }
  out->key = sample->key.c_str();
  out->entries = views;
  out->num_entries = sample->entries.size();
  out->owner = sample;
  return 1;
}

void tario_free_sample(TarioSampleView* view) {
  if (!view || !view->owner) return;
  delete[] view->entries;
  delete static_cast<Sample*>(view->owner);
  view->owner = nullptr;
  view->entries = nullptr;
}

void tario_stats(void* handle, uint64_t* samples, uint64_t* bad_members,
                 uint64_t* bad_shards) {
  auto* ctx = static_cast<Context*>(handle);
  if (!ctx) return;
  if (samples) *samples = ctx->samples_emitted.load();
  if (bad_members) *bad_members = ctx->bad_members.load();
  if (bad_shards) *bad_shards = ctx->bad_shards.load();
}

void tario_close(void* handle) {
  auto* ctx = static_cast<Context*>(handle);
  if (!ctx) return;
  ctx->stopping.store(true);
  ctx->loop.store(false);
  ctx->queue->Close();
  for (auto& t : ctx->threads) t.join();
  delete ctx->queue;
  delete ctx;
}

}  // extern "C"
