// muse_io: native data-loader core — multithreaded tar-shard reader.
//
// The reference delegates its IO hot path to webdataset's Python tarfile
// readers + DataLoader worker processes (training/data.py) and a threaded
// Python uploader (scripts/pre_encode.py:82-242).  On TPU-VM hosts the input
// pipeline must keep dozens of cores busy without the GIL: this library
// parses tar streams, groups members into samples by key, and fans out over
// N worker threads into a bounded queue, exposed to Python via ctypes
// (open_muse_tpu/training/native_io.py).
//
// Wire format returned by mio_pool_next (single malloc'd blob, freed with
// mio_free):
//   u32 n_members
//   repeated: u32 name_len | name bytes | u64 data_len | data bytes
//
// Build: make -C native   (g++ -O2 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Member {
  std::string name;
  std::vector<uint8_t> data;
};

struct Sample {
  std::string key;
  std::vector<Member> members;
};

// ---- tar stream parsing ----------------------------------------------------

struct TarReader {
  FILE* f = nullptr;
  bool is_pipe = false;

  bool open(const std::string& url) {
    if (url.rfind("pipe:", 0) == 0) {
      f = popen(url.c_str() + 5, "r");
      is_pipe = true;
    } else {
      f = fopen(url.c_str(), "rb");
    }
    return f != nullptr;
  }

  void close() {
    if (!f) return;
    if (is_pipe) pclose(f); else fclose(f);
    f = nullptr;
  }

  ~TarReader() { close(); }

  static int64_t parse_octal(const char* p, size_t n) {
    int64_t v = 0;
    for (size_t i = 0; i < n && p[i]; i++) {
      if (p[i] >= '0' && p[i] <= '7') v = v * 8 + (p[i] - '0');
    }
    return v;
  }

  bool read_exact(void* dst, size_t n) {
    return fread(dst, 1, n, f) == n;
  }

  bool skip(int64_t n) {
    if (!is_pipe) return fseek(f, (long)n, SEEK_CUR) == 0;
    char buf[8192];
    while (n > 0) {
      size_t chunk = n > (int64_t)sizeof(buf) ? sizeof(buf) : (size_t)n;
      if (fread(buf, 1, chunk, f) != chunk) return false;
      n -= (int64_t)chunk;
    }
    return true;
  }

  // Returns: 1 = member read, 0 = end of archive, -1 = corrupt.
  int next(Member* out) {
    char hdr[512];
    std::string longname;
    for (;;) {
      if (!read_exact(hdr, 512)) return 0;
      bool all_zero = true;
      for (int i = 0; i < 512; i++) if (hdr[i]) { all_zero = false; break; }
      if (all_zero) return 0;

      if (memcmp(hdr + 257, "ustar", 5) != 0 && hdr[257] != 0) return -1;

      int64_t size = parse_octal(hdr + 124, 12);
      char typeflag = hdr[156];
      int64_t padded = (size + 511) & ~511LL;

      if (typeflag == 'L') {  // GNU long name
        std::vector<char> buf(padded);
        if (!read_exact(buf.data(), padded)) return -1;
        longname.assign(buf.data(), strnlen(buf.data(), size));
        continue;
      }
      std::string name;
      if (!longname.empty()) {
        name = longname;
      } else {
        char prefix[156] = {0}, base[101] = {0};
        memcpy(base, hdr, 100);
        memcpy(prefix, hdr + 345, 155);
        name = prefix[0] ? std::string(prefix) + "/" + base : std::string(base);
      }
      if (typeflag != '0' && typeflag != 0) {  // not a regular file
        if (!skip(padded)) return -1;
        continue;
      }
      out->name = std::move(name);
      out->data.resize(size);
      if (size > 0 && !read_exact(out->data.data(), (size_t)size)) return -1;
      if (!skip(padded - size)) return -1;
      return 1;
    }
  }
};

// ---- sample grouping --------------------------------------------------------

static std::string sample_key(const std::string& name) {
  std::string n = name;
  if (n.rfind("./", 0) == 0) n = n.substr(2);
  size_t dot = n.find('.');
  return dot == std::string::npos ? n : n.substr(0, dot);
}

// ---- thread pool ------------------------------------------------------------

struct Pool {
  std::vector<std::string> shards;
  size_t next_shard = 0;
  std::mutex shard_mu;

  std::deque<Sample*> queue;
  size_t max_queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  int active_workers = 0;
  std::atomic<bool> stopping{false};
  std::vector<std::thread> threads;

  bool pop_shard(std::string* out) {
    std::lock_guard<std::mutex> lk(shard_mu);
    if (next_shard >= shards.size()) return false;
    *out = shards[next_shard++];
    return true;
  }

  void push_sample(Sample* s) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] { return queue.size() < max_queue || stopping; });
    if (stopping) { delete s; return; }
    queue.push_back(s);
    cv_pop.notify_one();
  }

  void worker() {
    std::string url;
    while (!stopping && pop_shard(&url)) {
      TarReader reader;
      if (!reader.open(url)) continue;
      Sample* current = nullptr;
      Member m;
      int rc = 0;
      while (!stopping && (rc = reader.next(&m)) == 1) {
        std::string key = sample_key(m.name);
        if (!current || current->key != key) {
          if (current) push_sample(current);
          current = new Sample();
          current->key = key;
        }
        current->members.push_back(std::move(m));
      }
      if (current) {
        if (rc >= 0) push_sample(current); else delete current;
      }
      // rc == -1: corrupt shard — skip remainder (non-throwing semantics,
      // reference training/data.py:60-93)
    }
    std::lock_guard<std::mutex> lk(mu);
    active_workers--;
    cv_pop.notify_all();
  }

  // Blocks; returns nullptr when the pool is drained.
  Sample* next() {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [&] { return !queue.empty() || active_workers == 0; });
    if (queue.empty()) return nullptr;
    Sample* s = queue.front();
    queue.pop_front();
    cv_push.notify_one();
    return s;
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_push.notify_all();
    cv_pop.notify_all();
    for (auto& t : threads) if (t.joinable()) t.join();
    std::lock_guard<std::mutex> lk(mu);
    for (auto* s : queue) delete s;
    queue.clear();
  }
};

static uint8_t* serialize(const Sample& s, int64_t* out_size) {
  size_t total = 4;
  for (const auto& m : s.members) total += 4 + m.name.size() + 8 + m.data.size();
  uint8_t* buf = (uint8_t*)malloc(total);
  if (!buf) return nullptr;
  uint8_t* p = buf;
  uint32_t n = (uint32_t)s.members.size();
  memcpy(p, &n, 4); p += 4;
  for (const auto& m : s.members) {
    uint32_t nl = (uint32_t)m.name.size();
    memcpy(p, &nl, 4); p += 4;
    memcpy(p, m.name.data(), nl); p += nl;
    uint64_t dl = (uint64_t)m.data.size();
    memcpy(p, &dl, 8); p += 8;
    if (dl) memcpy(p, m.data.data(), dl);
    p += dl;
  }
  *out_size = (int64_t)total;
  return buf;
}

}  // namespace

extern "C" {

void* mio_pool_create(const char** shard_urls, int n_shards, int num_threads,
                      int queue_depth) {
  Pool* pool = new Pool();
  for (int i = 0; i < n_shards; i++) pool->shards.emplace_back(shard_urls[i]);
  pool->max_queue = queue_depth > 0 ? (size_t)queue_depth : 64;
  // snapshot the count: workers decrement active_workers as they finish, so
  // the spawn loop must not read it as its bound
  const int n_threads = num_threads > 0 ? num_threads : 1;
  pool->active_workers = n_threads;
  for (int i = 0; i < n_threads; i++)
    pool->threads.emplace_back([pool] { pool->worker(); });
  return pool;
}

// Returns a serialized sample blob (see header comment) or nullptr when
// drained.  Caller frees with mio_free.
uint8_t* mio_pool_next(void* handle, int64_t* out_size) {
  Pool* pool = (Pool*)handle;
  Sample* s = pool->next();
  if (!s) return nullptr;
  uint8_t* buf = serialize(*s, out_size);
  delete s;
  return buf;
}

void mio_pool_destroy(void* handle) {
  Pool* pool = (Pool*)handle;
  pool->stop();
  delete pool;
}

void mio_free(uint8_t* ptr) { free(ptr); }

}  // extern "C"
