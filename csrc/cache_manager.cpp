// Native KV-cache manager: page allocator + LRU sequence store.
//
// C++ rebuild of the reference's cache-of-KV-caches
// (src/turbomind/models/llama/LlamaCacheManager.cc): create/fetch/
// update/erase sequences, page-granular growth with LRU eviction of
// inactive sequences, evicted sequences keep token ids for cache-miss
// re-decode (LlamaBatch.cc:680-699), per-sequence RNG snapshot.
//
// On TPU the device pool is a jax array addressed by page tables; this
// manager owns the HOST-side bookkeeping only (page free list, session
// map, token histories) and is exposed to Python through a flat C ABI
// (ctypes — no pybind11 in this environment).
//
// Build: make -C csrc   (outputs ../lmdeploy_tpu/kvcache/libtpucache.so)

#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Sequence {
  int64_t id = 0;
  std::vector<int32_t> tokens;
  std::vector<int32_t> pages;
  int32_t cache_len = 0;
  uint32_t rng[2] = {0, 0};
  bool has_rng = false;
  bool active = false;
  uint64_t stamp = 0;  // logical LRU clock
};

class CacheManager {
 public:
  CacheManager(int32_t num_pages, int32_t page_size, int32_t max_entries)
      : page_size_(page_size), max_entries_(max_entries) {
    free_.reserve(num_pages);
    for (int32_t p = num_pages - 1; p >= 0; --p) free_.push_back(p);
  }

  int32_t free_pages() const {
    std::lock_guard<std::mutex> g(mu_);
    return static_cast<int32_t>(free_.size());
  }

  bool contains(int64_t id) const {
    std::lock_guard<std::mutex> g(mu_);
    return seqs_.count(id) != 0;
  }

  // (Re)create a session, dropping any prior state under this id.
  void create(int64_t id) {
    std::lock_guard<std::mutex> g(mu_);
    erase_locked(id);
    Sequence s;
    s.id = id;
    s.stamp = ++clock_;
    seqs_.emplace(id, std::move(s));
    trim_locked();
  }

  bool erase(int64_t id) {
    std::lock_guard<std::mutex> g(mu_);
    return erase_locked(id);
  }

  // Ensure pages cover total_tokens; LRU-evicts inactive sequences under
  // pressure. Returns the new page count, or -1 if unsatisfiable.
  int32_t grow(int64_t id, int32_t total_tokens) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return -1;
    Sequence& s = it->second;
    int32_t need = (total_tokens + page_size_ - 1) / page_size_;
    while (static_cast<int32_t>(s.pages.size()) < need) {
      if (free_.empty() && !evict_one_locked(id)) return -1;
      if (!free_.empty()) {
        s.pages.push_back(free_.back());
        free_.pop_back();
      }
    }
    return static_cast<int32_t>(s.pages.size());
  }

  int32_t get_pages(int64_t id, int32_t* out, int32_t cap) const {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return -1;
    const auto& p = it->second.pages;
    int32_t n = static_cast<int32_t>(p.size());
    if (out && cap >= n) std::memcpy(out, p.data(), n * sizeof(int32_t));
    return n;
  }

  void set_active(int64_t id, bool active) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return;
    it->second.active = active;
    it->second.stamp = ++clock_;
  }

  int32_t set_tokens(int64_t id, const int32_t* toks, int32_t n) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return -1;
    it->second.tokens.assign(toks, toks + n);
    return n;
  }

  int32_t append_token(int64_t id, int32_t tok) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return -1;
    it->second.tokens.push_back(tok);
    return static_cast<int32_t>(it->second.tokens.size());
  }

  int32_t get_tokens(int64_t id, int32_t* out, int32_t cap) const {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return -1;
    const auto& t = it->second.tokens;
    int32_t n = static_cast<int32_t>(t.size());
    if (out && cap >= n) std::memcpy(out, t.data(), n * sizeof(int32_t));
    return n;
  }

  int32_t truncate_tokens(int64_t id, int32_t n) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return -1;
    auto& s = it->second;
    if (n < static_cast<int32_t>(s.tokens.size())) s.tokens.resize(n);
    if (s.cache_len > n) s.cache_len = n;
    return static_cast<int32_t>(s.tokens.size());
  }

  int32_t cache_len(int64_t id) const {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    return it == seqs_.end() ? -1 : it->second.cache_len;
  }

  void set_cache_len(int64_t id, int32_t len) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it != seqs_.end()) it->second.cache_len = len;
  }

  void set_rng(int64_t id, uint32_t a, uint32_t b) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return;
    it->second.rng[0] = a;
    it->second.rng[1] = b;
    it->second.has_rng = true;
  }

  // returns 1 and fills out[2] if a snapshot exists, else 0
  int32_t get_rng(int64_t id, uint32_t* out) const {
    std::lock_guard<std::mutex> g(mu_);
    auto it = seqs_.find(id);
    if (it == seqs_.end() || !it->second.has_rng) return 0;
    out[0] = it->second.rng[0];
    out[1] = it->second.rng[1];
    return 1;
  }

 private:
  bool erase_locked(int64_t id) {
    auto it = seqs_.find(id);
    if (it == seqs_.end()) return false;
    for (int32_t p : it->second.pages) free_.push_back(p);
    seqs_.erase(it);
    return true;
  }

  // Free the pages of the least-recently-used inactive sequence
  // (reference: LlamaCacheManager::evict:162-183 — token ids survive).
  bool evict_one_locked(int64_t exclude) {
    Sequence* victim = nullptr;
    for (auto& [id, s] : seqs_) {
      if (s.active || s.pages.empty() || id == exclude) continue;
      if (!victim || s.stamp < victim->stamp) victim = &s;
    }
    if (!victim) return false;
    for (int32_t p : victim->pages) free_.push_back(p);
    victim->pages.clear();
    victim->cache_len = 0;
    return true;
  }

  // Bound the session count (cache_max_entry_count).
  void trim_locked() {
    if (max_entries_ <= 0) return;
    while (static_cast<int32_t>(seqs_.size()) > max_entries_) {
      Sequence* victim = nullptr;
      for (auto& [id, s] : seqs_) {
        if (s.active) continue;
        if (!victim || s.stamp < victim->stamp) victim = &s;
      }
      if (!victim) return;
      erase_locked(victim->id);
    }
  }

  mutable std::mutex mu_;
  std::unordered_map<int64_t, Sequence> seqs_;
  std::vector<int32_t> free_;
  int32_t page_size_;
  int32_t max_entries_;
  uint64_t clock_ = 0;
};

}  // namespace

extern "C" {

void* cm_create(int32_t num_pages, int32_t page_size, int32_t max_entries) {
  return new CacheManager(num_pages, page_size, max_entries);
}
void cm_destroy(void* h) { delete static_cast<CacheManager*>(h); }

#define CM static_cast<CacheManager*>(h)
int32_t cm_free_pages(void* h) { return CM->free_pages(); }
int32_t cm_contains(void* h, int64_t id) { return CM->contains(id); }
void cm_create_seq(void* h, int64_t id) { CM->create(id); }
int32_t cm_erase(void* h, int64_t id) { return CM->erase(id); }
int32_t cm_grow(void* h, int64_t id, int32_t total_tokens) {
  return CM->grow(id, total_tokens);
}
int32_t cm_get_pages(void* h, int64_t id, int32_t* out, int32_t cap) {
  return CM->get_pages(id, out, cap);
}
void cm_set_active(void* h, int64_t id, int32_t active) {
  CM->set_active(id, active != 0);
}
int32_t cm_set_tokens(void* h, int64_t id, const int32_t* toks, int32_t n) {
  return CM->set_tokens(id, toks, n);
}
int32_t cm_append_token(void* h, int64_t id, int32_t tok) {
  return CM->append_token(id, tok);
}
int32_t cm_get_tokens(void* h, int64_t id, int32_t* out, int32_t cap) {
  return CM->get_tokens(id, out, cap);
}
int32_t cm_truncate_tokens(void* h, int64_t id, int32_t n) {
  return CM->truncate_tokens(id, n);
}
int32_t cm_cache_len(void* h, int64_t id) { return CM->cache_len(id); }
void cm_set_cache_len(void* h, int64_t id, int32_t len) {
  CM->set_cache_len(id, len);
}
void cm_set_rng(void* h, int64_t id, uint32_t a, uint32_t b) {
  CM->set_rng(id, a, b);
}
int32_t cm_get_rng(void* h, int64_t id, uint32_t* out) {
  return CM->get_rng(id, out);
}
#undef CM

}  // extern "C"
