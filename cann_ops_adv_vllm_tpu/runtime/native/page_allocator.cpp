// Native paged KV-cache allocator / block-table manager.
//
// The reference delegates KV paging to vLLM above the kernel library; in
// this framework the runtime is first-class.  This C++ core owns the
// performance-critical bookkeeping of continuous batching: a free-list of
// physical pages, per-sequence logical→physical block tables, reference
// counts for prefix sharing (copy-on-write fork), and O(1) append/free.
// Python drives it through a flat C ABI (ctypes) — no pybind11 required.
//
// Thread-safety: a single mutex guards the allocator; the engine calls are
// coarse-grained (per scheduler tick), so contention is negligible.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Sequence {
    std::vector<int32_t> block_table;  // logical slot -> physical page
    int64_t num_tokens = 0;
    int64_t trimmed_slots = 0;         // slots < this hold -1 (reclaimed)
};

class PageAllocator {
  public:
    PageAllocator(int32_t num_pages, int32_t page_size)
        : page_size_(page_size), ref_count_(num_pages, 0),
          is_free_(num_pages, 1), free_count_(num_pages) {
        free_list_.reserve(num_pages);
        for (int32_t p = num_pages - 1; p >= 0; --p) free_list_.push_back(p);
    }

    int32_t num_free() const {
        std::lock_guard<std::mutex> g(mu_);
        return free_count_;
    }

    // Create a sequence; returns seq id or -1 if it already exists.
    int64_t create(int64_t seq_id) {
        std::lock_guard<std::mutex> g(mu_);
        if (seqs_.count(seq_id)) return -1;
        seqs_.emplace(seq_id, Sequence{});
        return seq_id;
    }

    // Append n tokens, allocating pages as needed.
    // Returns the new token count, or -1 on out-of-pages (state unchanged).
    //
    // Allocation is RUN-PREFERRING: each new page first tries the
    // physical successor of the sequence's current last page, so a
    // sequence's block table stays physically contiguous whenever the
    // pool allows.  Physical contiguity is what turns runs of adjacent
    // selected pages into single multi-page DMA descriptors in the
    // decode kernel (ops.paged_attention._coalesce_runs) — the lever
    // against the k<C per-(head, page) descriptor floor.
    int64_t append_tokens(int64_t seq_id, int64_t n) {
        std::lock_guard<std::mutex> g(mu_);
        auto it = seqs_.find(seq_id);
        if (it == seqs_.end()) return -1;
        Sequence& s = it->second;
        int64_t target = s.num_tokens + n;
        int64_t pages_needed =
            (target + page_size_ - 1) / page_size_ -
            static_cast<int64_t>(s.block_table.size());
        if (pages_needed > free_count_) return -1;
        for (int64_t i = 0; i < pages_needed; ++i) {
            int32_t want = -1;
            if (!s.block_table.empty() && s.block_table.back() >= 0)
                want = s.block_table.back() + 1;
            s.block_table.push_back(take_page(want));
        }
        s.num_tokens = target;
        return target;
    }

    // Fork: child shares the parent's pages (copy-on-write prefix sharing;
    // writes to shared pages must go through ensure_writable()).
    int64_t fork(int64_t parent_id, int64_t child_id) {
        std::lock_guard<std::mutex> g(mu_);
        auto it = seqs_.find(parent_id);
        if (it == seqs_.end() || seqs_.count(child_id)) return -1;
        Sequence child = it->second;
        for (int32_t p : child.block_table) {
            if (p >= 0) ++ref_count_[p];
        }
        seqs_.emplace(child_id, std::move(child));
        return child_id;
    }

    // Make the last page exclusively owned (copy-on-write). Returns the
    // physical page to copy *into* (new page) and sets *src_page to the
    // shared source, or returns the existing page id when already
    // exclusive (then *src_page == result).  -1 on error/out-of-pages.
    int32_t ensure_writable_last(int64_t seq_id, int32_t* src_page) {
        std::lock_guard<std::mutex> g(mu_);
        auto it = seqs_.find(seq_id);
        if (it == seqs_.end() || it->second.block_table.empty()) return -1;
        int32_t last = it->second.block_table.back();
        *src_page = last;
        if (ref_count_[last] == 1) return last;
        if (free_count_ == 0) return -1;
        int32_t fresh = take_page(-1);
        --ref_count_[last];
        it->second.block_table.back() = fresh;
        return fresh;
    }

    // Sliding-window reclaim: release pages that lie wholly before
    // keep_from_token (the attention window's left edge).  Logical slot
    // indices of the remaining pages are unchanged — trimmed entries
    // become -1 placeholders that the decode kernel never reads (their
    // per-page (begin, end) token window is empty under kv_start, so the
    // DMA is skipped).  Returns pages freed, -1 on unknown sequence.
    int64_t trim_front(int64_t seq_id, int64_t keep_from_token) {
        std::lock_guard<std::mutex> g(mu_);
        auto it = seqs_.find(seq_id);
        if (it == seqs_.end()) return -1;
        Sequence& s = it->second;
        int64_t cut = keep_from_token / page_size_;
        if (cut > static_cast<int64_t>(s.block_table.size()))
            cut = static_cast<int64_t>(s.block_table.size());
        int64_t freed = 0;
        for (int64_t i = s.trimmed_slots; i < cut; ++i) {
            int32_t p = s.block_table[i];
            if (p >= 0 && --ref_count_[p] == 0) free_page(p);
            s.block_table[i] = -1;
            ++freed;
        }
        if (cut > s.trimmed_slots) s.trimmed_slots = cut;
        return freed;
    }

    int64_t free_seq(int64_t seq_id) {
        std::lock_guard<std::mutex> g(mu_);
        auto it = seqs_.find(seq_id);
        if (it == seqs_.end()) return -1;
        for (int32_t p : it->second.block_table) {
            if (p >= 0 && --ref_count_[p] == 0) free_page(p);
        }
        seqs_.erase(it);
        return 0;
    }

    int64_t num_tokens(int64_t seq_id) const {
        std::lock_guard<std::mutex> g(mu_);
        auto it = seqs_.find(seq_id);
        return it == seqs_.end() ? -1 : it->second.num_tokens;
    }

    // Copy the block table into out (capacity max_len), padding with
    // pad_value.  Returns number of valid entries, -1 if unknown seq.
    int64_t block_table(int64_t seq_id, int32_t* out, int64_t max_len,
                        int32_t pad_value) const {
        std::lock_guard<std::mutex> g(mu_);
        auto it = seqs_.find(seq_id);
        if (it == seqs_.end()) return -1;
        const auto& bt = it->second.block_table;
        int64_t n = std::min<int64_t>(bt.size(), max_len);
        std::memcpy(out, bt.data(), n * sizeof(int32_t));
        for (int64_t i = n; i < max_len; ++i) out[i] = pad_value;
        return n;
    }

  private:
    // Take a free page, preferring `want` (contiguity); -1 = any.
    // Caller must hold mu_ and have checked free_count_ > 0.
    int32_t take_page(int32_t want) {
        if (want >= 0 &&
            want < static_cast<int32_t>(is_free_.size()) &&
            is_free_[want]) {
            is_free_[want] = 0;       // stale free_list_ entry skipped later
            --free_count_;
            ref_count_[want] = 1;
            return want;
        }
        while (true) {               // lazy-deletion pop
            int32_t p = free_list_.back();
            free_list_.pop_back();
            if (is_free_[p]) {
                is_free_[p] = 0;
                --free_count_;
                ref_count_[p] = 1;
                return p;
            }
        }
    }

    void free_page(int32_t p) {
        free_list_.push_back(p);
        is_free_[p] = 1;
        ++free_count_;
    }

    const int32_t page_size_;
    mutable std::mutex mu_;
    std::vector<int32_t> free_list_;
    std::vector<int32_t> ref_count_;
    std::vector<char> is_free_;
    int32_t free_count_;
    std::unordered_map<int64_t, Sequence> seqs_;
};

}  // namespace

extern "C" {

void* pa_create(int32_t num_pages, int32_t page_size) {
    return new PageAllocator(num_pages, page_size);
}
void pa_destroy(void* pa) { delete static_cast<PageAllocator*>(pa); }
int32_t pa_num_free(void* pa) {
    return static_cast<PageAllocator*>(pa)->num_free();
}
int64_t pa_create_seq(void* pa, int64_t seq_id) {
    return static_cast<PageAllocator*>(pa)->create(seq_id);
}
int64_t pa_append_tokens(void* pa, int64_t seq_id, int64_t n) {
    return static_cast<PageAllocator*>(pa)->append_tokens(seq_id, n);
}
int64_t pa_fork(void* pa, int64_t parent, int64_t child) {
    return static_cast<PageAllocator*>(pa)->fork(parent, child);
}
int32_t pa_ensure_writable_last(void* pa, int64_t seq_id, int32_t* src) {
    return static_cast<PageAllocator*>(pa)->ensure_writable_last(seq_id, src);
}
int64_t pa_trim_front(void* pa, int64_t seq_id, int64_t keep_from_token) {
    return static_cast<PageAllocator*>(pa)->trim_front(seq_id,
                                                       keep_from_token);
}
int64_t pa_free_seq(void* pa, int64_t seq_id) {
    return static_cast<PageAllocator*>(pa)->free_seq(seq_id);
}
int64_t pa_num_tokens(void* pa, int64_t seq_id) {
    return static_cast<PageAllocator*>(pa)->num_tokens(seq_id);
}
int64_t pa_block_table(void* pa, int64_t seq_id, int32_t* out,
                       int64_t max_len, int32_t pad_value) {
    return static_cast<PageAllocator*>(pa)->block_table(seq_id, out, max_len,
                                                        pad_value);
}

}  // extern "C"
