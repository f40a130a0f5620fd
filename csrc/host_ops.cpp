// Native host-side runtime ops for candle_vllm_tpu.
//
// The reference implements its entire scheduler/runtime in native code
// (Rust: src/scheduler/*, 63 kLoC).  Here the *hot* host paths — per-token
// slot-mapping construction (inputs.rs:90-575 prepare_prompt/decode) and
// chained prefix-cache block hashing (prefix_cache.rs:371-383 hash_block) —
// run in C++, called through ctypes with zero-copy numpy buffers.  The
// Python implementations remain as fallbacks (engine/host_ops.py).
//
// Build: make -C csrc   (produces libcvt_host_ops.so)

#include <cstdint>
#include <cstddef>

extern "C" {

// positions[j] = start + j
// slots[j]    = block_ids[(start + j) / page_size] * page_size
//               + (start + j) % page_size
void cvt_fill_slots(int32_t* positions, int32_t* slots,
                    const int32_t* block_ids, int32_t start,
                    int32_t page_size, int32_t n) {
  for (int32_t j = 0; j < n; ++j) {
    int32_t pos = start + j;
    positions[j] = pos;
    slots[j] = block_ids[pos / page_size] * page_size + pos % page_size;
  }
}

// FNV-1a over (parent_hash || token block), one chained hash per full
// block of `block_size` tokens.  Writes ceil_div-capped `num_blocks`
// hashes; returns the number written.
static inline uint64_t fnv1a_step(uint64_t h, uint64_t v) {
  const uint64_t prime = 1099511628211ULL;
  for (int b = 0; b < 8; ++b) {
    h ^= (v >> (8 * b)) & 0xFF;
    h *= prime;
  }
  return h;
}

int32_t cvt_chain_hashes(const int32_t* tokens, int32_t num_tokens,
                         int32_t block_size, uint64_t seed,
                         uint64_t* out_hashes, int32_t max_blocks) {
  const uint64_t basis = 14695981039346656037ULL;
  uint64_t parent = seed;
  int32_t written = 0;
  for (int32_t start = 0; start + block_size <= num_tokens;
       start += block_size) {
    if (written >= max_blocks) break;
    uint64_t h = fnv1a_step(basis, parent);
    for (int32_t i = 0; i < block_size; ++i) {
      h = fnv1a_step(h, (uint64_t)(uint32_t)tokens[start + i]);
    }
    parent = h;
    out_hashes[written++] = h;
  }
  return written;
}

// Batched decode-row fill: one (position, slot) per sequence.
void cvt_fill_decode_rows(int32_t* positions, int32_t* slots,
                          const int32_t* starts,
                          const int32_t* const* block_tables,
                          int32_t page_size, int32_t n_seqs) {
  for (int32_t i = 0; i < n_seqs; ++i) {
    int32_t pos = starts[i];
    positions[i] = pos;
    slots[i] = block_tables[i][pos / page_size] * page_size + pos % page_size;
  }
}

}  // extern "C"
