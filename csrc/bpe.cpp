// Native BPE merge engine for data/tokenizer.py (ByteLevelBPE).
//
// The Python side keeps the parts that need Unicode smarts (regex
// pre-tokenization, NFC, byte->unicode mapping, special-token splits)
// and hands this library integer symbol sequences with word boundaries;
// the rank-driven merge loop — the O(n * merges) hot part of encode() —
// runs here.  Merge rules are integer triples (left_id, right_id) ->
// (merged_id, rank), exactly the ByteLevelBPE.ranks table projected
// through the vocab.
//
// Build: make -C csrc  (g++ -O3 -shared -fPIC)
// API (C, ctypes-friendly):
//   bpe_ctx* bpe_new(int n, const int* lhs, const int* rhs,
//                    const int* merged, const int* rank);
//   void bpe_free(bpe_ctx*);
//   // ids: concatenated word symbols; word_ends[i] = end offset of word i
//   // out must have room for n_ids ints; returns number of out ids.
//   int bpe_apply(bpe_ctx*, const int* ids, int n_ids,
//                 const int* word_ends, int n_words, int* out);

#include <cstddef>
#include <cstdint>
using std::size_t;
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<int, int>& p) const {
        return (static_cast<size_t>(p.first) << 32) ^
               static_cast<uint32_t>(p.second);
    }
};

struct Ctx {
    std::unordered_map<std::pair<int, int>, std::pair<int, int>, PairHash>
        merges;  // (l, r) -> (merged_id, rank)
};

// Apply merges to one word in-place (greedy lowest-rank first, the
// classic BPE loop).  Word sizes are tiny (<= a few dozen symbols), so
// the quadratic scan beats heap bookkeeping in practice.
void apply_word(const Ctx& ctx, std::vector<int>& w) {
    while (w.size() > 1) {
        int best_rank = INT32_MAX, best_pos = -1, best_id = -1;
        for (size_t i = 0; i + 1 < w.size(); ++i) {
            auto it = ctx.merges.find({w[i], w[i + 1]});
            if (it != ctx.merges.end() && it->second.second < best_rank) {
                best_rank = it->second.second;
                best_pos = static_cast<int>(i);
                best_id = it->second.first;
            }
        }
        if (best_pos < 0) break;
        // merge every occurrence of this exact pair left-to-right
        std::vector<int> out;
        out.reserve(w.size());
        int l = w[best_pos], r = w[best_pos + 1];
        for (size_t i = 0; i < w.size();) {
            if (i + 1 < w.size() && w[i] == l && w[i + 1] == r) {
                out.push_back(best_id);
                i += 2;
            } else {
                out.push_back(w[i]);
                i += 1;
            }
        }
        w.swap(out);
    }
}

}  // namespace

extern "C" {

void* bpe_new(int n, const int* lhs, const int* rhs, const int* merged,
              const int* rank) {
    auto* ctx = new Ctx();
    ctx->merges.reserve(static_cast<size_t>(n) * 2);
    for (int i = 0; i < n; ++i) {
        ctx->merges.emplace(std::make_pair(lhs[i], rhs[i]),
                            std::make_pair(merged[i], rank[i]));
    }
    return ctx;
}

void bpe_free(void* p) { delete static_cast<Ctx*>(p); }

int bpe_apply(void* p, const int* ids, int n_ids, const int* word_ends,
              int n_words, int* out) {
    const Ctx& ctx = *static_cast<Ctx*>(p);
    std::vector<int> w;
    int n_out = 0, start = 0;
    for (int wi = 0; wi < n_words; ++wi) {
        int end = word_ends[wi];
        w.assign(ids + start, ids + end);
        apply_word(ctx, w);
        for (int v : w) out[n_out++] = v;
        start = end;
    }
    (void)n_ids;
    return n_out;
}

}  // extern "C"
