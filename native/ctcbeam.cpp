// Lexicon-constrained CTC prefix beam search (streaming, carryable).
//
// Native twin of ecog2txt_tpu/models/ctc.py::CTCWordBeamState — the
// serving-host half of the live-partial-hypothesis path
// (serve.StreamingConformerSession.partial / StreamingSessionPool).
// The device side (posteriors) is jitted; this search runs per chunk
// per stream on the host, O(T_new * beam * branching) in Python-dict
// work there (~0.6 ms/step at beam 16 over the 1806-word MOCHA
// lexicon) — hot enough at pool scale to warrant C++.
//
// Exact same recurrence as the Python implementation (double math,
// identical merge rule), so chunked == one-shot == Python oracle; only
// float associativity in the merge order may differ (~1e-15).
//
// Key representation exploits two interning facts:
//  - a trie node uniquely identifies the partial-phoneme path from the
//    root, so (partial tuple) -> node id;
//  - emitted word sequences are extend-only, so they intern into a
//    parent-pointer lattice: seq id -> (parent seq id, word id).
// A beam key is then (words_seq, node, last) packed into one uint64.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr double NEG_INF = -std::numeric_limits<double>::infinity();

inline double lse2(double a, double b) {
  if (a == NEG_INF) return b;
  if (b == NEG_INF) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct TrieNode {
  std::vector<std::pair<int32_t, int32_t>> children;  // (phoneme, node)
  std::vector<int32_t> words;                         // word ids ending here
};

struct Trie {
  std::vector<TrieNode> nodes;  // [0] = root
  Trie() { nodes.emplace_back(); }
};

struct Val {
  double pb, pnb;  // log p(ending in blank/boundary), log p(non-blank)
};

// key packing: words_seq (32 bits) | node (23 bits) | last+1 (9 bits)
inline uint64_t pack_key(uint32_t seq, uint32_t node, int32_t last) {
  return (uint64_t(seq) << 32) | (uint64_t(node) << 9) |
         uint64_t(uint32_t(last + 1) & 0x1FF);
}

struct State {
  const Trie* trie;
  int beam_width;
  double bonus;
  long num_steps = 0;
  // word-sequence interning: seqs[id] = (parent id, word id); id 0 = ()
  std::vector<std::pair<uint32_t, int32_t>> seqs{{0, -1}};
  std::unordered_map<uint64_t, uint32_t> seq_intern;
  std::unordered_map<uint64_t, Val> beams;

  explicit State(const Trie* t, int bw, double b)
      : trie(t), beam_width(bw), bonus(b) {
    beams[pack_key(0, 0, -1)] = {0.0, NEG_INF};
  }

  uint32_t extend_seq(uint32_t parent, int32_t word) {
    uint64_t k = (uint64_t(parent) << 32) | uint32_t(word);
    auto it = seq_intern.find(k);
    if (it != seq_intern.end()) return it->second;
    uint32_t id = uint32_t(seqs.size());
    seqs.emplace_back(parent, word);
    seq_intern.emplace(k, id);
    return id;
  }
};

inline void merge(std::unordered_map<uint64_t, Val>& m, uint64_t key,
                  double pb, double pnb) {
  auto [it, inserted] = m.try_emplace(key, Val{pb, pnb});
  if (!inserted) {
    it->second.pb = lse2(it->second.pb, pb);
    it->second.pnb = lse2(it->second.pnb, pnb);
  }
}

}  // namespace

extern "C" {

void* ctcbeam_trie_new() { return new Trie(); }

void ctcbeam_trie_free(void* t) { delete static_cast<Trie*>(t); }

// Register one lexicon word as its phoneme-id expansion.  Returns 1 on
// success, 0 when an id would not fit the packed beam-key fields
// (phoneme id > 510 for the 9-bit last+1 slot, or more than 2^23-1
// trie nodes) — the caller must then discard the trie and fall back to
// the Python implementation, which has no such limits.
int32_t ctcbeam_trie_add(void* t, const int32_t* phonemes, int32_t n,
                         int32_t word_id) {
  Trie& trie = *static_cast<Trie*>(t);
  int32_t node = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t p = phonemes[i];
    if (p < 0 || p > 510) return 0;
    auto& ch = trie.nodes[node].children;
    auto it = std::find_if(ch.begin(), ch.end(),
                           [p](const auto& e) { return e.first == p; });
    if (it == ch.end()) {
      if (trie.nodes.size() >= size_t(0x800000)) return 0;
      int32_t child = int32_t(trie.nodes.size());
      trie.nodes.emplace_back();
      // re-fetch: emplace_back may reallocate nodes (and thus ch)
      trie.nodes[node].children.emplace_back(p, child);
      node = child;
    } else {
      node = it->second;
    }
  }
  trie.nodes[node].words.push_back(word_id);
  return 1;
}

void* ctcbeam_state_new(void* t, int32_t beam_width, double bonus) {
  return new State(static_cast<Trie*>(t), beam_width, bonus);
}

void ctcbeam_state_free(void* s) { delete static_cast<State*>(s); }

long ctcbeam_num_steps(void* s) { return static_cast<State*>(s)->num_steps; }

// Consume (T, K1) float64 posterior rows; blank id = K1 - 1.
void ctcbeam_advance(void* s, const double* logp, long T, int32_t K1) {
  State& st = *static_cast<State*>(s);
  const Trie& trie = *st.trie;
  const int32_t blank = K1 - 1;
  std::unordered_map<uint64_t, Val> next;
  std::vector<std::pair<double, uint64_t>> scored;
  // candidates per beam ≈ 2 + branching + word closures; at the root
  // branching is the full phoneme set, so size for ~2× that or the
  // map rehashes every step (measured: superlinear cost past beam 32)
  size_t reserve_hint = st.beams.size() * 64;
  for (long t = 0; t < T; ++t) {
    const double* lp = logp + t * K1;
    next.clear();
    next.reserve(reserve_hint);
    for (const auto& [key, val] : st.beams) {
      const uint32_t seq = uint32_t(key >> 32);
      const uint32_t node = uint32_t(key >> 9) & 0x7FFFFF;
      const int32_t last = int32_t(uint32_t(key) & 0x1FF) - 1;
      const double total = lse2(val.pb, val.pnb);
      // 1) blank: prefix unchanged
      merge(next, key, total + lp[blank], NEG_INF);
      // 2) repeat last non-blank phoneme: same prefix, non-blank mass
      if (last >= 0 && val.pnb != NEG_INF)
        merge(next, key, NEG_INF, val.pnb + lp[last]);
      // 3) extend with a phoneme the trie allows
      for (const auto& [p, child] : trie.nodes[node].children) {
        const double src = (p != last) ? total : val.pb;
        if (src == NEG_INF) continue;
        const double pnb = src + lp[p];
        merge(next, pack_key(seq, uint32_t(child), p), NEG_INF, pnb);
        // or close out any word completed at this node
        for (int32_t word : trie.nodes[child].words)
          merge(next, pack_key(st.extend_seq(seq, word), 0, p), NEG_INF,
                pnb + st.bonus);
      }
    }
    // prune to beam_width by total mass
    reserve_hint = next.size() * 2;
    scored.clear();
    scored.reserve(next.size());
    for (const auto& [key, val] : next)
      scored.emplace_back(-lse2(val.pb, val.pnb), key);
    size_t keep = std::min(size_t(st.beam_width), scored.size());
    std::partial_sort(scored.begin(), scored.begin() + keep, scored.end());
    st.beams.clear();
    for (size_t i = 0; i < keep; ++i)
      st.beams.emplace(scored[i].second, next.find(scored[i].second)->second);
  }
  st.num_steps += T;
}

}  // extern "C"

namespace {

// shared by ctcbeam_best / ctcbeam_best_score: best completed-word
// sequence id and its (merged) log score
std::pair<uint32_t, double> best_seq(const State& st) {
  // merge mass of beams describing the same word sequence (differing
  // only in `last`), over completed-word beams (node == root)
  std::unordered_map<uint32_t, double> by_seq;
  for (const auto& [key, val] : st.beams) {
    const uint32_t node = uint32_t(key >> 9) & 0x7FFFFF;
    if (node != 0) continue;
    const uint32_t seq = uint32_t(key >> 32);
    double sc = lse2(val.pb, val.pnb);
    auto [it, inserted] = by_seq.try_emplace(seq, sc);
    if (!inserted) it->second = lse2(it->second, sc);
  }
  uint32_t best = 0;
  double best_score = NEG_INF;
  if (!by_seq.empty()) {
    for (const auto& [seq, sc] : by_seq)
      if (sc > best_score) best_score = sc, best = seq;
  } else {
    for (const auto& [key, val] : st.beams) {
      double sc = lse2(val.pb, val.pnb);
      if (sc > best_score) best_score = sc, best = uint32_t(key >> 32);
    }
  }
  return {best, best_score};
}

}  // namespace

extern "C" {

// Best completed-word hypothesis: word ids into out (capacity cap);
// returns the count (non-mutating — callable after every chunk).
long ctcbeam_best(void* s, int32_t* out, long cap) {
  State& st = *static_cast<State*>(s);
  auto [seq_id, score] = best_seq(st);
  (void)score;
  // decode the parent-pointer chain (reversed)
  std::vector<int32_t> words;
  for (uint32_t seq = seq_id; seq != 0; seq = st.seqs[seq].first)
    words.push_back(st.seqs[seq].second);
  std::reverse(words.begin(), words.end());
  long n = long(words.size());
  for (long i = 0; i < n && i < cap; ++i) out[i] = words[i];
  return n;
}

// Merged log score of the best completed-word hypothesis (-inf when
// no beams survive).
double ctcbeam_best_score(void* s) {
  return best_seq(*static_cast<State*>(s)).second;
}

}  // extern "C"
