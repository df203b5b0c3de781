// CTC prefix beam search in C++ (host-side decode).
//
// The reference decodes with TensorFlow's C++ ctc_beam_search_decoder op
// (models_asr.py:135, models.py:1627).  This is the framework's native
// equivalent: standard prefix beam search with per-prefix blank/non-blank
// probability mass, merge_repeated CTC semantics, blank = last class.
// Bound via ctypes in avsi/ops/ctc.py (python fallback kept for parity
// tests).
//
// Prefixes live in a trie arena (parent pointer + label per node), so
// extending a beam and deduplicating candidates are O(1) — no prefix
// copying or full-prefix hashing.  At the reference's eval beam width
// (100, models_asr.py:135) this decodes a 250x34 utterance in ~1 ms vs
// ~500 ms for the naive copy-per-candidate formulation.
// avsi_ctc_beam_search_batch fans utterances out over std::thread.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

double logaddexp(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  double m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// Trie node: a prefix is identified by its node id.
struct Node {
  int32_t parent;  // -1 for the empty prefix
  int32_t label;
};

struct Beam {
  int32_t node;  // prefix id in the trie
  double pb;     // log prob mass ending in blank
  double pnb;    // log prob mass ending in non-blank
  double tot;    // cached logaddexp(pb, pnb)
};

int decode_one(const float* logits, int64_t t_len, int64_t num_classes,
               int64_t seq_len, int beam_width, int32_t* out_labels,
               int64_t max_out) {
  if (beam_width < 1 || num_classes < 2) return -1;
  const int blank = int(num_classes) - 1;
  const int64_t steps = std::min(t_len, seq_len);

  std::vector<Node> trie;
  trie.push_back({-1, -1});  // node 0 = empty prefix
  // child lookup: (parent_id * num_classes + label) -> child node id
  std::unordered_map<int64_t, int32_t> children;
  children.reserve(size_t(beam_width) * num_classes * 4);

  auto find_child = [&](int32_t parent, int32_t label) -> int32_t {
    auto it = children.find(int64_t(parent) * num_classes + label);
    return it == children.end() ? -1 : it->second;
  };
  auto make_child = [&](int32_t parent, int32_t label) -> int32_t {
    int32_t id = int32_t(trie.size());
    trie.push_back({parent, label});
    children.emplace(int64_t(parent) * num_classes + label, id);
    return id;
  };

  std::vector<Beam> beams{{0, 0.0, kNegInf, 0.0}};
  std::vector<double> logp(num_classes);
  // per-step candidate slots, keyed by node id
  std::unordered_map<int32_t, size_t> slot;
  slot.reserve(size_t(beam_width) * num_classes * 2);
  std::vector<Beam> next;
  next.reserve(size_t(beam_width) * num_classes);
  // size-W min-heap of candidate totals; its top is a safe (conservative,
  // since merged candidates only grow) lower bound on the W-th best score
  std::vector<double> heap;
  heap.reserve(size_t(beam_width) + 1);

  for (int64_t t = 0; t < steps; ++t) {
    const float* row = logits + t * num_classes;
    double mx = row[0];
    for (int64_t c = 1; c < num_classes; ++c) mx = std::max(mx, double(row[c]));
    double denom = 0.0;
    for (int64_t c = 0; c < num_classes; ++c) denom += std::exp(double(row[c]) - mx);
    double log_denom = mx + std::log(denom);
    for (int64_t c = 0; c < num_classes; ++c) logp[c] = double(row[c]) - log_denom;

    slot.clear();
    next.clear();
    heap.clear();

    auto heap_push = [&](double tot) {
      if (int(heap.size()) < beam_width) {
        heap.push_back(tot);
        std::push_heap(heap.begin(), heap.end(), std::greater<double>());
      } else if (tot > heap.front()) {
        std::pop_heap(heap.begin(), heap.end(), std::greater<double>());
        heap.back() = tot;
        std::push_heap(heap.begin(), heap.end(), std::greater<double>());
      }
    };
    auto threshold = [&]() {
      return int(heap.size()) < beam_width ? kNegInf : heap.front();
    };

    // Pass 1 — stay candidates (emit blank / repeat last symbol): the only
    // candidates that extension candidates can later merge into.
    for (const Beam& b : beams) {
      const int32_t last = trie[b.node].label;  // -1 for empty prefix
      double pb = logp[blank] + b.tot;
      double pnb = last >= 0 ? logp[last] + b.pnb : kNegInf;
      double tot = logaddexp(pb, pnb);
      slot.emplace(b.node, next.size());
      next.push_back({b.node, pb, pnb, tot});
      heap_push(tot);
    }

    // Pass 2 — extensions. Distinct (beam, symbol) pairs target distinct
    // child nodes, so two extensions never merge with each other; one can
    // only merge into an existing stay candidate. Hence skipping a
    // not-yet-present candidate whose exact score is below the current
    // W-th best is lossless pruning.
    for (const Beam& b : beams) {
      const int32_t last = trie[b.node].label;
      for (int s = 0; s < blank; ++s) {
        double base = (s == last) ? b.pb : b.tot;
        if (base == kNegInf) continue;
        double pnb = logp[s] + base;
        int32_t child = find_child(b.node, s);
        auto it = child >= 0 ? slot.find(child) : slot.end();
        if (it != slot.end()) {
          // merge into the stay candidate; do NOT re-push its total — the
          // heap must hold exactly one (insert-time, lower-bound) entry per
          // candidate, or the threshold can exceed the true W-th best and
          // prune wrongly
          Beam& m = next[it->second];
          m.pnb = logaddexp(m.pnb, pnb);
          m.tot = logaddexp(m.tot, pnb);
        } else if (pnb > threshold()) {
          if (child < 0) child = make_child(b.node, s);
          slot.emplace(child, next.size());
          next.push_back({child, kNegInf, pnb, pnb});
          heap_push(pnb);
        }
      }
    }

    if (int(next.size()) > beam_width) {
      std::partial_sort(
          next.begin(), next.begin() + beam_width, next.end(),
          [](const Beam& a, const Beam& b) { return a.tot > b.tot; });
      next.resize(beam_width);
    }
    std::swap(beams, next);
  }

  const Beam* best = &beams[0];
  for (const Beam& b : beams)
    if (b.tot > best->tot) best = &b;

  // walk parent pointers, then reverse
  std::vector<int32_t> labels;
  for (int32_t n = best->node; n > 0; n = trie[n].parent)
    labels.push_back(trie[n].label);
  std::reverse(labels.begin(), labels.end());
  int64_t n = std::min<int64_t>(labels.size(), max_out);
  memcpy(out_labels, labels.data(), n * sizeof(int32_t));
  return int(n);
}

}  // namespace

extern "C" {

// logits: (t_len, num_classes) row-major float32, blank = num_classes-1.
// Writes up to max_out labels into out_labels; returns the decoded length
// (or a negative error code).
int avsi_ctc_beam_search(const float* logits, int64_t t_len,
                         int64_t num_classes, int64_t seq_len,
                         int beam_width, int32_t* out_labels,
                         int64_t max_out) {
  return decode_one(logits, t_len, num_classes, seq_len, beam_width,
                    out_labels, max_out);
}

// Batched decode over num_threads std::threads.
// logits: (batch, t_len, num_classes); seq_lens: (batch,);
// out_labels: (batch, max_out); out_lens: (batch,) decoded lengths (or <0).
int avsi_ctc_beam_search_batch(const float* logits, int64_t batch,
                               int64_t t_len, int64_t num_classes,
                               const int64_t* seq_lens, int beam_width,
                               int32_t* out_labels, int64_t max_out,
                               int32_t* out_lens, int num_threads) {
  if (batch <= 0) return 0;
  if (num_threads < 1) num_threads = 1;
  num_threads = int(std::min<int64_t>(num_threads, batch));
  std::vector<std::thread> pool;
  pool.reserve(num_threads);
  for (int w = 0; w < num_threads; ++w) {
    pool.emplace_back([&, w]() {
      for (int64_t i = w; i < batch; i += num_threads) {
        out_lens[i] = decode_one(logits + i * t_len * num_classes, t_len,
                                 num_classes, seq_lens[i], beam_width,
                                 out_labels + i * max_out, max_out);
      }
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
