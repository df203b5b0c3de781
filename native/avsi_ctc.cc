// CTC prefix beam search in C++ (host-side decode).
//
// The reference decodes with TensorFlow's C++ ctc_beam_search_decoder op
// (models_asr.py:135, models.py:1627).  This is the framework's native
// equivalent: standard prefix beam search with per-prefix blank/non-blank
// probability mass, merge_repeated CTC semantics, blank = last class.
// Bound via ctypes in avsi/ops/ctc.py (python fallback kept for parity
// tests).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
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

struct Beam {
  std::vector<int32_t> prefix;
  double pb;   // log prob ending in blank
  double pnb;  // log prob ending in non-blank
  double total() const { return logaddexp(pb, pnb); }
};

std::string key_of(const std::vector<int32_t>& prefix) {
  return std::string(reinterpret_cast<const char*>(prefix.data()),
                     prefix.size() * sizeof(int32_t));
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
  if (beam_width < 1 || num_classes < 2) return -1;
  const int blank = int(num_classes) - 1;
  const int64_t steps = std::min(t_len, seq_len);

  std::vector<Beam> beams{{{}, 0.0, kNegInf}};
  std::vector<double> logp(num_classes);

  for (int64_t t = 0; t < steps; ++t) {
    const float* row = logits + t * num_classes;
    // log-softmax of the row
    double mx = row[0];
    for (int64_t c = 1; c < num_classes; ++c) mx = std::max(mx, double(row[c]));
    double denom = 0.0;
    for (int64_t c = 0; c < num_classes; ++c) denom += std::exp(double(row[c]) - mx);
    double log_denom = mx + std::log(denom);
    for (int64_t c = 0; c < num_classes; ++c) logp[c] = double(row[c]) - log_denom;

    std::unordered_map<std::string, size_t> index;
    std::vector<Beam> next;
    next.reserve(beams.size() * (size_t(num_classes)));

    auto accumulate = [&](std::vector<int32_t>&& prefix, double pb, double pnb) {
      std::string key = key_of(prefix);
      auto it = index.find(key);
      if (it == index.end()) {
        index.emplace(std::move(key), next.size());
        next.push_back({std::move(prefix), pb, pnb});
      } else {
        Beam& b = next[it->second];
        b.pb = logaddexp(b.pb, pb);
        b.pnb = logaddexp(b.pnb, pnb);
      }
    };

    for (const Beam& b : beams) {
      double p_total = b.total();
      // extend with blank
      accumulate(std::vector<int32_t>(b.prefix), logp[blank] + p_total, kNegInf);
      // repeat last symbol (merges into the same prefix's non-blank mass)
      if (!b.prefix.empty()) {
        accumulate(std::vector<int32_t>(b.prefix), kNegInf,
                   logp[b.prefix.back()] + b.pnb);
      }
      // extend with a new symbol
      for (int s = 0; s < blank; ++s) {
        double base = (!b.prefix.empty() && s == b.prefix.back()) ? b.pb : p_total;
        std::vector<int32_t> ext(b.prefix);
        ext.push_back(s);
        accumulate(std::move(ext), kNegInf, logp[s] + base);
      }
    }

    if (int(next.size()) > beam_width) {
      std::partial_sort(
          next.begin(), next.begin() + beam_width, next.end(),
          [](const Beam& a, const Beam& b) { return a.total() > b.total(); });
      next.resize(beam_width);
    }
    beams = std::move(next);
  }

  const Beam* best = &beams[0];
  for (const Beam& b : beams)
    if (b.total() > best->total()) best = &b;
  int64_t n = std::min<int64_t>(best->prefix.size(), max_out);
  memcpy(out_labels, best->prefix.data(), n * sizeof(int32_t));
  return int(n);
}

}  // extern "C"
