// Adaptive LightSlice cluster refinement — native backend.
//
// Native counterpart of the reference's per-slice ClusterRefiner thread
// fan-out (src/integrators/vrl/Preprocessor.cpp:722-773) and the
// Clustering cost model/refinement (:287-720). The algorithm matches
// alvrl_tpu/integrators/vrl/cluster.py (the numpy implementation is the
// executable spec; see its docstring for the Preprocessor.cpp citations):
//
//   * column weights: locality-weighted RMS of (mean^2 + var) with a 1%
//     average-weight safety floor;
//   * per-cluster variance = undersampling variance
//     W * sum(x^2/w) - (sum x)^2 plus integration variance W * sum(var/w),
//     locality-weighted per gather row;
//   * split: two column-weight-sampled seed columns, project normalized
//     columns on their difference, stable sort, min-total-variance split
//     point via forward/backward prefix variances;
//   * adaptive refinement: split the max-variance cluster while the
//     convergence constant (N*pu + numClusters) * clusteredVariance
//     decreases, provable lower-bound early exit, snapshot rollback,
//     optional depthCorrection RNG replay;
//   * representatives sampled proportional to column weight with
//     weight = 1/probability (singletons weight 1).
//
// The host-side clustering is the serial bottleneck of a warm clustered
// pass (numpy: 0.5-2.7 s/pass on the BASELINE configs); this module runs
// the whole build_clusters pipeline in C++ with std::thread over slices.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <thread>
#include <vector>

namespace {

// xoshiro256++ — fast, good-quality 64-bit generator (public domain
// algorithm, Blackman & Vigna). Independent of numpy's PCG64: the
// clustering is stochastic by design, no cross-backend bit parity.
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 init
    uint64_t z = seed;
    for (int i = 0; i < 4; ++i) {
      z += 0x9e3779b97f4a7c15ULL;
      uint64_t x = z;
      x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
      x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
      s[i] = x ^ (x >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t result = rotl(s[0] + s[3], 23) + s[0];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  double uniform() {  // [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
  int64_t integers(int64_t n) { return (int64_t)(uniform() * n) % n; }
};

struct Cluster {
  int64_t begin, end;
  double uvar, ivar;
  double key() const { return uvar + ivar; }
};

struct PQEntry {
  double key;
  uint64_t counter;
  Cluster c;
  bool operator<(const PQEntry& o) const {
    // max-heap by key; ties broken by insertion order (older first),
    // matching the numpy heap's (key, counter) ordering
    if (key != o.key) return key < o.key;
    return counter > o.counter;
  }
};

struct Clustering {
  // borrowed, row-major (P x N)
  const double* mean;
  const double* var;
  const double* loc_w;  // (P,)
  int64_t P, N;
  double pu;
  double depth_correction;
  Rng* rng;

  std::vector<double> col_w;        // (N,) — 0 for unused columns is fine
  std::vector<int64_t> order;
  std::vector<int64_t> singletons;
  std::priority_queue<PQEntry> pq;
  uint64_t push_counter = 0;
  double c_uvar = 0.0, c_ivar = 0.0;
  double tracer_var = 0.0, unclustered_ivar = 0.0;

  // scratch for splits
  std::vector<double> proj, pref_u_f, pref_i_f, pref_u_b, pref_i_b;
  std::vector<int64_t> tmp_cols;

  void compute_column_weights() {
    col_w.assign(N, 0.0);
    // w = sqrt(max(loc_w @ (mean^2 + var), 0)) + avg * 1e-2
    for (int64_t p = 0; p < P; ++p) {
      const double lw = loc_w[p];
      const double* mrow = mean + p * N;
      const double* vrow = var + p * N;
      for (int64_t j = 0; j < N; ++j)
        col_w[j] += lw * (mrow[j] * mrow[j] + vrow[j]);
    }
    double avg = 0.0;
    for (int64_t j = 0; j < N; ++j) {
      col_w[j] = std::sqrt(std::max(col_w[j], 0.0));
      avg += col_w[j];
    }
    avg = N ? avg / N : 0.0;
    if (avg == 0.0) avg = 1.0;
    for (int64_t j = 0; j < N; ++j) col_w[j] += avg * 1e-2;
  }

  void range_variance(int64_t begin, int64_t end, double* uvar, double* ivar) {
    double u = 0.0, iv = 0.0;
    double W = 0.0;
    for (int64_t k = begin; k < end; ++k) W += col_w[order[k]];
    for (int64_t p = 0; p < P; ++p) {
      const double* mrow = mean + p * N;
      const double* vrow = var + p * N;
      double sx = 0.0, sxxw = 0.0, svw = 0.0;
      for (int64_t k = begin; k < end; ++k) {
        const int64_t j = order[k];
        const double x = mrow[j];
        const double w = col_w[j];
        sx += x;
        sxxw += x * x / w;
        svw += vrow[j] / w;
      }
      u += loc_w[p] * (W * sxxw - sx * sx);
      iv += loc_w[p] * (W * svw);
    }
    *uvar = std::max(u, 0.0);
    *ivar = std::max(iv, 0.0);
  }

  void unclustered_variance() {
    // (tracer, integration) over all columns in `order`
    const int64_t n = (int64_t)order.size();
    if (n == 0) { tracer_var = 0.0; unclustered_ivar = 0.0; return; }
    double integ = 0.0, tracer = 0.0;
    for (int64_t p = 0; p < P; ++p) {
      const double* mrow = mean + p * N;
      const double* vrow = var + p * N;
      double sx = 0.0, sxx = 0.0, sv = 0.0;
      for (int64_t k = 0; k < n; ++k) {
        const int64_t j = order[k];
        sx += mrow[j];
        sxx += mrow[j] * mrow[j];
        sv += vrow[j];
      }
      integ += loc_w[p] * sv;
      if (n > 1) {
        const double xbar = sx / n;
        // sum (x - xbar)^2 = sxx - n*xbar^2
        tracer += loc_w[p] * (sxx - n * xbar * xbar);
      }
    }
    if (n <= 1) { tracer_var = 0.0; unclustered_ivar = integ; return; }
    tracer_var = tracer - integ;
    unclustered_ivar = integ;
  }

  void add_cluster(int64_t begin, int64_t end, double uvar, double ivar,
                   bool have_var) {
    if (end == begin + 1) {
      singletons.push_back(order[begin]);
      if (!have_var) {
        double u;
        range_variance(begin, end, &u, &ivar);
      }
      c_ivar += ivar;
      return;
    }
    if (!have_var) range_variance(begin, end, &uvar, &ivar);
    ++push_counter;
    pq.push(PQEntry{uvar + ivar, push_counter, Cluster{begin, end, uvar, ivar}});
    c_uvar += uvar;
    c_ivar += ivar;
  }

  Cluster pop_cluster() {
    PQEntry e = pq.top();
    pq.pop();
    c_uvar -= e.c.uvar;
    c_ivar -= e.c.ivar;
    return e.c;
  }

  int64_t num_clusters() const {
    return (int64_t)singletons.size() + (int64_t)pq.size();
  }
  double unclustered_var() const { return tracer_var + unclustered_ivar; }
  double clustered_var() const { return tracer_var + c_uvar + c_ivar; }
  double convergence_constant() const {
    return ((double)order.size() * pu + num_clusters()) * clustered_var();
  }
  double lower_bound_future() const {
    return ((double)order.size() * pu + num_clusters()) * unclustered_var();
  }

  // weighted sample of a position in [begin, end) by column weight;
  // returns position, sets *prob
  int64_t weighted_sample(int64_t begin, int64_t end, int64_t exclude,
                          double* prob) {
    double total = 0.0;
    for (int64_t k = begin; k < end; ++k) {
      const int64_t j = order[k];
      if (j != exclude) total += col_w[j];
    }
    if (total <= 0.0) {
      int64_t k = begin + rng->integers(end - begin);
      *prob = 1.0 / (double)(end - begin);
      return k;
    }
    const double u = rng->uniform() * total;
    double acc = 0.0;
    int64_t last = begin;
    for (int64_t k = begin; k < end; ++k) {
      const int64_t j = order[k];
      if (j == exclude) continue;
      last = k;
      acc += col_w[j];
      if (u < acc) break;
    }
    *prob = col_w[order[last]] / total;
    return last;
  }

  double col_norm(int64_t j) {
    double s = 0.0;
    for (int64_t p = 0; p < P; ++p) {
      const double x = mean[p * N + j];
      s += x * x;
    }
    return std::sqrt(s);
  }

  void prefix_variances(const int64_t* cols, int64_t k, double* pref_u,
                        double* pref_i) {
    // incremental (uvar, ivar) for prefixes; O(P*k)
    std::fill(pref_u, pref_u + k, 0.0);
    std::fill(pref_i, pref_i + k, 0.0);
    // W prefix
    static thread_local std::vector<double> Wp, A;
    Wp.resize(k);
    A.resize(k);  // per-row running sums reused
    double w_acc = 0.0;
    for (int64_t t = 0; t < k; ++t) {
      w_acc += col_w[cols[t]];
      Wp[t] = w_acc;
    }
    for (int64_t p = 0; p < P; ++p) {
      const double lw = loc_w[p];
      const double* mrow = mean + p * N;
      const double* vrow = var + p * N;
      double a = 0.0, b = 0.0, c = 0.0;
      for (int64_t t = 0; t < k; ++t) {
        const int64_t j = cols[t];
        const double x = mrow[j];
        const double w = col_w[j];
        a += x;
        b += x * x / w;
        c += vrow[j] / w;
        pref_u[t] += lw * (Wp[t] * b - a * a);
        pref_i[t] += lw * (Wp[t] * c);
      }
    }
    for (int64_t t = 0; t < k; ++t) {
      pref_u[t] = std::max(pref_u[t], 0.0);
      pref_i[t] = std::max(pref_i[t], 0.0);
    }
  }

  bool split(const Cluster& c) {
    const int64_t begin = c.begin, end = c.end;
    const int64_t k = end - begin;
    if (k < 2) return false;
    double p1, p2;
    const int64_t i1 = weighted_sample(begin, end, -1, &p1);
    const int64_t v1 = order[i1];
    const int64_t i2 = weighted_sample(begin, end, v1, &p2);
    const int64_t v2 = order[i2];

    // direction = (col2 - col1) normalized, or random if degenerate
    std::vector<double> dir(P);
    double n1 = col_norm(v1), n2 = col_norm(v2);
    double dlen = 0.0;
    for (int64_t p = 0; p < P; ++p) {
      dir[p] = mean[p * N + v2] - mean[p * N + v1];
      dlen += dir[p] * dir[p];
    }
    dlen = std::sqrt(dlen);
    if (n1 == 0.0 || n2 == 0.0 || dlen == 0.0) {
      double nn = 0.0;
      for (int64_t p = 0; p < P; ++p) {
        // Box-Muller standard normal
        double u1 = std::max(rng->uniform(), 1e-300);
        double u2 = rng->uniform();
        dir[p] = std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
        nn += dir[p] * dir[p];
      }
      dlen = std::max(std::sqrt(nn), 1e-30);
    }
    for (int64_t p = 0; p < P; ++p) dir[p] /= dlen;

    // projections of normalized columns
    proj.resize(k);
    for (int64_t t = 0; t < k; ++t) {
      const int64_t j = order[begin + t];
      double dot = 0.0, nrm = 0.0;
      for (int64_t p = 0; p < P; ++p) {
        const double x = mean[p * N + j];
        dot += dir[p] * x;
        nrm += x * x;
      }
      proj[t] = nrm > 0.0 ? dot / std::sqrt(nrm) : 0.0;
    }
    // stable argsort
    std::vector<int64_t> idx(k);
    std::iota(idx.begin(), idx.end(), 0);
    std::stable_sort(idx.begin(), idx.end(),
                     [&](int64_t a, int64_t b) { return proj[a] < proj[b]; });
    tmp_cols.resize(k);
    for (int64_t t = 0; t < k; ++t) tmp_cols[t] = order[begin + idx[t]];
    std::copy(tmp_cols.begin(), tmp_cols.end(), order.begin() + begin);

    // forward/backward prefix variances
    pref_u_f.resize(k); pref_i_f.resize(k);
    pref_u_b.resize(k); pref_i_b.resize(k);
    prefix_variances(order.data() + begin, k, pref_u_f.data(), pref_i_f.data());
    std::vector<int64_t> rev(tmp_cols.rbegin(), tmp_cols.rend());
    prefix_variances(rev.data(), k, pref_u_b.data(), pref_i_b.data());

    int64_t best_s = 1;
    double best_total = 1e300;
    for (int64_t s = 1; s < k; ++s) {
      const double total = pref_u_f[s - 1] + pref_i_f[s - 1] +
                           pref_u_b[k - 1 - s] + pref_i_b[k - 1 - s];
      if (total < best_total) { best_total = total; best_s = s; }
    }
    add_cluster(begin, begin + best_s, pref_u_f[best_s - 1], pref_i_f[best_s - 1], true);
    add_cluster(begin + best_s, end, pref_u_b[k - 1 - best_s], pref_i_b[k - 1 - best_s], true);
    return true;
  }

  // --- refinement --------------------------------------------------------

  struct Snapshot {
    double c_uvar, c_ivar;
    std::priority_queue<PQEntry> pq;
    std::vector<int64_t> singletons;
  };
  Snapshot snapshot() const { return Snapshot{c_uvar, c_ivar, pq, singletons}; }
  void restore(Snapshot&& s) {
    c_uvar = s.c_uvar;
    c_ivar = s.c_ivar;
    pq = std::move(s.pq);
    singletons = std::move(s.singletons);
  }

  bool refine(double undersampling) {
    if (undersampling > 0) {
      const int64_t target =
          (int64_t)(0.5 + (double)order.size() / undersampling);
      while (num_clusters() < target && !pq.empty()) {
        Cluster c = pop_cluster();
        split(c);
      }
      return true;
    }
    // adaptive
    if (pq.empty()) return true;
    if (unclustered_var() == 0.0) return false;

    Rng rng0 = *rng;
    double best = convergence_constant();
    Snapshot snap = snapshot();
    int64_t n_splits = 0, best_splits = 0;
    while (!pq.empty()) {
      Cluster c = pop_cluster();
      split(c);
      ++n_splits;
      const double cur = convergence_constant();
      if (cur < best) {
        best = cur;
        best_splits = n_splits;
        if (depth_correction == 1.0) snap = snapshot();
      }
      if (lower_bound_future() >= best) break;
    }
    restore(std::move(snap));

    if (depth_correction != 1.0) {
      *rng = rng0;  // replay the stream, split to the corrected depth
      const int64_t corrected =
          (int64_t)(0.5 + depth_correction * (double)best_splits);
      for (int64_t i = 0; i < corrected && !pq.empty(); ++i) {
        Cluster c = pop_cluster();
        split(c);
      }
    }
    return true;
  }

  // --- outputs -------------------------------------------------------------

  void sample_representatives(std::vector<int64_t>* ids,
                              std::vector<double>* ws) {
    ids->clear();
    ws->clear();
    for (int64_t v : singletons) {
      ids->push_back(v);
      ws->push_back(1.0);
    }
    // drain a copy of the pq in heap order (matches iteration over the
    // python list-heap closely enough — representative sampling is
    // order-insensitive statistically)
    std::priority_queue<PQEntry> copy = pq;
    while (!copy.empty()) {
      const Cluster& c = copy.top().c;
      double prob;
      const int64_t k = weighted_sample(c.begin, c.end, -1, &prob);
      ids->push_back(order[k]);
      ws->push_back(1.0 / std::max(prob, 1e-30));
      copy.pop();
    }
  }

  void clusters_out(std::vector<int64_t>* offsets, std::vector<int64_t>* cols) {
    offsets->clear();
    cols->clear();
    offsets->push_back(0);
    for (int64_t v : singletons) {
      cols->push_back(v);
      offsets->push_back((int64_t)cols->size());
    }
    std::priority_queue<PQEntry> copy = pq;
    while (!copy.empty()) {
      const Cluster& c = copy.top().c;
      for (int64_t k = c.begin; k < c.end; ++k) cols->push_back(order[k]);
      offsets->push_back((int64_t)cols->size());
      copy.pop();
    }
  }
};

Clustering make_clustering(const double* mean, const double* var,
                           const double* loc_w, int64_t P, int64_t N,
                           const int64_t* init_offsets, int64_t n_init,
                           const int64_t* init_cols, double pu,
                           double depth_correction, Rng* rng) {
  Clustering cl;
  cl.mean = mean;
  cl.var = var;
  cl.loc_w = loc_w;
  cl.P = P;
  cl.N = N;
  cl.pu = pu;
  cl.depth_correction = depth_correction;
  cl.rng = rng;
  cl.compute_column_weights();
  const int64_t total = init_offsets[n_init];
  cl.order.assign(init_cols, init_cols + total);
  for (int64_t c = 0; c < n_init; ++c) {
    const int64_t b = init_offsets[c], e = init_offsets[c + 1];
    if (e > b) cl.add_cluster(b, e, 0.0, 0.0, false);
  }
  cl.unclustered_variance();
  return cl;
}

}  // namespace

extern "C" {

// Single-clustering entry: build from init clusters, optionally refine,
// sample representatives. Returns number of representatives, or -1 if
// refine() returned false (zero unclustered variance -> caller falls
// back). Outputs are caller-allocated with capacity >= total columns.
// If out_cl_offsets != nullptr, also emits the final cluster partition
// (offsets: n_clusters+1, cols: total columns) and stores n_clusters in
// *out_n_clusters.
int64_t alvrl_cluster_refine(
    const double* mean, const double* var, const double* loc_w,
    int64_t P, int64_t N,
    const int64_t* init_offsets, int64_t n_init, const int64_t* init_cols,
    double pixel_undersampling, double depth_correction,
    double undersampling, int do_refine, uint64_t seed,
    int64_t* out_ids, double* out_ws,
    int64_t* out_cl_offsets, int64_t* out_cl_cols, int64_t* out_n_clusters) {
  Rng rng(seed);
  Clustering cl = make_clustering(mean, var, loc_w, P, N, init_offsets,
                                  n_init, init_cols, pixel_undersampling,
                                  depth_correction, &rng);
  if (do_refine) {
    if (!cl.refine(undersampling)) return -1;
  }
  std::vector<int64_t> ids;
  std::vector<double> ws;
  cl.sample_representatives(&ids, &ws);
  std::copy(ids.begin(), ids.end(), out_ids);
  std::copy(ws.begin(), ws.end(), out_ws);
  if (out_cl_offsets != nullptr) {
    std::vector<int64_t> offs, cols;
    cl.clusters_out(&offs, &cols);
    std::copy(offs.begin(), offs.end(), out_cl_offsets);
    std::copy(cols.begin(), cols.end(), out_cl_cols);
    *out_n_clusters = (int64_t)offs.size() - 1;
  }
  return (int64_t)ids.size();
}

// Per-slice refinement fan-out (the ClusterRefiner-threads counterpart):
// every slice refines the SAME init clusters against its own row subset
// of R with its own locality weights, in parallel.
//
// Inputs:
//   R_mean/R_var: (P_total x N) row-major
//   slice_row_offsets: (S+1,) offsets into slice_rows
//   slice_rows: concatenated row indices per slice
//   slice_loc_w: concatenated per-row locality weights (same layout)
//   slice_u: (S,) per-slice pixel undersampling
//   init_offsets/n_init/init_cols: initial cluster partition (global)
//   fb_ids/fb_ws/fb_count: fall-back representatives used when a slice
//     has zero contribution (refine() false)
// Outputs (caller-allocated):
//   out_ids/out_ws: (S x cap) padded tables; out_counts: (S,)
int64_t alvrl_cluster_slices(
    const double* R_mean, const double* R_var, int64_t P_total, int64_t N,
    const int64_t* slice_row_offsets, const int64_t* slice_rows,
    const double* slice_loc_w, const double* slice_u, int64_t S,
    const int64_t* init_offsets, int64_t n_init, const int64_t* init_cols,
    double depth_correction, double local_undersampling, int local_refinement,
    const int64_t* fb_ids, const double* fb_ws, int64_t fb_count,
    uint64_t seed, int64_t n_threads,
    int64_t* out_ids, double* out_ws, int64_t cap, int64_t* out_counts) {
  if (n_threads <= 0) {
    n_threads = (int64_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> bad(0);

  auto work = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= S) return;
      const int64_t rb = slice_row_offsets[i], re = slice_row_offsets[i + 1];
      const int64_t p = re - rb;
      // gather the slice's row submatrix (contiguous for cache locality)
      std::vector<double> sub_mean((size_t)p * N), sub_var((size_t)p * N);
      std::vector<double> loc(p);
      for (int64_t r = 0; r < p; ++r) {
        const int64_t src = slice_rows[rb + r];
        std::memcpy(&sub_mean[(size_t)r * N], R_mean + src * N,
                    sizeof(double) * N);
        std::memcpy(&sub_var[(size_t)r * N], R_var + src * N,
                    sizeof(double) * N);
        loc[r] = slice_loc_w[rb + r];
      }
      Rng rng(seed * 0x9e3779b97f4a7c15ULL + (uint64_t)i * 0xbf58476d1ce4e5b9ULL + 1);
      Clustering cl = make_clustering(sub_mean.data(), sub_var.data(),
                                      loc.data(), p, N, init_offsets, n_init,
                                      init_cols, slice_u[i],
                                      depth_correction, &rng);
      std::vector<int64_t> ids;
      std::vector<double> ws;
      bool ok = true;
      if (local_refinement) ok = cl.refine(local_undersampling);
      if (ok) {
        cl.sample_representatives(&ids, &ws);
      } else {
        ids.assign(fb_ids, fb_ids + fb_count);
        ws.assign(fb_ws, fb_ws + fb_count);
      }
      const int64_t n_out = std::min((int64_t)ids.size(), cap);
      if ((int64_t)ids.size() > cap) bad.fetch_add(1);
      std::copy(ids.begin(), ids.begin() + n_out, out_ids + i * cap);
      std::copy(ws.begin(), ws.begin() + n_out, out_ws + i * cap);
      out_counts[i] = n_out;
    }
  };

  std::vector<std::thread> threads;
  const int64_t nt = std::min<int64_t>(n_threads, std::max<int64_t>(S, 1));
  threads.reserve(nt);
  for (int64_t t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return bad.load() ? -1 : 0;
}

}  // extern "C"
