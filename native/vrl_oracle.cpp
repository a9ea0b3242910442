// Standalone DOUBLE-PRECISION oracle of the unclustered homogeneous
// VRL estimator — the cross-implementation validation harness.
//
// Why this exists (VERDICT r03 next-round item 3): BASELINE's
// cross-binary bar is an allclose against the reference Mitsuba CPU
// build. That build is impossible in this environment — Boost >= 1.47
// (filesystem/system/thread/timer, REQUIRED) is used across 86
// reference files and no Boost exists on this zero-egress box (see
// data/refbuild_attempt.log for the captured cmake failure). This
// harness is the strongest feasible substitute: an INDEPENDENT
// scalar C++ implementation of integrateVRL's semantics
// (vrlIntegrator.cpp:603-785) in double precision, consuming the
// reference's ASCII vrlFile format (VRL.h:43-73), compiled at test
// time with plain g++ and diffed against the JAX estimator at fixed
// uniforms. It shares no code with either the reference or the JAX
// path: different language, different precision, straightforward
// branching scalar control flow vs branchless vector math.
//
// Input (argv[1], text):
//   medium <sa_r sa_g sa_b> <ss_r ss_g ss_b> <g> <msw>
//   config <vol_vol_samples> <vol_surf_samples> <short_vrls 0|1> <u>
//   tris <n>           followed by n lines: p0(3) e1(3) e2(3)
//   rays <n>           followed by n lines:
//       o(3) d(3) hit_p(3) ng(3) albedo(3) valid(0|1)
// Optional trailing sections (round 5 — widen the oracle to every
// launch variant, VERDICT r04 item 2):
//   hetero <scale> <uv_steps> <nq> <st(3)> <ss_col(3)>
//   grid <nssz nssy nssx> <box_min(3)> <box_max(3)>
//       followed by nssz*nssy*nssx SUPERSAMPLED density values
//       (z-major) — grid-medium mode: supersampled-NN lookups,
//       nq-step cumulative-OD tables + linear interp, uv_steps
//       midpoint U<->V quadrature, pdfFailure = exp(-chan od(S->V))
//       (media/heterogeneous.py + integrate.py:248-335 semantics)
//   clusters <n_slices> then per slice: <n_reps> + n_reps x
//       "<vrl_idx> <weight>" lines; then "rayslice <n_rays>" + ids —
//       clustered mode: per-ray weighted representative sums
//       (getClusteredVrlContributions, vrlIntegrator.cpp:542-599)
// argv[2]: reference-format ASCII vrlFile, lines
//   "x0 y0 z0 x1 y1 z1 r g b" (serializeAscii, VRL.h:65-73 — the
//   format stores no particle count).
// argv[3]: traced particle count (the estimator's normalization
//   denominator, vrlIntegrator.cpp:590,805).
// Output: one line per ray, "r g b" (Li, particle-normalized).
//
// Sampling semantics transcribed (with independent derivation of the
// arithmetic) from:
//   sampleVtoDistance / getClosestPoints  vrlIntegrator.cpp:916-1032
//   KullaSampling                         vrlIntegrator.cpp:889-914
//   vol-vol / vol-surf integrands         vrlIntegrator.cpp:668-769
//   short-VRL pdfFailure division         vrlIntegrator.cpp:675,750
//   balance-strategy pdfFailure           homogeneous.cpp:275-352
// The numerical guards (h >= 1e-6, sin_theta fallback < 1e-4,
// occlusion band lo = 1e-3*max(dist,1)) mirror the documented
// conventions of alvrl_tpu/integrators/vrl/integrate.py so a fixed-u
// comparison is meaningful at 1e-3.

// Bench mode (VERDICT r04 next-round item 2 — "ground the baseline"):
//   vrl_oracle scene.txt vrls.txt pcount --bench REPS [THREADS]
// runs the full ray x VRL x sample sweep REPS times with RANDOM
// uniforms (splitmix64 per ray — cheaper than the reference's SFMT,
// which can only make this baseline FASTER, i.e. conservative for any
// "x over baseline" claim), parallelized over rays with std::thread,
// and prints one line: total pair-sample evals, wall seconds, evals/s.
// This is the measured stand-in for the reference CPU build's
// throughput (same integrand, same guards, double precision, -O3):
// bench.py's vs_baseline divides by (this per-core rate x 8 cores).

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

struct V3 {
    double x, y, z;
};
static V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
static double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
static double len(V3 a) { return std::sqrt(dot(a, a)); }
static V3 norm(V3 a) {
    double l = len(a);
    return l > 0 ? a * (1.0 / l) : a;
}

struct Tri {
    V3 p0, e1, e2;
};

struct Ray {
    V3 o, d, hit, ng, alb;
    int valid;
};

struct Vrl {
    V3 s, e, power;
};

// any-hit along [p, q] with the relative epsilon band of the JAX
// occlusion test (intersect.occluded semantics)
static bool occluded(const std::vector<Tri>& tris, V3 p, V3 q) {
    V3 dvec = q - p;
    double dist = len(dvec);
    if (dist <= 0) return false;
    V3 u = dvec * (1.0 / dist);
    double lo = 1e-3 * std::max(dist, 1.0);
    double hi = dist - lo;
    for (const Tri& t : tris) {
        V3 pv = cross(u, t.e2);
        double det = dot(t.e1, pv);
        if (std::fabs(det) < 1e-12) continue;
        double inv = 1.0 / det;
        V3 tv = p - t.p0;
        double uu = dot(tv, pv) * inv;
        if (uu < 0.0 || uu > 1.0) continue;
        V3 qv = cross(tv, t.e1);
        double vv = dot(u, qv) * inv;
        if (vv < 0.0 || uu + vv > 1.0) continue;
        double tt = dot(t.e2, qv) * inv;
        if (tt > lo && tt < hi) return true;
    }
    return false;
}

static double hg(double g, double c) {
    double temp = std::max(1.0 + g * g + 2.0 * g * c, 1e-12);
    return (1.0 / (4.0 * M_PI)) * (1.0 - g * g)
        / (temp * std::sqrt(temp));
}

// splitmix64 -> U[0,1); only used by --bench (test mode pins u = u_fix)
static inline double rng_u01(uint64_t* s) {
    uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    z ^= z >> 31;
    return (double)(z >> 11) * (1.0 / 9007199254740992.0);
}

// Heterogeneous (grid) medium state — mirrors the JAX grid-media
// conventions (media/heterogeneous.py): supersampled-NN density
// lookups (lookup_density_nn:157-174), NQ-step midpoint cumulative-OD
// tables with linear interpolation (cumulative_od:325-375), fresh
// uv_steps midpoint quadrature for the U<->V segment, and
// pdfFailure = exp(-chan * od(S->V)) with chan = mean sigma_t
// (integrate.py:257-267). The supersampled grid itself is a shared
// INPUT (exported by the test); the independent re-implementation is
// the indexing, quadrature, tables, and estimator wiring.
struct Grid {
    int hetero = 0;
    double scale = 1.0;
    int uv_steps = 4, nq = 16;
    double st[3], ss_col[3];  // sigma_t_color, sigma_s_color
    double chan;
    int nz = 0, ny = 0, nx = 0;        // supersampled dims
    V3 bmin, bmax;
    std::vector<double> ss;            // [z][y][x]

    double dens(V3 p) const {
        double qx = (p.x - bmin.x) / (bmax.x - bmin.x);
        double qy = (p.y - bmin.y) / (bmax.y - bmin.y);
        double qz = (p.z - bmin.z) / (bmax.z - bmin.z);
        if (qx < 0.0 || qx > 1.0 || qy < 0.0 || qy > 1.0 || qz < 0.0
            || qz > 1.0)
            return 0.0;
        auto idx = [](double q, int n) {
            long i = std::lround(q * (n - 1));
            if (i < 0) i = 0;
            if (i > n - 1) i = n - 1;
            return (int)i;
        };
        int ix = idx(qx, nx), iy = idx(qy, ny), iz = idx(qz, nz);
        return scale * ss[((size_t)iz * ny + iy) * nx + ix];
    }

    // midpoint-rule OD over [a, b] with n steps (optical_depth:292-322)
    double od(V3 a, V3 b, int n) const {
        V3 d = b - a;
        double dist = len(d);
        double total = 0.0;
        for (int i = 0; i < n; ++i) {
            double t = (i + 0.5) / n;
            total += dens(a + d * t);
        }
        return total * dist / n;
    }

    // cumulative table: cum[k] = OD of the first k/nq of [a, b]
    void table(V3 a, V3 b, std::vector<double>& cum) const {
        V3 d = b - a;
        double dist = len(d);
        cum.assign(nq + 1, 0.0);
        for (int i = 0; i < nq; ++i) {
            double t = (i + 0.5) / nq;
            cum[i + 1] = cum[i] + dens(a + d * t);
        }
        for (int i = 0; i <= nq; ++i) cum[i] *= dist / nq;
    }

    double interp(const std::vector<double>& cum, double frac) const {
        double x = std::min(std::max(frac, 0.0), 1.0) * nq;
        int k0 = (int)std::floor(x);
        if (k0 > nq - 1) k0 = nq - 1;
        double w = x - k0;
        return cum[k0] * (1.0 - w) + cum[k0 + 1] * w;
    }
};

// Per-slice clustered representative sets (the render-time clustered
// lookup, getClusteredVrlContributions vrlIntegrator.cpp:542-599:
// per-ray slice id -> sum of weight_i * integrateVRL(ray, vrl_i)).
struct Clusters {
    int enabled = 0;
    std::vector<std::vector<std::pair<int, double>>> slices;
    std::vector<int> ray_slice;
};

struct Params {
    double sa[3], ss[3], st[3], g, msw;
    int s_vv, s_vs, short_vrls;
    double u_fix;
    const std::vector<Tri>* tris;
    const std::vector<Vrl>* vrls;
    const Grid* grid = nullptr;
};

static const double H_EPS = 1e-6;

// One (ray, vrl) pair's contribution, scaled by `weight` (clustered
// representative weight; 1 for the unclustered sum). eye_tab: the
// per-ray cumulative-OD table (hetero only). rng == nullptr -> fixed
// uniforms (test mode).
static void eval_pair(const Params& P, const Ray& r, V3 evec,
                      double elen, const std::vector<double>& eye_tab,
                      const Vrl& vr, double weight, double out[3],
                      uint64_t* rng) {
    const double* ss = P.ss;
    const double* st = P.st;
    const Grid* G = P.grid;
    const bool het = G && G->hetero;
    if (het) { ss = G->ss_col; st = G->st; }
    std::vector<double> vtab;
    if (het) G->table(vr.s, vr.e, vtab);
    {
        V3 vd = vr.e - vr.s;
        double vlen = std::max(len(vd), 1e-15);
        V3 vu = vd * (1.0 / vlen);

        // clamped segment-segment closest points
        // (getClosestPoints, vrlIntegrator.cpp:962-1032)
        V3 w0 = r.o - vr.s;
        double a = dot(evec, evec), b = dot(evec, vd),
               c = dot(vd, vd), dd = dot(evec, w0),
               e = dot(vd, w0);
        double den = a * c - b * b;
        double sc, tc;
        if (den < 1e-9 * a * c + 1e-30) {
            sc = 0.0;
            tc = (c > 0) ? e / c : 0.0;
        } else {
            sc = (b * e - c * dd) / den;
            tc = (a * e - b * dd) / den;
        }
        if (sc < 0) { sc = 0; tc = (c > 0) ? e / c : 0; }
        else if (sc > 1) { sc = 1; tc = (c > 0) ? (e + b) / c : 0; }
        if (tc < 0) {
            tc = 0;
            sc = std::min(std::max(-dd / std::max(a, 1e-30), 0.0), 1.0);
        } else if (tc > 1) {
            tc = 1;
            sc = std::min(
                std::max((-dd + b) / std::max(a, 1e-30), 0.0), 1.0);
        }
        V3 diff = (r.o + evec * sc) - (vr.s + vd * tc);
        double h = std::max(len(diff), H_EPS);

        double cos_th = dot(norm(evec), vu);
        double sin_th = std::sqrt(std::max(1.0 - cos_th * cos_th, 0.0));
        bool near_par = sin_th < 1e-4;
        double sin_safe = std::max(sin_th, 1e-4);
        double arc_h = tc * vlen;
        double a0 = std::asinh(-arc_h / h * sin_safe);
        double a1 = std::asinh((vlen - arc_h) / h * sin_safe);

        // ---- vol-vol samples ----
        for (int k = 0; k < P.s_vv; ++k) {
            double u1 = rng ? rng_u01(rng) : P.u_fix;
            double u2 = rng ? rng_u01(rng) : P.u_fix;
            double arc_v, pdf_v;
            if (near_par) {
                arc_v = u1 * vlen;
                pdf_v = 1.0 / vlen;
            } else {
                double nv = h * std::sinh(a0 + u1 * (a1 - a0)) / sin_safe;
                double inv_dist = 1.0 / std::sqrt(std::max(
                    h * h + nv * nv * sin_safe * sin_safe, 1e-30));
                double denom = std::max((a1 - a0) / sin_safe, 1e-30);
                arc_v = nv + arc_h;
                pdf_v = inv_dist / denom;
            }
            V3 vpt = vr.s + vu * arc_v;

            // Kulla equi-angular along the eye ray around vpt
            V3 eu = norm(evec);
            double dot_pr = dot(eu, vpt - r.o);
            V3 ipt = r.o + eu * dot_pr;
            double dis = std::max(len(vpt - ipt), H_EPS);
            double aa = std::atan(std::fabs(dot_pr) / dis);
            double bb = std::atan(std::fabs(elen - dot_pr) / dis);
            if (dot_pr > 0) {
                aa = -aa;
                if (std::fabs(dot_pr) > elen) bb = -bb;
            }
            double t = dis * std::tan((1.0 - u2) * aa + u2 * bb);
            double span = bb - aa;
            double pdf_u =
                std::fabs(span) > 1e-12
                    ? dis / std::max(span * (dis * dis + t * t), 1e-30)
                    : 0.0;
            double arc_u = dot_pr + t;
            V3 upt = r.o + eu * arc_u;

            double pdf = pdf_v * pdf_u;
            V3 uv = upt - vpt;
            double d_uv2 = dot(uv, uv);
            if (!(d_uv2 > 0.0) || !(pdf > 0.0)) continue;
            if (occluded(*P.tris, upt, vpt)) continue;
            double d_uv = std::sqrt(d_uv2);
            V3 vudir = uv * (1.0 / d_uv);
            double d_eu = std::fabs(arc_u);
            double d_sv = std::fabs(arc_v);
            double ph_u = hg(P.g, dot(vudir, eu));
            double ph_v = hg(P.g, -dot(vu, vudir));
            double geo = ph_u * ph_v / std::max(pdf * d_uv2, 1e-30);
            const double* pw = &vr.power.x;
            if (het) {
                double od_eu = G->interp(eye_tab, d_eu / elen);
                double od_sv = G->interp(
                    vtab, std::min(std::max(arc_v / vlen, 0.0), 1.0));
                double od_uv = G->od(upt, vpt, G->uv_steps);
                double dens_u = G->dens(upt);
                double dens_v = G->dens(vpt);
                if (P.short_vrls)  // grid pdfFailure, no msw mixture
                    geo /= std::max(std::exp(-G->chan * od_sv), 1e-30);
                double od_all = od_eu + od_uv + od_sv;
                for (int ch = 0; ch < 3; ++ch)
                    out[ch] += weight * pw[ch] * (ss[ch] * dens_v)
                        * (ss[ch] * dens_u)
                        * std::exp(-st[ch] * od_all) * geo / P.s_vv;
            } else {
                if (P.short_vrls) {
                    double pf = (std::exp(-st[0] * d_sv)
                                 + std::exp(-st[1] * d_sv)
                                 + std::exp(-st[2] * d_sv)) / 3.0;
                    pf = P.msw * pf + (1.0 - P.msw);
                    geo /= std::max(pf, 1e-30);
                }
                double ddist = d_eu + d_uv + d_sv;
                for (int ch = 0; ch < 3; ++ch)
                    out[ch] += weight * pw[ch] * ss[ch] * ss[ch]
                        * std::exp(-st[ch] * ddist) * geo / P.s_vv;
            }
        }

        // ---- vol-surf samples ----
        bool alb_any = (r.alb.x + r.alb.y + r.alb.z) > 0.0;
        for (int k = 0; k < P.s_vs && alb_any; ++k) {
            double u1 = rng ? rng_u01(rng) : P.u_fix;
            double dot_pr = dot(vu, r.hit - vr.s);
            V3 ipt = vr.s + vu * dot_pr;
            double dis = std::max(len(r.hit - ipt), H_EPS);
            double aa = std::atan(std::fabs(dot_pr) / dis);
            double bb = std::atan(std::fabs(vlen - dot_pr) / dis);
            if (dot_pr > 0) {
                aa = -aa;
                if (std::fabs(dot_pr) > vlen) bb = -bb;
            }
            double t = dis * std::tan((1.0 - u1) * aa + u1 * bb);
            double span = bb - aa;
            double pdf_v =
                std::fabs(span) > 1e-12
                    ? dis / std::max(span * (dis * dis + t * t), 1e-30)
                    : 0.0;
            double arc_v = dot_pr + t;
            V3 vpt = vr.s + vu * arc_v;
            V3 uv = r.hit - vpt;
            double d_uv2 = dot(uv, uv);
            if (!(d_uv2 > 0.0) || !(pdf_v > 0.0)) continue;
            if (occluded(*P.tris, r.hit, vpt)) continue;
            double d_uv = std::sqrt(d_uv2);
            V3 vudir = uv * (1.0 / d_uv);
            double d_sv = std::fabs(arc_v);
            double cos_o = std::max(dot(r.ng, vudir * -1.0), 0.0);
            double ph_v = hg(P.g, -dot(vu, vudir));
            double geo = ph_v * cos_o * (1.0 / M_PI)
                / std::max(pdf_v * d_uv2, 1e-30);
            const double* pw = &vr.power.x;
            const double* albp = &r.alb.x;
            if (het) {
                double od_sv = G->interp(
                    vtab, std::min(std::max(arc_v / vlen, 0.0), 1.0));
                double od_uv = G->od(r.hit, vpt, G->uv_steps);
                double dens_v = G->dens(vpt);
                if (P.short_vrls)
                    geo /= std::max(std::exp(-G->chan * od_sv), 1e-30);
                double od_all = od_uv + od_sv;
                for (int ch = 0; ch < 3; ++ch) {
                    // tau(E->Usurf): the full eye table (same-medium
                    // quirk, vrlIntegrator.cpp:714)
                    double tau_eu =
                        std::exp(-st[ch] * eye_tab[G->nq]);
                    out[ch] += weight * pw[ch] * (ss[ch] * dens_v)
                        * albp[ch] * tau_eu
                        * std::exp(-st[ch] * od_all) * geo / P.s_vs;
                }
            } else {
                if (P.short_vrls) {
                    double pf = (std::exp(-st[0] * d_sv)
                                 + std::exp(-st[1] * d_sv)
                                 + std::exp(-st[2] * d_sv)) / 3.0;
                    pf = P.msw * pf + (1.0 - P.msw);
                    geo /= std::max(pf, 1e-30);
                }
                // tau(E -> Usurf) with the VRL medium (the reference's
                // same-medium quirk, vrlIntegrator.cpp:714)
                double ddist = d_uv + d_sv;
                for (int ch = 0; ch < 3; ++ch) {
                    double tau_eu = std::exp(-st[ch] * elen);
                    out[ch] += weight * pw[ch] * ss[ch] * albp[ch]
                        * tau_eu
                        * std::exp(-st[ch] * ddist) * geo / P.s_vs;
                }
            }
        }
    }
}

// One ray's full unclustered VRL sum.
static void eval_ray(const Params& P, const Ray& r, double out[3],
                     uint64_t* rng) {
    out[0] = out[1] = out[2] = 0.0;
    if (!r.valid) return;
    V3 evec = r.hit - r.o;
    double elen = std::max(len(evec), 1e-15);
    std::vector<double> eye_tab;
    if (P.grid && P.grid->hetero) P.grid->table(r.o, r.hit, eye_tab);
    for (const Vrl& vr : *P.vrls)
        eval_pair(P, r, evec, elen, eye_tab, vr, 1.0, out, rng);
}

// Clustered: per-ray slice id -> weighted representative sum
// (getClusteredVrlContributions, vrlIntegrator.cpp:542-599).
static void eval_ray_clustered(const Params& P, const Clusters& Cl,
                               int ri, const Ray& r, double out[3],
                               uint64_t* rng) {
    out[0] = out[1] = out[2] = 0.0;
    if (!r.valid) return;
    int sid = Cl.ray_slice[ri];
    if (sid < 0 || sid >= (int)Cl.slices.size()) return;
    V3 evec = r.hit - r.o;
    double elen = std::max(len(evec), 1e-15);
    std::vector<double> eye_tab;
    if (P.grid && P.grid->hetero) P.grid->table(r.o, r.hit, eye_tab);
    for (const auto& rep : Cl.slices[sid])
        eval_pair(P, r, evec, elen, eye_tab, (*P.vrls)[rep.first],
                  rep.second, out, rng);
}

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr,
                     "usage: vrl_oracle scene.txt vrls.txt pcount\n");
        return 2;
    }
    FILE* f = std::fopen(argv[1], "r");
    if (!f) { std::perror("scene"); return 2; }
    double sa[3], ss[3], g, msw;
    int s_vv, s_vs, short_vrls;
    double u_fix;
    char tag[32];
    if (std::fscanf(f, "%31s %lf %lf %lf %lf %lf %lf %lf %lf", tag,
                    &sa[0], &sa[1], &sa[2], &ss[0], &ss[1], &ss[2], &g,
                    &msw) != 9 || std::strcmp(tag, "medium")) {
        std::fprintf(stderr, "bad medium line\n");
        return 2;
    }
    if (std::fscanf(f, "%31s %d %d %d %lf", tag, &s_vv, &s_vs,
                    &short_vrls, &u_fix) != 5
        || std::strcmp(tag, "config")) {
        std::fprintf(stderr, "bad config line\n");
        return 2;
    }
    double st[3] = {sa[0] + ss[0], sa[1] + ss[1], sa[2] + ss[2]};
    int n_tris;
    if (std::fscanf(f, "%31s %d", tag, &n_tris) != 2
        || std::strcmp(tag, "tris")) return 2;
    std::vector<Tri> tris(n_tris);
    for (Tri& t : tris)
        if (std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %lf %lf",
                        &t.p0.x, &t.p0.y, &t.p0.z, &t.e1.x, &t.e1.y,
                        &t.e1.z, &t.e2.x, &t.e2.y, &t.e2.z) != 9)
            return 2;
    int n_rays;
    if (std::fscanf(f, "%31s %d", tag, &n_rays) != 2
        || std::strcmp(tag, "rays")) return 2;
    std::vector<Ray> rays(n_rays);
    for (Ray& r : rays)
        if (std::fscanf(f,
                        "%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                        "%lf %lf %lf %lf %d",
                        &r.o.x, &r.o.y, &r.o.z, &r.d.x, &r.d.y, &r.d.z,
                        &r.hit.x, &r.hit.y, &r.hit.z, &r.ng.x, &r.ng.y,
                        &r.ng.z, &r.alb.x, &r.alb.y, &r.alb.z,
                        &r.valid) != 16)
            return 2;

    // optional trailing sections: "hetero" (grid medium) / "clusters"
    Grid grid;
    Clusters clusters;
    while (std::fscanf(f, "%31s", tag) == 1) {
        if (!std::strcmp(tag, "hetero")) {
            grid.hetero = 1;
            if (std::fscanf(f, "%lf %d %d %lf %lf %lf %lf %lf %lf",
                            &grid.scale, &grid.uv_steps, &grid.nq,
                            &grid.st[0], &grid.st[1], &grid.st[2],
                            &grid.ss_col[0], &grid.ss_col[1],
                            &grid.ss_col[2]) != 9)
                return 2;
            grid.chan = (grid.st[0] + grid.st[1] + grid.st[2]) / 3.0;
            char gt[32];
            if (std::fscanf(f, "%31s %d %d %d %lf %lf %lf %lf %lf %lf",
                            gt, &grid.nz, &grid.ny, &grid.nx,
                            &grid.bmin.x, &grid.bmin.y, &grid.bmin.z,
                            &grid.bmax.x, &grid.bmax.y, &grid.bmax.z)
                    != 10 || std::strcmp(gt, "grid"))
                return 2;
            grid.ss.resize((size_t)grid.nz * grid.ny * grid.nx);
            for (double& v : grid.ss)
                if (std::fscanf(f, "%lf", &v) != 1) return 2;
        } else if (!std::strcmp(tag, "clusters")) {
            clusters.enabled = 1;
            int n_slices;
            if (std::fscanf(f, "%d", &n_slices) != 1) return 2;
            clusters.slices.resize(n_slices);
            for (auto& sl : clusters.slices) {
                int n_reps;
                if (std::fscanf(f, "%d", &n_reps) != 1) return 2;
                sl.resize(n_reps);
                for (auto& rep : sl)
                    if (std::fscanf(f, "%d %lf", &rep.first,
                                    &rep.second) != 2)
                        return 2;
            }
            char rt[32];
            int n_rs;
            if (std::fscanf(f, "%31s %d", rt, &n_rs) != 2
                || std::strcmp(rt, "rayslice") || n_rs != n_rays)
                return 2;
            clusters.ray_slice.resize(n_rs);
            for (int& s : clusters.ray_slice)
                if (std::fscanf(f, "%d", &s) != 1) return 2;
        } else {
            std::fprintf(stderr, "unknown section %s\n", tag);
            return 2;
        }
    }
    std::fclose(f);

    // reference ASCII vrlFile (VRL.h:43-73): particle count line, then
    // "x0 y0 z0 x1 y1 z1 r g b"
    f = std::fopen(argv[2], "r");
    if (!f) { std::perror("vrls"); return 2; }
    double pcount = std::atof(argv[3]);
    std::vector<Vrl> vrls;
    for (;;) {
        Vrl v;
        int got = std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %lf %lf",
                              &v.s.x, &v.s.y, &v.s.z, &v.e.x, &v.e.y,
                              &v.e.z, &v.power.x, &v.power.y,
                              &v.power.z);
        if (got != 9) break;
        vrls.push_back(v);
    }
    std::fclose(f);

    Params P;
    std::memcpy(P.sa, sa, sizeof sa);
    std::memcpy(P.ss, ss, sizeof ss);
    std::memcpy(P.st, st, sizeof st);
    P.g = g; P.msw = msw;
    P.s_vv = s_vv; P.s_vs = s_vs; P.short_vrls = short_vrls;
    P.u_fix = u_fix;
    P.tris = &tris; P.vrls = &vrls;
    P.grid = grid.hetero ? &grid : nullptr;

    if (argc >= 6 && !std::strcmp(argv[4], "--bench")) {
        int reps = std::atoi(argv[5]);
        int nthreads = (argc >= 7) ? std::atoi(argv[6]) : 1;
        auto t0 = std::chrono::steady_clock::now();
        std::vector<double> sums(nthreads, 0.0);
        auto work = [&](int tid) {
            uint64_t rng = 0x123456789abcdefULL + 0x9e3779b9ULL * tid;
            double acc = 0.0;
            for (int rep = 0; rep < reps; ++rep)
                for (size_t i = tid; i < rays.size();
                     i += (size_t)nthreads) {
                    double out[3];
                    eval_ray(P, rays[i], out, &rng);
                    acc += out[0] + out[1] + out[2];
                }
            sums[tid] = acc;
        };
        std::vector<std::thread> ths;
        for (int tdx = 0; tdx < nthreads; ++tdx)
            ths.emplace_back(work, tdx);
        for (auto& th : ths) th.join();
        double secs = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        long n_valid = 0;
        for (const Ray& r : rays) n_valid += r.valid ? 1 : 0;
        double checksum = 0.0;
        for (double s : sums) checksum += s;
        // pair-sample evals: every (valid ray, VRL) pair draws s_vv
        // vol-vol + s_vs vol-surf samples (matches bench.py's count)
        double evals = (double)n_valid * (double)vrls.size()
            * (double)(P.s_vv + P.s_vs) * (double)reps;
        std::printf("{\"pair_sample_evals\": %.0f, \"seconds\": %.6f, "
                    "\"evals_per_s\": %.6g, \"threads\": %d, "
                    "\"checksum\": %.6g}\n",
                    evals, secs, evals / secs, nthreads, checksum);
        return 0;
    }

    for (int ri = 0; ri < n_rays; ++ri) {
        double out[3];
        if (clusters.enabled)
            eval_ray_clustered(P, clusters, ri, rays[ri], out, nullptr);
        else
            eval_ray(P, rays[ri], out, nullptr);
        std::printf("%.10e %.10e %.10e\n", out[0] / pcount,
                    out[1] / pcount, out[2] / pcount);
    }
    return 0;
}

