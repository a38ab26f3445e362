// Native host DP kernels for the Plan7 pipeline.
//
// Like the reference's striped SIMD implementations, Forward/Backward run
// in *odds space* (probabilities relative to background) with sparse
// rescaling -- multiply/add only, no per-cell transcendentals -- and the
// results are converted back to log space on output.  Agreement with the
// float64 log-space NumPy oracle is at the 1e-9 nat level (rescale
// rounding), far inside the reported-score tolerance.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr double NEGMASS = -1e30;
constexpr double RESCALE_HI = 1e250;
constexpr double TINY = 1e-290;

inline double xexp(double a) { return a <= -5e29 ? 0.0 : std::exp(a); }

inline double xlog(double a, double sc) {
    return a > 0.0 ? std::log(a) + sc : NEGMASS;
}

struct ExpProf {
    double *eBM, *eMM, *eIM, *eDM, *eMD, *eDD, *eMI, *eII;
    double *ems, *eis;          // [Kp * (M+1)] odds
    double eE[2], eN[2], eJ[2], eC[2];
    int M, Kp;

    ExpProf(const double* tBM, const double* tMM, const double* tIM,
            const double* tDM, const double* tMD, const double* tDD,
            const double* tMI, const double* tII,
            const double* msc, const double* isc,
            const double* xE, const double* xN, const double* xJ,
            const double* xC, int M_, int Kp_) : M(M_), Kp(Kp_) {
        int W = M + 1;
        eBM = new double[M]; eMM = new double[M]; eIM = new double[M];
        eDM = new double[M]; eMD = new double[M]; eDD = new double[M];
        eMI = new double[W]; eII = new double[W];
        ems = new double[(size_t)Kp * W]; eis = new double[(size_t)Kp * W];
        for (int k = 0; k < M; k++) {
            eBM[k] = xexp(tBM[k]); eMM[k] = xexp(tMM[k]);
            eIM[k] = xexp(tIM[k]); eDM[k] = xexp(tDM[k]);
            eMD[k] = xexp(tMD[k]); eDD[k] = xexp(tDD[k]);
        }
        for (int k = 0; k < W; k++) { eMI[k] = xexp(tMI[k]); eII[k] = xexp(tII[k]); }
        for (size_t i = 0; i < (size_t)Kp * W; i++) {
            ems[i] = xexp(msc[i]); eis[i] = xexp(isc[i]);
        }
        for (int j = 0; j < 2; j++) {
            eE[j] = xexp(xE[j]); eN[j] = xexp(xN[j]);
            eJ[j] = xexp(xJ[j]); eC[j] = xexp(xC[j]);
        }
    }
    ~ExpProf() {
        delete[] eBM; delete[] eMM; delete[] eIM; delete[] eDM;
        delete[] eMD; delete[] eDD; delete[] eMI; delete[] eII;
        delete[] ems; delete[] eis;
    }
};

}  // namespace

extern "C" {

double hmmdp_forward(
    const uint8_t* dsq, int32_t L,
    const double* tBM, const double* tMM, const double* tIM,
    const double* tDM, const double* tMD, const double* tDD,
    const double* tMI, const double* tII,
    const double* msc, const double* isc,
    const double* xE, const double* xN, const double* xJ, const double* xC,
    int32_t M, int32_t Kp,
    double* xNv, double* xBv, double* xEv, double* xCv, double* xJv,
    double* Mm, double* Im, double* Dm, int32_t keep) {
    ExpProf P(tBM, tMM, tIM, tDM, tMD, tDD, tMI, tII, msc, isc,
              xE, xN, xJ, xC, M, Kp);
    const int W = M + 1;
    double* mrow = new double[W]();
    double* irow = new double[W]();
    double* drow = new double[W]();
    double* nm = new double[W]();
    double* ni = new double[W]();
    double* nd = new double[W]();

    // N is a pure product chain (never receives summed mass in Forward),
    // so it is tracked in log space to stay exact across rescales
    double logN = 0.0;
    double b_ = P.eN[1], j_ = 0.0, c_ = 0.0;   // linear specials
    double logscale = 0.0;
    xNv[0] = 0.0; xBv[0] = std::log(b_);
    xEv[0] = xCv[0] = xJv[0] = NEGMASS;
    if (keep) for (int k = 0; k < W; k++) Mm[k] = Im[k] = Dm[k] = NEGMASS;

    for (int i = 1; i <= L; i++) {
        const double* ms = P.ems + (size_t)dsq[i - 1] * W;
        const double* is = P.eis + (size_t)dsq[i - 1] * W;
        nm[0] = 0.0; ni[0] = 0.0; nd[0] = 0.0;
        double bprev = b_;
        for (int k = 1; k <= M; k++) {
            nm[k] = ms[k] * (mrow[k - 1] * P.eMM[k - 1]
                             + irow[k - 1] * P.eIM[k - 1]
                             + drow[k - 1] * P.eDM[k - 1]
                             + bprev * P.eBM[k - 1]);
        }
        for (int k = 1; k < M; k++)
            ni[k] = is[k] * (mrow[k] * P.eMI[k] + irow[k] * P.eII[k]);
        for (int k = std::max(M, 1); k < W; k++) ni[k] = 0.0;
        if (M >= 1) nd[1] = 0.0;
        for (int k = 2; k <= M; k++)
            nd[k] = nm[k - 1] * P.eMD[k - 1] + nd[k - 1] * P.eDD[k - 1];
        double e = 0.0;
        for (int k = 1; k <= M; k++) e += nm[k];
        for (int k = 1; k <= M; k++) e += nd[k];
        j_ = j_ * P.eJ[0] + e * P.eE[0];
        c_ = c_ * P.eC[0] + e * P.eE[1];
        logN += xN[0];
        double n_scaled = std::exp(logN - logscale);
        b_ = n_scaled * P.eN[1] + j_ * P.eJ[1];
        xEv[i] = xlog(e, logscale);
        xJv[i] = xlog(j_, logscale);
        xCv[i] = xlog(c_, logscale);
        xNv[i] = logN;
        xBv[i] = xlog(b_, logscale);
        std::swap(mrow, nm); std::swap(irow, ni); std::swap(drow, nd);
        if (keep) {
            double* Mo = Mm + (size_t)i * W;
            double* Io = Im + (size_t)i * W;
            double* Do = Dm + (size_t)i * W;
            Mo[0] = Io[0] = Do[0] = NEGMASS;
            for (int k = 1; k < W; k++) {
                Mo[k] = xlog(mrow[k], logscale);
                Io[k] = xlog(irow[k], logscale);
                Do[k] = xlog(drow[k], logscale);
            }
        }
        if (e > RESCALE_HI || (e > 0 && e < 1.0 / RESCALE_HI)) {
            double s = e;
            double inv = 1.0 / s;
            for (int k = 0; k < W; k++) {
                mrow[k] *= inv; irow[k] *= inv; drow[k] *= inv;
            }
            b_ *= inv; j_ *= inv; c_ *= inv;
            logscale += std::log(s);
        }
    }
    double score = xCv[L] + xC[1];
    delete[] mrow; delete[] irow; delete[] drow;
    delete[] nm; delete[] ni; delete[] nd;
    return score;
}

double hmmdp_backward(
    const uint8_t* dsq, int32_t L,
    const double* tBM, const double* tMM, const double* tIM,
    const double* tDM, const double* tMD, const double* tDD,
    const double* tMI, const double* tII,
    const double* msc, const double* isc,
    const double* xE, const double* xN, const double* xJ, const double* xC,
    int32_t M, int32_t Kp,
    double* xNv, double* xBv, double* xEv, double* xCv, double* xJv,
    double* Mm, double* Im, double* Dm, int32_t keep) {
    ExpProf P(tBM, tMM, tIM, tDM, tMD, tDD, tMI, tII, msc, isc,
              xE, xN, xJ, xC, M, Kp);
    const int W = M + 1;
    double* mrow = new double[W]();
    double* irow = new double[W]();
    double* drow = new double[W]();
    double* nm = new double[W]();
    double* ni = new double[W]();
    double* nd = new double[W]();

    double logscale = 0.0;
    double c_ = P.eC[1];
    double e_ = c_ * P.eE[1];
    double n_ = 0.0, b_ = 0.0, j_ = 0.0;
    xCv[L] = xlog(c_, 0.0);
    xEv[L] = xlog(e_, 0.0);
    xNv[L] = xBv[L] = xJv[L] = NEGMASS;
    drow[0] = 0.0;
    if (M >= 1) drow[M] = e_;
    for (int k = M - 1; k >= 1; k--)
        drow[k] = e_ + drow[k + 1] * P.eDD[k];
    mrow[0] = 0.0;
    for (int k = 1; k <= M; k++) mrow[k] = e_;
    for (int k = 1; k < M; k++)
        mrow[k] += drow[k + 1] * P.eMD[k];
    if (keep) {
        double* Mo = Mm + (size_t)L * W;
        double* Io = Im + (size_t)L * W;
        double* Do = Dm + (size_t)L * W;
        Mo[0] = Io[0] = Do[0] = NEGMASS;
        for (int k = 1; k < W; k++) {
            Mo[k] = xlog(mrow[k], 0.0);
            Io[k] = NEGMASS;
            Do[k] = xlog(drow[k], 0.0);
        }
    }

    for (int i = L - 1; i >= 0; i--) {
        const double* ms = P.ems + (size_t)dsq[i] * W;
        const double* is = P.eis + (size_t)dsq[i] * W;
        double b = 0.0;
        for (int k = 1; k <= M; k++)
            b += mrow[k] * P.eBM[k - 1] * ms[k];
        b_ = b;
        j_ = j_ * P.eJ[0] + b * P.eJ[1];
        c_ = c_ * P.eC[0];
        n_ = n_ * P.eN[0] + b * P.eN[1];
        e_ = j_ * P.eE[0] + c_ * P.eE[1];
        xBv[i] = xlog(b_, logscale);
        xJv[i] = xlog(j_, logscale);
        xCv[i] = xlog(c_, logscale);
        xNv[i] = xlog(n_, logscale);
        xEv[i] = xlog(e_, logscale);

        ni[0] = 0.0;
        for (int k = 1; k < M; k++)
            ni[k] = mrow[k + 1] * P.eIM[k] * ms[k + 1]
                    + irow[k] * P.eII[k] * is[k];
        for (int k = std::max(M, 1); k < W; k++) ni[k] = 0.0;
        nd[0] = 0.0;
        if (M >= 1) nd[M] = e_;
        for (int k = M - 1; k >= 1; k--)
            nd[k] = e_ + mrow[k + 1] * P.eDM[k] * ms[k + 1]
                    + nd[k + 1] * P.eDD[k];
        nm[0] = 0.0;
        for (int k = 1; k <= M; k++) nm[k] = e_;
        for (int k = 1; k < M; k++)
            nm[k] += mrow[k + 1] * P.eMM[k] * ms[k + 1]
                     + irow[k] * P.eMI[k] * is[k]
                     + nd[k + 1] * P.eMD[k];
        std::swap(mrow, nm); std::swap(irow, ni); std::swap(drow, nd);
        if (keep) {
            double* Mo = Mm + (size_t)i * W;
            double* Io = Im + (size_t)i * W;
            double* Do = Dm + (size_t)i * W;
            Mo[0] = Io[0] = Do[0] = NEGMASS;
            for (int k = 1; k < W; k++) {
                Mo[k] = xlog(mrow[k], logscale);
                Io[k] = xlog(irow[k], logscale);
                Do[k] = xlog(drow[k], logscale);
            }
        }
        double mx = 0.0;
        for (int k = 1; k < W; k++) mx = std::max(mx, mrow[k]);
        if (mx > RESCALE_HI || (mx > 0 && mx < 1.0 / RESCALE_HI)) {
            double inv = 1.0 / mx;
            for (int k = 0; k < W; k++) {
                mrow[k] *= inv; irow[k] *= inv; drow[k] *= inv;
            }
            n_ *= inv; b_ *= inv; j_ *= inv; c_ *= inv; e_ *= inv;
            logscale += std::log(mx);
        }
    }
    double score = xNv[0];
    delete[] mrow; delete[] irow; delete[] drow;
    delete[] nm; delete[] ni; delete[] nd;
    return score;
}

// Optimal accuracy DP (gated max-plus on posteriors; stays in log space --
// values are posterior sums, no transcendentals involved).
double hmmdp_optacc(
    const double* ppM, const double* ppI,   // [L+1, M+1]
    const double* ppN, const double* ppJ, const double* ppC,  // [L+1]
    const double* gMM, const double* gIM, const double* gDM,
    const double* gMD, const double* gDD,   // [M] gates (0 / NEGMASS)
    const double* gMI, const double* gII,   // [M+1]
    const double* gBM,                      // [M]
    int32_t eJ_ok, int32_t L, int32_t M,
    double* Mx, double* Ix, double* Dx,     // [L+1, M+1]
    double* xN, double* xB, double* xE, double* xJ, double* xC) {
    const int W = M + 1;
    for (int k = 0; k < W; k++) Mx[k] = Ix[k] = Dx[k] = NEGMASS;
    xN[0] = 0.0; xB[0] = 0.0;
    xE[0] = xJ[0] = xC[0] = NEGMASS;
    for (int i = 1; i <= L; i++) {
        double* mc = Mx + (size_t)i * W;
        double* ic = Ix + (size_t)i * W;
        double* dc = Dx + (size_t)i * W;
        const double* mp = Mx + (size_t)(i - 1) * W;
        const double* ip = Ix + (size_t)(i - 1) * W;
        const double* dp = Dx + (size_t)(i - 1) * W;
        const double* pm = ppM + (size_t)i * W;
        const double* pi = ppI + (size_t)i * W;
        mc[0] = ic[0] = dc[0] = NEGMASS;
        for (int k = 1; k <= M; k++) {
            double v = std::max(std::max(mp[k - 1] + gMM[k - 1],
                                         ip[k - 1] + gIM[k - 1]),
                                std::max(dp[k - 1] + gDM[k - 1],
                                         xB[i - 1] + gBM[k - 1]));
            mc[k] = pm[k] + v;
        }
        for (int k = 1; k < M; k++)
            ic[k] = pi[k] + std::max(mp[k] + gMI[k], ip[k] + gII[k]);
        for (int k = std::max(M, 1); k < W; k++) ic[k] = NEGMASS;
        if (M >= 1) dc[1] = NEGMASS;
        for (int k = 2; k <= M; k++)
            dc[k] = std::max(mc[k - 1] + gMD[k - 1], dc[k - 1] + gDD[k - 1]);
        double e = NEGMASS;
        for (int k = 1; k <= M; k++) e = std::max(e, mc[k]);
        if (M >= 1) e = std::max(e, dc[M]);
        xE[i] = e;
        xJ[i] = std::max(xJ[i - 1] + ppJ[i], eJ_ok ? e : NEGMASS);
        xC[i] = std::max(xC[i - 1] + ppC[i], e);
        xN[i] = xN[i - 1] + ppN[i];
        xB[i] = std::max(xN[i], xJ[i]);
    }
    return xC[L];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Stochastic traceback ensemble (region resolution + trace null2)
// ---------------------------------------------------------------------------
//
// Samples N paths from a (log-space) Forward matrix of a region and
// returns the sampled domain spans plus the per-position trace null2
// accumulation (p7_Null2_ByTrace per sampled domain, summed over samples;
// the caller divides by N).

namespace {

struct Rng {  // xoshiro256** -- fast, good quality for sampling
    uint64_t s[4];
    explicit Rng(uint64_t seed) {
        uint64_t z = seed + 0x9E3779B97F4A7C15ULL;
        for (int i = 0; i < 4; i++) {
            z ^= z >> 30; z *= 0xBF58476D1CE4E5B9ULL;
            z ^= z >> 27; z *= 0x94D049BB133111EBULL;
            z ^= z >> 31;
            s[i] = z + (z == 0);
            z += 0x9E3779B97F4A7C15ULL;
        }
    }
    static inline uint64_t rotl(uint64_t x, int k) {
        return (x << k) | (x >> (64 - k));
    }
    uint64_t next() {
        uint64_t result = rotl(s[1] * 5, 7) * 9;
        uint64_t t = s[1] << 17;
        s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3];
        s[2] ^= t; s[3] = rotl(s[3], 45);
        return result;
    }
    double uniform() {  // [0, 1)
        return (next() >> 11) * 0x1.0p-53;
    }
};

inline int choose(Rng& rng, const double* logp, int n) {
    // two-pass categorical draw (no scratch buffer; n can be M+1)
    double mx = NEGMASS;
    for (int i = 0; i < n; i++) mx = std::max(mx, logp[i]);
    if (mx <= -5e29) return 0;
    double tot = 0.0;
    for (int i = 0; i < n; i++) tot += std::exp(logp[i] - mx);
    double u = rng.uniform() * tot;
    for (int i = 0; i < n; i++) {
        u -= std::exp(logp[i] - mx);
        if (u <= 0) return i;
    }
    return n - 1;
}

}  // namespace

extern "C" {

// Returns the number of sampled spans written (up to max_spans).
// spans_out: per span [sample_idx, a, b] int32 triples.
// n2acc: [L+2] accumulated per-position null2 log-odds (caller /= N).
int32_t hmmdp_stotrace(
    const uint8_t* dsq, int32_t L,
    const double* Mm, const double* Im, const double* Dm,   // [L+1, W] log
    const double* xNv, const double* xBv, const double* xEv,
    const double* xCv, const double* xJv,                   // [L+1]
    const double* tBM, const double* tMM, const double* tIM,
    const double* tDM, const double* tMD, const double* tDD,
    const double* tMI, const double* tII,
    const double* xE, const double* xN, const double* xJ, const double* xC,
    const double* odds_m, const double* odds_i,             // [K, W]
    int32_t M, int32_t K, int32_t nsamples, uint64_t seed,
    int32_t* spans_out, int32_t max_spans, double* n2acc) {
    const int W = M + 1;
    Rng rng(seed);
    double* uM = new double[W];
    double* uI = new double[W];
    double* lp = new double[W + 1];
    int nspans = 0;

    for (int s = 0; s < nsamples; s++) {
        int state = 0;  // 0=C 1=E 2=M 3=D 4=I 5=B 6=J 7=N
        int i = L, k = 0, end_i = 0;
        int guard = 8 * (L + M) + 64;
        while (guard-- > 0) {
            // defensive: a numerically-degenerate matrix must not walk out
            // of bounds
            if (i < 0 || k < 0 || k > M) break;
            if ((state == 2 || state == 4) && i < 1) break;
            if (state == 0) {          // C
                double o0 = i > 0 ? xCv[i - 1] + xC[0] : NEGMASS;
                double o1 = xEv[i] + xE[1];
                double two[2] = {o0, o1};
                if (choose(rng, two, 2) == 0) i--;
                else state = 1;
            } else if (state == 1) {   // E
                end_i = i;
                for (int kk = 0; kk < W; kk++) { uM[kk] = 0; uI[kk] = 0; }
                for (int kk = 1; kk <= M; kk++) lp[kk - 1] = Mm[(size_t)i * W + kk];
                lp[M] = Dm[(size_t)i * W + M];
                int c = choose(rng, lp, M + 1);
                if (c == M) { state = 3; k = M; }
                else { state = 2; k = c + 1; }
            } else if (state == 2) {   // M
                uM[k] += 1;
                double o[4];
                o[0] = k >= 2 ? Mm[(size_t)(i - 1) * W + k - 1] + tMM[k - 1] : NEGMASS;
                o[1] = k >= 2 ? Im[(size_t)(i - 1) * W + k - 1] + tIM[k - 1] : NEGMASS;
                o[2] = k >= 2 ? Dm[(size_t)(i - 1) * W + k - 1] + tDM[k - 1] : NEGMASS;
                o[3] = xBv[i - 1] + tBM[k - 1];
                int c = choose(rng, o, 4);
                i--;
                if (c == 3) {
                    // domain span complete: record + trace null2
                    if (nspans < max_spans) {
                        spans_out[3 * nspans] = s;
                        spans_out[3 * nspans + 1] = i + 1;
                        spans_out[3 * nspans + 2] = end_i;
                        nspans++;
                    }
                    double tot = 0;
                    for (int kk = 0; kk <= M; kk++) tot += uM[kk] + uI[kk];
                    if (tot > 0) {
                        // null2[x] = sum_k (uM[k] odds_m[x,k] + uI[k] odds_i[x,k]) / tot
                        for (int pos = i + 1; pos <= end_i; pos++) {
                            uint8_t x = dsq[pos - 1];
                            if (x >= K) continue;
                            double v = 0;
                            const double* om_ = odds_m + (size_t)x * W;
                            const double* oi_ = odds_i + (size_t)x * W;
                            for (int kk = 1; kk <= M; kk++)
                                v += uM[kk] * om_[kk] + uI[kk] * oi_[kk];
                            double val = v / tot;
                            n2acc[pos] += val > 1e-30 ? std::log(val) : -69.0;
                        }
                    }
                    state = 5;
                } else if (c == 0) k--;
                else if (c == 1) { state = 4; k--; }
                else { state = 3; k--; }
            } else if (state == 3) {   // D
                double o0 = Mm[(size_t)i * W + k - 1] + tMD[k - 1];
                double o1 = Dm[(size_t)i * W + k - 1] + tDD[k - 1];
                double two[2] = {o0, o1};
                if (choose(rng, two, 2) == 0) { state = 2; k--; }
                else k--;
            } else if (state == 4) {   // I
                uI[k] += 1;
                double o0 = Mm[(size_t)(i - 1) * W + k] + tMI[k];
                double o1 = Im[(size_t)(i - 1) * W + k] + tII[k];
                double two[2] = {o0, o1};
                i--;
                if (choose(rng, two, 2) == 0) state = 2;
            } else if (state == 5) {   // B
                double o0 = xNv[i] + xN[1];
                double o1 = xJv[i] + xJ[1];
                double two[2] = {o0, o1};
                state = choose(rng, two, 2) == 0 ? 7 : 6;
            } else if (state == 6) {   // J
                double o0 = i > 0 ? xJv[i - 1] + xJ[0] : NEGMASS;
                double o1 = xEv[i] + xE[0];
                double two[2] = {o0, o1};
                if (choose(rng, two, 2) == 0) i--;
                else state = 1;
            } else {                   // N
                if (i == 0) break;
                i--;
            }
        }
    }
    delete[] uM; delete[] uI; delete[] lp;
    return nspans;
}

// ---------------------------------------------------------------------------
// SSV seeding for the long-targets (nhmmer) pipeline
// ---------------------------------------------------------------------------
//
// Quantized single-segment Viterbi scan over a long window: the per-row
// diagonal maximum is compared against a precomputed threshold (uint8 MSV
// units); rows where it crosses are reported as seed positions and the DP
// state is reset so one strong diagonal yields one seed burst instead of
// flooding the output.  The caller extends seeds by max_length and merges
// them into subwindows (p7_SSVFilter_longtarget +
// p7_pli_ExtendAndMergeWindows roles).

int64_t hmmdp_ssv_seed(
    const uint8_t* dsq, int64_t L,
    const int32_t* cost,     // [Kp, M] quantized biased emission costs
    int32_t bias_b, int32_t xBv,   // fixed diagonal entry value
    int32_t thresh,          // report rows where max_k sv >= thresh
    int32_t M, int32_t Kp,
    int64_t* pos_out, int64_t max_out) {
    (void)Kp;
    int16_t* mpv = new int16_t[M]();
    int16_t* nv = new int16_t[M];
    int64_t n = 0;
    const int16_t entry = (int16_t)std::min(xBv + bias_b, 255);
    for (int64_t i = 1; i <= L; i++) {
        const int32_t* c = cost + (size_t)dsq[i - 1] * M;
        int16_t mx = 0;
        int16_t v0 = (int16_t)std::max(entry - c[0], 0);
        mx = v0;
        int16_t prev_shift;
        for (int k = M - 1; k >= 1; k--) {
            prev_shift = mpv[k - 1] > xBv ? mpv[k - 1] : (int16_t)xBv;
            int16_t v = (int16_t)std::min(prev_shift + bias_b, 255) - (int16_t)c[k];
            if (v < 0) v = 0;
            nv[k] = v;
            if (v > mx) mx = v;
        }
        nv[0] = v0;
        if (mx >= thresh) {
            if (n < max_out) pos_out[n] = i;
            n++;
            std::memset(nv, 0, sizeof(int16_t) * M);
        }
        std::swap(mpv, nv);
    }
    delete[] mpv; delete[] nv;
    return n < max_out ? n : max_out;
}

}  // extern "C"
