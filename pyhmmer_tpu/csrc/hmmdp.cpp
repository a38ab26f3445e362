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
