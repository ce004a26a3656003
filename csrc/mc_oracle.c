/* Monte Carlo plane-parallel radiative-transfer oracle.
 *
 * Compiled third-party-class reference for the DISORT solver's fluxes
 * (BASELINE.md acceptance: "SW+LW flux RMSE vs cdisort").  The cdisort
 * C source is not present in the reference checkout (it is fetched at
 * configure time from the external pydisort package; this environment has
 * no network), so the independent compiled oracle is this Monte Carlo
 * photon transport: a genuinely different solution method (no angular
 * discretization, no Fourier expansion, no eigenproblem — nothing shared
 * with the discrete-ordinates implementation under test), in a different
 * language, whose systematic error is zero and statistical error is
 * ~1/sqrt(n_photons).
 *
 * Physics covered (the flux-path feature matrix):
 *   - multi-layer atmospheres: per-layer dtau, ssa, Henyey-Greenstein g
 *     (g = 0 -> isotropic), layers top-down;
 *   - collimated beam at mu0 (unit flux normalization F = mu0*fbeam
 *     entering TOA per unit horizontal area);
 *   - isotropic top illumination (fisot);
 *   - internal thermal emission with linear-in-tau Planck profile per
 *     layer (emission density (1-ssa) B(tau), two-sided isotropic);
 *   - Lambertian surface with albedo and emission (1-albedo)*B_surface;
 *   - tallies: upward and downward (diffuse+direct) flux at every level.
 *
 * Sampling notes: distance to next event ~ exp in optical depth;
 * scattering vs absorption by Russian roulette on ssa; HG direction via
 * the exact inverse-CDF; thermal emission photons launched per layer with
 * linear-in-tau position sampling; all tallies are expected-value
 * (photon-count) estimators, so flux conservation is exact in expectation.
 *
 * RNG: xoshiro256++ (public recurrence), per-run seed.
 */

#define _USE_MATH_DEFINES
#include <math.h>
#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static inline uint64_t rotl(const uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

typedef struct { uint64_t s[4]; } rng_t;

static uint64_t splitmix64(uint64_t *x) {
  uint64_t z = (*x += 0x9E3779B97f4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

static void rng_seed(rng_t *r, uint64_t seed) {
  for (int i = 0; i < 4; i++) r->s[i] = splitmix64(&seed);
}

static inline uint64_t rng_next(rng_t *r) {
  const uint64_t result = rotl(r->s[0] + r->s[3], 23) + r->s[0];
  const uint64_t t = r->s[1] << 17;
  r->s[2] ^= r->s[0];
  r->s[3] ^= r->s[1];
  r->s[1] ^= r->s[2];
  r->s[0] ^= r->s[3];
  r->s[2] ^= t;
  r->s[3] = rotl(r->s[3], 45);
  return result;
}

static inline double urand(rng_t *r) {
  return (double)(rng_next(r) >> 11) * 0x1.0p-53;
}

/* ------------------------------------------------------------------ */

typedef struct {
  int nlyr;
  const double *dtau;   /* per layer, top-down */
  const double *ssa;
  const double *g;      /* HG asymmetry per layer */
  const double *taucum; /* cumulative, length nlyr+1, taucum[0] = 0 */
  double albedo;
  /* tallies: up[lvl], dn[lvl] — photon-weight crossings per level */
  double *up;
  double *dn;
} atmo_t;

static int find_layer(const atmo_t *a, double tau) {
  /* layer l spans [taucum[l], taucum[l+1]); bisection */
  int lo = 0, hi = a->nlyr - 1;
  while (lo < hi) {
    int mid = (lo + hi + 1) >> 1;
    if (tau >= a->taucum[mid]) lo = mid; else hi = mid - 1;
  }
  return lo;
}

/* track one photon from (tau, mu) with weight wgt until it exits or dies.
 * mu > 0 means DOWNWARD here (increasing tau).  Crossing tallies are
 * recorded at every level passed. */
static void track(const atmo_t *a, rng_t *r, double tau, double mu,
                  double wgt) {
  const double taumax = a->taucum[a->nlyr];
  for (int bounce = 0; bounce < 100000; bounce++) {
    if (wgt < 1e-12) return;
    /* optical path to next interaction */
    double s = -log(1.0 - urand(r));
    double dtau_v = s * fabs(mu);
    double tnew = (mu > 0.0) ? tau + dtau_v : tau - dtau_v;

    if (mu > 0.0) {
      /* tally downward crossings of levels in (tau, min(tnew, taumax)] */
      double tstop = (tnew < taumax) ? tnew : taumax;
      for (int l = find_layer(a, tau) + 1;
           l <= a->nlyr && a->taucum[l] <= tstop; l++)
        a->dn[l] += wgt;
      if (tnew >= taumax) {
        /* hit the surface: Lambertian reflection + absorption */
        wgt *= a->albedo;
        if (wgt < 1e-12) return;
        /* Lambertian: mu ~ sqrt(u) upward */
        mu = -sqrt(urand(r));
        tau = taumax;
        a->up[a->nlyr] += wgt;  /* reflected counts as upward at surface */
        continue;
      }
    } else {
      /* tally upward crossings of levels in [max(tnew, 0), tau) */
      double tstop = (tnew > 0.0) ? tnew : 0.0;
      for (int l = find_layer(a, tau);
           l >= 0 && a->taucum[l] >= tstop; l--)
        if (a->taucum[l] < tau) a->up[l] += wgt;
      if (tnew <= 0.0) return;  /* escaped TOA */
    }
    tau = tnew;

    /* interaction in layer l */
    int l = find_layer(a, tau);
    wgt *= a->ssa[l];          /* survival (implicit absorption) */
    if (wgt < 1e-12) return;
    /* scatter: HG with asymmetry g (exact inversion) */
    double gg = a->g[l];
    double cth;
    if (fabs(gg) < 1e-8) {
      cth = 2.0 * urand(r) - 1.0;
    } else {
      double u = urand(r);
      double q = (1.0 - gg * gg) / (1.0 - gg + 2.0 * gg * u);
      cth = (1.0 + gg * gg - q * q) / (2.0 * gg);
      if (cth > 1.0) cth = 1.0;
      if (cth < -1.0) cth = -1.0;
    }
    double phi = 6.283185307179586 * urand(r);
    /* rotate: new polar cosine w.r.t. vertical.  Our mu is the cosine
     * against the DOWNWARD axis; standard spherical rotation applies. */
    double sth = sqrt(fmax(0.0, 1.0 - cth * cth));
    double smu = sqrt(fmax(0.0, 1.0 - mu * mu));
    double mu_new = mu * cth + smu * sth * cos(phi);
    if (mu_new > 1.0) mu_new = 1.0;
    if (mu_new < -1.0) mu_new = -1.0;
    mu = mu_new;
    if (fabs(mu) < 1e-9) mu = (mu >= 0 ? 1e-9 : -1e-9);
  }
}

/* Beam run: n photons incident at mu0 (downward), unit incident flux
 * mu0*fbeam = 1 convention is applied by the CALLER via scaling; here
 * each photon has weight 1 and enters at tau = 0 moving down at mu0.
 * The direct (unscattered) component is included in dn tallies naturally.
 */
void mc_beam(int nlyr, const double *dtau, const double *ssa,
             const double *g, double albedo, double mu0,
             long n_photons, uint64_t seed,
             double *up, double *dn) {
  double *taucum = (double *)malloc((nlyr + 1) * sizeof(double));
  taucum[0] = 0.0;
  for (int l = 0; l < nlyr; l++) taucum[l + 1] = taucum[l] + dtau[l];
  atmo_t a = {nlyr, dtau, ssa, g, taucum, albedo, up, dn};
  memset(up, 0, (nlyr + 1) * sizeof(double));
  memset(dn, 0, (nlyr + 1) * sizeof(double));
  rng_t r;
  rng_seed(&r, seed);
  /* level 0 downward: every photon crosses the TOA downward */
  for (long i = 0; i < n_photons; i++) {
    dn[0] += 1.0;
    track(&a, &r, 0.0, mu0, 1.0);
  }
  double inv = 1.0 / (double)n_photons;
  for (int l = 0; l <= nlyr; l++) { up[l] *= inv; dn[l] *= inv; }
  free(taucum);
}

/* Isotropic top illumination: photons enter with mu ~ sqrt(u) downward
 * (flux-weighted cosine law), unit incident flux. */
void mc_isotropic_top(int nlyr, const double *dtau, const double *ssa,
                      const double *g, double albedo,
                      long n_photons, uint64_t seed,
                      double *up, double *dn) {
  double *taucum = (double *)malloc((nlyr + 1) * sizeof(double));
  taucum[0] = 0.0;
  for (int l = 0; l < nlyr; l++) taucum[l + 1] = taucum[l] + dtau[l];
  atmo_t a = {nlyr, dtau, ssa, g, taucum, albedo, up, dn};
  memset(up, 0, (nlyr + 1) * sizeof(double));
  memset(dn, 0, (nlyr + 1) * sizeof(double));
  rng_t r;
  rng_seed(&r, seed);
  for (long i = 0; i < n_photons; i++) {
    dn[0] += 1.0;
    track(&a, &r, 0.0, sqrt(urand(&r)), 1.0);
  }
  double inv = 1.0 / (double)n_photons;
  for (int l = 0; l <= nlyr; l++) { up[l] *= inv; dn[l] *= inv; }
  free(taucum);
}

/* Thermal emission run.  blev: Planck function at the nlyr+1 levels
 * (linear in tau inside each layer); bsurf: surface Planck; the surface
 * emits (1-albedo)*bsurf*pi upward (hemispheric flux pi*B) and internal
 * emission density per layer is 4*pi*(1-ssa)*B(tau) dtau/(4pi) two-sided.
 *
 * Emitted-power bookkeeping (per unit horizontal area):
 *   layer l: P_l = 2*pi*(1-ssa_l) * integral B dtau  (both hemispheres,
 *            angle-integrated: 2 * 2pi * int B dtau * (1/2) mean-mu ...)
 * We use the standard result that the hemispheric emissive power of a
 * slab element is 2*pi*B*(1-ssa)*dtau (per side: pi... see note below) —
 * concretely we launch photons isotropically over 4pi with position
 * density (1-ssa)B(tau) and weight the run by
 *   W_l = 4*pi * (1-ssa_l) * Bbar_l * dtau_l   [idealized emitted power]
 * divided by ... the calibration test (isothermal opaque atmosphere must
 * emit pi*B from the TOA... with our "flux" = pi*B convention reported by
 * DISORT as flup = pi*B) fixes the constant; see tests/test_mc_oracle.py.
 *
 * Here fluxes are reported in DISORT units (flup = pi*B for a black
 * isothermal medium), i.e. photon weights carry power 2*(1-ssa)*Bbar*dtau
 * per unit emitted photon over each hemisphere... final constant:
 *   total emitted power per layer (both directions) = 2*pi*(1-ssa)*
 *   \int_layer B dtau.
 */
void mc_thermal(int nlyr, const double *dtau, const double *ssa,
                const double *g, double albedo,
                const double *blev, double bsurf,
                long n_photons, uint64_t seed,
                double *up, double *dn) {
  double *taucum = (double *)malloc((nlyr + 1) * sizeof(double));
  taucum[0] = 0.0;
  for (int l = 0; l < nlyr; l++) taucum[l + 1] = taucum[l] + dtau[l];
  atmo_t a = {nlyr, dtau, ssa, g, taucum, albedo, up, dn};
  memset(up, 0, (nlyr + 1) * sizeof(double));
  memset(dn, 0, (nlyr + 1) * sizeof(double));
  rng_t r;
  rng_seed(&r, seed);

  /* emission budget: layers + surface.  Volume emission coefficient is
   * (1-ssa) B per steradian per unit optical depth -> the layer's total
   * emitted power per unit horizontal area is 4 pi (1-ssa) \int B dtau
   * (half up, half down; a thin layer's one-sided emergent flux
   * 2 pi \int I mu dmu = 2 pi (1-ssa) B dtau then matches DISORT). */
  double *power = (double *)malloc((nlyr + 1) * sizeof(double));
  double ptot = 0.0;
  for (int l = 0; l < nlyr; l++) {
    double bbar = 0.5 * (blev[l] + blev[l + 1]);
    power[l] = 4.0 * M_PI * (1.0 - ssa[l]) * bbar * dtau[l];
    ptot += power[l];
  }
  power[nlyr] = M_PI * (1.0 - albedo) * bsurf;  /* surface emission */
  ptot += power[nlyr];
  if (ptot <= 0.0) { free(taucum); free(power); return; }

  for (long i = 0; i < n_photons; i++) {
    /* pick emitter proportional to power */
    double x = urand(&r) * ptot, acc = 0.0;
    int src = nlyr;
    for (int l = 0; l <= nlyr; l++) {
      acc += power[l];
      if (x <= acc) { src = l; break; }
    }
    double wgt = ptot / (double)n_photons;  /* power each photon carries */
    if (src == nlyr) {
      /* surface: Lambertian upward emission */
      double mu = -sqrt(urand(&r));
      up[nlyr] += wgt;
      track(&a, &r, taucum[nlyr], mu, wgt);
    } else {
      /* position: linear-in-tau density B(t) within the layer via
       * rejection against max(B0, B1) (B >= 0) */
      double b0 = blev[src], b1 = blev[src + 1];
      double bmax = (b0 > b1 ? b0 : b1) + 1e-300;
      double xi;
      do { xi = urand(&r); }
      while (urand(&r) * bmax > b0 + (b1 - b0) * xi);
      double tau = taucum[src] + xi * dtau[src];
      /* volume emission is isotropic: power per solid angle is uniform,
       * so the direction cosine is uniform on (-1, 1).  (The cosine law
       * applies only to SURFACE emission — the Lambertian branch.) */
      double mu = 2.0 * urand(&r) - 1.0;
      if (fabs(mu) < 1e-9) mu = (mu >= 0 ? 1e-9 : -1e-9);
      track(&a, &r, tau, mu, wgt);
    }
  }
  free(taucum);
  free(power);
}
