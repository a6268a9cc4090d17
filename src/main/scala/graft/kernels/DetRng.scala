package graft.kernels

/** Counter-based deterministic RNG for the stochastic state-space kernels
  * (EnKF / particle filter / MCMC) and their DuckDB replay oracles.
  *
  * Every draw is a pure function of (seed, stream, t, i, j): a splitmix64
  * finalizer over a structured counter. No sequential generator state, so
  * draws are reproducible under ANY execution order — the property a
  * distributed engine needs (per-series draws on executors cannot share a
  * mutable generator) — and the whole stream replays in SQL: the two
  * wrapping 64-bit multiplies become HUGEINT products mod 2⁶⁴ (the FNV
  * trick the EnbPI bootstrap oracle already uses).
  *
  * Gaussians are Irwin-Hall(12) sums of uniforms (mean 0, variance 1):
  * arithmetic-only, so the JVM and DuckDB produce BIT-IDENTICAL draws —
  * IEEE doubles combined in identical order — unlike Box-Muller, whose
  * libm log/cos differ across runtimes by ulps that a 70-step filter
  * recursion then amplifies.
  *
  * Reference behavior (bayesian/enkf.py, particle_filter.py, mcmc.py)
  * depends on numpy's PCG64 stream; draws are engine-defined there too —
  * only the filter/sampler ALGORITHM is contract, which this preserves.
  */
object DetRng {

  private final val C1 = 0xbf58476d1ce4e5b9L
  private final val C2 = 0x94d049bb133111ebL
  final val Golden = 0x9e3779b97f4a7c15L

  /** Seed-derived xor constant (inlined into oracle SQL as a literal so
    * the SQL never multiplies two 64-bit values). */
  def seedConst(seed: Long): Long = seed * Golden

  /** splitmix64 finalizer (public-domain mixer, Steele et al.). */
  def mix(x: Long): Long = {
    var z = (x ^ (x >>> 30)) * C1
    z = (z ^ (z >>> 27)) * C2
    z ^ (z >>> 31)
  }

  /** Structured counter: stream < 64, t < 2²⁰ (series position /
    * iteration), i < 2¹² (ensemble member / particle / dimension).
    * Stays below 2³⁸, so ×16 for the Irwin-Hall sub-slot never nears
    * 64-bit overflow — plain BIGINT arithmetic on the SQL side. */
  def ctr(stream: Long, t: Long, i: Long): Long =
    (stream * 1048576L + t) * 4096L + i

  private def uniformRaw(seedC: Long, c: Long): Double =
    (mix(c ^ seedC) >>> 11).toDouble / 9007199254740992.0

  /** Uniform in [0, 1) at sub-slot 12 (disjoint from gauss's 0..11). */
  def uniform(seedC: Long, c: Long): Double = uniformRaw(seedC, c * 16 + 12)

  /** Irwin-Hall(12) standard normal: Σ₁²⁻ uniforms − 6, summed in
    * sub-slot order (the oracle's list fold adds in the same order). */
  def gauss(seedC: Long, c: Long): Double = {
    var s = 0.0
    var j = 0
    while (j < 12) { s += uniformRaw(seedC, c * 16 + j); j += 1 }
    s - 6.0
  }
}
