package graft.mc

/** Portable-arithmetic Monte-Carlo twin (r14-verdict task 4, the
  * g20/e31 method applied to the MC harness).
  *
  * [[LocalSim]] — the production battery behind o02/o03 — draws its
  * populations from xxhash64 Box–Muller normals and runs the real
  * RegDI/PC estimators, none of which an SQL oracle can replay, so
  * those queries are graded rows-only. This twin re-expresses the SAME
  * control flow — grid → per-(sim, γ) population synthesis → NMAR
  * selection → estimator battery → [[MonteCarlo.summarize]] — in
  * arithmetic BOTH engines compute bit-identically, so the assembled
  * result schema and the summary identities become hash-graded
  * (o04_mc_portable), and o02/o03 pin agreement against it in McSuite:
  *
  *  - uniforms are the catalog's portable integer hash
  *    (((id·1000003 + seed) mod P) · 1315423911) mod P / P with
  *    P = 100000007 (the g07/g19/g20 convention) — pure 64-bit integer
  *    ops + one IEEE division, identical in the JVM and DuckDB;
  *  - "normals" are Irwin–Hall sums of four uniforms (mean 2,
  *    additions only) — Box–Muller's log/cos would reintroduce the
  *    libm divergence the twin exists to avoid;
  *  - the NMAR propensity is LINEAR in y and clamped,
  *    π = clamp(0.5 + γ·(y−3)·0.15, 0.05, 0.95), not the reference's
  *    logistic (exp is libm); distributional fidelity to the reference
  *    stays o02/o03 + BASELINE_REPRO's job — the twin grades control
  *    flow and assembly arithmetic, not statistics;
  *  - every aggregate is the exact-decimal dsum: [[dsumLocal]] mirrors
  *    `sum(CAST(x AS DECIMAL(38,10)))` bit-for-bit (shortest-repr
  *    BigDecimal, HALF_UP at scale 10, exact accumulation, correctly
  *    rounded toDouble), so the task-local fan-out, a distributed
  *    dsum, and DuckDB's sqlDsum all agree.
  *
  * The battery is four estimators shaped like the reference's
  * (`RegDI2.R` battery; naive B mean, design mean over A, regression
  * adjustment, a DR-style combination) with closed-form simple-OLS
  * arithmetic — every operation an IEEE +,−,×,/ over exact-decimal
  * sums, textually mirrored in the o04 oracle SQL.
  */
final case class PortableConfig(sim: Int, gi: Int, gamma: Double, nPop: Int)

object PortableSim {

  private val P = 100000007L
  private val K = 1315423911L

  /** Portable uniform in [0, 1): pure integer arithmetic, engine-exact.
    * The squaring step is load-bearing: a purely LINEAR hash maps
    * consecutive channel seeds to affine shifts of one another
    * (u_{k+1} = u_k + K/P mod 1), so Irwin–Hall sums of such channels
    * collapse to a one-dimensional lattice — measured channel
    * correlations drop from 1.0 to ≤ 0.03 with the quadratic mix.
    * id·1000003 separates rows so nearby ids don't alias either.
    * Max intermediate: h2·K < 10⁸·1.32·10⁹ ≈ 1.3·10¹⁷ — inside both
    * engines' 64-bit integer range. */
  def uniform(id: Long, seed: Long): Double = {
    val h1 = (id * 1000003L + seed) % P
    val h2 = (h1 * h1 + seed) % P
    (h2 * K % P).toDouble / 100000007.0
  }

  /** Bit-exact local mirror of `dsum` (sum(CAST(x AS DECIMAL(38,10)))
    * cast back to double): Spark's double→decimal cast goes through the
    * shortest decimal string (BigDecimal.valueOf) with HALF_UP, the
    * decimal sum is exact, and decimal→double (BigDecimal.doubleValue)
    * is correctly rounded — so the fold is accumulation-order-free. */
  def dsumLocal(xs: Iterator[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    while (xs.hasNext)
      acc = acc.add(java.math.BigDecimal.valueOf(xs.next())
        .setScale(10, java.math.RoundingMode.HALF_UP))
    acc.doubleValue
  }

  /** One task-local portable simulation: synthesize the population,
    * select A (Bernoulli 0.1) and B (clamped-linear NMAR in γ), run the
    * four-estimator battery. Every arithmetic tree here is textually
    * mirrored in the o04 oracle SQL — change one only with the other. */
  def simulate(cfg: PortableConfig): Seq[SimResult] = {
    val n = cfg.nPop
    // 1e12 gamma spacing: with the old 1e6 spacing, cells (gi, sim+100)
    // and (gi+1, sim) shared the identical seed base, so at the
    // documented 1000-replicate scale ~90% of adjacent-gamma cells
    // reused the same population (r15 review). A collision now needs
    // sim deltas of 1e8 — beyond any real replicate count. Mirrored in
    // McOracle.o04's seedb CTE; max intermediate in [[uniform]] stays
    // ≪ 2⁶³ (seed ≤ ~1e13, h1² < 1e16).
    val seedB = 1000000000000L * cfg.gi + 10000L * cfg.sim
    val x = new Array[Double](n)
    val y = new Array[Double](n)
    val inA = new Array[Boolean](n)
    val inB = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val id = (i + 1).toLong
      val xv = uniform(id, seedB + 1) + uniform(id, seedB + 2) +
        uniform(id, seedB + 3) + uniform(id, seedB + 4)
      val eta = uniform(id, seedB + 5) + uniform(id, seedB + 6) +
        uniform(id, seedB + 7) + uniform(id, seedB + 8) - 2.0
      val yv = 3.0 + 0.7 * (xv - 2.0) + eta
      x(i) = xv
      y(i) = yv
      inA(i) = uniform(id, seedB + 9) < 0.1
      val pi = math.min(math.max(0.5 + cfg.gamma * (yv - 3.0) * 0.15,
        0.05), 0.95)
      inB(i) = uniform(id, seedB + 10) < pi
      i += 1
    }
    val nA = inA.count(identity)
    val nB = inB.count(identity)
    // fixed synthetic grid: degenerate cells are authoring errors, not
    // data conditions — fail loudly rather than emit NaN estimates
    require(nA > 0 && nB > 1,
      s"portable sim cell (sim=${cfg.sim}, gamma=${cfg.gamma}) is " +
        s"degenerate: nA=$nA nB=$nB")
    def sel(mask: Array[Boolean], v: Int => Double): Iterator[Double] =
      Iterator.range(0, n).filter(mask(_)).map(v)
    val syB = dsumLocal(sel(inB, y(_)))
    val sxB = dsumLocal(sel(inB, x(_)))
    val sxyB = dsumLocal(sel(inB, i => x(i) * y(i)))
    val sxxB = dsumLocal(sel(inB, i => x(i) * x(i)))
    val syA = dsumLocal(sel(inA, y(_)))
    val sxPop = dsumLocal(x.iterator)
    val nBd = nB.toDouble
    val meanSB = syB / nB
    val meanSA = syA / nA
    val xbarPop = sxPop / n
    val xbarB = sxB / nB
    val beta = (sxyB - sxB * syB / nBd) / (sxxB - sxB * sxB / nBd)
    val reg = meanSB + beta * (xbarPop - xbarB)
    val alpha = meanSB - beta * xbarB
    val sresA = dsumLocal(sel(inA, i => y(i) - (alpha + beta * x(i))))
    val dr = reg + sresA / nA
    Seq(
      SimResult(cfg.sim, cfg.gamma, "DR_X1", dr),
      SimResult(cfg.sim, cfg.gamma, "Mean_S_A", meanSA),
      SimResult(cfg.sim, cfg.gamma, "Mean_S_B", meanSB),
      SimResult(cfg.sim, cfg.gamma, "Reg_X1", reg))
  }
}
