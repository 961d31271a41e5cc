package graft.mc

/** One task-local NMAR simulation replicate: population synthesis,
  * sample draws, and the estimator battery — pure JVM arrays, no Spark.
  *
  * Mirrors `generate_population_NMAR` (`Simulaciones_Clean.ipynb:
  * 1242-1290 (cell 18)`) and the cell-23 battery semantics: x ~ N(2,1),
  * y = 3 + 0.7(x−2) + η with η ~ N(0, √0.51); A = SRS(n_A); B = exact-n
  * weighted draw with π ∝ logistic(γ·(y−c)) (Efraimidis–Spirakis keys —
  * same inclusion-probability law as R's `sample(prob=)`). RNG parity
  * with R is distributional, not bitwise (SURVEY.md §7.5.4): streams are
  * seeded per phase (seed, seed+1000, seed+2000) exactly as the
  * reference seeds its three `set.seed` calls.
  *
  * The estimators are the local (single-task) renditions of the same
  * closed forms the distributed graft.estimators use — identical math,
  * array arithmetic instead of Catalyst expressions.
  */
object LocalSim {

  private final val TrueC = 3.0

  def run(cfg: SimConfig): Seq[SimResult] = {
    val n = cfg.nPop
    val rng = new java.util.Random(cfg.seedBase)
    val x = Array.fill(n)(2.0 + rng.nextGaussian())
    val eta = Array.fill(n)(rng.nextGaussian() * math.sqrt(0.51))
    val y = Array.tabulate(n)(i => 3.0 + 0.7 * (x(i) - 2.0) + eta(i))
    val x1 = x.map(v => if (v <= 2.0) 1.0 else 0.0)
    val x2 = x.map(v => if (v > 2.0) 1.0 else 0.0)

    // A: SRS without replacement, exact n_A (partial Fisher–Yates)
    val rngA = new java.util.Random(cfg.seedBase + 1000L)
    val idx = Array.tabulate(n)(identity)
    var i = 0
    while (i < cfg.nA) {
      val j = i + rngA.nextInt(n - i)
      val t = idx(i); idx(i) = idx(j); idx(j) = t
      i += 1
    }
    val inA = new Array[Boolean](n)
    (0 until cfg.nA).foreach(k => inA(idx(k)) = true)

    // B: weighted without replacement, exact n_B — E–S keys u^(1/w)
    val rngB = new java.util.Random(cfg.seedBase + 2000L)
    val keyed = Array.tabulate(n) { k =>
      val p = 1.0 / (1.0 + math.exp(-cfg.gamma * (y(k) - TrueC)))
      (math.pow(rngB.nextDouble(), 1.0 / p), k)
    }
    val inB = new Array[Boolean](n)
    keyed.sortBy(-_._1).take(cfg.nB).foreach { case (_, k) => inB(k) = true }

    val dA = n.toDouble / cfg.nA
    val dB = n.toDouble / cfg.nB

    def meanWhere(sel: Array[Boolean]): Double = {
      var s = 0.0; var c = 0
      var k = 0
      while (k < n) { if (sel(k)) { s += y(k); c += 1 }; k += 1 }
      s / c
    }

    Seq(
      SimResult(cfg.sim, cfg.gamma, "Mean_S_A", meanWhere(inA)),
      SimResult(cfg.sim, cfg.gamma, "Mean_S_B", meanWhere(inB)),
      SimResult(cfg.sim, cfg.gamma, "RegDI_X1",
        regdi(n, y, Array(x1), inA, inB, dA)),
      SimResult(cfg.sim, cfg.gamma, "PC_X1_X2",
        pc(n, y, Array(x1, x2), inA, inB, dA, dB))
    )
  }

  /** RegDI correction 0/1, calibration vars (uno, δ_i, δ_y, δ_aux…) —
    * the local form of `RegDI2.R:144-193,244-248`. */
  private[mc] def regdi(n: Int, y: Array[Double], aux: Array[Array[Double]],
                        inA: Array[Boolean], inB: Array[Boolean],
                        dA: Double): Double = {
    val k = 3 + aux.length
    // calibration totals T = (N, Σ_B 1, Σ_B y, Σ_B aux…)
    val t = new Array[Double](k)
    t(0) = n.toDouble
    var r = 0
    while (r < n) {
      if (inB(r)) {
        t(1) += 1.0; t(2) += y(r)
        var a = 0
        while (a < aux.length) { t(3 + a) += aux(a)(r); a += 1 }
      }
      r += 1
    }
    // Gram over A rows: features x_r = (1, δ_i, δ_y, δ_aux…)
    val xtdx = Array.ofDim[Double](k, k)
    val xtd = new Array[Double](k)
    r = 0
    while (r < n) {
      if (inA(r)) {
        val f = new Array[Double](k)
        f(0) = 1.0
        if (inB(r)) {
          f(1) = 1.0; f(2) = y(r)
          var a = 0
          while (a < aux.length) { f(3 + a) = aux(a)(r); a += 1 }
        }
        var ii = 0
        while (ii < k) {
          xtd(ii) += dA * f(ii)
          var jj = 0
          while (jj < k) { xtdx(ii)(jj) += dA * f(ii) * f(jj); jj += 1 }
          ii += 1
        }
      }
      r += 1
    }
    val rhs = Array.tabulate(k)(ii => t(ii) - xtd(ii))
    val lambda = solve(xtdx, rhs)
    // w = d(1 + xᵀλ);  est = Σ w·y_A / Σ w
    var sw = 0.0; var swy = 0.0
    r = 0
    while (r < n) {
      if (inA(r)) {
        var xl = lambda(0)
        if (inB(r)) {
          xl += lambda(1) + lambda(2) * y(r)
          var a = 0
          while (a < aux.length) { xl += lambda(3 + a) * aux(a)(r); a += 1 }
        }
        val w = dA * (1.0 + xl)
        sw += w; swy += w * y(r)
      }
      r += 1
    }
    swy / sw
  }

  /** PC scenario 1: calibrate the B design on aux vars against HT totals
    * estimated from A (`PC.R:190-237`), then the calibrated B mean. */
  private[mc] def pc(n: Int, y: Array[Double], aux: Array[Array[Double]],
                     inA: Array[Boolean], inB: Array[Boolean],
                     dA: Double, dB: Double): Double = {
    val k = aux.length
    val t = new Array[Double](k)       // HT totals from A
    val xtdx = Array.ofDim[Double](k, k)
    val xtd = new Array[Double](k)
    var r = 0
    while (r < n) {
      if (inA(r)) {
        var a = 0
        while (a < k) { t(a) += dA * aux(a)(r); a += 1 }
      }
      if (inB(r)) {
        var ii = 0
        while (ii < k) {
          xtd(ii) += dB * aux(ii)(r)
          var jj = 0
          while (jj < k) { xtdx(ii)(jj) += dB * aux(ii)(r) * aux(jj)(r); jj += 1 }
          ii += 1
        }
      }
      r += 1
    }
    val rhs = Array.tabulate(k)(ii => t(ii) - xtd(ii))
    val lambda = solve(xtdx, rhs)
    var sw = 0.0; var swy = 0.0
    r = 0
    while (r < n) {
      if (inB(r)) {
        var xl = 0.0
        var a = 0
        while (a < k) { xl += lambda(a) * aux(a)(r); a += 1 }
        val w = dB * (1.0 + xl)
        sw += w; swy += w * y(r)
      }
      r += 1
    }
    swy / sw
  }

  /** In-place Gaussian elimination with partial pivoting (k ≤ ~8). */
  private[mc] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val k = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < k) {
      var p = col
      var r = col + 1
      while (r < k) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      val ta = a(col); a(col) = a(p); a(p) = ta
      val tb = b(col); b(col) = b(p); b(p) = tb
      require(math.abs(a(col)(col)) > 1e-12, "singular calibration system")
      r = col + 1
      while (r < k) {
        val f = a(r)(col) / a(col)(col)
        var c = col
        while (c < k) { a(r)(c) -= f * a(col)(c); c += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val out = new Array[Double](k)
    var r = k - 1
    while (r >= 0) {
      var s = b(r)
      var c = r + 1
      while (c < k) { s -= a(r)(c) * out(c); c += 1 }
      out(r) = s / a(r)(r)
      r -= 1
    }
    out
  }
}
