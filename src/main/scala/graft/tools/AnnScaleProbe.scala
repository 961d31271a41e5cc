package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Scale probe for the embedding similarity operators — the measured leg
  * of SCALE.md §Similarity search. Synthesizes a planted-cluster corpus
  * 100-1000× the test fixture with deterministic hash-derived vectors
  * (no rand streams, partition-invariant), runs the PRODUCTION paths
  * ([[Ann.nearDupLsh]] bucketed near-dup, [[Ann.annTopK]] bucketed
  * top-k) fully distributed, and checks planted-truth invariants so a
  * fast-but-wrong run cannot pass:
  *
  *  - corpus = clusters of `m` consecutive ids; members share a
  *    hash-derived center plus 5% per-member noise, so intra-cluster
  *    cosine ≈ 0.997 and cross-cluster cosine concentrates near 0 —
  *    a hard gap on both sides of the 0.9 threshold;
  *  - PRECISION is structural: every emitted pair must be intra-cluster
  *    (id_a/m == id_b/m) — one wrong pair fails the run;
  *  - RECALL is counted against the closed-form pair total
  *    n/m · C(m,2); the noisiest planted pairs sit near cos 0.99
  *    (θ ≈ 8°, p_plane ≈ 0.974), where (bits=18, tables=8) gives a
  *    per-pair miss probability (1 − 0.974¹⁸)⁸ ≈ 4e-4, so the
  *    asserted floor is 0.998 (measured 0.9985 at tables=6,
  *    ≥ 0.999 at 8).
  *
  * Run: sbt "runMain graft.tools.AnnScaleProbe [nVecs] [dim] [bits]"
  * Expect ~linear wall-time in corpus size PROVIDED bits grows with n:
  * random-pair collisions per table scale with bucket occupancy
  * (n / 2^bits), so holding bits fixed while n grows is superlinear by
  * design — the operating rule at scale is to add a bit per corpus
  * doubling (18 bits ≈ 1M, 20 bits ≈ 4M, …), which holds occupancy
  * and per-vector candidate count constant. Signatures are codegen'd
  * literal dot folds computed scan-side, candidates come from one
  * (table, bucket) equi-join, and only bucket collisions are scored.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val bits = if (args.length > 2) args(2).toInt else 18
    val m = 4L // cluster size
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // vec_d = center(cluster, d) + 0.05 · noise(id, d), both hash-uniform
    // in [-1, 1] — deterministic under any partitioning
    def u(seedCols: Column*) =
      pmod(xxhash64(seedCols: _*), lit(2000001L)).cast("double") / 1000000.0 - 1.0
    val cluster = (col("id") / m).cast("long")
    val vec = transform(sequence(lit(0), lit(dim - 1)), d =>
      (u(cluster, d) + lit(0.05) * u(col("id"), d, lit(1))).cast("float"))
    val emb = spark.range(nVecs)
      .select(col("id").as("vec_id"), vec.as("embedding")).cache()
    emb.count()

    // ---- bucketed near-dup: precision structural, recall closed-form --
    val t0 = System.nanoTime()
    val pairs = Ann.nearDupLsh(emb, "vec_id", "embedding", dim,
      threshold = 0.9, bits = bits, tables = 8)
    val p = pairs.agg(count(lit(1)).as("n"),
      count(when((col("id_a") / m).cast("long") =!=
        (col("id_b") / m).cast("long"), 1)).as("cross")).head()
    val tDup = (System.nanoTime() - t0) / 1e9
    val expected = nVecs / m * (m * (m - 1) / 2)
    require(p.getLong(1) == 0L,
      s"near-dup emitted ${p.getLong(1)} cross-cluster pairs (precision broken)")
    val recall = p.getLong(0).toDouble / expected
    require(recall >= 0.998, f"near-dup recall $recall%.5f below 0.998")

    // ---- bucketed top-k: every query's cluster mates must be found ---
    val queries = emb.filter(col("vec_id") % (nVecs / 100) === 0)
    val nQ = queries.count()
    val t1 = System.nanoTime()
    val topk = Ann.annTopK(queries, emb, "vec_id", "embedding", dim,
      k = m.toInt, bits = bits, tables = 8).cache()
    val mates = topk.filter((col("qid") / m).cast("long") ===
      (col("cid") / m).cast("long") && col("qid") =!= col("cid")).count()
    val tTopK = (System.nanoTime() - t1) / 1e9
    // k = m slots: self + the m−1 planted mates fill them exactly
    require(mates >= (nQ * (m - 1) * 999) / 1000,
      s"top-k found $mates of ${nQ * (m - 1)} planted mates")
    topk.unpersist()

    // ---- IVF top-k: same planted invariant through the k-means path --
    // Single-probe IVF is boundary-limited BY DESIGN: a query only
    // searches its own cell, so a cluster straddling a Voronoi boundary
    // loses the mates that landed across it. Measured (round 7): 283/300
    // mates (94.3%) at 16 cells / 1M vectors — the honest single-probe
    // figure; multi-probe (search the top-p cells by centroid score) is
    // the standard recall lever. Floor 0.90 catches systematic
    // cell-assignment or Lloyd breaks without pretending single-probe
    // recall it doesn't have.
    def ivfLeg(nCells: Int, floorPct: Int, nProbe: Int = 1): (Double, Double) = {
      val t2 = System.nanoTime()
      val ivf = Ann.ivfTopK(queries, emb, "vec_id", "embedding", dim,
        k = m.toInt, nCells = nCells, lloydIters = 1, nProbe = nProbe).cache()
      val ivfMates = ivf.filter((col("qid") / m).cast("long") ===
        (col("cid") / m).cast("long") && col("qid") =!= col("cid")).count()
      val tIvf = (System.nanoTime() - t2) / 1e9
      require(ivfMates >= (nQ * (m - 1) * floorPct) / 100,
        s"ivf($nCells cells) found $ivfMates of ${nQ * (m - 1)} planted mates")
      ivf.unpersist()
      (tIvf, ivfMates.toDouble / (nQ * (m - 1)))
    }
    val (tIvf, rIvf) = ivfLeg(16, 90)
    // Realistic cell count (≈√n for 1M vectors is ~1000; 256 here keeps
    // per-cell occupancy ≈4k): exercises the round-8 fused
    // ArgMaxDotConst assignment — the pre-round-8 literal-argmax
    // (greatest over one codegen'd dot per centroid) stalled Janino
    // compile past ~16 cells × 64 dims, so this leg COULD NOT RUN.
    // More cells = more Voronoi boundaries = more single-probe
    // straddle, hence the lower floor; the measured figure goes in
    // SCALE.md.
    val nCellsBig = if (args.length > 3) args(3).toInt else 256
    val (tIvfBig, rIvfBig) = ivfLeg(nCellsBig, 80)
    // multi-probe: the recall lever — same candidate-side cost, query
    // fan-out ×4; boundary-straddle losses should mostly close
    val (tIvfMp, rIvfMp) = ivfLeg(nCellsBig, 95, nProbe = 4)

    // ---- PQ ADC: flat scan over m-int codes instead of vectors -------
    // Same planted invariant; quantization error is the recall risk, so
    // the floor stays at 0.95 (planted mates sit at cos ≈ 0.997 — far
    // above anything the codebook error can demote below background).
    val t3 = System.nanoTime()
    val pq = Ann.pqTopK(queries, emb, "vec_id", "embedding", dim,
      k = m.toInt, m = 16, kCodes = 256, iters = 1).cache()
    val pqMates = pq.filter((col("qid") / m).cast("long") ===
      (col("cid") / m).cast("long") && col("qid") =!= col("cid")).count()
    val tPq = (System.nanoTime() - t3) / 1e9
    val rPq = pqMates.toDouble / (nQ * (m - 1))
    require(pqMates >= (nQ * (m - 1) * 95) / 100,
      s"pq top-k found $pqMates of ${nQ * (m - 1)} planted mates")
    pq.unpersist()

    // ---- IVF-PQ composed: cells bound WHICH, codes bound WHAT --------
    // Scored pairs ≈ |Q|·nProbe·(n/nCells), each from a 16-int code;
    // floor combines the measured multi-probe IVF leg (0.990) with
    // PQ's planted-mate fidelity (1.000) — set at 0.95.
    val t4 = System.nanoTime()
    val ivfpq = Ann.ivfPqTopK(queries, emb, "vec_id", "embedding", dim,
      k = m.toInt, nCells = nCellsBig, nProbe = 4, m = 16, kCodes = 256,
      lloydIters = 1, pqIters = 1, rerankFrom = 2 * m.toInt).cache()
    val ivfpqMates = ivfpq.filter((col("qid") / m).cast("long") ===
      (col("cid") / m).cast("long") && col("qid") =!= col("cid")).count()
    val tIvfPq = (System.nanoTime() - t4) / 1e9
    val rIvfPq = ivfpqMates.toDouble / (nQ * (m - 1))
    require(ivfpqMates >= (nQ * (m - 1) * 95) / 100,
      s"ivf-pq top-k found $ivfpqMates of ${nQ * (m - 1)} planted mates")
    ivfpq.unpersist()

    // ---- residual IVF-PQ: classical Jégou §IV.B encoding -------------
    // Same composed leg with residual = true: codes quantize
    // x − centroid(cell), so quantization error strictly tightens at
    // equal bit budget. The pin is the round-9 done-criterion: recall
    // must be ≥ the raw-vector leg's (and ≥ the same 0.95 floor); the
    // extra cost is one more fused projection in the training/encode
    // scans plus the per-row reconstruction norm.
    val t5 = System.nanoTime()
    val ivfpqR = Ann.ivfPqTopK(queries, emb, "vec_id", "embedding", dim,
      k = m.toInt, nCells = nCellsBig, nProbe = 4, m = 16, kCodes = 256,
      lloydIters = 1, pqIters = 1, rerankFrom = 2 * m.toInt,
      residual = true).cache()
    val ivfpqRMates = ivfpqR.filter((col("qid") / m).cast("long") ===
      (col("cid") / m).cast("long") && col("qid") =!= col("cid")).count()
    val tIvfPqR = (System.nanoTime() - t5) / 1e9
    val rIvfPqR = ivfpqRMates.toDouble / (nQ * (m - 1))
    require(ivfpqRMates >= ivfpqMates,
      s"residual ivf-pq found $ivfpqRMates mates < raw's $ivfpqMates")
    require(ivfpqRMates >= (nQ * (m - 1) * 95) / 100,
      s"residual ivf-pq found $ivfpqRMates of ${nQ * (m - 1)} planted mates")
    ivfpqR.unpersist()

    // ---- SQ8 integer-dot MIPS (e25): compression fidelity at scale ---
    // Train (one exact max) + scan-side int8 encode are linear; the
    // exhaustive integer scan is the declared e22/e25 ADC shape, so the
    // leg runs a 20-query slice (|Q|·n pairs). Planted mates sit at
    // reconstruction dot ≈ |center|² — far above the ≈0 background —
    // so int8 quantization must keep them top-k: floor 0.95.
    val sqQueries = emb.filter(col("vec_id") % (nVecs / 20) === 0)
    val nSqQ = sqQueries.count()
    val t6 = System.nanoTime()
    val sq = graft.queries.AnnQueries.sq8MipsTopK(sqQueries, emb,
      k = m.toInt).cache()
    val sqMates = sq.filter((col("qid") / m).cast("long") ===
      (col("cid") / m).cast("long") && col("qid") =!= col("cid")).count()
    val tSq = (System.nanoTime() - t6) / 1e9
    val rSq = sqMates.toDouble / (nSqQ * (m - 1))
    require(sqMates >= (nSqQ * (m - 1) * 95) / 100,
      s"sq8 top-k found $sqMates of ${nSqQ * (m - 1)} planted mates")
    sq.unpersist()

    // ---- prototype pruning (e28): cluster-then-drop at scale ----------
    // Scale claims under test: ONE fused-expression scan emits each
    // vector's (cell, dot) pair, per-cell rank windows bounded at
    // corpus/nCells. Invariants: every vector graded exactly once, and
    // every non-trivial cell drops exactly floor(n/4) members.
    val t7 = System.nanoTime()
    val pruned = graft.queries.AnnQueries.prototypePrune(emb, dim,
      nCells = 16).cache()
    val prAgg = pruned.agg(count(lit(1)).as("n"),
      countDistinct(col("vid")).as("d")).head()
    val prCells = pruned.groupBy("cell")
      .agg(count(lit(1)).as("n"),
        count(when(!col("keep"), 1)).as("dropped"))
      .collect()
    val tPr = (System.nanoTime() - t7) / 1e9
    require(prAgg.getLong(0) == nVecs && prAgg.getLong(1) == nVecs,
      s"prototype prune lost or duplicated rows: ${prAgg.getLong(0)}")
    prCells.foreach { r =>
      require(r.getLong(2) == r.getLong(1) / 4,
        s"cell ${r.getInt(0)} dropped ${r.getLong(2)} of ${r.getLong(1)}")
    }
    val prDropped = prCells.map(_.getLong(2)).sum
    pruned.unpersist()

    println(f"vecs=$nVecs%,d dim=$dim neardup(${p.getLong(0)}%,d pairs, " +
      f"recall=$recall%.5f)=$tDup%.1fs topk($nQ queries)=$tTopK%.1fs " +
      f"ivf($nQ queries, 16 cells, mate-recall=$rIvf%.3f)=$tIvf%.1fs " +
      f"ivf($nQ queries, $nCellsBig cells, mate-recall=$rIvfBig%.3f)=$tIvfBig%.1fs " +
      f"ivf($nQ queries, $nCellsBig cells, probe=4, mate-recall=$rIvfMp%.3f)=$tIvfMp%.1fs " +
      f"pq($nQ queries, m=16 k=256, mate-recall=$rPq%.3f)=$tPq%.1fs " +
      f"ivfpq($nQ queries, $nCellsBig cells, probe=4, m=16, " +
      f"mate-recall=$rIvfPq%.3f)=$tIvfPq%.1fs " +
      f"ivfpq-residual(mate-recall=$rIvfPqR%.3f)=$tIvfPqR%.1fs " +
      f"sq8($nSqQ queries, mate-recall=$rSq%.3f)=$tSq%.1fs " +
      f"protoPrune(16 cells, $prDropped%,d dropped)=$tPr%.1fs")
    spark.stop()
  }
}
