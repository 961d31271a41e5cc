package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Tables.{load, sqlDsum}

/** Similarity search over `embeddings.parquet` (Array[Float], dim 64).
  *
  * e01 is the brute-force cosine top-k BASELINE, made hash-checkable
  * against DuckDB by computing every dot product with an exact
  * DECIMAL(38,18) accumulator (exact decimal addition is associative, so
  * Spark's per-row left fold equals DuckDB's unnest+group-by sum bit for
  * bit; the final cos division happens in IEEE doubles in both engines).
  * Ranking ties break on candidate id, so the top-k sets are identical.
  *
  * The 100 TB scale path (LSH-bucketed, never all-pairs) lives in
  * `graft.operators.Ann` with rows-only grading + ScalaTest recall
  * checks, since its hash functions are engine-specific.
  */
object AnnQueries {

  // 30,18: element products are < 10³, so every pairwise '+' stays within
  // precision 31 ≤ 38 — EXACT decimal arithmetic (no per-step rounding,
  // fold order irrelevant), unlike 38,18 where Spark rounds each add.
  private val accType = DecimalType(30, 18)

  /** Exact-decimal dot product, as a double — the REFERENCE
    * formulation (interpreted HOF fold; also accepts double-literal
    * plane arrays, which the native float-float expression does not).
    * Hot paths use [[dotExactF]]; AnnSuite pins the two value-equal on
    * real vectors. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(accType)),
      lit(java.math.BigDecimal.ZERO).cast(accType),
      (acc, x) => (acc + x).cast(accType)).cast("double")

  /** Native exact-decimal dot of two float arrays (the hot path —
    * ~5× the HOF fold; value-identical, suite-pinned). */
  def dotExactF(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotExactF(a, b)

  /** Cosine, emitted as float32: the decimal dot products can differ
    * from another engine's in their final (1e-18) digit because
    * double→decimal rounding is not specified identically everywhere;
    * the float cast absorbs that last-ulp noise deterministically. */
  def cosineExact(a: Column, b: Column): Column =
    (dotExactF(a, b) / (sqrt(dotExactF(a, a)) * sqrt(dotExactF(b, b))))
      .cast("float")

  /** Brute-force cosine top-k of `cand` for each row of `queries`.
    *
    * The self-norms are computed ONCE per row on each side before the
    * cross join (not per pair inside it): the pair space only pays one
    * decimal dot product instead of three. Same IEEE operation tree per
    * value as the inlined `cosineExact`, so the output is bit-identical
    * — at |Q|·|C| pairs this is the difference between O(|Q|·|C|) and
    * O(3·|Q|·|C|) interpreted decimal folds. */
  /** Projection barrier: CollapseProject would otherwise inline a
    * once-per-row norm back into the per-pair projection after the join
    * (recomputing it |Q| or |C| times); a Generate node is opaque to
    * project collapsing, so the value is materialized exactly once per
    * input row. explode(array(x)) is 1-row-in → 1-row-out. */
  private def perRow(df: DataFrame, named: Column, name: String): DataFrame =
    df.select(df.columns.map(col) :+ explode(array(named)).as(name): _*)

  def bruteForceTopK(queries: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = perRow(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")),
      sqrt(dotExactF(col("qe"), col("qe"))), "nq")
    // spread BEFORE the broadcast cross join: the |Q|·n decimal dots
    // evaluate on the cand side's partitions, and a single-split
    // fixture would otherwise serialize the whole pair space on one
    // core (the repartition is the same cost class as the scan this
    // baseline already pays)
    val c = perRow(spreadForExpr(cand)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")),
      sqrt(dotExactF(col("ce"), col("ce"))), "nc")
    val pairs = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotExactF(col("qe"), col("ce")) / (col("nq") * col("nc")))
          .cast("float").as("cos"))
    val win = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
    pairs.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .orderBy("qid", "rk")
  }

  // ---- portable ANN family (e20/e21/e22): every stage in ANSI SQL ----

  /** THE md5→unit-interval map every portable-ANN constant derives
    * from: the first 13 hex chars of md5(key) as an integer over 2⁵²,
    * minus 0.5. Every step is EXACT in IEEE (13 hex chars = 52 bits
    * fit a double; 2⁵² is a power of two, so the division is exact)
    * and md5 is byte-identical in any engine — the d04 convention.
    * MD5's avalanche makes components independent across keys; the
    * portable multiplicative hash would NOT work here (it is affine in
    * its argument, so consecutive indices would form a lattice and one
    * table's planes would be shifts of each other). ONE definition —
    * [[sqlPortableUnit]] is its SQL twin; change both together or the
    * hash gates fail. */
  private def portableUnit(key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0 - 0.5
  }

  /** SQL rendition of [[portableUnit]] over a column named `hx` holding
    * md5(key) — shared verbatim by the e20/e21/e22 oracles. */
  private val sqlPortableUnit: String = {
    val hexParse13 = (0 until 13).map { i =>
      s"(strpos('0123456789abcdef', substring(hx, ${i + 1}, 1)) - 1) * ${BigInt(16).pow(12 - i)}"
    }.mkString(" + ")
    s"CAST($hexParse13 AS DOUBLE) / 4503599627370496.0 - 0.5"
  }

  /** DuckDB rendition of the exact brute-force top-5 for the fixture
    * queries (vec_id < 10) — the ground-truth side shared VERBATIM by
    * the e29/e30 recall evals. Emits CTEs xq..xr; `xr` is the
    * (qid, cid) exact top-5 set. */
  private val sqlExactTop5Chain: String =
    """xq AS (SELECT vec_id AS qid, embedding AS qe
                        FROM embeddings WHERE vec_id < 10),
             xc AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
             xel AS (SELECT qid, cid,
                       CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS p,
                       CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pq,
                       CAST(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pc
                     FROM xq CROSS JOIN xc, generate_series(1, 64) AS t(i)
                     WHERE qid <> cid),
             xd AS (SELECT qid, cid,
                      CAST(sum(p) AS DOUBLE) AS dot,
                      CAST(sum(pq) AS DOUBLE) AS nq,
                      CAST(sum(pc) AS DOUBLE) AS nc
                    FROM xel GROUP BY qid, cid),
             xs AS (SELECT qid, cid,
                      CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                    FROM xd),
             xr AS (SELECT qid, cid FROM
                      (SELECT qid, cid,
                         row_number() OVER
                           (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                       FROM xs)
                    WHERE rk <= 5)"""

  /** Spread a small single-split frame across the cores before a
    * CPU-bound fused-expression walk: a fixture/calibration-sized
    * parquet reads as ONE split, which would serialize the whole
    * tables×bits (or nCells·dim) exact-decimal walk on one core. The
    * shuffle is row-preserving and every portable expression is
    * partition-invariant (AnnSuite pins it), so the graded result
    * cannot change; at production scale the scan is already parallel
    * and the repartition is a cheap rebalance of the sample. */
  private[queries] def spreadForExpr(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Hyperplane (t, b) for the portable LSH twin: components
    * [[portableUnit]]("t:b:j"). Uniform-cube directions are a valid
    * sign-LSH family for cosine (collision probability monotone in
    * angle), just not the spherically-symmetric Gaussian one —
    * acceptable for the graded twin; the production path keeps
    * Gaussian planes. */
  private[graft] def portablePlane(t: Int, b: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => portableUnit(s"$t:$b:$j"))

  /** (id, vec, table, bucket) rows — `tables` per vector — with bucket
    * sign bits decided by EXACT-DECIMAL plane dots (a plain double dot
    * is fold-order-dependent at the ulp level, which could flip a sign
    * bit near zero between engines; the decimal sum is one value in any
    * engine, and sign is preserved through the double cast). The 48
    * per-plane folds ride ONE fused native expression
    * (LshBucketKeysExact — a single walk of each vector) instead of
    * tables×bits interpreted HOF folds; AnnSuite pins value equality
    * with the dotExact formulation, and the DuckDB hash oracle is the
    * cross-engine proof. */
  private[graft] def lshBucketsPortable(df: DataFrame, idCol: String,
                                          vecCol: String, dim: Int,
                                          bits: Int, tables: Int): DataFrame = {
    val planes = for (t <- 0 until tables; b <- 0 until bits)
      yield portablePlane(t, b, dim)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      posexplode(graft.expressions.VectorExpressions.lshKeysExact(
        col(vecCol), planes, dim, bits, tables)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
  }

  /** Portable IVF centroid `c`: components [[portableUnit]]("ivf:c:j")
    * (the prefix keeps the hash families disjoint). NOT normalized —
    * uniform-cube directions concentrate near a common norm, so the
    * argmax-dot assignment is unbiased enough for a graded twin, and
    * skipping the norm keeps every component an exact IEEE value. */
  private[graft] def portableCentroid(c: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => portableUnit(s"ivf:$c:$j"))

  /** Portable spherical k-means — the e31 treatment extended from
    * FIXED md5-literal centroids to TRAINED ones, which is what lets
    * e10 hash-grade a Lloyd-refined pipeline instead of only a
    * data-independent one (r15-verdict task 6).
    *
    * Every step is either exact-decimal (order-free, one value in any
    * engine) or a deterministic IEEE double op on bit-identical inputs,
    * so DuckDB replays the trainer verbatim:
    *  - init: components [[portableUnit]]("km:c:j"), normalized by
    *    sqrt of the exact-decimal sum of component squares;
    *  - assign: the fused exact-decimal argmax
    *    (ArgMaxDotScoreExact — ties to the LOWER cell, the
    *    `row_number ... ORDER BY s DESC, c` tie rule of the e31 SQL);
    *  - means: per (cell, component),
    *    CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count — exact
    *    decimal numerator, one IEEE division;
    *  - re-normalize through the same decimal tree; EMPTY cells keep
    *    the previous (already-normalized) centroid, never re-scaled —
    *    re-normalizing a kept centroid would divide by its ≈1.0-but-
    *    not-exactly-1.0 norm and fork engines that skip the no-op.
    *
    * The norm arithmetic runs through Spark expressions rather than
    * driver-side scala.math so the double→decimal rounding is Spark's
    * own cast — the exact convention the DuckDB oracle text mirrors
    * (JBD.valueOf + HALF_UP scale 18; see
    * VectorExpressions.exactDotConst): the init norm in a
    * (nCells·dim)-row LOCAL frame, each round's norm as a
    * cell-partitioned window INSIDE the round's means job (exact
    * decimal sums are order-free, so the window total is bit-identical
    * to the oracle's groupBy+join rendition). Per round: ONE job, with
    * only nCells·dim aggregated scalars reaching the driver. */
  private[graft] def portableKmeansCentroids(
      data: DataFrame, vecCol: String, dim: Int, nCells: Int,
      iters: Int, tag: String = "km"): Seq[Seq[Double]] = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType,
      StructField, StructType}
    val spark = data.sparkSession
    val ve = graft.expressions.VectorExpressions
    // v / sqrt(Σ decimal(v²)) per cell, through Spark's own casts
    def normalized(raw: Seq[(Int, Seq[Double])]): Map[Int, Seq[Double]] = {
      val rows: java.util.List[Row] = java.util.Arrays.asList(
        raw.flatMap { case (c, vs) =>
          vs.zipWithIndex.map { case (v, j) => Row(c, j, v) }
        }: _*)
      val df = spark.createDataFrame(rows, StructType(Seq(
        StructField("c", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("v", DoubleType, nullable = false))))
      val nrm = df.groupBy("c").agg(
        sqrt(sum((col("v") * col("v")).cast("decimal(38,18)"))
          .cast("double")).as("nrm"))
      df.join(nrm, "c")
        .select(col("c"), col("j"), (col("v") / col("nrm")).as("vn"))
        .collect().groupBy(_.getInt(0))
        .map { case (c, rs) =>
          val arr = new Array[Double](dim)
          rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          c -> arr.toSeq
        }
    }
    var cents: Seq[Seq[Double]] = {
      val n = normalized((0 until nCells).map(c =>
        c -> (0 until dim).map(j => portableUnit(s"$tag:$c:$j"))))
      (0 until nCells).map(n(_))
    }
    for (_ <- 0 until iters) {
      // ONE action per round: the norm rides a cell-partitioned window
      // over the 64·nCells-row means frame inside the same job (the
      // decimal sum is exact and order-free, so the window total is
      // bit-identical to the groupBy+join rendition the oracle SQL
      // uses — r16: the separate normalize action doubled the
      // trainer's job count for no arithmetic difference)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("cell")
      val normed = data
        .select(ve.argMaxDotScoreExact(col(vecCol), cents)
          .getField("cell").as("cell"), col(vecCol).as("__v"))
        .select(col("cell"), posexplode(col("__v")))
        .groupBy("cell", "pos")
        .agg((sum(col("col").cast("double").cast("decimal(38,18)"))
          .cast("double") / count(lit(1)).cast("double")).as("m"))
        .withColumn("nrm",
          sqrt(sum((col("m") * col("m")).cast("decimal(38,18)"))
            .over(w).cast("double")))
        .select(col("cell"), col("pos"), (col("m") / col("nrm")).as("v"))
        .collect()
      val byCell = normed.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (prev, c) =>
        byCell.get(c) match {
          case Some(rs) =>
            val arr = new Array[Double](dim)
            rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr.toSeq
          case None => prev
        }
      }
    }
    cents
  }

  /** ONE SQL definition of the exact-decimal argmax assignment (the
    * ArgMaxDotScoreExact mirror: decimal-sum dots, DESC score, ties to
    * the LOWER cell) — shared by every Lloyd round AND the final
    * assignment [[sqlPortableKmeans]] emits, so a rounding or tie-rule
    * change cannot fork the two (the r15 exactDotConst unification
    * argument, applied to the SQL side). Emits `<dots> AS (...),
    * <assign> AS (vid, c)`. */
  private def sqlArgmaxAssign(src: String, centTable: String,
                              dots: String, assign: String): String =
    s"""$dots AS (SELECT s.vid, $centTable.c,
                    CAST(sum(CAST(CAST(s.embedding[$centTable.j + 1]
                                       AS DOUBLE)
                                  * $centTable.v AS DECIMAL(38,18)))
                         AS DOUBLE) AS sc
                  FROM $src s, $centTable GROUP BY s.vid, $centTable.c),
        $assign AS (SELECT vid, c FROM
                      (SELECT vid, c, row_number() OVER
                         (PARTITION BY vid ORDER BY sc DESC, c) AS rk
                       FROM $dots) t WHERE rk = 1)"""

  /** The [[portableKmeansCentroids]] init/normalize/mean conventions as
    * DuckDB CTE text: `k$r(c, j, v)` is the round-r centroid table
    * (k0 = normalized init; each round assigns by exact-decimal argmax
    * against k(r−1), means per (cell, component), re-normalizes, and
    * COALESCEs empty cells to the previous centroid). When `assignAs`
    * is set, a final [[sqlArgmaxAssign]] against k$iters is appended
    * under that CTE name (vid, c) — the same SQL definition the rounds
    * use, so trainer and final assignment cannot drift. `src` must
    * expose (vid, embedding). Shares [[sqlPortableUnit]] with the
    * e20–e31 oracles. */
  private[graft] def sqlPortableKmeans(src: String, dim: Int,
                                       nCells: Int, iters: Int,
                                       tag: String = "km",
                                       assignAs: Option[String] = None)
      : String = {
    val init =
      s"""ku AS (SELECT c, j, $sqlPortableUnit AS v
                 FROM (SELECT c, j,
                         md5('$tag:' || CAST(c AS VARCHAR) || ':' ||
                             CAST(j AS VARCHAR)) AS hx
                       FROM generate_series(0, ${nCells - 1}) cc(c),
                            generate_series(0, ${dim - 1}) jj(j))),
          kn AS (SELECT c, sqrt(CAST(sum(CAST(v * v AS DECIMAL(38,18)))
                                     AS DOUBLE)) AS nrm
                 FROM ku GROUP BY c),
          k0 AS (SELECT ku.c, ku.j, ku.v / kn.nrm AS v
                 FROM ku JOIN kn USING (c))"""
    val rounds = (1 to iters).map { r =>
      val p = s"k${r - 1}"
      s"""${sqlArgmaxAssign(src, p, s"kd$r", s"ka$r")},
          km$r AS (SELECT a.c, jj.j,
                     CAST(sum(CAST(CAST(s.embedding[jj.j + 1] AS DOUBLE)
                                   AS DECIMAL(38,18))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
                   FROM ka$r a JOIN $src s ON s.vid = a.vid,
                        generate_series(0, ${dim - 1}) jj(j)
                   GROUP BY a.c, jj.j),
          kz$r AS (SELECT c, sqrt(CAST(sum(CAST(m * m AS DECIMAL(38,18)))
                                       AS DOUBLE)) AS nrm
                   FROM km$r GROUP BY c),
          k$r AS (SELECT p.c, p.j,
                    COALESCE(m.m / z.nrm, p.v) AS v
                  FROM k${r - 1} p
                  LEFT JOIN km$r m ON m.c = p.c AND m.j = p.j
                  LEFT JOIN kz$r z ON z.c = p.c)"""
    }.mkString(",\n")
    val base = if (iters == 0) init else init + ",\n" + rounds
    assignAs match {
      case Some(name) =>
        base + ",\n" +
          sqlArgmaxAssign(src, s"k$iters", s"kd${iters + 1}", name)
      case None => base
    }
  }

  /** Shared scoring tail of the portable top-k family (e20/e21/e22):
    * join bare (qid, cid) pairs back to per-row-normed vector frames —
    * two longs rode the candidate-generation shuffle, never the
    * vectors — and keep the top k per query by (cos DESC, cid). The
    * e01 ranking contract (float-cast exact-decimal cosine, cid
    * tie-break) lives HERE, in one place. `candSide` carries
    * (cid, ce); `dot` picks the exact-decimal scorer — the native
    * float path, or the HOF for double arrays like e22's
    * reconstructions. */
  private def scorePairsTopK(pairs: DataFrame, queries: DataFrame,
                             candSide: DataFrame, k: Int,
                             dot: (Column, Column) => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qv = perRow(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qe")),
      sqrt(dotExactF(col("qe"), col("qe"))), "nq")
    val cv = perRow(candSide, sqrt(dot(col("ce"), col("ce"))), "nc")
    val scored = pairs.join(broadcast(qv), Seq("qid")).join(cv, Seq("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qe"), col("ce")) / (col("nq") * col("nc")))
          .cast("float").as("cos"))
    val win = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
    scored.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .orderBy("qid", "rk")
  }

  /** Portable IVF top-k: assign every candidate to its argmax-dot cell
    * and probe each query's top-`nProbe` cells (both through ONE fused
    * exact-decimal expression per vector — TopPDotExactConst, ranking
    * by the double value of the exact sums with ties to the lower
    * cell), join on the cell, score unique pairs with the exact-decimal
    * cosine, keep the top k per query by (cos DESC, cid). Same
    * cell-join scale shape as Ann.ivfTopK; every stage replays in SQL
    * because the centroids are md5-literals, not k-means output. */
  def ivfTopKPortable(queries: DataFrame, cand: DataFrame, dim: Int,
                      k: Int, nCells: Int, nProbe: Int): DataFrame = {
    val cents = (0 until nCells).map(portableCentroid(_, dim))
    val topP = graft.expressions.VectorExpressions.topPDotExact(_, cents, _)
    val q = queries
      .select(col("vec_id").as("qid"),
        topP(col("embedding"), nProbe).as("__probes"))
      .select(col("qid"), explode(col("__probes")).as("cell"))
    val c = spreadForExpr(cand).select(col("vec_id").as("cid"),
      topP(col("embedding"), 1).getItem(0).as("cell"))
    val pairs = broadcast(q).join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
    scorePairsTopK(pairs, queries,
      cand.select(col("vec_id").as("cid"), col("embedding").as("ce")),
      k, dotExactF)
  }

  /** Portable PQ codeword (s, w): components
    * [[portableUnit]]("pq:s:w:j") — the data-independent codebook
    * standing in for per-subspace k-means, so the whole PQ pipeline
    * replays in SQL. */
  private[graft] def portableCodeword(s: Int, w: Int,
                                      subDim: Int): Seq[Double] =
    (0 until subDim).map(j => portableUnit(s"pq:$s:$w:$j"))

  /** Portable PQ top-k (exhaustive ADC): encode every candidate to its
    * per-subspace exact-decimal argmin code (PqEncodeExactConst),
    * reconstruct the concatenated codeword vector, and score EVERY
    * (query, candidate) pair as the exact-decimal cosine between the
    * query and the reconstruction — the classic non-IVF PQ scan shape,
    * with candidates carrying m·log₂(kCodes) bits instead of dim
    * floats. Top k per query by (cos DESC, cid). */
  def pqTopKPortable(queries: DataFrame, cand: DataFrame, dim: Int,
                     k: Int, m: Int, kCodes: Int): DataFrame = {
    val books = (0 until m).map(s =>
      (0 until kCodes).map(w => portableCodeword(s, w, dim / m)))
    // exhaustive ADC: every (query, candidate) id pair; the candidate
    // side is the RECONSTRUCTION (doubles), so the tail scores it with
    // the type-polymorphic HOF fold
    val pairs = broadcast(queries.select(col("vec_id").as("qid")))
      .crossJoin(cand.select(col("vec_id").as("cid")))
      .filter(col("qid") =!= col("cid"))
    scorePairsTopK(pairs, queries,
      spreadForExpr(cand).select(col("vec_id").as("cid"),
        graft.expressions.VectorExpressions.pqRecon(
          graft.expressions.VectorExpressions.pqEncodeExact(
            col("embedding"), books, dim), books, dim).as("ce")),
      k, dotExact)
  }

  /** Portable LSH top-k: bucket both sides with [[lshBucketsPortable]],
    * take DISTINCT colliding (qid, cid) pairs — two longs through the
    * dedup shuffle, never the vectors — then score each unique pair
    * once with the exact-decimal cosine (per-row norms behind a
    * projection barrier, the e01 shape) and keep the top k per query
    * by (cos DESC, cid). Same candidate-generation scale shape as
    * Ann.annTopK: band equi-joins, never all-pairs. */
  def lshTopKPortable(queries: DataFrame, cand: DataFrame, dim: Int,
                      k: Int, bits: Int, tables: Int): DataFrame = {
    val qb = lshBucketsPortable(queries, "vec_id", "embedding", dim, bits,
      tables).select(col("table"), col("bucket"), col("id").as("qid"))
    val cb = lshBucketsPortable(spreadForExpr(cand), "vec_id", "embedding",
      dim, bits, tables)
      .select(col("table"), col("bucket"), col("id").as("cid"))
    val pairs = broadcast(qb).join(cb, Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    scorePairsTopK(pairs, queries,
      cand.select(col("vec_id").as("cid"), col("embedding").as("ce")),
      k, dotExactF)
  }

  /** Similarity-threshold calibration: the pre-dedup step that picks a
    * near-duplicate cosine cutoff EMPIRICALLY instead of by folklore —
    * bucket the corpus (portable LSH, the e20 family), score every
    * colliding pair once with the exact-decimal cosine, and histogram
    * the similarities into `nBins` equal bins over [−1, 1]. Each output
    * row carries the bin, its pair count, and the DESCENDING cumulative
    * count — "a threshold at this bin's lower edge merges cum_pairs
    * candidate pairs", read straight off the curve (SemDeDup, Abbas
    * 2023 §4, tunes its threshold from exactly this distribution).
    *
    * Scale shape: candidates via band equi-joins (never all-pairs), the
    * pair-dedup shuffle carries two longs, norms are once-per-row
    * behind the projection barrier, and the result is nBins rows — the
    * single-partition cumulative window is driver-sized by contract.
    * In production the input is a uniform SAMPLE of the corpus (the
    * curve is a distribution estimate; g04 provides the exact-n
    * sampler); the graded fixture calibrates on the full table.
    * Returns (bin, n_pairs, cum_pairs), highest-similarity bin first. */
  def simThresholdCalibration(emb: DataFrame, dim: Int, bits: Int,
                              tables: Int, nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    require(nBins >= 2, s"nBins=$nBins must be >= 2")
    // Bucket ONCE ([[spreadForExpr]] parallelizes the plane walk) into
    // a persisted (table, bucket, id) frame both join sides read — the
    // un-persisted self-join would evaluate the walk twice.
    val b = lshBucketsPortable(spreadForExpr(emb), "vec_id", "embedding",
        dim, bits,
        tables)
      .select("table", "bucket", "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      b.count()
      val pairs = b.select(col("table"), col("bucket"), col("id").as("qid"))
        .join(b.select(col("table"), col("bucket"), col("id").as("cid")),
          Seq("table", "bucket"))
        .filter(col("qid") < col("cid"))
        .select("qid", "cid").distinct()
      val qv = perRow(
        emb.select(col("vec_id").as("qid"), col("embedding").as("qe")),
        sqrt(dotExactF(col("qe"), col("qe"))), "nq")
      val cv = perRow(
        emb.select(col("vec_id").as("cid"), col("embedding").as("ce")),
        sqrt(dotExactF(col("ce"), col("ce"))), "nc")
      // bin from the DOUBLE cosine (bit-identical across engines: exact-
      // decimal dot, correctly-rounded sqrt/divide); the least/greatest
      // clamp absorbs the |cos| ≤ 1 + ulp rounding overshoot
      val cosD = dotExactF(col("qe"), col("ce")) / (col("nq") * col("nc"))
      val hist = pairs.join(qv, Seq("qid")).join(cv, Seq("cid"))
        .select(greatest(least(
          floor((cosD + lit(1.0)) * lit(nBins / 2.0)), lit(nBins - 1)),
          lit(0)).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
        .withColumn("cum_pairs",
          sum("n_pairs").over(Window.orderBy(desc("bin"))))
        .orderBy(desc("bin"))
      // ≤ nBins rows — collect to a local relation so the cache can be
      // dropped before returning (the pageRankTopK discipline)
      val rows = hist.collect()
      hist.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), hist.schema)
    } finally b.unpersist(blocking = false)
  }

  /** Portable spherical k-means, one Lloyd refinement round, graded as
    * a per-cluster summary: seed nCells centroids from
    * [[portableUnit]]("km:c:j"), assign every vector to its argmax
    * exact-decimal-dot cell, recompute each centroid as the
    * exact-decimal per-dimension mean of its members (empty cells keep
    * their seed — deterministic), reassign against the refined
    * centroids, and emit per final cell: member count, how many members
    * moved between the two assignments, and the exact-decimal sums of
    * the first two components. Every decision replays in ANSI SQL —
    * the graded twin of `Ann.kmeansCentroids` (whose seeded
    * hash-ordered init is engine-specific by design).
    *
    * Scale shape: assignments are scan-side fused expressions (no
    * shuffle, O(1) codegen size at any nCells); the update is ONE
    * partial-aggregable explode-groupBy whose output is the bounded
    * nCells×dim table (map-side combine reduces the shuffle to
    * partitions×nCells×dim rows); refined centroids ride back as
    * literal weights — the k×k Gram convention, k·dim doubles on the
    * driver. The nCells-row result materializes as a local relation and
    * the one persisted frame is dropped before returning. */
  def kmeansPortableSummary(cand: DataFrame, dim: Int,
                            nCells: Int): DataFrame = {
    import graft.util.Tables.dsum
    val ve = graft.expressions.VectorExpressions
    val init = (0 until nCells).map(c =>
      (0 until dim).map(j => portableUnit(s"km:$c:$j")))
    val base = spreadForExpr(cand)
      .select(col("vec_id").as("id"), col("embedding").as("e"))
      .withColumn("cell0", element_at(ve.topPDotExact(col("e"), init, 1), 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val upd = base
        .select(col("cell0"), posexplode(col("e")).as(Seq("j", "x")))
        .groupBy("cell0", "j")
        .agg(dsum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val means = upd.map { r =>
        (r.getInt(0), r.getInt(1)) -> r.getDouble(2) / r.getLong(3).toDouble
      }.toMap
      val cents2 = (0 until nCells).map(c =>
        (0 until dim).map(j => means.getOrElse((c, j), init(c)(j))))
      val out = base
        .withColumn("cell", element_at(ve.topPDotExact(col("e"), cents2, 1), 1))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          sum((col("cell") =!= col("cell0")).cast("int")).as("n_moved"),
          dsum(element_at(col("e"), 1).cast("double")).as("s0"),
          dsum(element_at(col("e"), 2).cast("double")).as("s1"))
        .orderBy("cell")
      val rows = out.collect()
      cand.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally base.unpersist(blocking = false)
  }

  /** Prototype-based data pruning (the D4 diversification step,
    * Tirumala et al. 2023 §3; SSL-prototypes, Sorscher et al. 2022):
    * assign every vector to its portable k-means cell (the SAME
    * "km:c:j" seed family as [[kmeansPortableSummary]] — cluster once,
    * prune and summarize from one assignment), rank each cell's
    * members by alignment with the cell centroid (most prototypical
    * first), and DROP the most prototypical `dropNum/dropDen` fraction
    * — the abundant near-prototype examples contribute least at large
    * data scale. The within-cell rank key is dot(e, cent)/‖e‖: the
    * centroid's own norm is constant inside a cell, so dividing by it
    * cannot change the order — and skipping it keeps every value on
    * the proven e01 tree (exact-decimal dot → double → one divide →
    * float cast). The keep rule is pure integers (dropDen·rk >
    * dropNum·n, the t24 tercile trick), so the whole table replays in
    * any engine.
    *
    * Scale shape: ONE fused-expression scan assigns each vector's cell
    * together with its dot value (ArgMaxDotScoreExact — no second fold,
    * no centroid join), and the per-cell rank window is
    * corpus/nCells-bounded (the e21 cell contract); at production
    * scale the rank cut becomes a sampled per-cell threshold joined
    * back (the t16 discussion). */
  def prototypePrune(cand: DataFrame, dim: Int, nCells: Int,
                     dropNum: Int = 1, dropDen: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dropNum >= 0 && dropDen > 0 && dropNum < dropDen,
      s"drop fraction $dropNum/$dropDen must be in [0, 1)")
    val ve = graft.expressions.VectorExpressions
    val init = (0 until nCells).map(c =>
      (0 until dim).map(j => portableUnit(s"km:$c:$j")))
    // ONE fused walk emits the assigned cell WITH its exact-decimal dot
    // (ArgMaxDotScoreExact) — an assign-then-join rendition would pay a
    // second decimal fold plus a centroid join for a value the argmax
    // already computed
    val base = perRow(
      spreadForExpr(cand)
        .select(col("vec_id").as("vid"), col("embedding").as("e"))
        .withColumn("__as", ve.argMaxDotScoreExact(col("e"), init)),
      sqrt(dotExactF(col("e"), col("e"))), "nq")
    val scored = base
      .select(col("vid"), col("__as.cell").as("cell"),
        (col("__as.sc") / col("nq")).cast("float").as("score"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("cell").orderBy(desc("score"), col("vid"))))
      .withColumn("keep",
        col("rk") * lit(dropDen.toLong)
          > count(lit(1)).over(Window.partitionBy("cell"))
            * lit(dropNum.toLong))
      .select("vid", "cell", "score", "rk", "keep")
      .orderBy("vid")
  }

  /** Symmetric int8 scalar quantization (SQ8) + exhaustive integer-dot
    * MIPS top-k — the cheapest production vector-compression family
    * (Faiss's ScalarQuantizer; Guo et al. 2020 §2 survey the
    * quantized-MIPS setting): ONE trained statistic (the corpus
    * max-|x|, exact under float abs/max — no arithmetic, so every
    * engine computes the identical value), a single global scale
    * s = maxAbs/127 (one correctly-rounded double divide), every
    * vector encoded scan-side to dim ints in [-127, 127], and every
    * (query, candidate) pair scored as the INTEGER code dot. With one
    * global scale the reconstruction inner product is s²·(code dot),
    * so integer ranking IS reconstruction-MIPS ranking — and the whole
    * pipeline (train, encode, score, rank) is exact integer/IEEE
    * arithmetic in any engine: the only e-family member whose oracle
    * needs no decimal machinery at all.
    *
    * Scale shape: training is one partial-aggregable max (a scalar to
    * the driver — the k×k Gram convention); encoding is a shuffle-free
    * scan-side transform (1 B/dim vs 4 B of float, int8 multiply-adds
    * SIMD-vectorize); the exhaustive scan is the declared e22 ADC
    * shape (broadcast queries, linear in the corpus). At production
    * scale the same encode composes with the e21 IVF cell join for
    * sublinear candidate generation — SQ8-in-IVF is the standard
    * billion-vector layout. */
  def sq8MipsTopK(queries: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxAbs = cand
      .agg(max(array_max(transform(col("embedding"), x => abs(x)))))
      .head.getFloat(0)
    require(maxAbs > 0f, s"sq8MipsTopK: corpus max|x| = $maxAbs")
    // float→double cast is exact; the divide is one correctly-rounded
    // IEEE op — the oracle recomputes the identical value in SQL
    val s = maxAbs.toDouble / 127.0
    // round-half-up as floor(v + 0.5): floor is exact and unambiguous
    // cross-engine (`round` tie conventions are not); the clamp can
    // never fire (|x|/s ≤ 127 + ulp) but states the int8 contract
    def code(c: Column): Column = transform(c, x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") / lit(s) + lit(0.5)))).cast("int"))
    val q = broadcast(queries
      .select(col("vec_id").as("qid"), code(col("embedding")).as("qcode")))
    val c = spreadForExpr(cand)
      .select(col("vec_id").as("cid"), code(col("embedding")).as("ccode"))
    val pairs = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        aggregate(
          zip_with(col("qcode"), col("ccode"), (a, b) => (a * b).cast("long")),
          lit(0L), (acc, x) => acc + x).as("idot"))
    val win = Window.partitionBy("qid").orderBy(desc("idot"), col("cid"))
    pairs.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .orderBy("qid", "rk")
  }

  /** Greedy Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    * diversified top-k: pull each query's exact top-`poolK` pool (the
    * e01 machinery), then greedily select `k` members maximizing
    * λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s), ties to the lower cid —
    * the retrieval-diversification step an LLM pipeline uses for
    * few-shot example selection and dedup-aware context packing.
    *
    * Float parity: pool and pair cosines are the e01 float-cast
    * exact-decimal cosine; the MMR score combines them in doubles
    * (each op correctly rounded, so any engine computes the same
    * value). λ and 1−λ arrive as SEPARATE literals because
    * 1.0 − 0.7 ≠ 0.7's decimal complement in binary — the caller pins
    * both sides of the split and the oracle embeds the same decimal
    * strings.
    *
    * Scale shape: the pool is a top-k candidate generation problem
    * (brute-force here at |Q| = 10; e20/e21's bucketed generation at
    * production |Q|), after which ALL state is |Q|-bounded: the pool
    * (|Q|·poolK rows), the pair-sim frame (|Q|·poolK² rows), and the
    * selection (≤ |Q|·k rows, collected per round — the k×k Gram
    * convention). Each greedy round is one distributed
    * join + window argmax over those bounded frames. */
  def mmrDiverseTopK(queries: DataFrame, cand: DataFrame, k: Int,
                     poolK: Int, lam: Double, omLam: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    // a pool smaller than k would silently emit < k picks per query
    require(poolK >= k && k >= 1,
      s"mmrDiverseTopK: need poolK ($poolK) >= k ($k) >= 1")
    val spark = queries.sparkSession
    val pool = bruteForceTopK(queries, cand, poolK)
      .select(col("qid"), col("cid"), col("cos").as("qc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      pool.count()
      // poolK >= k guards the REQUESTED pool; a small candidate set can
      // still realize fewer than k members for some query, which would
      // exhaust the greedy loop mid-way and silently emit < k picks —
      // fail loudly instead (one aggregation over the cached
      // |Q|·poolK-bounded frame)
      // one action covers both failure shapes: a NULL count after the
      // left join is a query with ZERO pool rows; a small count is a
      // realized pool the greedy loop would exhaust mid-way
      val bad = queries.select(col("vec_id").as("qid")).distinct()
        .join(pool.groupBy(col("qid")).agg(count(lit(1)).as("n")),
          Seq("qid"), "left")
        .filter(col("n").isNull || col("n") < k).limit(1).collect()
      if (bad.nonEmpty) {
        val realized =
          if (bad.head.isNullAt(1)) 0L else bad.head.getLong(1)
        throw new IllegalArgumentException(
          s"mmrDiverseTopK: query ${bad.head.get(0)} realized a pool of " +
            s"$realized < k=$k candidates — " +
            (if (realized == 0L) "an EMPTY pool; "
             else "not enough distinct candidates; ") +
            "nothing to diversify over")
      }
      val ev = cand.select(col("vec_id"), col("embedding"))
      // pairwise pool cosines, both directions (s is symmetric but the
      // lookup below is by the candidate side)
      val psim = pool.select(col("qid"), col("cid").as("a"))
        .join(pool.select(col("qid"), col("cid").as("b")), Seq("qid"))
        .filter(col("a") =!= col("b"))
        .join(ev.select(col("vec_id").as("a"), col("embedding").as("ea")),
          Seq("a"))
        .join(ev.select(col("vec_id").as("b"), col("embedding").as("eb")),
          Seq("b"))
        .select(col("qid"), col("a"), col("b"),
          cosineExact(col("ea"), col("eb")).cast("double").as("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        psim.count()
        val win = Window.partitionBy("qid").orderBy(desc("mmrd"), col("cid"))
        // (qid, cid, pick, mmr-as-double) — ≤ |Q|·k scalars
        var sel = Vector.empty[(Long, Long, Int, Double)]
        for (t <- 1 to k) {
          val base =
            if (sel.isEmpty)
              pool.withColumn("ms", lit(null).cast("double"))
            else {
              import spark.implicits._
              val selDf = sel.toDF("qid", "cid", "pick", "md")
              val ms = psim
                .join(broadcast(selDf.select(col("qid"), col("cid").as("b"))),
                  Seq("qid", "b"))
                .groupBy("qid", "a")
                .agg(max(col("s")).as("ms"))
                .withColumnRenamed("a", "cid")
              pool
                .join(broadcast(selDf.select("qid", "cid")),
                  Seq("qid", "cid"), "left_anti")
                .join(ms, Seq("qid", "cid"), "left")
            }
          val picked = base
            .withColumn("mmrd",
              lit(lam) * col("qc").cast("double") -
                lit(omLam) * coalesce(col("ms"), lit(0.0)))
            .withColumn("rr", row_number().over(win))
            .filter(col("rr") === 1)
            .select("qid", "cid", "mmrd")
            .collect()
          sel = sel ++ picked.map(r =>
            (r.getLong(0), r.getLong(1), t, r.getDouble(2)))
        }
        import spark.implicits._
        sel.toDF("qid", "cid", "pick", "md")
          .select(col("qid"), col("cid"), col("pick"),
            col("md").cast("float").as("mmr"))
          .orderBy("qid", "pick")
      } finally psim.unpersist(blocking = false)
    } finally pool.unpersist(blocking = false)
  }

  /** Self-validating recall columns for the approximate top-k queries
    * (e03/e04): compute the EXACT top-k of the same queries (broadcast
    * cross join + codegen'd double cosine — O(|Q|·n) with |Q| = 10, far
    * cheaper than the decimal e01 oracle) and attach, per row:
    *
    *  - `in_exact_topk` / `query_recall` — plain top-k overlap,
    *    INFORMATIVE ONLY: most fixture queries' exact top-5 sit near
    *    cos 0.3 (θ ≈ 72°), where every sublinear ANN method has
    *    near-zero collision probability by design — measured avg
    *    overlap 0.06–0.3 across SFs. Low overlap on near-orthogonal
    *    neighbors is correct ANN behavior, not a defect (the planted-
    *    cluster suite and AnnScaleProbe measure recall where neighbors
    *    ARE near: ≥ 0.9 / 0.9998).
    *  - `strong_recall` / `recall_ok` — the LOAD-BEARING invariant:
    *    among exact-top-k members with cosine ≥ `strongThr` (the
    *    fixture's planted near-dup level), the fraction the
    *    approximate result found; vacuously 1.0 for queries with no
    *    strong neighbor. A method that misses a genuinely-near
    *    neighbor fails this; AnnSuite asserts `recall_ok` all-true and
    *    full query coverage at every graded SF. */
  /** Session memo for the exact-top-k oracle below: it is a pure
    * function of (queries, cand, k) — keyed here by the canonicalized
    * analyzed plans, which embed the parquet paths, so distinct SF dirs
    * or filtered candidate sets can never alias — and FIVE graded
    * queries (e03/e04/e07/e08/e09) call it with identical arguments.
    * Memoizing the collected rows (≤ |Q|·k) makes one Verify/Bench pass
    * pay the O(|Q|·n) cross join once instead of five times; whichever
    * query runs first is timed at full cost. (The r10→r8 e03 "2.4×
    * regression" was NOT the operator: tools.AnnAbProbe measured the r8
    * lazy shape leaking its caches into the bench's second pass, so r8's
    * min-of-2 reported a warm-cache 0.80 s against the honest 1.75 s —
    * the bare operator is 0.76 s at sf0.1 either way.) */
  private val exactMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int), Array[Row]]()

  /** [[withTwinAgreement]]'s portable-twin pair sets, same lifecycle. */
  private val twinMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int), Set[(Long, Long)]]()

  /** The SOURCE PATHS feeding a frame, for memo keys. A canonicalized
    * plan string does NOT carry file locations (a parquet read prints
    * as `Relation [none#0L,…] parquet` whatever its path — verified in
    * round 14 after the twin memo silently collided across SF dirs and
    * graded sf0.01 agreement against sf0.001 pairs), so any memo keyed
    * on canonicalized plans alone conflates the same query over
    * different fixtures. Every memo key below appends this. */
  private[queries] def sourcePathsOf(df: DataFrame): String = sourcePaths(df)

  private def sourcePaths(df: DataFrame): String =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }.sorted.mkString(";")

  /** Drop all memoized exact-oracle rows. Bench calls this at the start
    * of EACH timing pass so every pass pays the declared validation cost
    * exactly once (otherwise pass 2 is memo-warm and the reported
    * min-of-2 understates the steady-state cost); Verify calls it at
    * startup so a long-lived session can never grade fresh results
    * against rows memoized from a since-regenerated fixture (the memo
    * key embeds only the parquet PATHS, not file contents). */
  def clearExactMemo(): Unit = { exactMemo.clear(); twinMemo.clear() }

  def withExactRecall(res0: DataFrame, queries: DataFrame, cand: DataFrame,
                      k: Int, strongThr: Double, floor: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = cand.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val win = Window.partitionBy("qid").orderBy(desc("cos_x"), col("cid"))
    val exactDf = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.operators.Ann.cosine(col("qe"), col("ce"))
          .cast("float").as("cos_x"))
      .withColumn("rk_x", row_number().over(win))
      .filter(col("rk_x") <= k)
    val memoKey = (
      queries.queryExecution.analyzed.canonicalized.toString
        + "@" + sourcePaths(queries),
      cand.queryExecution.analyzed.canonicalized.toString
        + "@" + sourcePaths(cand), k)
    // the oracle collect runs BEFORE res0 is persisted — a failed
    // O(|Q|·n) cross join must not leak a pinned cache (the
    // finally-guard below only covers the joined collect)
    val exactRows = exactMemo.computeIfAbsent(memoKey, _ => exactDf.collect())
    val exact = res0.sparkSession.createDataFrame(
      java.util.Arrays.asList(exactRows: _*), exactDf.schema)
    // `res` appears in two branches below (the per-query aggregate and
    // the row-level membership join). Exchange reuse does not fire
    // across differently-pruned branches (measured, SCALE.md t07), so
    // persist it: without this the entire ANN pipeline executes twice
    // per run. The exact side needs no persist — it lands as a ≤ |Q|·k
    // local relation via the memo and broadcasts into both branches.
    val res = res0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perQ = exact
      .join(res.select(col("qid"), col("cid"), lit(1).as("f")),
        Seq("qid", "cid"), "left")
      .groupBy("qid").agg(
        sum(coalesce(col("f"), lit(0))).as("n_exact_found"),
        sum((col("cos_x") >= strongThr).cast("int")).as("n_strong"),
        sum(((col("cos_x") >= strongThr).cast("int") *
          coalesce(col("f"), lit(0)))).as("n_strong_found"))
    val out = res
      .join(exact.select(col("qid"), col("cid"), lit(1).as("in_exact_topk")),
        Seq("qid", "cid"), "left")
      .withColumn("in_exact_topk", coalesce(col("in_exact_topk"), lit(0)))
      .join(perQ, Seq("qid"))
      .withColumn("query_recall", col("n_exact_found").cast("double") / k)
      .withColumn("strong_recall",
        when(col("n_strong") === 0, lit(1.0))
          .otherwise(col("n_strong_found").cast("double") / col("n_strong")))
      .withColumn("recall_ok", col("strong_recall") >= floor)
      .drop("n_exact_found", "n_strong", "n_strong_found")
    // Eager materialization + cache discipline (round-9 advisory): ONE
    // action computes the validated frame while the persisted subtree
    // is hot, then the fixture-sized cache entry is dropped. The
    // result is ≤ |Q|·k rows by the ANN query-set contract, so holding
    // it as a local relation is free — and a long-lived session no
    // longer accumulates pinned caches per e03/e04/e07/e08 run
    // (the bench tail's repeated `CacheManager: already cached`
    // warnings were this leak's symptom: re-persisting the same plans
    // run over run). PlanSuite pins the local-relation shape and the
    // empty cache.
    // finally-guarded: a failed collect (task retry storm) must not
    // leak the pinned cache either — the leak this discipline exists
    // to prevent
    val rows =
      try out.collect()
      finally res.unpersist()
    res0.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Appends per-query agreement columns (`twin`, `twin_overlap` =
    * |res ∩ twin| / k over each qid's top-k) against one of the
    * HASH-GRADED portable twins (e20/e21/e22) to a production-ANN
    * result. The production paths (e03/e04/e07–e09) are xxhash-seeded
    * and legitimately un-replayable in DuckDB; their exact-recall
    * columns pin quality, but nothing regression-pinned them BETWEEN
    * rounds against a DuckDB-anchored baseline (r13-verdict task 4).
    * The twin's pair set IS hash-graded every round, so a silent
    * production-path break (seed drift, bucketing bug) now moves
    * `twin_overlap` below its AnnSuite-asserted measured floor and
    * fails CORRECTNESS-adjacent grading instead of passing rows-only.
    *
    * `res` arrives as a ≤ |Q|·k-row LOCAL relation (withExactRecall's
    * contract) — the twin pipeline executes ONCE distributed and its
    * ≤ |Q|·k pairs collect; the overlap join runs driver-side so the
    * result stays a local relation (PlanSuite's e03 pin) and no new
    * cache entries appear. */
  def withTwinAgreement(res: DataFrame, twin: DataFrame, k: Int,
                        twinName: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StringType}
    // e21 backs both e04 and e08 (e22 both e07 and e09): memoize the
    // twin's pair set per canonicalized plan so a shared twin executes
    // once per session pass, not once per consumer. Same lifecycle as
    // exactMemo — Bench clears per pass (each pass pays the declared
    // twin cost once), Verify clears at startup (no stale-fixture rows).
    val memoKey = (twin.queryExecution.analyzed.canonicalized.toString
      + "@" + sourcePaths(twin), twinName, k)
    val twinPairs = twinMemo.computeIfAbsent(memoKey, _ =>
      twin.select(col("qid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val rows = res.collect()
    val schema = res.schema
    val qi = schema.fieldIndex("qid")
    val ci = schema.fieldIndex("cid")
    val perQ = rows.groupBy(_.getLong(qi)).map { case (q, rs) =>
      q -> rs.count(r => twinPairs((q, r.getLong(ci)))).toDouble / k
    }
    val outSchema = schema
      .add("twin", StringType, nullable = false)
      .add("twin_overlap", DoubleType, nullable = false)
    val outRows = rows.map(r => org.apache.spark.sql.Row.fromSeq(
      r.toSeq :+ twinName :+ perQ(r.getLong(qi))))
    res.sparkSession.createDataFrame(
      java.util.Arrays.asList(outRows: _*), outSchema)
  }

  /** Portable SemDeDup census — the hash-graded twin of e10's k-means
    * production path (the e20/e21/e22 treatment applied to semantic
    * dedup, r13-verdict task 3): cells come from md5-literal centroids
    * ("sd:c:j" — no k-means, the data-independent seeded assignment via
    * the same ArgMaxDotScoreExact fused scan e28 uses), within-cell
    * near-dup pairs score with the exact-decimal cosine at `threshold`,
    * duplicate groups form by `ccRounds` FIXED min-label rounds (the
    * a40 fixed-round convention — deterministic and engine-replayable
    * whether or not the spread converged), and each group keeps its
    * least-central member (min cent_align, id tie-break — SemDeDup's
    * keep-the-outlier rule). Graded as the per-cell census
    * (n_vectors, n_pairs, n_kept, sum_cluster, align_q) — every column
    * an exact integer (cent_align quantized at 2⁻²⁰ per row BEFORE the
    * sum, the t27 convention), so the ENTIRE pipeline — assignment,
    * pair search, clustering, keeper rule — replays in DuckDB and
    * hash-matches. A bounded result (≤ nCells rows): nothing
    * corpus-sized reaches the driver.
    *
    * Scale shape: one fused-expression scan assigns cells, the pair
    * search is the cell equi-join (never all-pairs — the e10/SemDeDup
    * contract), label rounds are node-keyed joins over the near-dup
    * pair set (tiny by construction), and the census is one
    * partial-aggregable pass. The `base` frame is referenced by the
    * pair join (twice) and the census — persisted once, dropped in a
    * finally. */
  def semDedupPortable(cand: DataFrame, dim: Int, nCells: Int,
                       threshold: Double, ccRounds: Int): DataFrame = {
    val (out, pinned) = semDedupCensus(cand, dim, nCells, threshold,
      ccRounds, pin = true)
    try {
      val rows = out.collect()
      cand.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** The LAZY census tree (no persist, no collect) — for plan
    * inspection only (DumpPlans/PlanSuite pin the cell-equi-join pair
    * search and the partial-aggregable census shapes, which the graded
    * path's collected LocalTableScan hides). Reads the shared subtrees
    * uncached: do not execute on real data. */
  private[graft] def semDedupPortablePlan(cand: DataFrame, dim: Int,
      nCells: Int, threshold: Double, ccRounds: Int): DataFrame =
    semDedupCensus(cand, dim, nCells, threshold, ccRounds, pin = false)._1

  /** Shared builder: `pin = true` persists + eagerly materializes the
    * twice-read subtrees (base: pair join + census; pairs: label rounds
    * + per-cell pair counts) and returns them for the caller to
    * unpersist; a mid-build failure unpersists whatever was already
    * pinned before rethrowing. */
  private def semDedupCensus(cand: DataFrame, dim: Int, nCells: Int,
                             threshold: Double, ccRounds: Int, pin: Boolean)
      : (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val ve = graft.expressions.VectorExpressions
    val cents = (0 until nCells).map(c =>
      (0 until dim).map(j => portableUnit(s"sd:$c:$j")))
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def stage(df: DataFrame): DataFrame =
      if (!pin) df
      else try {
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        pinned += p
        p.count()
        p
      } catch {
        case e: Throwable =>
          pinned.foreach(_.unpersist(blocking = false)); throw e
      }
    val base = stage(perRow(
      spreadForExpr(cand)
        .select(col("vec_id").as("id"), col("embedding").as("e"))
        .withColumn("__as",
          ve.argMaxDotScoreExact(col("e"), cents)),
      sqrt(dotExactF(col("e"), col("e"))), "nrm")
      .select(col("id"), col("e"), col("nrm"),
        col("__as.cell").as("cell"),
        (col("__as.sc") / col("nrm")).cast("float").as("cent_align")))
    val a = base.select(col("cell"), col("id").as("id_a"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = base.select(col("cell"), col("id").as("id_b"),
      col("e").as("eb"), col("nrm").as("nb"))
    // two-phase scoring (r17, the nearDupExact/semanticDedup pattern):
    // a codegen'd double-dot prefilter at (threshold − 0.01) drops the
    // background pairs BEFORE the exact-decimal dot — the margin is
    // ~13 orders of magnitude above double-vs-decimal fold drift plus
    // the float cast's 1e-7, so no pair whose exact float cos reaches
    // `threshold` can be dropped, and the exact scorer still decides
    // membership: the pair set is bit-identical to exact-scoring every
    // same-cell pair (which the DuckDB oracle replays).
    val pairs = stage(a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(ve.dotF(col("ea"), col("eb")) >=
        lit(threshold - 0.01) * col("na") * col("nb"))
      .select(col("cell"), col("id_a"), col("id_b"),
        (dotExactF(col("ea"), col("eb")) / (col("na") * col("nb")))
          .cast("float").as("cos"))
      .filter(col("cos") >= lit(threshold.toFloat))
      .select("cell", "id_a", "id_b"))
    val ue = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(
        pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    var lbl = ue.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to ccRounds) {
      val spread = ue
        .join(lbl.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("lbl"))
      lbl = lbl.unionByName(spread)
        .groupBy("id").agg(min("lbl").as("lbl"))
    }
    val labeled = base.select("id", "cell", "cent_align")
      .join(lbl.withColumnRenamed("lbl", "cluster"), Seq("id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("id")))
    val keepWin = Window.partitionBy("cluster")
      .orderBy(col("cent_align").asc, col("id").asc)
    val census = labeled
      .withColumn("keep",
        (row_number().over(keepWin) === 1).cast("long"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("keep")).as("n_kept"),
        sum(col("cluster")).as("sum_cluster"),
        sum(floor(col("cent_align").cast("double") * lit(1048576.0)
          + lit(0.5)).cast("long")).as("align_q"))
    val out = census
      .join(pairs.groupBy("cell").agg(count(lit(1)).as("n_pairs")),
        Seq("cell"), "left")
      .na.fill(0L, Seq("n_pairs"))
      .select("cell", "n_vectors", "n_pairs", "n_kept",
        "sum_cluster", "align_q")
      .orderBy("cell")
    (out, pinned.toList)
  }

  val qs: Seq[Q] = Seq(
    Q("e01_cosine_topk",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                         FROM embeddings WHERE vec_id < 10),
                   c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
                   el AS (SELECT qid, cid,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS p,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(38,18)) AS pq,
                            CAST(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS pc
                          FROM q CROSS JOIN c, generate_series(1, 64) AS t(i)
                          WHERE qid <> cid),
                   dots AS (SELECT qid, cid,
                              CAST(sum(p) AS DOUBLE) AS dot,
                              CAST(sum(pq) AS DOUBLE) AS nq,
                              CAST(sum(pc) AS DOUBLE) AS nc
                            FROM el GROUP BY qid, cid),
                   sims AS (SELECT qid, cid,
                              CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                            FROM dots),
                   ranked AS (SELECT qid, cid, cos,
                                CAST(row_number() OVER
                                  (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rk
                              FROM sims)
              SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 5
              ORDER BY qid, rk""")),

    // ---- E20 portable-LSH top-k (full hash oracle) --------------------
    // The d04/g20 pattern applied to the ANN family: the production LSH
    // path (e03) is seeded-Gaussian and engine-specific, so this twin
    // derives its hyperplanes from md5("t:b:j") (13 hex chars / 2⁵² −
    // 0.5 — exact IEEE, byte-identical cross-engine), decides sign bits
    // through exact-decimal dots, equi-joins (table, bucket), and
    // scores unique pairs with the e01 exact-decimal cosine — so the
    // ENTIRE sublinear retrieval pipeline (bucketing included, not just
    // the final scoring) replays in DuckDB and hash-matches. 8 tables ×
    // 6 bits over the 64-dim fixture.
    Q("e20_ann_lsh_portable",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        lshTopKPortable(emb.filter(col("vec_id") < 10), emb, dim = 64,
          k = 5, bits = 6, tables = 8)
      },
      Some {
        s"""WITH pl AS (SELECT t, b, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT t, b, sj,
                         md5(CAST(t AS VARCHAR) || ':' ||
                             CAST(b AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 7) tt(t),
                            generate_series(0, 5) bb(b),
                            generate_series(0, 63) jj(sj))),
             dots AS (SELECT e.vec_id AS vid, p.t, p.b,
                        CAST(sum(CAST(CAST(e.embedding[p.sj + 1] AS DOUBLE)
                                      * p.v AS DECIMAL(38,18))) AS DOUBLE)
                          AS s
                      FROM embeddings e, pl p
                      GROUP BY e.vec_id, p.t, p.b),
             sigs AS (SELECT vid, t,
                        CAST(sum(CASE WHEN s > 0
                                      THEN CAST(1 AS BIGINT) << b
                                      ELSE 0 END) AS BIGINT) AS bucket
                      FROM dots GROUP BY vid, t),
             prs AS (SELECT DISTINCT a.vid AS qid, c.vid AS cid
                     FROM sigs a JOIN sigs c
                       ON a.t = c.t AND a.bucket = c.bucket
                     WHERE a.vid < 10 AND a.vid <> c.vid),
             el AS (SELECT p.qid, p.cid,
                      CAST(CAST(qv.embedding[i] AS DOUBLE) *
                           CAST(cv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pd,
                      CAST(CAST(qv.embedding[i] AS DOUBLE) *
                           CAST(qv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pq,
                      CAST(CAST(cv.embedding[i] AS DOUBLE) *
                           CAST(cv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pc
                    FROM prs p
                    JOIN embeddings qv ON qv.vec_id = p.qid
                    JOIN embeddings cv ON cv.vec_id = p.cid,
                         generate_series(1, 64) AS g(i)),
             d2 AS (SELECT qid, cid,
                      CAST(sum(pd) AS DOUBLE) AS dot,
                      CAST(sum(pq) AS DOUBLE) AS nq,
                      CAST(sum(pc) AS DOUBLE) AS nc
                    FROM el GROUP BY qid, cid),
             sims AS (SELECT qid, cid,
                        CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                      FROM d2),
             ranked AS (SELECT qid, cid, cos,
                          CAST(row_number() OVER
                            (PARTITION BY qid ORDER BY cos DESC, cid)
                            AS INT) AS rk
                        FROM sims)
             SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 5
             ORDER BY qid, rk"""
      }),

    // ---- E21 portable-IVF top-k (full hash oracle) --------------------
    // e20's sibling for the IVF retrieval path (e04's production shape):
    // centroids are md5 literals (no k-means — the data-independent
    // seeded assignment), cell ranking rides the exact-decimal fused
    // expression, candidates come from the cell equi-join with 2-probe
    // queries, and scoring is the e01 exact-decimal cosine — the whole
    // pipeline replays in DuckDB. 16 cells, nProbe 2.
    Q("e21_ann_ivf_portable",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        ivfTopKPortable(emb.filter(col("vec_id") < 10), emb, dim = 64,
          k = 5, nCells = 16, nProbe = 2)
      },
      Some {
        s"""WITH ce AS (SELECT c, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT c, sj,
                         md5('ivf:' || CAST(c AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 15) cc(c),
                            generate_series(0, 63) jj(sj))),
             dots AS (SELECT e.vec_id AS vid, ce.c,
                        CAST(sum(CAST(CAST(e.embedding[ce.sj + 1] AS DOUBLE)
                                      * ce.v AS DECIMAL(38,18))) AS DOUBLE)
                          AS s
                      FROM embeddings e, ce
                      GROUP BY e.vec_id, ce.c),
             rk0 AS (SELECT vid, c,
                       row_number() OVER
                         (PARTITION BY vid ORDER BY s DESC, c) AS r
                     FROM dots),
             cnd AS (SELECT vid AS cid, c AS cell FROM rk0 WHERE r = 1),
             qpr AS (SELECT vid AS qid, c AS cell FROM rk0
                     WHERE r <= 2 AND vid < 10),
             prs AS (SELECT q.qid, c2.cid
                     FROM qpr q JOIN cnd c2 USING (cell)
                     WHERE q.qid <> c2.cid),
             el AS (SELECT p.qid, p.cid,
                      CAST(CAST(qv.embedding[i] AS DOUBLE) *
                           CAST(cv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pd,
                      CAST(CAST(qv.embedding[i] AS DOUBLE) *
                           CAST(qv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pq,
                      CAST(CAST(cv.embedding[i] AS DOUBLE) *
                           CAST(cv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pc
                    FROM prs p
                    JOIN embeddings qv ON qv.vec_id = p.qid
                    JOIN embeddings cv ON cv.vec_id = p.cid,
                         generate_series(1, 64) AS g(i)),
             d2 AS (SELECT qid, cid,
                      CAST(sum(pd) AS DOUBLE) AS dot,
                      CAST(sum(pq) AS DOUBLE) AS nq,
                      CAST(sum(pc) AS DOUBLE) AS nc
                    FROM el GROUP BY qid, cid),
             sims AS (SELECT qid, cid,
                        CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                      FROM d2),
             ranked AS (SELECT qid, cid, cos,
                          CAST(row_number() OVER
                            (PARTITION BY qid ORDER BY cos DESC, cid)
                            AS INT) AS rk
                        FROM sims)
             SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 5
             ORDER BY qid, rk"""
      }),

    // ---- E22 portable-PQ exhaustive ADC top-k (full hash oracle) ------
    // Completes the portable approximate-retrieval family (e20 LSH,
    // e21 IVF): candidates are PQ-quantized against md5-literal
    // codebooks (8 subspaces × 16 codes × 8 dims; exact-decimal L2²
    // argmin with ties to the lower code), and every pair scores as
    // the exact-decimal cosine between the query and the candidate's
    // RECONSTRUCTION — the classic exhaustive ADC scan, 32 bits per
    // candidate instead of 256 bytes. The oracle replays encode,
    // reconstruction, and scoring in DuckDB and hash-matches.
    Q("e22_ann_pq_portable",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        pqTopKPortable(emb.filter(col("vec_id") < 10), emb, dim = 64,
          k = 5, m = 8, kCodes = 16)
      },
      Some {
        s"""WITH cw AS (SELECT s, w, j,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT s, w, j,
                         md5('pq:' || CAST(s AS VARCHAR) || ':' ||
                             CAST(w AS VARCHAR) || ':' ||
                             CAST(j AS VARCHAR)) AS hx
                       FROM generate_series(0, 7) ss(s),
                            generate_series(0, 15) ww(w),
                            generate_series(0, 7) jj(j))),
             dist AS (SELECT e.vec_id AS vid, c.s, c.w,
                        CAST(sum(CAST(
                          (CAST(e.embedding[c.s * 8 + c.j + 1] AS DOUBLE)
                             - c.v) *
                          (CAST(e.embedding[c.s * 8 + c.j + 1] AS DOUBLE)
                             - c.v) AS DECIMAL(38,18))) AS DOUBLE) AS d2
                      FROM embeddings e, cw c
                      GROUP BY e.vec_id, c.s, c.w),
             codes AS (SELECT vid, s, w FROM
                         (SELECT vid, s, w,
                            row_number() OVER
                              (PARTITION BY vid, s ORDER BY d2, w) AS r
                          FROM dist)
                       WHERE r = 1),
             recon AS (SELECT co.vid, co.s * 8 + c.j + 1 AS i, c.v
                       FROM codes co
                       JOIN cw c ON c.s = co.s AND c.w = co.w),
             rn AS (SELECT vid,
                      CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)
                        AS n2
                    FROM recon GROUP BY vid),
             q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < 10),
             qn AS (SELECT qid,
                      CAST(sum(CAST(CAST(qe[i] AS DOUBLE) *
                                    CAST(qe[i] AS DOUBLE)
                                    AS DECIMAL(38,18))) AS DOUBLE) AS nq2
                    FROM q, generate_series(1, 64) AS g(i)
                    GROUP BY qid),
             el AS (SELECT q.qid, r.vid AS cid,
                      CAST(CAST(q.qe[r.i] AS DOUBLE) * r.v
                           AS DECIMAL(38,18)) AS pd
                    FROM q JOIN recon r ON q.qid <> r.vid),
             d2s AS (SELECT qid, cid, CAST(sum(pd) AS DOUBLE) AS dot
                     FROM el GROUP BY qid, cid),
             sims AS (SELECT d.qid, d.cid,
                        CAST(d.dot / (sqrt(qn.nq2) * sqrt(rn.n2))
                             AS FLOAT) AS cos
                      FROM d2s d
                      JOIN qn USING (qid)
                      JOIN rn ON rn.vid = d.cid),
             ranked AS (SELECT qid, cid, cos,
                          CAST(row_number() OVER
                            (PARTITION BY qid ORDER BY cos DESC, cid)
                            AS INT) AS rk
                        FROM sims)
             SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 5
             ORDER BY qid, rk"""
      }),

    // ---- E23 portable k-means cluster summary (full hash oracle) ------
    // The clustering op itself as a graded deliverable (corpus
    // bucketing, the stage SemDeDup and curriculum mixing build on):
    // md5-seeded centroids, exact-decimal argmax assignment, one
    // exact-decimal-mean Lloyd refinement, reassignment, per-cluster
    // counts/movement/component sums. The production path
    // (Ann.kmeansCentroids, inside e04/e08/e10) keeps its seeded
    // hash-ordered init; this is its portable twin, like e20-e22 for
    // retrieval. 16 cells over all vectors.
    Q("e23_kmeans_portable",
      (s, d) => kmeansPortableSummary(load(s, d, "embeddings"),
        dim = 64, nCells = 16),
      Some {
        s"""WITH ci AS (SELECT c, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT c, sj,
                         md5('km:' || CAST(c AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 15) cc(c),
                            generate_series(0, 63) jj(sj))),
             d0 AS (SELECT e.vec_id AS vid, ci.c,
                      CAST(sum(CAST(CAST(e.embedding[ci.sj + 1] AS DOUBLE)
                                    * ci.v AS DECIMAL(38,18))) AS DOUBLE)
                        AS sc
                    FROM embeddings e, ci
                    GROUP BY e.vec_id, ci.c),
             a0 AS (SELECT vid, c AS cell0,
                      row_number() OVER
                        (PARTITION BY vid ORDER BY sc DESC, c) AS r
                    FROM d0),
             asg0 AS (SELECT vid, cell0 FROM a0 WHERE r = 1),
             upd AS (SELECT a.cell0 AS c, g.i - 1 AS sj,
                       ${sqlDsum("CAST(e.embedding[g.i] AS DOUBLE)")}
                         / CAST(count(*) AS DOUBLE) AS v
                     FROM asg0 a
                     JOIN embeddings e ON e.vec_id = a.vid,
                          generate_series(1, 64) g(i)
                     GROUP BY a.cell0, g.i),
             c2 AS (SELECT ci.c, ci.sj, coalesce(u.v, ci.v) AS v
                    FROM ci LEFT JOIN upd u
                      ON u.c = ci.c AND u.sj = ci.sj),
             d2 AS (SELECT e.vec_id AS vid, c2.c,
                      CAST(sum(CAST(CAST(e.embedding[c2.sj + 1] AS DOUBLE)
                                    * c2.v AS DECIMAL(38,18))) AS DOUBLE)
                        AS sc
                    FROM embeddings e, c2
                    GROUP BY e.vec_id, c2.c),
             a2 AS (SELECT vid, c AS cell,
                      row_number() OVER
                        (PARTITION BY vid ORDER BY sc DESC, c) AS r
                    FROM d2),
             asg2 AS (SELECT vid, cell FROM a2 WHERE r = 1)
             SELECT CAST(f.cell AS INT) AS cell,
                    count(*) AS n,
                    CAST(sum(CASE WHEN f.cell <> a.cell0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_moved,
                    ${sqlDsum("CAST(e.embedding[1] AS DOUBLE)")} AS s0,
                    ${sqlDsum("CAST(e.embedding[2] AS DOUBLE)")} AS s1
             FROM asg2 f
             JOIN asg0 a USING (vid)
             JOIN embeddings e ON e.vec_id = f.vid
             GROUP BY f.cell ORDER BY cell"""
      }),

    // ---- E11 k-NN label propagation (majority vote) -------------------
    // Semi-supervised labeling: each query takes the modal `label`
    // among its exact top-5 cosine neighbors (ties → smaller label).
    // Composes Ann.labelVote over the e01 exact top-k so the whole
    // chain hash-matches; the production path feeds ivfTopK/pqTopK
    // output into the same labelVote (AnnSuite pins agreement).
    Q("e11_knn_label_vote",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        graft.operators.Ann.labelVote(
          bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5),
          emb.select(col("vec_id").as("cid"), col("label")))
          .orderBy("qid")
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                         FROM embeddings WHERE vec_id < 10),
                   c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
                   el AS (SELECT qid, cid,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS p,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(38,18)) AS pq,
                            CAST(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS pc
                          FROM q CROSS JOIN c, generate_series(1, 64) AS t(i)
                          WHERE qid <> cid),
                   dots AS (SELECT qid, cid,
                              CAST(sum(p) AS DOUBLE) AS dot,
                              CAST(sum(pq) AS DOUBLE) AS nq,
                              CAST(sum(pc) AS DOUBLE) AS nc
                            FROM el GROUP BY qid, cid),
                   sims AS (SELECT qid, cid,
                              CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                            FROM dots),
                   ranked AS (SELECT qid, cid,
                                row_number() OVER
                                  (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                              FROM sims),
                   v AS (SELECT qid, e.label, count(*) AS votes
                         FROM ranked JOIN embeddings e ON e.vec_id = ranked.cid
                         WHERE rk <= 5 GROUP BY qid, e.label),
                   p AS (SELECT qid, label, votes,
                           row_number() OVER
                             (PARTITION BY qid ORDER BY votes DESC, label) AS r
                         FROM v)
              SELECT qid, label AS pred_label, votes FROM p WHERE r = 1
              ORDER BY qid""")),

    // ---- E12 metadata-filtered similarity search ----------------------
    // Filtered retrieval (the most-requested vector-store feature):
    // top-k among ONLY the candidates passing a metadata predicate
    // (label = 3). Pre-filtering composes below every path in the ANN
    // family — here the exact-decimal brute force for the hash oracle;
    // the same .filter() on the candidate frame feeds ivfTopK/pqTopK
    // unchanged, with the predicate pushed to the candidate scan BELOW
    // the cell join (AnnSuite pins the filtered-IVF behavior). This is
    // the right 100 TB shape for selective filters; for ~unselective
    // ones, post-filtering the top-k' > k result is the documented
    // alternative.
    Q("e12_filtered_topk",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        bruteForceTopK(emb.filter(col("vec_id") < 10),
          emb.filter(col("label") === 3), k = 5)
          .orderBy("qid", "rk")
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                         FROM embeddings WHERE vec_id < 10),
                   c AS (SELECT vec_id AS cid, embedding AS ce
                         FROM embeddings WHERE label = 3),
                   el AS (SELECT qid, cid,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS p,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(38,18)) AS pq,
                            CAST(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS pc
                          FROM q CROSS JOIN c, generate_series(1, 64) AS t(i)
                          WHERE qid <> cid),
                   dots AS (SELECT qid, cid,
                              CAST(sum(p) AS DOUBLE) AS dot,
                              CAST(sum(pq) AS DOUBLE) AS nq,
                              CAST(sum(pc) AS DOUBLE) AS nc
                            FROM el GROUP BY qid, cid),
                   sims AS (SELECT qid, cid,
                              CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                            FROM dots),
                   ranked AS (SELECT qid, cid, cos,
                                CAST(row_number() OVER
                                  (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rk
                              FROM sims)
              SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 5
              ORDER BY qid, rk""")),

    // ---- E6 hybrid retrieval: BM25 ⊕ dense cosine via RRF -------------
    // The standard two-tower retrieval fusion: reciprocal-rank fusion
    // (Cormack et al.) of the lexical BM25 ranking (query term 'spark')
    // and the dense cosine ranking (neighbors of vec 0), each top-100,
    // rrf = Σ 1/(60 + rank). Rank-based fusion is what makes this
    // hash-matchable: ranks are integers, 1/(60+r) is one IEEE divide,
    // and both engines rank identical score bits (t10's arithmetic for
    // BM25, e01's exact-decimal dots for cosine). The lexical top-100
    // cut runs BEFORE its global row_number, so the unavoidable
    // single-partition rank window sees 100 rows, not the corpus.
    Q("e06_hybrid_rrf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lex = graft.operators.TextPipeline.bm25(
            load(s, d, "documents"), "doc_id", "text",
            queryTerms = Seq("spark"), withIdf = false)
          .limit(100) // bm25 output is (score DESC, doc_id)-sorted
          // constant partition key: the global rank is inherently
          // single-partition, but it runs AFTER limit(100) so that
          // partition holds ≤ 100 rows; the lit key only silences the
          // "No Partition Defined" warning that would otherwise mask
          // real unbounded-window regressions in the logs
          .select(col("doc_id"), row_number().over(
            Window.partitionBy(lit(1))
              .orderBy(col("score").desc, col("doc_id"))).as("r_lex"))
        val emb = load(s, d, "embeddings")
        val sem = bruteForceTopK(emb.filter(col("vec_id") === 0), emb, k = 100)
          .select(col("cid").as("doc_id"), col("rk").as("r_sem"))
        lex.join(sem, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("r_lex"), col("r_sem"),
            (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
             coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0))).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(
                   regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
               FROM documents),
              p AS (SELECT doc_id, count(*) AS dl,
                           count(CASE WHEN tok = 'spark' THEN 1 END) AS tf
                    FROM toks GROUP BY doc_id),
              st AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM p),
              lex AS (SELECT doc_id,
                        (1.0 * ((CAST(2.2 AS DOUBLE) * tf) /
                          (tf + CAST(1.2 AS DOUBLE) *
                            (0.25 + 0.75 * (dl / st.avgdl))))) AS score
                      FROM p, st WHERE tf > 0),
              lexr AS (SELECT doc_id,
                         CAST(row_number() OVER
                           (ORDER BY score DESC, doc_id) AS INT) AS r_lex
                       FROM lex),
              q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                    WHERE vec_id <> 0),
              el AS (SELECT cid,
                       CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS pr,
                       CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(38,18)) AS pq,
                       CAST(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS pc
                     FROM q CROSS JOIN c, generate_series(1, 64) AS t(i)),
              dots AS (SELECT cid, CAST(sum(pr) AS DOUBLE) AS dot,
                         CAST(sum(pq) AS DOUBLE) AS nq,
                         CAST(sum(pc) AS DOUBLE) AS nc
                       FROM el GROUP BY cid),
              sims AS (SELECT cid, CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                       FROM dots),
              semr AS (SELECT cid AS doc_id,
                         CAST(row_number() OVER
                           (ORDER BY cos DESC, cid) AS INT) AS r_sem
                       FROM sims),
              fused AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                          a.r_lex, b.r_sem,
                          (coalesce(CAST(1.0 AS DOUBLE) / (60 + a.r_lex), 0.0) +
                           coalesce(CAST(1.0 AS DOUBLE) / (60 + b.r_sem), 0.0)) AS rrf
                        FROM (SELECT * FROM lexr WHERE r_lex <= 100) a
                        FULL OUTER JOIN
                             (SELECT * FROM semr WHERE r_sem <= 100) b
                        ON a.doc_id = b.doc_id)
              SELECT doc_id, r_lex, r_sem, rrf FROM fused
              ORDER BY rrf DESC, doc_id LIMIT 20""")),

    // ---- E5 per-label embedding centroids (vector aggregation) --------
    // Class centroids / domain means over an embedding column — the
    // aggregation half of k-means and the lookup table for centroid-
    // based routing. posexplode → groupBy (label, dim): map-side partial
    // aggs, one shuffle of (labels × dim) keys, never a per-label
    // collect. Means use the exact-decimal numerator (dmean) so the
    // doubles are bit-identical cross-engine.
    Q("e05_label_centroids",
      (s, d) => load(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").as("idx"))
        .agg(graft.util.Tables.dmean(col("col").cast("double")).as("centroid"))
        .orderBy("label", "idx"),
      Some(s"""WITH f AS (SELECT label,
                   unnest(generate_series(0, len(embedding) - 1)) AS idx,
                   unnest(embedding) AS v
                 FROM embeddings)
               SELECT label, idx,
                      ${graft.util.Tables.sqlDmean("CAST(v AS DOUBLE)")} AS centroid
               FROM f GROUP BY label, idx ORDER BY label, idx""")),

    // ---- E13 per-label centroid drift ---------------------------------
    // L2 distance of every label's centroid from the global centroid —
    // the embedding-space "which slice sits off-distribution" monitor.
    // Exact-decimal means per (label, idx), exact-decimal Σdiff² per
    // label, correctly-rounded sqrt → full hash oracle. One explode
    // feeds both centroid levels (partial-aggregable).
    Q("e13_centroid_drift",
      (s, d) => {
        import graft.util.Tables.{dmean, dsum}
        val f = load(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .select(col("label"), col("pos").as("idx"),
            col("col").cast("double").as("v"))
        val byLabel = f.groupBy("label", "idx").agg(dmean(col("v")).as("c"))
        val global = f.groupBy("idx").agg(dmean(col("v")).as("g"))
        byLabel.join(global, "idx")
          .groupBy("label")
          .agg(sqrt(dsum((col("c") - col("g")) * (col("c") - col("g"))))
            .as("drift"))
          .orderBy("label")
      },
      Some(s"""WITH f AS (SELECT label,
                   unnest(generate_series(0, len(embedding) - 1)) AS idx,
                   CAST(unnest(embedding) AS DOUBLE) AS v
                 FROM embeddings),
                 bl AS (SELECT label, idx, ${graft.util.Tables.sqlDmean("v")}
                          AS c
                        FROM f GROUP BY label, idx),
                 gl AS (SELECT idx, ${graft.util.Tables.sqlDmean("v")} AS g
                        FROM f GROUP BY idx)
               SELECT bl.label,
                      sqrt(${graft.util.Tables.sqlDsum("(c - g) * (c - g)")})
                        AS drift
               FROM bl JOIN gl ON gl.idx = bl.idx
               GROUP BY bl.label ORDER BY bl.label""")),

    // ---- E14 Johnson–Lindenstrauss random projection ------------------
    // 64-dim embeddings projected to 16 via the Achlioptas ±1 sign
    // matrix derived from the portable multiplicative hash — the matrix
    // is never materialized and the projection reruns bit-identically
    // in any engine. One explode + one partial-aggregable groupBy.
    Q("e14_random_projection",
      (s, d) => graft.operators.Ann.randomProjection(
          load(s, d, "embeddings"), "vec_id", "embedding", outDim = 16)
        .orderBy("vec_id", "j"),
      Some(s"""WITH f AS (SELECT vec_id,
                   unnest(generate_series(0, len(embedding) - 1)) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
                 FROM embeddings),
                 x AS (SELECT f.vec_id, f.i, f.v, js.j
                       FROM f CROSS JOIN
                         (SELECT unnest(generate_series(0, 15)) AS j) js),
                 sgn AS (SELECT vec_id, j, v,
                           1.0 - 2.0 * CAST((((i * 16 + j) % 100000007)
                             * 1315423911 % 100000007) % 2 AS DOUBLE) AS sg
                         FROM x)
               SELECT vec_id, j,
                      ${graft.util.Tables.sqlDsum("v * sg")} / sqrt(16.0)
                        AS out
               FROM sgn GROUP BY vec_id, j ORDER BY vec_id, j""")),

    // ---- E24 similarity-threshold calibration (full hash oracle) ------
    // The dedup-threshold tuning curve: portable-LSH candidate pairs
    // over the whole table (qid < cid, once each), exact-decimal
    // cosine, 20-bin histogram over [-1, 1] with descending cumulative
    // counts. Same pl/dots/sigs pipeline as the e20 oracle, un-filtered
    // but at bits = 10: longer bucket keys bias collisions toward the
    // high-similarity region the threshold lives in — a sharper
    // calibration sample at ~15× fewer scored pairs than the 6-bit
    // background-dominated curve (254,924 → ~16k pairs at sf0.1).
    Q("e24_sim_calibration",
      (s, d) => simThresholdCalibration(load(s, d, "embeddings"),
        dim = 64, bits = 10, tables = 8, nBins = 20),
      Some {
        s"""WITH pl AS (SELECT t, b, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT t, b, sj,
                         md5(CAST(t AS VARCHAR) || ':' ||
                             CAST(b AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 7) tt(t),
                            generate_series(0, 9) bb(b),
                            generate_series(0, 63) jj(sj))),
             dots AS (SELECT e.vec_id AS vid, p.t, p.b,
                        CAST(sum(CAST(CAST(e.embedding[p.sj + 1] AS DOUBLE)
                                      * p.v AS DECIMAL(38,18))) AS DOUBLE)
                          AS s
                      FROM embeddings e, pl p
                      GROUP BY e.vec_id, p.t, p.b),
             sigs AS (SELECT vid, t,
                        CAST(sum(CASE WHEN s > 0
                                      THEN CAST(1 AS BIGINT) << b
                                      ELSE 0 END) AS BIGINT) AS bucket
                      FROM dots GROUP BY vid, t),
             prs AS (SELECT DISTINCT a.vid AS qid, c.vid AS cid
                     FROM sigs a JOIN sigs c
                       ON a.t = c.t AND a.bucket = c.bucket
                     WHERE a.vid < c.vid),
             el AS (SELECT p.qid, p.cid,
                      CAST(CAST(qv.embedding[i] AS DOUBLE) *
                           CAST(cv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pd,
                      CAST(CAST(qv.embedding[i] AS DOUBLE) *
                           CAST(qv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pq,
                      CAST(CAST(cv.embedding[i] AS DOUBLE) *
                           CAST(cv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pc
                    FROM prs p
                    JOIN embeddings qv ON qv.vec_id = p.qid
                    JOIN embeddings cv ON cv.vec_id = p.cid,
                         generate_series(1, 64) AS g(i)),
             d2 AS (SELECT qid, cid,
                      CAST(sum(pd) AS DOUBLE) AS dot,
                      CAST(sum(pq) AS DOUBLE) AS nq,
                      CAST(sum(pc) AS DOUBLE) AS nc
                    FROM el GROUP BY qid, cid),
             binned AS (SELECT CAST(greatest(least(
                          floor((dot / (sqrt(nq) * sqrt(nc)) + 1.0) * 10.0),
                          19.0), 0.0) AS INT) AS bin
                        FROM d2),
             hist AS (SELECT bin, count(*) AS n_pairs
                      FROM binned GROUP BY bin)
             SELECT bin, n_pairs,
                    CAST(sum(n_pairs) OVER (ORDER BY bin DESC) AS BIGINT)
                      AS cum_pairs
             FROM hist ORDER BY bin DESC"""
      }),

    // ---- E25 SQ8 integer-dot MIPS top-k (full hash oracle) ------------
    // Scalar quantization joins the compression family (e22 is vector
    // quantization): train = one exact float max, encode = int8 codes
    // from ONE global scale, score = pure INTEGER dots — with a global
    // scale, integer ranking equals reconstruction-MIPS ranking, and
    // the oracle is exact integer arithmetic end to end (the only
    // e-family oracle with no decimal accumulators).
    Q("e25_sq8_mips_topk",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        sq8MipsTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      },
      Some("""WITH sc AS (SELECT CAST(max(list_aggregate(
                            list_transform(embedding, x -> abs(x)), 'max'))
                            AS DOUBLE) / CAST(127 AS DOUBLE) AS s
                          FROM embeddings),
                   codes AS (SELECT vec_id, i,
                               GREATEST(CAST(-127 AS BIGINT),
                                 LEAST(CAST(127 AS BIGINT),
                                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                                     / (SELECT s FROM sc) + 0.5) AS BIGINT)))
                                 AS qd
                             FROM embeddings, generate_series(1, 64) g(i)),
                   dots AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                              CAST(sum(q.qd * c.qd) AS BIGINT) AS idot
                            FROM codes q JOIN codes c USING (i)
                            WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
                            GROUP BY q.vec_id, c.vec_id),
                   ranked AS (SELECT qid, cid, idot,
                                CAST(row_number() OVER
                                  (PARTITION BY qid
                                   ORDER BY idot DESC, cid) AS INT) AS rk
                              FROM dots)
              SELECT qid, cid, idot, rk FROM ranked WHERE rk <= 5
              ORDER BY qid, rk""")),

    // ---- E26 MMR diversified top-k (full hash oracle) -----------------
    // Greedy Maximal Marginal Relevance over the exact top-12 pool:
    // λ = 0.7 relevance vs 0.3 redundancy (both pinned as decimal
    // literals — 1 − 0.7 is NOT binary-0.3), ties to the lower cid.
    // The oracle replays the greedy loop as a recursive CTE whose rows
    // carry the selected-set LIST; the max-redundancy term is a pure
    // list lambda over the pool-pair sim lists (the t23 pattern: no
    // aggregates over the recursive reference).
    Q("e26_mmr_diverse",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        mmrDiverseTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
          poolK = 12, lam = 0.7, omLam = 0.3)
      },
      Some("""WITH RECURSIVE
                   el AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                            CAST(CAST(q.embedding[i] AS DOUBLE) *
                                 CAST(c.embedding[i] AS DOUBLE)
                                 AS DECIMAL(38,18)) AS pd,
                            CAST(CAST(q.embedding[i] AS DOUBLE) *
                                 CAST(q.embedding[i] AS DOUBLE)
                                 AS DECIMAL(38,18)) AS pq,
                            CAST(CAST(c.embedding[i] AS DOUBLE) *
                                 CAST(c.embedding[i] AS DOUBLE)
                                 AS DECIMAL(38,18)) AS pc
                          FROM embeddings q CROSS JOIN embeddings c,
                               generate_series(1, 64) AS t(i)
                          WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
                   sims AS (SELECT qid, cid,
                              CAST(CAST(sum(pd) AS DOUBLE) /
                                   (sqrt(CAST(sum(pq) AS DOUBLE)) *
                                    sqrt(CAST(sum(pc) AS DOUBLE)))
                                   AS FLOAT) AS cos
                            FROM el GROUP BY qid, cid),
                   pool AS (SELECT qid, cid, cos AS qc FROM
                              (SELECT qid, cid, cos,
                                 row_number() OVER
                                   (PARTITION BY qid
                                    ORDER BY cos DESC, cid) AS rk
                               FROM sims)
                            WHERE rk <= 12),
                   pp AS (SELECT p1.qid, p1.cid AS a, p2.cid AS b
                          FROM pool p1 JOIN pool p2 USING (qid)
                          WHERE p1.cid <> p2.cid),
                   el2 AS (SELECT pp.qid, pp.a, pp.b,
                             CAST(CAST(va.embedding[i] AS DOUBLE) *
                                  CAST(vb.embedding[i] AS DOUBLE)
                                  AS DECIMAL(38,18)) AS pd,
                             CAST(CAST(va.embedding[i] AS DOUBLE) *
                                  CAST(va.embedding[i] AS DOUBLE)
                                  AS DECIMAL(38,18)) AS pa,
                             CAST(CAST(vb.embedding[i] AS DOUBLE) *
                                  CAST(vb.embedding[i] AS DOUBLE)
                                  AS DECIMAL(38,18)) AS pb
                           FROM pp
                           JOIN embeddings va ON va.vec_id = pp.a
                           JOIN embeddings vb ON vb.vec_id = pp.b,
                                generate_series(1, 64) AS g(i)),
                   ps AS (SELECT qid, a, b,
                            CAST(CAST(CAST(sum(pd) AS DOUBLE) /
                                 (sqrt(CAST(sum(pa) AS DOUBLE)) *
                                  sqrt(CAST(sum(pb) AS DOUBLE)))
                                 AS FLOAT) AS DOUBLE) AS sv
                          FROM el2 GROUP BY qid, a, b),
                   wl AS (SELECT qid, a AS cid,
                            list(struct_pack(b := b, s := sv)) AS ws
                          FROM ps GROUP BY qid, a),
                   rec(qid, pick, cid, md, sel) AS (
                     SELECT qid, 1, cid, md, [cid] FROM
                       (SELECT qid, cid, md,
                          row_number() OVER
                            (PARTITION BY qid ORDER BY md DESC, cid) AS rr
                        FROM (SELECT qid, cid,
                                CAST('0.7' AS DOUBLE) * CAST(qc AS DOUBLE)
                                  - CAST('0.3' AS DOUBLE) *
                                    CAST(0.0 AS DOUBLE) AS md
                              FROM pool))
                     WHERE rr = 1
                     UNION ALL
                     SELECT qid, pick + 1, cid, md, list_append(sel, cid)
                     FROM (
                       SELECT qid, pick, cid, md, sel,
                              row_number() OVER
                                (PARTITION BY qid
                                 ORDER BY md DESC, cid) AS rr
                       FROM (
                         SELECT r.qid, r.pick, c.cid,
                                CAST('0.7' AS DOUBLE) *
                                  CAST(c.qc AS DOUBLE)
                                - CAST('0.3' AS DOUBLE) * coalesce(
                                    list_max(list_transform(
                                      list_filter(w.ws,
                                        x -> list_contains(r.sel, x.b)),
                                      x -> x.s)),
                                    CAST(0.0 AS DOUBLE)) AS md,
                                r.sel
                         FROM (SELECT * FROM rec WHERE pick < 5) r
                         JOIN pool c ON c.qid = r.qid
                           AND NOT list_contains(r.sel, c.cid)
                         LEFT JOIN wl w ON w.qid = r.qid
                           AND w.cid = c.cid))
                     WHERE rr = 1)
              SELECT qid, cid, CAST(pick AS INT) AS pick,
                     CAST(md AS FLOAT) AS mmr
              FROM rec ORDER BY qid, pick""")),

    // ---- E27 contrastive hard-negative mining --------------------------
    // The embedding-training data op (DPR, Karpukhin 2020 §4.2; ANCE,
    // Xiong 2021): for each anchor, the top-k most-similar corpus
    // vectors whose LABEL DIFFERS — maximally confusable negatives for
    // a contrastive batch. Same exact-decimal cosine machinery as e01
    // (once-per-row norms, spread candidate side), plus the label
    // inequality applied IN the pair space before ranking. The graded
    // fixture mines exactly over |Q|·n pairs (the declared e01
    // contract); at production scale the pair space comes from the e21
    // IVF cell join with the label filter pushed into the candidate
    // scan, same as e12's global filter.
    Q("e27_hard_negatives",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = load(s, d, "embeddings")
        val q = perRow(emb.filter(col("vec_id") < 20)
            .select(col("vec_id").as("qid"), col("label").as("qlab"),
              col("embedding").as("qe")),
          sqrt(dotExactF(col("qe"), col("qe"))), "nq")
        val c = perRow(spreadForExpr(emb)
            .select(col("vec_id").as("cid"), col("label").as("clab"),
              col("embedding").as("ce")),
          sqrt(dotExactF(col("ce"), col("ce"))), "nc")
        val pairs = broadcast(q).crossJoin(c)
          .filter(col("qlab") =!= col("clab"))
          .select(col("qid"), col("qlab"), col("cid"), col("clab"),
            (dotExactF(col("qe"), col("ce")) / (col("nq") * col("nc")))
              .cast("float").as("cos"))
        val win = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
        pairs.withColumn("rk", row_number().over(win))
          .filter(col("rk") <= 5)
          .orderBy("qid", "rk")
      },
      Some("""WITH q AS (SELECT vec_id AS qid, label AS qlab,
                           embedding AS qe
                         FROM embeddings WHERE vec_id < 20),
                   c AS (SELECT vec_id AS cid, label AS clab,
                           embedding AS ce
                         FROM embeddings),
                   el AS (SELECT qid, qlab, cid, clab,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS p,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(38,18)) AS pq,
                            CAST(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS pc
                          FROM q CROSS JOIN c, generate_series(1, 64) AS t(i)
                          WHERE qlab <> clab),
                   dots AS (SELECT qid, qlab, cid, clab,
                              CAST(sum(p) AS DOUBLE) AS dot,
                              CAST(sum(pq) AS DOUBLE) AS nq,
                              CAST(sum(pc) AS DOUBLE) AS nc
                            FROM el GROUP BY qid, qlab, cid, clab),
                   sims AS (SELECT qid, qlab, cid, clab,
                              CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                            FROM dots),
                   ranked AS (SELECT qid, qlab, cid, clab, cos,
                                CAST(row_number() OVER
                                  (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rk
                              FROM sims)
              SELECT qid, qlab, cid, clab, cos, rk FROM ranked
              WHERE rk <= 5 ORDER BY qid, rk""")),

    // ---- E28 prototype-based data pruning (D4 diversification) --------
    // Cluster-then-prune data curation (D4, Tirumala 2023; SSL
    // prototypes, Sorscher 2022): every vector lands in its e23
    // portable-k-means cell, each cell ranks members by centroid
    // alignment, and the most prototypical quarter is dropped. The full
    // keep/drop table hash-matches: the assignment replays e23's d0/a0
    // chain verbatim, the rank key rides the e01 float-cast tree, and
    // the cut is pure integer arithmetic.
    Q("e28_prototype_prune",
      (s, d) => prototypePrune(load(s, d, "embeddings"),
        dim = 64, nCells = 16, dropNum = 1, dropDen = 4),
      Some {
        s"""WITH ci AS (SELECT c, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT c, sj,
                         md5('km:' || CAST(c AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 15) cc(c),
                            generate_series(0, 63) jj(sj))),
             d0 AS (SELECT e.vec_id AS vid, ci.c,
                      CAST(sum(CAST(CAST(e.embedding[ci.sj + 1] AS DOUBLE)
                                    * ci.v AS DECIMAL(38,18))) AS DOUBLE)
                        AS sc
                    FROM embeddings e, ci
                    GROUP BY e.vec_id, ci.c),
             a0 AS (SELECT vid, c AS cell, sc,
                      row_number() OVER
                        (PARTITION BY vid ORDER BY sc DESC, c) AS r
                    FROM d0),
             asg AS (SELECT vid, cell, sc FROM a0 WHERE r = 1),
             nrm AS (SELECT vec_id AS vid,
                       sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE)
                                          * CAST(embedding[i] AS DOUBLE)
                                          AS DECIMAL(38,18))) AS DOUBLE))
                         AS nq
                     FROM embeddings, generate_series(1, 64) t(i)
                     GROUP BY vec_id),
             sc AS (SELECT a.vid, a.cell,
                      CAST(a.sc / n.nq AS FLOAT) AS score
                    FROM asg a JOIN nrm n USING (vid)),
             r AS (SELECT vid, cell, score,
                     row_number() OVER
                       (PARTITION BY cell ORDER BY score DESC, vid) AS rk,
                     count(*) OVER (PARTITION BY cell) AS n
                   FROM sc)
             SELECT vid, CAST(cell AS INT) AS cell, score,
                    CAST(rk AS INT) AS rk, 4 * rk > n AS keep
             FROM r ORDER BY vid"""
      }),

    // ---- E29 ANN recall@k evaluation ------------------------------------
    // The standard retrieval-quality harness: per query, how much of
    // the EXACT top-5 (e01's brute-force machinery) the portable IVF
    // (e21's machinery, nProbe = 2) recovered. Both sides score with
    // the same exact-decimal cosine, so the overlap join — and the
    // whole eval — replays in DuckDB; recall is one IEEE division of
    // the exact hit count. The |Q|·k frames are tiny; the cost is the
    // two retrievals themselves (shared scan, bounded candidates).
    Q("e29_ann_recall",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 10)
        val approx = ivfTopKPortable(q, emb, dim = 64, k = 5,
            nCells = 16, nProbe = 2)
          .select(col("qid"), col("cid"), lit(1L).as("__hit"))
        bruteForceTopK(q, emb, k = 5)
          .select("qid", "cid")
          .join(approx, Seq("qid", "cid"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
          .select(col("qid"), col("hits"),
            (col("hits").cast("double") / lit(5.0)).as("recall"))
          .orderBy("qid")
      },
      Some {
        s"""WITH $sqlExactTop5Chain,
             ce AS (SELECT c, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT c, sj,
                         md5('ivf:' || CAST(c AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 15) cc(c),
                            generate_series(0, 63) jj(sj))),
             vdots AS (SELECT e.vec_id AS vid, ce.c,
                         CAST(sum(CAST(CAST(e.embedding[ce.sj + 1] AS DOUBLE)
                                       * ce.v AS DECIMAL(38,18))) AS DOUBLE)
                           AS s
                       FROM embeddings e, ce
                       GROUP BY e.vec_id, ce.c),
             rk0 AS (SELECT vid, c,
                       row_number() OVER
                         (PARTITION BY vid ORDER BY s DESC, c) AS r
                     FROM vdots),
             cnd AS (SELECT vid AS cid, c AS cell FROM rk0 WHERE r = 1),
             qpr AS (SELECT vid AS qid, c AS cell FROM rk0
                     WHERE r <= 2 AND vid < 10),
             prs AS (SELECT q.qid, c2.cid
                     FROM qpr q JOIN cnd c2 USING (cell)
                     WHERE q.qid <> c2.cid),
             vel AS (SELECT p.qid, p.cid,
                       CAST(CAST(qv.embedding[i] AS DOUBLE) *
                            CAST(cv.embedding[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pd,
                       CAST(CAST(qv.embedding[i] AS DOUBLE) *
                            CAST(qv.embedding[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pq,
                       CAST(CAST(cv.embedding[i] AS DOUBLE) *
                            CAST(cv.embedding[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pc
                     FROM prs p
                     JOIN embeddings qv ON qv.vec_id = p.qid
                     JOIN embeddings cv ON cv.vec_id = p.cid,
                          generate_series(1, 64) AS g(i)),
             vd AS (SELECT qid, cid,
                      CAST(sum(pd) AS DOUBLE) AS dot,
                      CAST(sum(pq) AS DOUBLE) AS nq,
                      CAST(sum(pc) AS DOUBLE) AS nc
                    FROM vel GROUP BY qid, cid),
             vs AS (SELECT qid, cid,
                      CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                    FROM vd),
             vr AS (SELECT qid, cid FROM
                      (SELECT qid, cid,
                         row_number() OVER
                           (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                       FROM vs)
                    WHERE rk <= 5),
             h AS (SELECT x.qid,
                     CAST(sum(CASE WHEN v.cid IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS hits
                   FROM xr x LEFT JOIN vr v
                     ON v.qid = x.qid AND v.cid = x.cid
                   GROUP BY x.qid)
             SELECT qid, hits, CAST(hits AS DOUBLE) / 5.0 AS recall
             FROM h ORDER BY qid"""
      }),

    // ---- E30 recall-vs-nProbe tuning curve -------------------------------
    // The standard IVF tuning artifact downstream of e29: recall@5 at
    // nProbe ∈ {1, 2, 4} from ONE candidate generation at the maximum
    // probe depth — each pair carries the probe rank of the cell that
    // produced it, scores ONCE with the exact-decimal cosine, and the
    // per-depth rankings just filter prank ≤ p. The |Q|·poolK pair
    // frame is never recomputed per depth.
    Q("e30_ivf_nprobe_sweep",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = load(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 10)
        val cents = (0 until 16).map(portableCentroid(_, 64))
        def topP(c: Column, p: Int) =
          graft.expressions.VectorExpressions.topPDotExact(c, cents, p)
        val qpr = q.select(col("vec_id").as("qid"),
            posexplode(topP(col("embedding"), 4)))
          .select(col("qid"), (col("pos") + 1).as("prank"),
            col("col").as("cell"))
        val c = spreadForExpr(emb).select(col("vec_id").as("cid"),
          topP(col("embedding"), 1).getItem(0).as("cell"))
        val pairs = broadcast(qpr).join(c, Seq("cell"))
          .filter(col("qid") =!= col("cid"))
          .select("qid", "cid", "prank")
        val qv = q.select(col("vec_id").as("qid"), col("embedding").as("qe"))
          .withColumn("nq", sqrt(dotExactF(col("qe"), col("qe"))))
        val cv = spreadForExpr(emb)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
          .withColumn("nc", sqrt(dotExactF(col("ce"), col("ce"))))
        val scored = pairs.join(broadcast(qv), Seq("qid")).join(cv, Seq("cid"))
          .select(col("qid"), col("cid"), col("prank"),
            (dotExactF(col("qe"), col("ce")) / (col("nq") * col("nc")))
              .cast("float").as("cos"))
        import s.implicits._
        val probes = Seq(1, 2, 4).toDF("nprobe")
        val win = Window.partitionBy("nprobe", "qid")
          .orderBy(desc("cos"), col("cid"))
        val approx = scored.join(broadcast(probes),
            col("prank") <= col("nprobe"))
          .withColumn("rk", row_number().over(win))
          .filter(col("rk") <= 5)
          .select("nprobe", "qid", "cid")
        val exact = bruteForceTopK(q, emb, 5).select("qid", "cid")
        probes.crossJoin(exact)
          .join(approx.withColumn("__hit", lit(1L)),
            Seq("nprobe", "qid", "cid"), "left")
          .groupBy("nprobe", "qid")
          .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
          .select(col("nprobe"), col("qid"), col("hits"),
            (col("hits").cast("double") / lit(5.0)).as("recall"))
          .orderBy("nprobe", "qid")
      },
      Some {
        s"""WITH $sqlExactTop5Chain,
             ce AS (SELECT c, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT c, sj,
                         md5('ivf:' || CAST(c AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 15) cc(c),
                            generate_series(0, 63) jj(sj))),
             vdots AS (SELECT e.vec_id AS vid, ce.c,
                         CAST(sum(CAST(CAST(e.embedding[ce.sj + 1] AS DOUBLE)
                                       * ce.v AS DECIMAL(38,18))) AS DOUBLE)
                           AS s
                       FROM embeddings e, ce
                       GROUP BY e.vec_id, ce.c),
             rk0 AS (SELECT vid, c,
                       row_number() OVER
                         (PARTITION BY vid ORDER BY s DESC, c) AS r
                     FROM vdots),
             cnd AS (SELECT vid AS cid, c AS cell FROM rk0 WHERE r = 1),
             qpr AS (SELECT vid AS qid, c AS cell,
                       CAST(r AS INT) AS prank FROM rk0
                     WHERE r <= 4 AND vid < 10),
             prs AS (SELECT q.qid, c2.cid, q.prank
                     FROM qpr q JOIN cnd c2 USING (cell)
                     WHERE q.qid <> c2.cid),
             vel AS (SELECT p.qid, p.cid, p.prank,
                       CAST(CAST(qv.embedding[i] AS DOUBLE) *
                            CAST(cv.embedding[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pd,
                       CAST(CAST(qv.embedding[i] AS DOUBLE) *
                            CAST(qv.embedding[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pq,
                       CAST(CAST(cv.embedding[i] AS DOUBLE) *
                            CAST(cv.embedding[i] AS DOUBLE)
                            AS DECIMAL(38,18)) AS pc
                     FROM prs p
                     JOIN embeddings qv ON qv.vec_id = p.qid
                     JOIN embeddings cv ON cv.vec_id = p.cid,
                          generate_series(1, 64) AS g(i)),
             vd AS (SELECT qid, cid, prank,
                      CAST(sum(pd) AS DOUBLE) AS dot,
                      CAST(sum(pq) AS DOUBLE) AS nq,
                      CAST(sum(pc) AS DOUBLE) AS nc
                    FROM vel GROUP BY qid, cid, prank),
             vs AS (SELECT qid, cid, prank,
                      CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                    FROM vd),
             pr AS (SELECT pb.p, s2.qid, s2.cid,
                      row_number() OVER
                        (PARTITION BY pb.p, s2.qid
                         ORDER BY s2.cos DESC, s2.cid) AS rk
                    FROM vs s2 JOIN (VALUES (1), (2), (4)) pb(p)
                      ON s2.prank <= pb.p),
             vrk AS (SELECT p, qid, cid FROM pr WHERE rk <= 5),
             h AS (SELECT pb.p AS nprobe, x.qid,
                     CAST(sum(CASE WHEN v.cid IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS hits
                   FROM (VALUES (1), (2), (4)) pb(p) CROSS JOIN xr x
                   LEFT JOIN vrk v
                     ON v.p = pb.p AND v.qid = x.qid AND v.cid = x.cid
                   GROUP BY pb.p, x.qid)
             SELECT nprobe, qid, hits, CAST(hits AS DOUBLE) / 5.0 AS recall
             FROM h ORDER BY nprobe, qid"""
      }),

    // ---- E31 portable SemDeDup census (full hash oracle) --------------
    // The e20/e21/e22 treatment applied to e10's pipeline: md5-literal
    // centroids instead of k-means, so assignment, within-cell pair
    // search, fixed-round min-label clustering, keep-the-outlier rule
    // AND the quantized census all replay in DuckDB — the whole
    // SemDeDup control flow is hash-graded, leaving only e10's k-means
    // centroids themselves to the suite-pinned invariants (nCells = 1
    // degenerate-exact + planted strong-dup recovery + recall floor,
    // DedupSuite/AnnSuite).
    Q("e31_semdedup_portable",
      (s, d) => semDedupPortable(load(s, d, "embeddings"), dim = 64,
        nCells = 8, threshold = 0.45, ccRounds = 3),
      Some {
        val rounds = (1 to 3).map { r =>
          s"""c$r AS (SELECT ue.dst AS id, min(l${r - 1}.lbl) AS lbl
                      FROM ue JOIN l${r - 1} ON ue.src = l${r - 1}.id
                      GROUP BY ue.dst),
              l$r AS (SELECT id, min(lbl) AS lbl FROM (
                        SELECT id, lbl FROM c$r UNION ALL
                        SELECT id, lbl FROM l${r - 1})
                      GROUP BY id)"""
        }.mkString(",\n")
        s"""WITH ce AS (SELECT c, sj,
                   $sqlPortableUnit
                     AS v
                 FROM (SELECT c, sj,
                         md5('sd:' || CAST(c AS VARCHAR) || ':' ||
                             CAST(sj AS VARCHAR)) AS hx
                       FROM generate_series(0, 7) cc(c),
                            generate_series(0, 63) jj(sj))),
             dots AS (SELECT e.vec_id AS vid, ce.c,
                        CAST(sum(CAST(CAST(e.embedding[ce.sj + 1] AS DOUBLE)
                                      * ce.v AS DECIMAL(38,18))) AS DOUBLE)
                          AS s
                      FROM embeddings e, ce
                      GROUP BY e.vec_id, ce.c),
             nr AS (SELECT vec_id AS vid,
                      sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE)
                                         * CAST(embedding[i] AS DOUBLE)
                                         AS DECIMAL(38,18))) AS DOUBLE))
                        AS nrm
                    FROM embeddings, generate_series(1, 64) t(i)
                    GROUP BY vec_id),
             al AS (SELECT a.vid AS id, CAST(a.c AS INTEGER) AS cell,
                      CAST(a.s / n.nrm AS FLOAT) AS cent_align
                    FROM (SELECT vid, c, s,
                            row_number() OVER
                              (PARTITION BY vid ORDER BY s DESC, c) AS r
                          FROM dots) a
                    JOIN nr n ON n.vid = a.vid
                    WHERE a.r = 1),
             prs AS (SELECT a.cell, a.id AS id_a, b.id AS id_b
                     FROM al a JOIN al b
                       ON a.cell = b.cell AND a.id < b.id),
             el AS (SELECT p.cell, p.id_a, p.id_b,
                      CAST(CAST(qv.embedding[i] AS DOUBLE) *
                           CAST(cv.embedding[i] AS DOUBLE)
                           AS DECIMAL(38,18)) AS pd
                    FROM prs p
                    JOIN embeddings qv ON qv.vec_id = p.id_a
                    JOIN embeddings cv ON cv.vec_id = p.id_b,
                         generate_series(1, 64) AS g(i)),
             d2 AS (SELECT cell, id_a, id_b,
                      CAST(sum(pd) AS DOUBLE) AS dot
                    FROM el GROUP BY cell, id_a, id_b),
             pr2 AS (SELECT d.cell, d.id_a, d.id_b
                     FROM d2 d
                     JOIN nr na ON na.vid = d.id_a
                     JOIN nr nb ON nb.vid = d.id_b
                     WHERE CAST(d.dot / (na.nrm * nb.nrm) AS FLOAT)
                       >= CAST(0.45 AS FLOAT)),
             ue AS (SELECT id_a AS src, id_b AS dst FROM pr2 UNION ALL
                    SELECT id_b AS src, id_a AS dst FROM pr2),
             l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM ue),
             $rounds,
             cl AS (SELECT al.id, al.cell, al.cent_align,
                      COALESCE(l3.lbl, al.id) AS cluster
                    FROM al LEFT JOIN l3 ON l3.id = al.id),
             kp AS (SELECT id, cell, cent_align, cluster,
                      CASE WHEN row_number() OVER
                        (PARTITION BY cluster
                         ORDER BY cent_align ASC, id ASC) = 1
                        THEN 1 ELSE 0 END AS keep
                    FROM cl),
             agg AS (SELECT cell, count(*) AS n_vectors,
                       CAST(sum(keep) AS BIGINT) AS n_kept,
                       CAST(sum(cluster) AS BIGINT) AS sum_cluster,
                       CAST(sum(CAST(floor(CAST(cent_align AS DOUBLE)
                         * 1048576.0 + 0.5) AS BIGINT)) AS BIGINT)
                         AS align_q
                     FROM kp GROUP BY cell),
             pc AS (SELECT cell, count(*) AS n_pairs FROM pr2
                    GROUP BY cell)
             SELECT a.cell, a.n_vectors,
                    CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
                    a.n_kept, a.sum_cluster, a.align_q
             FROM agg a LEFT JOIN pc p ON p.cell = a.cell
             ORDER BY a.cell"""
      })
  )
}
