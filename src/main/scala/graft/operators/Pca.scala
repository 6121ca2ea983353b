package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed PCA over the embedding column — the
  * dimensionality-reduction stage an embedding pipeline runs before ANN
  * (project to the leading components, score/serve on fewer dims at less
  * IO) and the drift lens a corpus monitor wants (the top component IS
  * the dominant axis of variation).
  *
  * Determinism doctrine ([[Graph]] / [[Classifier]]): every distributed
  * reduction sums values quantized ONCE to scaled longs
  * (`round(x · 2^32)`), so second moments, power-iteration matmuls, the
  * normalizer, the Rayleigh quotient, and the per-row projections are
  * all EXACT commutative sums — bit-identical under any partitioning and
  * reproducible by an unrolled SQL oracle (every float expression is one
  * fixed shape the oracle mirrors token-for-token).
  *
  * Scale shape: the corpus is touched by ONE `treeAggregate` pass that
  * folds each partition into a d + d² long array (first + second
  * moments together) — no shuffle at all; the reduce volume is d² per
  * partition regardless of corpus size. The d×d
  * covariance then lives driver-side (d=64 → 4 KB of longs) where power
  * iteration is a few thousand flops — never a distributed job. The
  * projection pass is one scan, zero shuffles (per-row fold against
  * broadcast-literal mean/component arrays).
  *
  * Overflow bound (why 2^32 is safe): with |x| ≤ B the quantized product
  * magnitude is ≤ B²·2^32, so n rows sum to ≤ n·B²·2^32 — for unit-norm
  * embeddings (B ≤ 1) that stays inside a signed long up to n ≈ 2^30
  * rows. Past that, shard the moment pass (per-shard exact longs, exact
  * long-sum merge) — the quantum does NOT need to shrink.
  */
object Pca {

  /** 2^32 — the shared message quantum (see [[Graph.Scale]]). */
  val Scale: Double = 4294967296.0

  /** Round-half-away-from-zero on a double — the shared quantizer.
    * Bit-equivalent to BOTH Spark's `round()` (BigDecimal HALF_UP over
    * the shortest decimal representation: a double ≠ 0.5 keeps its side
    * of 0.5 under round-trip-unique printing, a double == 0.5 rounds
    * away) and DuckDB's C-library `round()` — but allocation-free, which
    * matters at d² quantizations per row. The floor(x+0.5) shortcut
    * alone is WRONG for the largest double below 0.5 (the add rounds up
    * to 1.0); the correction term restores exactness. */
  @inline private[operators] def rnd(x: Double): Long =
    if (x >= 0) {
      val r = Math.floor(x + 0.5)
      // the add can round UP across the boundary (x = nextDown(0.5):
      // x+0.5 lands on 1.0); `x < r - 0.5` is exact because r - 0.5 is
      // representable at r's scale, unlike the earlier `r - x > 0.5`
      // form whose subtraction itself double-rounds back onto 0.5
      (if (x < r - 0.5) r - 1.0 else r).toLong
    } else {
      val r = Math.ceil(x - 0.5)
      (if (x > r + 0.5) r + 1.0 else r).toLong
    }

  /** Exact first+second moments: (n, S_i = Σ round(x_i·2^32),
    * Q_ij = Σ round(x_i·x_j·2^32)) — the sufficient statistics of the
    * covariance, as longs. ONE `treeAggregate` pass (the [[Classifier]]
    * shape): each partition folds its rows into a d + d² long array, the
    * merge is an exact long-vector sum — no row inflation, no shuffle,
    * and the reduce volume is d² per partition regardless of corpus
    * size. (A first cut exploded the per-row outer product into d²
    * struct rows for a groupBy — same exchange bound on paper, but the
    * 4096× row inflation plus per-element BigDecimal rounding made it
    * 60× slower at sf0.1.) */
  def moments(df: DataFrame, vecCol: String): (Long, Array[Long], Array[Array[Long]]) = {
    val rows = df.select(col(vecCol).cast("array<float>"))
    val first = rows.limit(1).collect()
    require(first.nonEmpty,
      s"Pca.moments: input is empty — no rows to derive the dimensionality from")
    val d = first.head.getSeq[Float](0).size
    val zero = new Array[Long](1 + d + d * d)
    val agg = rows.rdd.treeAggregate(zero)(
      seqOp = (acc, row) => {
        val v = row.getSeq[Float](0)
        acc(0) += 1L
        var i = 0
        while (i < d) {
          val xi = v(i).toDouble
          acc(1 + i) += rnd(xi * Scale)
          var j = 0
          val base = 1 + d + i * d
          while (j < d) { acc(base + j) += rnd(xi * v(j).toDouble * Scale); j += 1 }
          i += 1
        }
        acc
      },
      combOp = (a, b) => {
        var k = 0
        while (k < a.length) { a(k) += b(k); k += 1 }
        a
      })
    (agg(0), Array.tabulate(d)(i => agg(1 + i)),
      Array.tabulate(d, d)((i, j) => agg(1 + d + i * d + j)))
  }

  /** Covariance C_ij as a DataFrame (pos_i, pos_j, cov) — the
    * closing-division shape shared with the oracle:
    * (Q/2^32)/n − ((S_i/2^32)/n)·((S_j/2^32)/n). The corpus pass is the
    * distributed part ([[moments]]); the d×d assembly is driver-side by
    * construction (d² doubles, plan-literal sized). */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val (n, s, q) = moments(df, vecCol)
    val d = s.length
    val spark = df.sparkSession
    import spark.implicits._
    (for (i <- 0 until d; j <- 0 until d) yield {
      val cov = (q(i)(j).toDouble / Scale) / n -
        ((s(i).toDouble / Scale) / n) * ((s(j).toDouble / Scale) / n)
      (i.toLong, j.toLong, cov)
    }).toDF("pos_i", "pos_j", "cov")
  }

  /** First principal component + eigenvalue + per-dim mean. */
  final case class Model(mean: Array[Double], component: Array[Double], eigval: Double)

  /** Driver-side power iteration on the exact moments — the SAME
    * quantized arithmetic as the oracle's unrolled steps, so the
    * component vector is reproduced bit-for-bit by DuckDB. */
  def topComponent(df: DataFrame, vecCol: String, iters: Int): Model = {
    val (n, s, q) = moments(df, vecCol)
    topComponentFromMoments(n, s, q, iters)
  }

  /** The pure driver core ([[topComponent]] minus the distributed moment
    * pass) — also the sequential twin PcaSpec compares against. */
  def topComponentFromMoments(n: Long, s: Array[Long], q: Array[Array[Long]],
                              iters: Int): Model = {
    val mean = s.map(si => (si.toDouble / Scale) / n)
    val c = covFromMoments(n, s, q)
    val (v, lam) = powerIterate(c, iters)
    Model(mean, v, lam)
  }

  private def covFromMoments(n: Long, s: Array[Long],
                             q: Array[Array[Long]]): Array[Array[Double]] = {
    val d = s.length
    Array.tabulate(d, d) { (i, j) =>
      (q(i)(j).toDouble / Scale) / n -
        ((s(i).toDouble / Scale) / n) * ((s(j).toDouble / Scale) / n)
    }
  }

  /** One quantized power-iteration solve on a driver-side matrix —
    * the exact arithmetic the oracle's unrolled steps mirror. */
  private def powerIterate(c: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val d = c.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 0 until iters) {
      val uq = Array.tabulate(d) { i =>
        var acc = 0L
        var j = 0
        while (j < d) { acc += rnd(c(i)(j) * v(j) * Scale); j += 1 }
        acc
      }
      val w = uq.map(_.toDouble / Scale)
      var nq = 0L
      w.foreach(wv => nq += rnd(wv * wv * Scale))
      // zero-variance matrix: the step maps everything to 0 and the
      // normalizer vanishes — keep the previous vector instead of
      // dividing 0/0 into NaNs (eigval correctly reports 0)
      if (nq > 0L) {
        val nrm = math.sqrt(nq.toDouble / Scale)
        v = w.map(_ / nrm)
      }
    }
    var lq = 0L
    for (i <- 0 until d; j <- 0 until d) lq += rnd(c(i)(j) * v(i) * v(j) * Scale)
    (v, lq.toDouble / Scale)
  }

  /** Leading `k` components via deflation: solve, subtract the rank-one
    * term `λ·v·vᵀ` (one fixed double shape the oracle mirrors), solve
    * again. Power iteration on a deflated matrix converges to the NEXT
    * eigenvector because the removed direction now has eigenvalue ~0.
    * Returns components in eigenvalue order with the shared mean. */
  final case class Components(mean: Array[Double], comps: Seq[(Array[Double], Double)])

  def topComponents(df: DataFrame, vecCol: String, k: Int, iters: Int): Components = {
    val (n, s, q) = moments(df, vecCol)
    topComponentsFromMoments(n, s, q, k, iters)
  }

  def topComponentsFromMoments(n: Long, s: Array[Long], q: Array[Array[Long]],
                               k: Int, iters: Int): Components = {
    val mean = s.map(si => (si.toDouble / Scale) / n)
    var c = covFromMoments(n, s, q)
    val d = s.length
    val out = Seq.newBuilder[(Array[Double], Double)]
    for (m <- 0 until k) {
      val (v, lam) = powerIterate(c, iters)
      out += ((v, lam))
      if (m < k - 1)
        c = Array.tabulate(d, d)((i, j) => c(i)(j) - lam * v(i) * v(j))
    }
    Components(mean, out.result())
  }

  /** Moments are EXACT LONGS, so they are additive: merge = elementwise
    * long sum, and solve-on-merged is BIT-IDENTICAL to solve-on-union —
    * the O(delta) arrival path (the VectorIndex.appendCorpus /
    * incremental-BM25 doctrine applied to linear algebra). A new batch
    * costs one moment pass over the BATCH; the corpus is never
    * re-scanned, and unlike float streaming-PCA sketches nothing is
    * approximate: the merged state IS the full-corpus state. */
  def mergeMoments(a: (Long, Array[Long], Array[Array[Long]]),
                   b: (Long, Array[Long], Array[Array[Long]])): (Long, Array[Long], Array[Array[Long]]) = {
    require(a._2.length == b._2.length, "moment dims must agree")
    val d = a._2.length
    (a._1 + b._1,
      Array.tabulate(d)(i => a._2(i) + b._2(i)),
      Array.tabulate(d, d)((i, j) => a._3(i)(j) + b._3(i)(j)))
  }

  /** Persist the moment array as the PCA deploy artifact (rows
    * (kind, i, j, v): kind 0 = n, 1 = S_i, 2 = Q_ij) — longs only, so
    * the round trip is exact by construction. */
  def saveMoments(spark: org.apache.spark.sql.SparkSession,
                  m: (Long, Array[Long], Array[Array[Long]]), dir: String): Unit = {
    import spark.implicits._
    val (n, s, q) = m
    val rows = Seq((0, 0, 0, n)) ++
      s.indices.map(i => (1, i, 0, s(i))) ++
      (for (i <- s.indices; j <- s.indices) yield (2, i, j, q(i)(j)))
    rows.toDF("kind", "i", "j", "v").write.mode("overwrite").parquet(dir)
  }

  def loadMoments(spark: org.apache.spark.sql.SparkSession,
                  dir: String): (Long, Array[Long], Array[Array[Long]]) = {
    val rows = spark.read.parquet(dir)
      .select("kind", "i", "j", "v").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val d = rows.keysIterator.collect { case (1, i, _) => i }.max + 1
    (rows((0, 0, 0)),
      Array.tabulate(d)(i => rows((1, i, 0))),
      Array.tabulate(d, d)((i, j) => rows((2, i, j))))
  }

  /** One projection fold column: exact long sum closed by one division,
    * mean/component as plan literals. */
  private def projCol(vecCol: String, mean: Array[Double],
                      comp: Array[Double]): Column = {
    val meanArr = array(mean.map(lit): _*)
    val vArr = array(comp.map(lit): _*)
    aggregate(
      transform(col(vecCol), (xi: Column, i: Column) =>
        round((xi.cast("double") - element_at(meanArr, i + 1)) *
          element_at(vArr, i + 1) * Scale).cast("long")),
      lit(0L), (acc: Column, x: Column) => acc + x) / Scale
  }

  /** Project every row onto the component: ONE scan, zero shuffles —
    * the mean/component travel as plan literals and the per-row fold is
    * an exact long sum closed by one division. Returns (id, pc1). */
  def project(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    df.select(col(idCol).as("vec_id"),
      projCol(vecCol, model.mean, model.component).as("pc1"))

  /** Project onto several components in ONE scan (the 2-D corpus-map /
    * outlier-score shape): one fold column per component. */
  def projectMany(df: DataFrame, idCol: String, vecCol: String,
                  cs: Components, names: Seq[String]): DataFrame = {
    require(names.size <= cs.comps.size)
    val cols = names.zipWithIndex.map { case (nm, m) =>
      projCol(vecCol, cs.mean, cs.comps(m)._1).as(nm)
    }
    df.select(col(idCol).as("vec_id") +: cols: _*)
  }
}
