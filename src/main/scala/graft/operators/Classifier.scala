package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed TRAINING of the linear quality classifier — the learn
  * half of [[TextOps.classifierScore]] (which deploys fixed weights):
  * logistic regression over hashed bag-of-words features, full-batch
  * gradient descent, the fastText-style filter-model shape
  * (GPT-3/DCLM-style corpus quality classifiers are exactly this:
  * hashed n-gram features, a linear model, a corpus-scale pass per
  * epoch).
  *
  * Determinism contract (the training twin of the permille doctrine):
  * the model must come out BIT-IDENTICAL for the same corpus under any
  * partitioning, any executor count, any run. Floating-point gradient
  * sums are addition-order-dependent, and a shuffle-free guarantee of
  * stable order does not exist in a distributed engine — so each
  * document's gradient contribution is rounded ONCE to a scaled Long
  * (`round(g·2^32)`), and the cross-document reduction sums exact longs,
  * which is associative and commutative. The weight update divides the
  * exact sum back once per epoch. All transcendentals go through
  * `StrictMath` (ieee-portable across JVMs/platforms; `Math.exp` is
  * allowed to differ per platform). Feature hashing uses the JLS-pinned
  * `String.hashCode` — stable by specification.
  *
  * Scale shape: one corpus pass per epoch via `treeAggregate` over a
  * pre-tokenized RDD (the MLlib GD shape): per-partition Long-array
  * accumulation (the genuine imperative-kernel exception — a dim-sized
  * mutable accumulator has no expression form), depth-2 tree merge so
  * the driver receives O(√partitions) arrays, not all of them. The
  * feature dimension (default 2¹⁴ longs = 128 KB) broadcasts per epoch.
  * Label skew is irrelevant — there is no key, only a commutative
  * reduce. Epochs are few by design (a corpus filter model, not a deep
  * net); each costs exactly one scan.
  */
object Classifier {

  /** 2^32 — gradient quantum. A per-doc gradient component is in
    * [-1, 1]·tf, so 32 fractional bits keep ~9 significant decimal
    * digits per contribution while a billion docs still fit a long
    * (2⁶³/2^32 ≈ 2·10⁹ unit-gradient docs per bucket). */
  val Scale: Double = 4294967296.0

  /** JLS-stable feature bucket for a token. */
  def bucket(w: String, dim: Int): Int = {
    val h = w.hashCode % dim
    if (h < 0) h + dim else h
  }

  def sigmoid(z: Double): Double = 1.0 / (1.0 + StrictMath.exp(-z))

  /** Distinct (bucket, count) pairs of a doc's tokens, SORTED by bucket —
    * every consumer iterates in this order so per-doc double sums are
    * order-pinned (see the determinism contract above). */
  def docCounts(ws: Seq[String], dim: Int): Array[(Int, Int)] = {
    val m = scala.collection.mutable.Map.empty[Int, Int]
    ws.foreach { t => val k = bucket(t, dim); m(k) = m.getOrElse(k, 0) + 1 }
    m.toArray.sortBy(_._1)
  }

  final case class Model(weights: Array[Double], bias: Double,
                         epochLoss: Array[Double], epochAccuracy: Array[Double])

  /** Train on `(tokens, label)` rows; label ∈ {0,1}. Full-batch GD,
    * `epochs` scans. Features: binary token presence by default (the
    * standard bag-of-words LR featurization — unit-magnitude features
    * keep full-batch GD well-conditioned, so it converges in a handful
    * of epochs); `binary = false` switches to L1-normalized counts
    * (tf/len — length-invariant, but features of magnitude ~1/len need
    * ~len× the epochs·lr budget). Per-doc gradient is bounded either
    * way (L∞ ≤ 1). */
  def train(df: DataFrame, textCol: String, labelCol: String,
            dim: Int = 16384, epochs: Int = 5, lr: Double = 2.0,
            binary: Boolean = true): Model = {
    val data = df.select(TextOps.tokens(col(textCol)).as("ws"),
        col(labelCol).cast("double").as("y"))
      .filter(size(col("ws")) > 0)
      .select(col("ws"), col("y"))
      .rdd.map(r => (r.getSeq[String](0), r.getDouble(1)))
      .cache()
    val n = data.count().toDouble
    val sc = df.sparkSession.sparkContext
    val w = new Array[Double](dim)
    var b = 0.0
    val losses = new Array[Double](epochs)
    val accs = new Array[Double](epochs)
    for (e <- 0 until epochs) {
      val bw = sc.broadcast(w.clone())
      val bb = b
      // acc layout: [0..dim) grad, [dim] bias grad, [dim+1] loss, [dim+2] correct
      val acc = data.treeAggregate(new Array[Long](dim + 3))(
        seqOp = (a, doc) => {
          val (ws, y) = doc
          // bucket-SORTED iteration: the in-doc dot product is a double
          // sum, so its term order must be pinned or the last ulp (and
          // therefore the quantized gradient) drifts between the
          // distributed and local twins
          val counts = docCounts(ws, dim)
          val inv = 1.0 / ws.size
          def fv(c: Int): Double = if (binary) 1.0 else c * inv
          var z = bb
          counts.foreach { case (k, c) => z += bw.value(k) * fv(c) }
          val p = sigmoid(z)
          val d = p - y
          counts.foreach { case (k, c) =>
            a(k) += StrictMath.round(d * fv(c) * Scale)
          }
          a(dim) += StrictMath.round(d * Scale)
          // clamped log-loss: p is sigmoid-bounded away from 0/1 only by
          // double range; clamp so one confident mistake can't emit ±Inf
          val pc = math.min(math.max(p, 1e-12), 1.0 - 1e-12)
          val loss = -(y * StrictMath.log(pc) + (1.0 - y) * StrictMath.log(1.0 - pc))
          a(dim + 1) += StrictMath.round(loss * Scale)
          a(dim + 2) += (if ((p >= 0.5) == (y >= 0.5)) 1L else 0L)
          a
        },
        combOp = (a, c) => { var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a },
        depth = 2)
      bw.destroy()
      var i = 0
      while (i < dim) { w(i) -= lr * (acc(i) / Scale) / n; i += 1 }
      b -= lr * (acc(dim) / Scale) / n
      losses(e) = (acc(dim + 1) / Scale) / n
      accs(e) = acc(dim + 2) / n
    }
    data.unpersist()
    Model(w, b, losses, accs)
  }

  /** Pure-Scala reference trainer — the brute-force twin the spec pins
    * the distributed path against (same hashing, same StrictMath, same
    * long-quantized accumulation, sequential). */
  def trainLocal(docs: Seq[(Seq[String], Double)], dim: Int, epochs: Int,
                 lr: Double, binary: Boolean = true): Model = {
    val n = docs.count(_._1.nonEmpty).toDouble
    val w = new Array[Double](dim)
    var b = 0.0
    val losses = new Array[Double](epochs)
    val accs = new Array[Double](epochs)
    for (e <- 0 until epochs) {
      val acc = new Array[Long](dim + 3)
      docs.filter(_._1.nonEmpty).foreach { case (ws, y) =>
        val counts = docCounts(ws, dim)
        val inv = 1.0 / ws.size
        def fv(c: Int): Double = if (binary) 1.0 else c * inv
        var z = b
        counts.foreach { case (k, c) => z += w(k) * fv(c) }
        val p = sigmoid(z)
        val d = p - y
        counts.foreach { case (k, c) => acc(k) += StrictMath.round(d * fv(c) * Scale) }
        acc(dim) += StrictMath.round(d * Scale)
        val pc = math.min(math.max(p, 1e-12), 1.0 - 1e-12)
        val loss = -(y * StrictMath.log(pc) + (1.0 - y) * StrictMath.log(1.0 - pc))
        acc(dim + 1) += StrictMath.round(loss * Scale)
        acc(dim + 2) += (if ((p >= 0.5) == (y >= 0.5)) 1L else 0L)
      }
      var i = 0
      while (i < dim) { w(i) -= lr * (acc(i) / Scale) / n; i += 1 }
      b -= lr * (acc(dim) / Scale) / n
      losses(e) = (acc(dim + 1) / Scale) / n
      accs(e) = acc(dim + 2) / n
    }
    Model(w, b, losses, accs)
  }

  /** Score documents under a trained model: `(doc, p, keep)`.
    * Broadcast weights, one scan, bounded per-row work (the documented
    * UDF exception — an iterative hashed-feature dot has no expression
    * form). */
  def score(df: DataFrame, idCol: String, textCol: String, model: Model,
            threshold: Double = 0.5, binary: Boolean = true): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bw = sc.broadcast(model.weights)
    val bb = model.bias
    val dim = model.weights.length
    val p = udf { (ws: Seq[String]) =>
      if (ws.isEmpty) null.asInstanceOf[java.lang.Double]
      else {
        val counts = docCounts(ws, dim)
        val inv = 1.0 / ws.size
        def fv(c: Int): Double = if (binary) 1.0 else c * inv
        var z = bb
        counts.foreach { case (k, c) => z += bw.value(k) * fv(c) }
        java.lang.Double.valueOf(sigmoid(z))
      }
    }
    df.select(col(idCol).as("doc"), p(TextOps.tokens(col(textCol))).as("p"))
      .withColumn("keep", coalesce(col("p") >= threshold, lit(false)))
  }
}
