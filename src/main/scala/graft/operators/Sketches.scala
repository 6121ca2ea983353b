package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches for corpus-scale statistics — HyperLogLog distinct
  * counting and count-min frequency estimation — built integer-exact on
  * the repo's cross-engine md5 substrate so the driver's DuckDB oracle
  * can pin them bit-for-bit (unlike `approx_count_distinct` /
  * `approx_percentile`, whose buffers are engine-private).
  *
  * Why sketches at 100 TB: `count(DISTINCT x)` shuffles every distinct
  * value; a billion-key distinct is a corpus-sized exchange. The HLL
  * register frame is `m` rows (here 256) NO MATTER the corpus size, and
  * partial aggregation collapses it map-side — the shuffle carries at
  * most `m` rows per task. Count-min is the same story for frequency:
  * `d·w` cells total, merged by plain addition, so heavy-hitter serving
  * never rebuilds a corpus-sized vocabulary. Both sketches are
  * commutative-monoid merges (max / sum), which is exactly what Spark's
  * partial-agg machinery wants.
  *
  * Determinism contract: every register and cell derives from md5 hex
  * digits through integer arithmetic only — no engine RNG, no float
  * accumulation. The closing HLL estimate is ONE fixed-order IEEE
  * expression over an exact integer sum (the correctly-rounded-closing-
  * division doctrine of the temperature sampler / surprisal gate).
  *
  * Reference analogue: the reference keeps exact health/metastate counts
  * (`health.go`, `state_pointers`) because its tables are node-local;
  * a distributed corpus needs the mergeable form.
  */
object Sketches {

  /** Number of HLL registers — 2 md5 hex chars' worth (2^8). */
  val HllM = 256

  /** Register cap: rho ≤ 40 keeps 2^(40-rho) an exact long and the
    * harmonic sum ≤ m·2^40 = 2^48, exactly representable even as a
    * double (< 2^53) — so ANY summation order yields identical bits. */
  val HllRhoCap = 40

  /** HLL bucket: fold of the first 2 md5 hex chars, 0..255. */
  def hllBucket(key: Column): Column =
    conv(substring(md5(key), 1, 2), 16, 10).cast("int")

  /** HLL rho over the 64-bit suffix (md5 hex chars 3..18): number of
    * leading zero BITS + 1, capped at [[HllRhoCap]]. Computed from hex
    * digits: 4 bits per leading '0' char, then 3/2/1/0 more from the
    * first non-zero digit's own leading zeros — integer CASE arithmetic,
    * portable to any engine with substr/regexp. */
  def hllRho(key: Column): Column = {
    val tail = substring(md5(key), 3, 16)
    val z = length(regexp_extract(tail, "^(0*)", 1))
    val dval = conv(tail.substr(z + lit(1), lit(1)), 16, 10).cast("int")
    val lzd = when(dval >= 8, 0).when(dval >= 4, 1).when(dval >= 2, 2).otherwise(3)
    when(z >= 16, HllRhoCap)
      .otherwise(least(z * 4 + lzd + 1, lit(HllRhoCap)))
      .cast("int")
  }

  /** (bucket, rho) via the codegen'd digest-byte expression
    * ([[graft.expressions.HllBucketRho]]) — bit-identical to the
    * portable [[hllBucket]]/[[hllRho]] hex chain (spec-pinned), minus
    * the per-row hex string, regexp, and conv(). */
  def hllBucketRhoFast(key: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.HllBucketRho(Bridge.expression(key)))
  }

  /** The full m-row register frame for `df[keyCol]` — empty buckets
    * surface as register 0 (they carry the strongest evidence in the
    * harmonic mean; dropping them is the classic HLL implementation
    * bug). One partial-agg groupBy on ≤ m distinct buckets: map-side
    * collapse makes the exchange O(m · tasks) regardless of corpus. */
  def hllRegisters(df: DataFrame, keyCol: String): DataFrame = {
    val regs = df
      .select(hllBucketRhoFast(col(keyCol).cast("string")).as("br"))
      .select(col("br.bucket").as("bucket"), col("br.rho").as("rho"))
      .groupBy("bucket").agg(max("rho").as("r"))
    df.sparkSession.range(HllM).select(col("id").cast("int").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("r"), lit(0)).cast("int").as("register"))
  }

  /** Per-GROUP register frames — the shape that replaces
    * `GROUP BY g, count(DISTINCT x)` at scale: the exchange carries at
    * most |groups|·m register rows instead of every distinct (g, x)
    * pair. Empty buckets are NOT materialized per group (that would be
    * |groups|·m rows even for tiny groups); [[hllEstimateByGroup]]
    * accounts for them arithmetically instead. NULL keys are dropped
    * here — the same contract the ungrouped [[hllRegisters]] gets
    * implicitly (a null key hashes to a null (bucket, rho) struct and
    * falls out of the max) — otherwise a (g, null, null) row would
    * count toward `_present` downstream without contributing a
    * harmonic term, skewing that group's estimate. */
  def hllRegistersByGroup(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"),
        hllBucketRhoFast(col(keyCol).cast("string")).as("br"))
      .select(col("g"), col("br.bucket").as("bucket"), col("br.rho").as("rho"))
      .groupBy("g", "bucket").agg(max("rho").cast("int").as("register"))

  /** One estimate row per group from a [[hllRegistersByGroup]] frame.
    * Missing buckets contribute 2^cap each to the harmonic numerator
    * (register 0) without being materialized: S = Σ_present 2^(cap-r) +
    * (m - n_present)·2^cap — exact long arithmetic, then the same
    * fixed-order closing estimate as [[hllEstimate]]. */
  def hllEstimateByGroup(registers: DataFrame): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    registers.groupBy("g").agg(
      count(lit(1)).as("_present"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - register)")).as("_sp"),
      sum(when(col("register") === 0, 1L).otherwise(0L)).as("_zp"))
      .select(col("g"),
        (col("_sp") + (lit(HllM.toLong) - col("_present")) *
          lit(1L << HllRhoCap)).as("s_sum"),
        (col("_zp") + (lit(HllM.toLong) - col("_present"))).as("n_zero"))
      .select(col("g"), col("s_sum"), col("n_zero"),
        round(lit(alpha * HllM.toDouble * HllM.toDouble) *
          lit(math.pow(2.0, HllRhoCap)) / col("s_sum").cast("double"), 4)
          .as("hll_estimate"))
  }

  /** Element-wise merge of two register frames (the distributed-union
    * property: HLL(A ∪ B) = max(HLL(A), HLL(B)) per bucket). */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.withColumnRenamed("register", "rb"), Seq("bucket"))
      .select(col("bucket"), greatest(col("register"), col("rb")).as("register"))

  /** One-row estimate from a register frame: exact integer harmonic
    * numerator S = Σ 2^(cap - register), zero-bucket count, and the
    * standard alpha_m · m² / Σ2^-M estimate as one fixed-order IEEE
    * chain over S (both engines round identically). Small-range linear
    * counting (m·ln(m/V)) is deliberately NOT folded in — ln is
    * transcendental; a serving layer applies it on top of `n_zero`. */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    registers.agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - register)")).as("s_sum"),
      sum(when(col("register") === 0, 1L).otherwise(0L)).as("n_zero"))
      .select(
        lit(HllM).as("m"), col("s_sum"), col("n_zero"),
        round(lit(alpha * HllM.toDouble * HllM.toDouble) *
          lit(math.pow(2.0, HllRhoCap)) / col("s_sum").cast("double"), 4)
          .as("hll_estimate"))
  }

  /** EXACT quantiles with O(distinct values) state — the third rung of
    * the percentile ladder: exact `percentile` buffers EVERY value of a
    * group (OOMs a billion-row group), `approx_percentile` is a sketch
    * (engine-private, can't hash-match an oracle) — but for integer-ish
    * metrics (lengths, token counts, latencies) the value domain is
    * small, so reduce to a (group, value, count) HISTOGRAM first: the
    * groupBy partial-aggregates map-side, per-group state is bounded by
    * the domain (not the row count), and the quantile is an exact
    * linear-interpolation walk over the histogram — same answer as the
    * buffering form, verified by sharing its oracle.
    *
    * Rank arithmetic mirrors quantile_cont: pos = q·(n_valid−1) over
    * null-free values; `n` in the output counts ALL rows (the oracle's
    * count(*)); all-null groups surface with null quantiles.
    *
    * Scale shape: one partial-agg groupBy to the histogram, one
    * histogram-sized window for cumulative counts, then one broadcast-
    * sized join per requested quantile — no corpus-sized sort, no
    * per-group value buffering. */
  def histQuantiles(df: DataFrame, groupCol: String, value: Column,
                    qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 },
      "quantiles must be named and within [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"), value.as("v"))
    val hist = base.where(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).cast("long").as("c"))
    val w = Window.partitionBy("g").orderBy("v")
    val cum = hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("cumb", col("cum") - col("c"))
    val groups = base.groupBy("g").agg(count(lit(1)).as("n"))
    // <=>: a NULL group key is a real group and must keep its nv
    val nValid = hist.groupBy("g").agg(sum("c").as("nv"))
      .withColumnRenamed("g", "_gn")
    val spine = groups.join(nValid, col("g") <=> col("_gn"), "left_outer").drop("_gn")
    qs.foldLeft(spine) { case (acc, (name, q)) =>
      val pos = lit(q) * (col("nv") - 1).cast("double")
      val lo = floor(pos).cast("long")
      val hi = least(lo + 1, col("nv") - 1)
      val hl = cum.select(col("g").as("_g"), col("v").as("_vl"),
        col("cumb").as("_bl"), col("cum").as("_cl"))
      val hu = cum.select(col("g").as("_g2"), col("v").as("_vu"),
        col("cumb").as("_bu"), col("cum").as("_cu"))
      acc
        .join(hl, acc("g") <=> hl("_g") && lo >= col("_bl") && lo < col("_cl"), "left_outer")
        .join(hu, acc("g") <=> hu("_g2") && hi >= col("_bu") && hi < col("_cu"), "left_outer")
        .withColumn(name,
          round(col("_vl").cast("double") +
            (pos - lo.cast("double")) * (col("_vu").cast("double") - col("_vl").cast("double")), 4))
        .drop("_g", "_vl", "_bl", "_cl", "_g2", "_vu", "_bu", "_cu")
    }.drop("nv").withColumnRenamed("g", groupCol)
  }

  /** The (group, value, count) histogram behind [[histQuantiles]],
    * exposed as a storable artifact: counts are ADDITIVE, so corpus
    * halves union+sum to exactly the full histogram and quantiles over
    * the merged artifact are bit-identical to from-scratch (the
    * incremental-BM25 doctrine applied to order statistics — an
    * arriving batch folds in at O(batch distinct values), the corpus is
    * never re-scanned). */
  def histBuild(df: DataFrame, groupCol: String, value: Column): DataFrame =
    df.select(col(groupCol).as("g"), value.as("v"))
      .groupBy("g", "v").agg(count(lit(1)).cast("long").as("c"))

  /** Additive merge of [[histBuild]] artifacts. */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("g", "v").agg(sum("c").as("c"))

  /** [[histQuantiles]] served from a stored histogram instead of raw
    * rows. NOTE: `n` counts histogram mass (non-null values), not raw
    * rows — a stored histogram cannot know about rows whose value was
    * null; callers needing the raw-row count keep it beside the
    * artifact. */
  def histQuantilesFromHist(hist: DataFrame,
                            qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 },
      "quantiles must be named and within [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy("v")
    val cum = hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("cumb", col("cum") - col("c"))
    val spine = hist.groupBy("g").agg(sum("c").as("n"), sum("c").as("nv"))
    qs.foldLeft(spine) { case (acc, (name, q)) =>
      val pos = lit(q) * (col("nv") - 1).cast("double")
      val lo = floor(pos).cast("long")
      val hi = least(lo + 1, col("nv") - 1)
      val hl = cum.select(col("g").as("_g"), col("v").as("_vl"),
        col("cumb").as("_bl"), col("cum").as("_cl"))
      val hu = cum.select(col("g").as("_g2"), col("v").as("_vu"),
        col("cumb").as("_bu"), col("cum").as("_cu"))
      acc
        .join(hl, acc("g") <=> hl("_g") && lo >= col("_bl") && lo < col("_cl"), "left_outer")
        .join(hu, acc("g") <=> hu("_g2") && hi >= col("_bu") && hi < col("_cu"), "left_outer")
        .withColumn(name,
          round(col("_vl").cast("double") +
            (pos - lo.cast("double")) * (col("_vu").cast("double") - col("_vl").cast("double")), 4))
        .drop("_g", "_vl", "_bl", "_cl", "_g2", "_vu", "_bu", "_cu")
    }.drop("nv")
  }

  /** Count-min bucket for sketch row `r`: fold of the first 8 md5 hex
    * chars of "r:key", mod `w`. Row-salting the key string gives the d
    * independent hash functions from the one md5 primitive. */
  def cmsBucket(key: Column, row: Int, w: Int): Column =
    (conv(substring(md5(concat(lit(s"$row:"), key)), 1, 8), 16, 10)
      .cast("long") % w).cast("int")

  /** Build the d×w cell frame `(r, b, c)` from keys with an integer
    * weight column (1 per occurrence, or a pre-aggregated count — CMS is
    * linear, so both yield identical cells). The explode is d-fold on
    * the KEY frame, then one partial-agg groupBy on ≤ d·w cells — the
    * exchange is sketch-sized, never corpus-sized. */
  def cmsCells(df: DataFrame, keyCol: String, weightCol: String,
               d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2 (got d=$d, w=$w)")
    val rows = array((0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(keyCol), r, w).as("b"))): _*)
    df.select(explode(rows).as("rb"), col(weightCol).cast("long").as("c"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum("c").as("c"))
  }

  /** Point estimates for `probes[keyCol]`: min over the d rows of the
    * probed cells — the classic CMS upper bound (estimate ≥ true count,
    * always). A probe cell the sketch never touched counts as 0 (LEFT
    * join + coalesce), so a never-seen probe key reports `cms_est = 0`
    * instead of silently vanishing from the output — with an inner join
    * a key missing even ONE of its d cells would also take min over only
    * the present cells, inflating the bound. The cell frame is d·w rows;
    * [[graft.queries.QueryDef.broadcastIfSmall]]-shaped by construction,
    * so the probe join never shuffles the probe side. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, keyCol: String,
                  d: Int = 4, w: Int = 1024): DataFrame = {
    val rows = array((0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(keyCol), r, w).as("b"))): _*)
    probes
      .select(col("*"), explode(rows).as("rb"))
      .join(cells, col("rb.r") === cells("r") && col("rb.b") === cells("b"),
        "left_outer")
      .withColumn("_c0", coalesce(cells("c"), lit(0L)))
      .groupBy(probes.columns.map(col): _*)
      .agg(min("_c0").as("cms_est"))
  }
}
