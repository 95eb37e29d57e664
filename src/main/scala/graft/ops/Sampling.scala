package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic scan-time filters/samplers, the declarative
  * equivalents of the reference's `SequenceFileInputFilter` family
  * (hadoop-mapreduce-client-core/.../lib/input/
  * SequenceFileInputFilter.java:49 — RegexFilter:111, PercentFilter:154,
  * MD5Filter:203) and `InputSampler`
  * (.../lib/partition/InputSampler.java:57).
  *
  * All of these are plain `filter` predicates, so Catalyst pushes them
  * into the scan where the source supports it; at 100 TB a hash-mod
  * sample reads every row group but never shuffles.
  */
object Sampling {

  /** PercentFilter: keep keys where hash(key) % f == 0 → ~1/f sample,
    * deterministic and stable across runs/engines for the same key. */
  def percentFilter(df: DataFrame, key: Column, f: Int): DataFrame =
    df.filter(pmod(hash(key), lit(f)) === 0)

  /** Arithmetic mod sample on an integral key — fully portable
    * (hash-free) flavor used by the oracle-checked query. */
  def modFilter(df: DataFrame, key: Column, f: Int): DataFrame =
    df.filter(pmod(key, lit(f)) === 0)

  /** MD5Filter: keep keys whose md5 prefix mod f == 0. */
  def md5Filter(df: DataFrame, key: Column, f: Int): DataFrame =
    df.filter(pmod(conv(substring(md5(key.cast("binary")), 1, 7), 16, 10).cast("long"), lit(f)) === 0)

  /** RegexFilter: keep rows whose key matches the pattern. */
  def regexFilter(df: DataFrame, key: Column, pattern: String): DataFrame =
    df.filter(regexp_like(key, lit(pattern)))

  /** Deterministic exactly-N sample: take the N smallest md5(id)
    * values — content-stable (same corpus → same sample, independent
    * of partitioning/run), uniform (md5 order is unrelated to any data
    * order), and exact-count where Bernoulli sampling is only
    * expected-count. Plans as distributed top-k (TakeOrderedAndProject,
    * per-partition heaps of N), never a global sort — the subset-
    * selection op a training pipeline wants for "pick 1M docs of the
    * corpus, reproducibly". */
  def deterministicSample(df: DataFrame, id: Column, n: Int): DataFrame =
    df.withColumn("__smp", md5(id.cast("string").cast("binary")))
      .orderBy(col("__smp")).limit(n).drop("__smp")

  /** Deterministic WEIGHTED exactly-N sample — Efraimidis-Spirakis
    * A-ES with hash-derived uniforms instead of randomness: priority
    * = u^(1/w) with u = md5(id)-uniform in (0,1), keep the N largest
    * (compared in the log domain, ln(u)/w — same order, see below).
    * Inclusion probability tracks weight (the curation "sample by
    * quality score" contract) while staying content-stable and
    * replayable across runs and engines — the weighted sibling of
    * [[deterministicSample]]. Non-positive weights fail IN-PLAN
    * (raise_error), not silently.
    *
    * Scale posture: one map pass + TakeOrderedAndProject top-N —
    * no shuffle beyond the top-N merge; the 60-bit md5 prefix keeps
    * u exactly representable in a double. */
  def weightedSample(df: DataFrame, id: Column, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 0, s"weightedSample: n must be >= 0: $n")
    // the name is interpolated into raise_error below — keep it loud
    // and un-injectable (the Profiler guard, same reason)
    require(weightCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"weightedSample: unsupported weight column name: $weightCol")
    val u = (conv(substring(md5(id.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long").cast("double") + 1.0) / (math.pow(2, 60) + 1.0)
    val w = when(col(weightCol) > 0, col(weightCol).cast("double"))
      .otherwise(expr(
        s"raise_error('weightedSample: non-positive weight in $weightCol')"))
    // the computed double IS the keep decision, and libm pow/log are
    // not correctly rounded — a 1-ulp JVM/DuckDB disagreement at the
    // rank-n cutoff would flip membership. The priority is compared in
    // the LOG domain: ln(u)/w orders identically to u^(1/w) (exp is
    // monotone) but has bounded dynamic range — ln(u) ∈ [-42, 0) for
    // the 60-bit uniform — so rounding to 9 absolute decimals
    // collapses ulp noise to EQUAL without flattening small-weight
    // tails to 0.0 (u^(1/w) spans hundreds of orders of magnitude and
    // an absolute round zeroed everything below 5e-10). The id
    // tiebreak then orders equals identically in both engines.
    // Residual: |ln(u)/w| < 1e-9 (u within 1e-9·w of 1) still ties at
    // the TOP and falls to the id tiebreak — a bounded sliver, not the
    // unbounded tail the pow-domain round collapsed.
    df.withColumn("__pri", round(log(u) / w, 9))
      .orderBy(col("__pri").desc, id)
      .limit(n)
      .drop("__pri")
  }

  /** Bernoulli sample (seeded) — InputSampler.RandomSampler analogue;
    * Spark's `orderBy` does its own reservoir sampling for range
    * partitioning, so no `writePartitionFile` equivalent is needed. */
  def randomSample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** SplitSampler analogue: first `n` records per partition. */
  def splitSample(df: DataFrame, nPerPartition: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions(_.take(nPerPartition))(enc)
  }

  /** Stratified sample: per-stratum Bernoulli fractions (training-set
    * class balancing). Seeded and map-only — no shuffle at any scale. */
  def stratified[T](df: DataFrame, keyCol: String,
                    fractions: Map[T, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(keyCol, fractions, seed)

  /** Deterministic EXACT-proportion stratified sample: per stratum,
    * keep the `ceil(n_k * num / den)` rows with the smallest md5(id) —
    * [[deterministicSample]]'s content-stable/reproducible contract
    * applied per class, and exact-count where [[stratified]]
    * (`sampleBy`) is only expected-count. The fraction is an integer
    * ratio so the keep rule is pure integer arithmetic — a double
    * threshold can round differently across engines (the q50 lesson).
    * One hash-partition shuffle on the stratum key; each stratum ranks
    * inside its partitions (sort spills if a stratum is huge — the
    * same bound any per-key window op carries; a stratum column with
    * near-row cardinality makes the ranks trivially 1 and the sort
    * free). */
  def stratifiedExact(df: DataFrame, strataCol: String, id: Column,
                      num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"stratifiedExact: need 0 <= num <= den, got $num/$den")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(
        w.orderBy(md5(id.cast("string").cast("binary")), id)))
      .withColumn("__n", count(lit(1)).over(w))
      // rn <= ceil(n*num/den)  ⇔  (rn-1)*den < n*num, in integers
      .where((col("__rn") - 1) * den < col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Temperature-balanced (α = 1/2) stratified sampling — the
    * multilingual-corpus rebalancing step of an LLM data pipeline
    * (XLM-R-style exponentiated sampling): stratum `s` gets a quota
    * proportional to `count_s^α`, so dominant languages are
    * down-weighted and small languages keep representation, without
    * ever over-drawing a stratum (`quota ≤ count`).
    *
    * α is fixed at 1/2 because that keeps the whole quota rule in
    * EXACT integer arithmetic: `w_s = floor(sqrt(n_s))` (IEEE sqrt is
    * correctly rounded, so the floor is engine-portable — a general
    * `pow(n, α)` is not), `quota_s = min(n_s, T·w_s / Σw)` with
    * BigInt driver math, and membership is [[stratifiedExact]]'s
    * rank rule (smallest md5(id) per stratum) — content-stable and
    * reproducible across runs, engines, and partitionings.
    *
    * Per-stratum counts are collected to the driver: strata are
    * languages/sources (tens, not millions) — the same groups ≪ rows
    * contract as [[stratifiedExact]]. One hash-partition shuffle for
    * the per-stratum rank; the quota table joins back as a broadcast.
    * Null strata are matched null-safely (kept, like the window
    * partitioning in [[stratifiedExact]]). */
  def temperatureSample(df: DataFrame, strataCol: String, id: Column,
                        targetTotal: Long): DataFrame = {
    require(targetTotal >= 0, s"temperatureSample: targetTotal must be >= 0: $targetTotal")
    val spark = df.sparkSession
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n")).collect()
    val totalW = counts.map(r => math.sqrt(r.getLong(1).toDouble).toLong).sum
    val quotaRows = counts.map { r =>
      val n = r.getLong(1)
      val w = math.sqrt(n.toDouble).toLong // floor: exact for n < 2^53
      val quota =
        if (totalW == 0L) 0L
        else math.min(n, ((BigInt(targetTotal) * w) / totalW).toLong)
      org.apache.spark.sql.Row(r.get(0), quota)
    }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(strataCol).copy(nullable = true),
      org.apache.spark.sql.types.StructField("__quota", org.apache.spark.sql.types.LongType)))
    val quotas = spark.createDataFrame(
      spark.sparkContext.parallelize(quotaRows.toSeq, 1), qSchema)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val ranked = df.withColumn("__rn", row_number().over(
      w.orderBy(md5(id.cast("string").cast("binary")), id)))
    ranked
      .join(broadcast(quotas), ranked(strataCol) <=> quotas(strataCol))
      .where(col("__rn") <= col("__quota"))
      .select(df.columns.map(ranked(_)): _*)
  }

  /** Deterministic train/val/test assignment for ML pipelines: bucket
    * each row by an md5 prefix of its id (16 bits, uniform), carve
    * [0, 65536) by cumulative weight, and label with the matching
    * split name. Content-stable: the same id lands in the same split
    * across runs, engines and data orderings — the property that keeps
    * a held-out set held out when the corpus is re-ingested. Pure
    * column arithmetic (no shuffle, no UDF); weights are normalized.
    */
  def hashSplit(df: DataFrame, id: Column,
                weights: Seq[(String, Double)],
                splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "hashSplit: weights must be positive")
    require(!df.columns.contains(splitCol),
      s"hashSplit: input already has a '$splitCol' column — overwriting it " +
        "would silently destroy data; pass a different splitCol")
    val total = weights.map(_._2).sum
    val bucket = conv(substring(md5(id.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int")
    // cumulative upper bounds over the 16-bit bucket space; the last
    // split takes everything remaining so coverage is exhaustive
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(c => math.round(c * 65536).toInt)
    val labeled = weights.map(_._1).zip(bounds).dropRight(1)
      .foldLeft(lit(null).cast("string")) { case (acc, (name, hi)) =>
        coalesce(acc, when(bucket < hi, name))
      }
    // a null id has no content to be stable on — assigning it anywhere
    // (it would otherwise fall through to the LAST split, polluting the
    // held-out set) is silent corruption; fail the job instead
    df.withColumn(splitCol,
      when(id.isNull, raise_error(lit("hashSplit: null id — split membership must be content-stable")))
        .otherwise(coalesce(labeled, lit(weights.last._1))))
  }
}
