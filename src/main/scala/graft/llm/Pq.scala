package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): split each dim-d vector
  * into `m` subvectors of d/m dims, train a `k`-centroid codebook per
  * subspace, store each corpus vector as `m` small integer codes.
  * Search is ADC (asymmetric distance computation): the QUERY keeps
  * full precision; per subspace a k-entry lookup table of squared
  * distances query-subvector → centroid is computed once (driver-side,
  * m·k doubles), and each corpus vector's approximate distance is the
  * sum of m table lookups over its codes.
  *
  * Why this is the memory tier the other ANN paths lack: int8 (q41)
  * compresses 4× and still scans d multiplies per pair; IVF (q34)
  * prunes which vectors are scanned but stores them whole. PQ stores
  * d=64 floats as m=8 codes — 256 B → 8 B per vector, 32× — so a
  * 100 TB float corpus becomes a ~3 TB code table that fits a modest
  * cluster's memory, scanned with integer lookups (no float math per
  * dimension). Compose with IVF for the classic IVF-PQ: posting-list
  * pruning over code-compressed residuals.
  *
  * Codebooks come from [[Clustering.lloyd]] per subspace — the
  * integer-exact fixed-point driver — so training is deterministic
  * across runs/JVMs and the encode argmin (fixed-order double math,
  * ties to the lowest code) matches the q212 portability contract.
  * Scale posture: training is m lloyd runs over subDim-wide
  * projections (each: quantized corpus persisted once, d·k-cell
  * aggregates per round); encode is MAP-ONLY against m·k literal
  * centroids; ADC scan is map-only against broadcast-size literal
  * LUTs + one top-k. Vectors never shuffle anywhere.
  */
object Pq {

  /** Trained model: `codebooks(s)(c)` is centroid c of subspace s
    * (subDim doubles). Missing/empty clusters hold zero vectors. */
  case class Model(dim: Int, m: Int, k: Int, codebooks: Seq[Seq[Array[Double]]]) {
    require(m >= 1 && dim % m == 0,
      s"Pq.Model: m=$m must divide dim=$dim - a non-divisor would silently " +
        "drop the trailing dimensions from every code")
    val subDim: Int = dim / m
    require(codebooks.size == m && codebooks.forall(_.size == k),
      s"Pq.Model: need $m x $k codebooks")
  }

  /** Train per-subspace codebooks with [[Clustering.lloyd]]. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            dim: Int, m: Int, k: Int, maxIter: Int = 10,
            scale: Int = 1000): Model = {
    require(m >= 1 && dim % m == 0, s"Pq.train: m=$m must divide dim=$dim")
    val subDim = dim / m
    val books = (0 until m).map { s =>
      val sub = emb.select(col(idCol),
        slice(col(vecCol), s * subDim + 1, subDim).as(vecCol))
      val r = Clustering.lloyd(sub, idCol, vecCol, k, maxIter, subDim, scale)
      // centroids-only consumer: the per-subspace quantized cache is
      // dead weight the moment the driver map is extracted
      r.release()
      (0L until k.toLong).map(c =>
        r.centroids.getOrElse(c, Array.fill(subDim)(0.0)))
    }
    Model(dim, m, k, books)
  }

  /** Squared-euclidean distance of a subvector column to a literal
    * centroid, in a fixed evaluation order (same portability argument
    * as Clustering.lloydStep's distance). */
  private def sqDist(sub: Column, cent: Array[Double]): Column = {
    val c = array(cent.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(sub, c, (x, y) => {
      val d = x.cast("double") - y; d * d
    }), lit(0.0), (acc, v) => acc + v)
  }

  /** Length guard shared by every full-vector entry point. */
  private def dimGuard(vecCol: String, dim: Int, who: String): Column =
    when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"$who: embedding length "), size(col(vecCol)).cast("string"),
        lit(s" != expected dim $dim"))))

  /** Argmin code of a subvector against one subspace codebook — ties
    * to the lowest code (the least(struct(d, c)) rule). Shared by
    * [[encode]] and the residual encode inside [[ivfAdcTopK]]. */
  private def argminCode(sub: Column, book: Seq[Array[Double]]): Column = {
    val cand = book.zipWithIndex.map { case (cent, c) =>
      struct(sqDist(sub, cent).as("d"), lit(c).as("c"))
    }
    (if (cand.size == 1) cand.head else least(cand: _*)).getField("c")
  }

  /** Collect the query vectors driver-side (|queryIds| rows), loudly:
    * empty query sets and unknown ids are caller errors, not an
    * `empty.reduce` crash three operators later. */
  private def collectQueries(emb: DataFrame, idCol: String, vecCol: String,
                             queryIds: Seq[Long], who: String): Map[Long, Array[Double]] = {
    require(queryIds.nonEmpty, s"$who: queryIds is empty")
    val spark = emb.sparkSession
    import spark.implicits._
    val qs = emb.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap.view.mapValues(_.toArray).toMap
    val missing = queryIds.filterNot(qs.contains)
    require(missing.isEmpty, s"$who: query ids not found: ${missing.mkString(", ")}")
    qs
  }

  /** The per-query m×k ADC lookup table: squared distance of the
    * (optionally `shift`-centered) query subvector to each codebook
    * centroid, in the fixed subspace-element summation order.
    * `shift = null` means no centering — IEEE `x - 0.0 == x`, so one
    * loop serves both the raw-vector and residual (IVF) forms
    * bit-exactly. */
  private def lutFor(qv: Array[Double], shift: Array[Double],
                     model: Model): Seq[Seq[Double]] =
    (0 until model.m).map { s =>
      model.codebooks(s).map { cb =>
        var acc = 0.0; var i = 0
        while (i < model.subDim) {
          val idx = s * model.subDim + i
          val centered = if (shift == null) qv(idx) else qv(idx) - shift(idx)
          val d = centered - cb(i)
          acc += d * d; i += 1
        }
        acc
      }
    }

  /** Approximate distance of a `codes` row under a LUT: sum of m
    * literal table lookups in subspace order. */
  private def adcDist(lut: Seq[Seq[Double]], model: Model): Column =
    (0 until model.m).map { s =>
      val table = array(lut(s).toIndexedSeq.map(lit): _*)
      element_at(table, element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)

  /** Shared rank tail: per-query ascending approximate distance,
    * ties to the lower vec_id, top-k, distances rounded. */
  private def rankTail(all: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    all.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("adist"), 6).as("adist"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Encode: (idCol, codes) with `codes` an array<int> of length m;
    * codes(s) = argmin over the subspace-s codebook, ties to the
    * lowest code. Map-only — the codebooks ride as plan literals. */
  def encode(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val guarded = dimGuard(vecCol, model.dim, "Pq.encode")
    val codes = (0 until model.m).map { s =>
      argminCode(slice(guarded, s * model.subDim + 1, model.subDim),
        model.codebooks(s))
    }
    emb.select(col(idCol), array(codes: _*).as("codes"))
  }

  /** Elementwise residual of a vector column against a literal
    * centroid: `vec - cent`, computed as double subtraction per
    * element (the float→double cast is exact, so both engines see
    * identical residuals). */
  private def residual(vec: Column, cent: Array[Double]): Column = {
    val c = array(cent.toIndexedSeq.map(lit): _*)
    zip_with(vec, c, (x, y) => x.cast("double") - y)
  }

  /** IVF-PQ (Jégou et al. 2011 §IV): the coarse quantizer partitions
    * the corpus into `coarse.size` posting lists; each vector's
    * RESIDUAL against its coarse centroid is PQ-encoded; a query
    * probes the `nProbe` nearest cells and ranks candidates by ADC
    * over residual codes with a per-(query, cell) lookup table.
    *
    * This is the composition the [[encode]] scaladoc promises: IVF
    * (q34) prunes WHICH vectors are scanned, PQ compresses WHAT is
    * scanned — at 100 TB the index is `codes` (m bytes/vector) plus
    * one posting-list id, the probe scan touches nProbe/k of it, and
    * the only full-precision vectors anywhere are the query batch
    * (driver-side) and the k+m·k centroid literals in the plan.
    * Residual encoding matters vs raw-vector PQ: residuals are
    * centered near zero, so one shared codebook serves every cell.
    * The encoded corpus PERSISTS at the fork: every (query, cell)
    * probe branch filters the same code table, so without the persist
    * Spark would replay the full assign+encode scan once per branch
    * (|queries|·nProbe corpus passes instead of one). The cache lives
    * until the harness clears it (the repo's persist-at-fork
    * convention) — a long-lived service answering many batches should
    * instead [[encode]] once, persist/release the codes on ITS
    * lifecycle, and call [[adcTopK]] per batch.
    *
    * All math is fixed-order double arithmetic (assignment argmin via
    * `least(struct(dist, cell))`, LUT sums in subspace order), so the
    * result is bit-deterministic and replayable by another engine —
    * the q219 portability contract extended to the composed index.
    *
    * Output: (qid, vec_id, rank, adist) ascending approximate
    * distance, ties to the lower vec_id; self-pairs kept (a query's
    * own code row is its quantized self).
    *
    * `refine` > 1 adds the exact re-rank stage (Jégou et al. 2011
    * §V, IVFADC+R): the ADC pass shortlists `refine·topK` candidates
    * per query, then the shortlist joins back to the full-precision
    * vectors and re-ranks by EXACT squared L2. m·k ADC codes carry
    * only m·log₂k bits per vector — near-duplicate neighbors are
    * ADC-tied and their relative order is quantization noise, so
    * pure-ADC recall caps well below 1 even when every true neighbor
    * is IN the shortlist; the refinement fixes the ORDER at the cost
    * of reading refine·topK·|queries| full vectors (a broadcast-join
    * sliver of the corpus — the shortlist is tiny by construction,
    * so at 100 TB this stage touches kilobytes per query where the
    * ADC scan touched the posting lists). `refine = 1` (default) is
    * the pure-ADC path, bit-identical to before. */
  def ivfAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
                 coarse: Seq[Array[Double]], model: Model,
                 queryIds: Seq[Long], nProbe: Int, topK: Int,
                 refine: Int = 1): DataFrame = {
    require(coarse.nonEmpty && coarse.forall(_.length == model.dim),
      s"Pq.ivfAdcTopK: coarse centroids must be dim-${model.dim}")
    require(nProbe >= 1 && nProbe <= coarse.size,
      s"Pq.ivfAdcTopK: nProbe=$nProbe out of range for ${coarse.size} cells")
    val guarded = dimGuard(vecCol, model.dim, "Pq.ivfAdcTopK")
    // Coarse assignment: argmin cell by full-dim squared L2, ties to
    // the lower cell — one map-only pass, centroids ride as literals.
    val cellCol = least(coarse.zipWithIndex.map { case (cent, c) =>
      struct(sqDist(guarded, cent).as("d"), lit(c).as("c"))
    }: _*).getField("c")
    // Residual against the ASSIGNED cell (chained when — coarse.size
    // branches, each a zip_with; only the matching branch evaluates).
    val resCol = coarse.zipWithIndex.tail
      .foldLeft(when(col("cl") === 0, residual(col(vecCol), coarse.head))) {
        case (acc, (cent, c)) => acc.when(col("cl") === c, residual(col(vecCol), cent))
      }
    val withRes = emb.select(col(idCol), col(vecCol), cellCol.as("cl"))
      .withColumn("res", resCol)
    // PQ-encode the residuals (same argmin/tie rule as encode()).
    val codeCols = (0 until model.m).map { s =>
      argminCode(slice(col("res"), s * model.subDim + 1, model.subDim),
        model.codebooks(s))
    }
    val codes = withRes.select(col(idCol), col("cl"), array(codeCols: _*).as("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Query batch driver-side: coarse distances + probe list + LUTs.
    val qs = collectQueries(emb, idCol, vecCol, queryIds, "Pq.ivfAdcTopK")
    val perBranch = for {
      qid <- queryIds
      qv = qs(qid)
      cellDists = coarse.zipWithIndex.map { case (cent, c) =>
        var acc = 0.0; var i = 0
        while (i < model.dim) { val d = qv(i) - cent(i); acc += d * d; i += 1 }
        (acc, c)
      }
      (_, cell) <- cellDists.sorted.take(nProbe)
    } yield {
      // lut(s)(c): residual-space squared distance, (qv - coarse) - cb
      // per element, subspace-order summation.
      val lut = lutFor(qv, coarse(cell), model)
      codes.where(col("cl") === cell)
        .select(lit(qid).as("qid"), col(idCol).as("vec_id"),
          adcDist(lut, model).as("adist"))
    }
    val all = perBranch.reduce(_.unionByName(_))
    if (refine <= 1) rankTail(all, topK)
    else {
      // exact re-rank of the ADC shortlist: refine·topK ids per query
      // broadcast back against the full-precision vectors; the query
      // vectors are already driver-side, so the exact distance is a
      // per-query literal sqDist CASE over a tiny joined frame.
      val short = rankTail(all, topK * refine).select("qid", "vec_id")
      val joined = emb.select(col(idCol).as("vec_id"), dimGuard(vecCol,
          model.dim, "Pq.ivfAdcTopK.refine").as("__v"))
        .join(broadcast(short), Seq("vec_id"))
      val exact = queryIds.tail
        .foldLeft(when(col("qid") === queryIds.head,
          sqDist(col("__v"), qs(queryIds.head)))) { (acc, qid) =>
          acc.when(col("qid") === qid, sqDist(col("__v"), qs(qid)))
        }
      rankTail(joined.select(col("qid"), col("vec_id"), exact.as("adist")), topK)
    }
  }

  /** ADC top-k for a small query set: collects the query vectors
    * (|queryIds| rows), builds each query's m·k LUT driver-side, and
    * ranks the code table with per-query literal lookups — one
    * map-only scan over codes per query batch, then the shared
    * rank tail. Output: (qid, vec_id, rank, adist), ascending
    * approximate distance, ties to the lower vec_id; self-pairs kept
    * (a query's own code row is its quantized self). */
  def adcTopK(codes: DataFrame, emb: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], topK: Int, model: Model): DataFrame = {
    val qs = collectQueries(emb, idCol, vecCol, queryIds, "Pq.adcTopK")
    val perQuery = queryIds.map { qid =>
      val lut = lutFor(qs(qid), null, model)
      codes.select(lit(qid).as("qid"), col(idCol).as("vec_id"),
        adcDist(lut, model).as("adist"))
    }
    rankTail(perQuery.reduce(_.unionByName(_)), topK)
  }
}
