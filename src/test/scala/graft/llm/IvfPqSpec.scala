package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Pq.ivfAdcTopK]] — the composed IVF-PQ index — against a
  * from-scratch driver-side replay of the same definition (assignment
  * argmin, residual encode, per-(query, cell) LUT ADC), plus the
  * structural properties: candidates come only from probed cells,
  * every query's quantized self appears, and dimension guards fire. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val k = 4
  private val subDim = dim / m

  // pinned quarter-grid coarse cells + residual codebook (exact doubles)
  private val coarse: Seq[Array[Double]] =
    (0 until 3).map(c => Array.tabulate(dim)(i => ((c * 37 + i * 13) % 21 - 10) / 4.0))
  private val model = Pq.Model(dim, m, k,
    (0 until m).map(s => (0 until k).map(c =>
      Array.tabulate(subDim)(i => ((c * 29 + i * 11 + s * 5) % 17 - 8) / 4.0))))

  /** Seeded jittered corpus around the coarse cells so posting lists
    * are non-trivially populated. */
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(91)
    (0L until 60L).map { id =>
      val cell = coarse((id % 3).toInt)
      (id, cell.map(x => (x + rnd.nextGaussian() * 0.8).toFloat).toSeq)
    }
  }
  private lazy val emb = vecs.toDF("vec_id", "embedding")

  private val queryIds = Seq(0L, 7L, 31L)
  private val nProbe = 2
  private val topK = 5

  /** Naive replay: plain loops, same fixed evaluation order. */
  private def naive(): Seq[(Long, Long, Int, Double)] = {
    val data = vecs.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val cellOf = data.view.mapValues { v =>
      coarse.zipWithIndex.map { case (c, i) => (sq(v, c), i) }.min._2
    }.toMap
    val codesOf = data.map { case (id, v) =>
      val cent = coarse(cellOf(id))
      val res = v.indices.map(i => v(i) - cent(i)).toArray
      id -> (0 until m).map { s =>
        (0 until k).map { c =>
          (sq(res.slice(s * subDim, (s + 1) * subDim), model.codebooks(s)(c)), c)
        }.min._2
      }
    }
    queryIds.flatMap { qid =>
      val qv = data(qid)
      val probed = coarse.zipWithIndex
        .map { case (c, i) => (sq(qv, c), i) }.sorted.take(nProbe).map(_._2)
      val cands = probed.flatMap { cell =>
        val cent = coarse(cell)
        val lut = (0 until m).map { s =>
          (0 until k).map { c =>
            var acc = 0.0; var i = 0
            while (i < subDim) {
              val d = (qv(s * subDim + i) - cent(s * subDim + i)) - model.codebooks(s)(c)(i)
              acc += d * d; i += 1
            }
            acc
          }
        }
        data.keys.filter(cellOf(_) == cell).map { id =>
          val codes = codesOf(id)
          (id, (0 until m).map(s => lut(s)(codes(s))).sum)
        }
      }
      cands.sortBy { case (id, d) => (d, id) }.take(topK).zipWithIndex.map {
        case ((id, d), r) =>
          (qid, id, r + 1, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  test("matches the from-scratch driver replay exactly") {
    val got = Pq.ivfAdcTopK(emb, "vec_id", "embedding", coarse, model,
        queryIds, nProbe, topK)
      .as[(Long, Long, Int, Double)].collect().toSeq
      .sortBy(r => (r._1, r._3))
    assert(got == naive(), s"\ngot:   $got\nnaive: ${naive()}")
  }

  test("candidates come only from probed cells; self-pair present at adist of the quantized self") {
    val got = Pq.ivfAdcTopK(emb, "vec_id", "embedding", coarse, model,
        queryIds, nProbe, topK)
      .as[(Long, Long, Int, Double)].collect()
    // every query returns its full topK on this densely-populated fixture
    assert(got.groupBy(_._1).forall(_._2.length == topK))
    // the quantized self is a candidate (its cell is always probed first)
    queryIds.foreach { qid =>
      assert(got.exists(r => r._1 == qid && r._2 == qid),
        s"query $qid missing its own code row in top-$topK")
    }
  }

  test("refine: exact re-rank orders the ADC shortlist by true distance") {
    // planted near-duplicates: 6 vectors within a whisker of query 0,
    // far closer than the jittered corpus — exact L2 orders them by
    // construction, while 2-bit-per-subspace ADC codes tie them
    val qv = vecs.find(_._1 == 0L).get._2.map(_.toDouble).toArray
    val planted = (0 until 6).map { j =>
      (500L + j, qv.zipWithIndex.map { case (v, i) =>
        (v + 0.001 * (j + 1) * (if (i % 2 == 0) 1 else -1)).toFloat }.toSeq)
    }
    val emb2 = (vecs ++ planted).toDF("vec_id", "embedding")
    val refined = Pq.ivfAdcTopK(emb2, "vec_id", "embedding", coarse, model,
        Seq(0L), nProbe, topK = 7, refine = 4)
      .as[(Long, Long, Int, Double)].collect().toSeq
    // exact order: self (d=0), then planted by ascending perturbation
    assert(refined.map(_._2) == Seq(0L, 500L, 501L, 502L, 503L, 504L, 505L),
      refined.toString)
    // adist is now the EXACT squared distance: strictly increasing
    assert(refined.map(_._4) == refined.map(_._4).sorted)
    assert(refined.head._4 == 0.0)
    // refine=1 (default) is bit-identical to the pure-ADC path
    val pure = Pq.ivfAdcTopK(emb2, "vec_id", "embedding", coarse, model,
      Seq(0L), nProbe, topK = 7)
    val explicit = Pq.ivfAdcTopK(emb2, "vec_id", "embedding", coarse, model,
      Seq(0L), nProbe, topK = 7, refine = 1)
    assert(pure.collect().toSeq == explicit.collect().toSeq)
  }

  test("wrong-dimension vectors raise in-plan") {
    val bad = Seq((99L, Seq.fill(dim + 1)(0.1f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pq.ivfAdcTopK(bad.unionByName(emb), "vec_id", "embedding", coarse, model,
        queryIds, nProbe, topK).collect()
    }
    assert(ex.getMessage != null)
  }

  test("nProbe and centroid-shape guards") {
    intercept[IllegalArgumentException] {
      Pq.ivfAdcTopK(emb, "vec_id", "embedding", coarse, model, queryIds,
        nProbe = 9, topK = 3)
    }
    intercept[IllegalArgumentException] {
      Pq.ivfAdcTopK(emb, "vec_id", "embedding", Seq(Array(1.0)), model,
        queryIds, 1, 3)
    }
    ()
  }
}
