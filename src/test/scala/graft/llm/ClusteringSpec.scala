package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Clustering.lloydStep]]: assignments are nearest-centroid
  * optimal (verified against a driver-side replay), well-separated
  * clusters are a fixed point, and the dimension guard is loud. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("well-separated clusters with correct seeds are a fixed point") {
    val rows = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array.fill(4)(c * 10.0f)
      base(0) += (i / 3 % 5) * 0.01f // tiny within-cluster jitter
      (i, base.toSeq, c)
    }
    val out = Clustering.lloydStep(mk(rows), "vec_id", "embedding",
      "label", dim = 4, scale = 1000)
    assert(out.where(col("label") =!= col("assigned")).count() == 0)
  }

  test("swapped seed labels converge back to the true clusters") {
    // two tight blobs, every label deliberately WRONG (swapped):
    // centroids still land between their true members, so one step
    // reassigns everything to the majority-correct centroid
    val rows = (0L until 20L).map { i =>
      val c = (i % 2).toInt
      (i, Seq.fill(3)(c * 100.0f), 1 - c)
    }
    val out = Clustering.lloydStep(mk(rows), "vec_id", "embedding",
      "label", dim = 3, scale = 1000)
      .select("vec_id", "assigned").as[(Long, Long)].collect().toMap
    // all vectors of one blob land in the SAME centroid, blobs differ
    val byBlob = (0L until 20L).groupBy(_ % 2).map { case (b, ids) =>
      b -> ids.map(out).toSet
    }
    assert(byBlob(0L).size == 1 && byBlob(1L).size == 1)
    assert(byBlob(0L) != byBlob(1L))
  }

  test("assignments match a driver-side exact replay") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 60L).map { i =>
      (i, Seq.fill(6)(rnd.nextFloat() * 2 - 1), rnd.nextInt(4))
    }
    val got = Clustering.lloydStep(mk(rows), "vec_id", "embedding",
      "label", dim = 6, scale = 1000)
      .select("vec_id", "assigned").as[(Long, Long)].collect().toMap
    // replay: same quantization, exact integer sums, same double order
    val q = rows.map { case (id, v, l) =>
      (id, v.map(e => math.round(e.toDouble * 1000)), l.toLong)
    }
    val sums = q.groupBy(_._3).map { case (l, vs) =>
      l -> (vs.map(_._2).transpose.map(_.sum), vs.size.toLong)
    }
    q.foreach { case (id, x, _) =>
      val xx = x.map(a => a * a).sum.toDouble
      val best = sums.toSeq.map { case (l, (s, n)) =>
        val dot = x.zip(s).map { case (a, b) => a * b }.sum.toDouble
        val ss = s.map(a => a * a).sum.toDouble
        (xx - (2.0 * dot) / n + ss / (n.toDouble * n.toDouble), l)
      }.min
      assert(got(id) == best._2, s"vec $id: got ${got(id)}, want ${best._2}")
    }
  }

  test("dimension mismatch fails loudly in-plan") {
    val bad = mk(Seq((1L, Seq(1.0f, 2.0f), 0)))
    val e = intercept[Exception] {
      Clustering.lloydStep(bad, "vec_id", "embedding", "label", dim = 3)
        .collect()
    }
    assert(e.getMessage.contains("lloydStep") ||
      e.getCause.getMessage.contains("lloydStep"))
  }
}
