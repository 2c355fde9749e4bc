package graft.ops

import graft.SparkSpec

/** Deterministic integer k-means: exact agreement with a driver-side
 * replay of the same quantize → md5-seed → Lloyd trajectory, plus
 * the assignment-optimality invariant on real data. */
class KmeansSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("kmeansDet equals the sequential Lloyd replay on sf0.001 embeddings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 8

    val got = Similarity.kmeansDet(embs, k = k, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // driver-side replay
    val qs = embs.select($"vec_id", $"embedding".cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .flatMap { case (id, v) =>
        val maxAbs = v.foldLeft(0.0)((a, x) => math.max(a, math.abs(x)))
        if (maxAbs > 0.0) {
          val scale = 127.0 / maxAbs
          Some((id, v.map(x => math.floor(x * scale + 0.5).toLong + 127L)))
        } else None
      }
    var centroids = qs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k).map(_._2.map(identity))
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var asg: Map[Long, (Long, Long)] = Map.empty
    for (it <- 1 to 3) {
      asg = qs.map { case (id, v) =>
        val (dist, cl) = centroids.zipWithIndex
          .map { case (c, i) => (d2(v, c), i.toLong) }.min
        id -> (cl, dist)
      }.toMap
      if (it < 3) {
        val upd = centroids.map(_.clone())
        asg.groupBy(_._2._1).foreach { case (cl, members) =>
          val vecs = members.keys.toSeq.map(id => qs.find(_._1 == id).get._2)
          for (d <- upd(cl.toInt).indices)
            upd(cl.toInt)(d) = Math.floorDiv(vecs.map(_(d)).sum, vecs.size.toLong)
        }
        centroids = upd
      }
    }
    assert(got === asg)

    // invariant: every vector sits in its truly nearest final centroid
    qs.foreach { case (id, v) =>
      val best = centroids.zipWithIndex
        .map { case (c, i) => (d2(v, c), i.toLong) }.min
      assert(got(id)._2 === best._1, s"vec $id not at nearest centroid")
    }
  }
}
