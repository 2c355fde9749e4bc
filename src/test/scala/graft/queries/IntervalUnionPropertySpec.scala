package graft.queries

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks

/** Property guard for the interval-union sweep line: on random point
 * sets, the windowed SQL sweep must equal a brute-force interval
 * union computed in plain Scala. */
class IntervalUnionPropertySpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def bruteForce(points: Seq[Long], span: Long): (Long, Long) = {
    val sorted = points.sorted.map(p => (p, p + span))
    var islands = 0L
    var covered = 0L
    var curStart = Long.MinValue
    var curEnd = Long.MinValue
    sorted.foreach { case (s, e) =>
      if (islands == 0 || s > curEnd) {
        if (islands > 0) covered += curEnd - curStart
        islands += 1; curStart = s; curEnd = e
      } else if (e > curEnd) curEnd = e
    }
    if (islands > 0) covered += curEnd - curStart
    (islands, covered)
  }

  test("sweep equals brute-force union on random point sets") {
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { trial =>
      val span = 50L + rnd.nextInt(100)
      val users = (1L to 5L)
      val pts = users.flatMap { u =>
        val n = 1 + rnd.nextInt(30)
        Seq.fill(n)((u * 100000 + rnd.nextInt(1000), u, rnd.nextInt(2000).toLong))
      }
      // unique event ids per row for a deterministic ordering
      val rows = pts.zipWithIndex.map { case ((_, u, us), i) => (i.toLong, u, us) }
      val df = rows.toDF("event_id", "user_id", "us")
      val got = SqlSurfaceQueries.intervalUnionOf(df, span)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      users.foreach { u =>
        val expected = bruteForce(rows.filter(_._2 == u).map(_._3), span)
        assert(got(u) === expected,
          s"trial $trial user $u span $span: got ${got(u)}, expected $expected")
      }
    }
  }
}
