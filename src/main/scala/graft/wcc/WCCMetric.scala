package graft.wcc

/**
 * Closed-form WCC estimators (F3-F6 in SURVEY.md §2.7).
 *
 * Behavioral contract is the reference's `WCCMetric.scala:16-48`,
 * replicated bit-for-bit INCLUDING its two deviations from the DWCC
 * paper (arXiv:1411.0557), per the quirk ledger in SURVEY.md §7.1:
 *
 *  - theta2 returns `-numerator/denominator` (the reference computes
 *    the value on a dangling line after the `val denominator =`
 *    statement, `WCCMetric.scala:41` — the negative sign is the
 *    actual returned expression);
 *  - theta3's denominator contains the `dOut*dIn*w` term TWICE
 *    (`WCCMetric.scala:46`).
 */
object WCCMetric {

  /** F3: vertex-local WCC w.r.t. its community.
   *
   * @param vtC number of community members adjacent to the vertex
   * @param tC  number of triangles the vertex closes inside the
   *            community
   * (reference `WCCMetric.scala:16-21`) */
  def computeWccV(v: VertexData, c: CommunityData, vtC: Int, tC: Int): Double = {
    if (v.t == 0) return 0.0
    val numerator = tC.toDouble * v.vt
    val denominator = v.t * (c.r - 1 + v.vt - vtC).toDouble
    numerator / denominator
  }

  /** F4: estimated WCC change of inserting a vertex with (dIn, dOut)
   * edges into community c (reference `WCCMetric.scala:23-30`). */
  def computeWccI(c: CommunityData, dIn: Int, dOut: Int, globalCC: Double, vertexCount: Long): Double = {
    val q = (c.b - dIn) / c.r.toDouble
    val t1 = theta1(c.r, c.d, dIn, dOut, globalCC, q)
    val t2 = theta2(c.r, c.d, globalCC, q)
    val t3 = theta3(c.r, c.d, dIn, dOut, globalCC)
    (dIn * t1 + (c.r - dIn) * t2 + t3) / vertexCount.toDouble
  }

  private def theta1(r: Int, d: Double, dIn: Int, dOut: Int, w: Double, q: Double): Double = {
    val numerator = ((r - 1) * d + 1 + q) * (dIn - 1) * d
    val denominator = (r + q) * ((r - 1) * (r - 2)) * math.pow(d, 3) +
      (dIn - 1) * d + q * (q - 1) * d * w + q * (q - 1) * w + dOut + w
    numerator / denominator
  }

  /** Reference quirk preserved: result is -num/den (`WCCMetric.scala:38-42`). */
  private def theta2(r: Int, d: Double, w: Double, q: Double): Double = {
    val numerator = (r - 1) * (r - 2) * math.pow(d, 3) * ((r - 1) * d + q)
    val denominator = ((r - 1) * (r - 2) * math.pow(d, 3) + q * (q - 1) * w +
      q * (r - 1) * d * w) * (r + q) * (r - 1 + q)
    -numerator / denominator
  }

  /** Reference quirk preserved: dOut*dIn*w appears twice in the
   * denominator (`WCCMetric.scala:44-48`). */
  private def theta3(r: Int, d: Double, dIn: Int, dOut: Int, w: Double): Double = {
    val numerator = (dIn * (dIn - 1) * d) * (dIn + dOut)
    val denominator = (dIn * (dIn - 1) * d + dOut * (dOut - 1) * w +
      dOut * dIn * w + dOut * dIn * w) * (r + dOut)
    numerator / denominator
  }

  /** F6: WCC gain of removing a vertex into its own singleton, 0 for
   * already-isolated communities (reference `DistributedWCC.scala:407-419`). */
  def computeWccR(v: VertexData, cDegrees: Map[Long, Int], c: CommunityData,
      globalCC: Double, vertexCount: Long): Double = {
    if (c.r == 1) return 0.0
    val dIn = cDegrees.getOrElse(v.cId, 0)
    val dOut = cDegrees.values.sum - dIn
    val removed = c.removeVertex(dIn, dOut)
    -computeWccI(removed, dIn, dOut, globalCC, vertexCount)
  }
}
