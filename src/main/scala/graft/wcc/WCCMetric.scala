package graft.wcc

/**
 * Closed-form estimators for the Weighted Community Clustering
 * metric (F3-F6 in SURVEY.md §2.7), used by the movement decision:
 * instead of re-counting triangles after a hypothetical move, the
 * refinement loop scores moves with these O(1) estimates derived
 * from community stats (size r, internal edges a -> density d,
 * boundary edges b) and the global clustering coefficient.
 *
 * Behavioral contract is the reference's `WCCMetric.scala:16-48`,
 * reproduced bit-for-bit — every arithmetic expression below keeps
 * the reference's left-to-right association so doubles round the
 * same way — INCLUDING its two deviations from the DWCC paper
 * (arXiv:1411.0557), per the quirk ledger in SURVEY.md §7.1:
 *
 *  - the middle estimator term is returned NEGATED (the reference's
 *    `WCCMetric.scala:41` evaluates `- numerator / denominator` as
 *    the trailing expression of the method);
 *  - the boundary term's denominator repeats its `dOut*dIn*w`
 *    cross term (`WCCMetric.scala:46`).
 *
 * Parity with a faithful sequential simulation of the reference is
 * asserted by `ReferenceSimSpec` on email-Eu-core.
 */
object WCCMetric {

  /** F6: WCC gain of evicting `v` into its own singleton community.
   * Communities of size 1 score 0 (nothing to leave). Derived from
   * the insertion estimate of the inverse move (reference
   * `DistributedWCC.scala:407-419`).
   *
   * @param cDegrees per-neighbor-community edge counts of `v`
   */
  def computeWccR(v: VertexData, cDegrees: Map[Long, Int], c: CommunityData,
      globalCC: Double, vertexCount: Long): Double = {
    val toOwn = cDegrees.getOrElse(v.cId, 0)
    val toRest = cDegrees.values.sum - toOwn
    computeWccRFromDegrees(v, toOwn, toRest, c, globalCC, vertexCount)
  }

  /** `computeWccR` on pre-split own/rest degree counts (the compact
   * movement path) — identical arithmetic. */
  def computeWccRFromDegrees(v: VertexData, toOwn: Int, toRest: Int,
      c: CommunityData, globalCC: Double, vertexCount: Long): Double = {
    if (c.r == 1) return 0.0
    val shrunk = c.removeVertex(toOwn, toRest)
    -computeWccI(shrunk, toOwn, toRest, globalCC, vertexCount)
  }

  /** F4: estimated global-WCC change of inserting a vertex that has
   * `dIn` edges into community `c` and `dOut` edges elsewhere
   * (reference `WCCMetric.scala:23-30`). The three terms weigh the
   * effect on (1) the members the vertex now touches, (2) the
   * members it does not, and (3) the inserted vertex itself. */
  def computeWccI(c: CommunityData, dIn: Int, dOut: Int, globalCC: Double,
      vertexCount: Long): Double = {
    val size = c.r
    val dens = c.d
    // boundary edges per member not absorbed by the insertion
    val q = (c.b - dIn) / c.r.toDouble

    // term over the dIn members adjacent to the inserted vertex
    def touchedTerm: Double = {
      val pairs = (size - 1) * (size - 2)
      val headroom = (size - 1) * dens + 1 + q
      val numerator = headroom * (dIn - 1) * dens
      val denominator =
        (size + q) * pairs * math.pow(dens, 3) + (dIn - 1) * dens +
          q * (q - 1) * dens * globalCC + q * (q - 1) * globalCC + dOut + globalCC
      numerator / denominator
    }

    // term over the (r - dIn) members NOT adjacent to the inserted
    // vertex; returned negated (reference quirk, see object doc)
    def untouchedTerm: Double = {
      val cubic = (size - 1) * (size - 2) * math.pow(dens, 3)
      val numerator = cubic * ((size - 1) * dens + q)
      val denominator =
        (cubic + q * (q - 1) * globalCC + q * (size - 1) * dens * globalCC) *
          (size + q) * (size - 1 + q)
      -numerator / denominator
    }

    // the inserted vertex's own WCC_V estimate; the cross term
    // appears twice in the denominator (reference quirk)
    def selfTerm: Double = {
      val inPairs = dIn * (dIn - 1)
      val cross = dOut * dIn * globalCC
      val numerator = inPairs * dens * (dIn + dOut)
      val denominator =
        (inPairs * dens + dOut * (dOut - 1) * globalCC + cross + cross) *
          (size + dOut)
      numerator / denominator
    }

    (dIn * touchedTerm + (size - dIn) * untouchedTerm + selfTerm) /
      vertexCount.toDouble
  }

  /** F3: vertex-local WCC of `v` w.r.t. its community — the share of
   * `v`'s triangle structure that lives inside the community,
   * discounted by the outside vertices it still triangles with
   * (reference `WCCMetric.scala:16-21`).
   *
   * @param vtC community members closing >=1 triangle with `v`
   * @param tC  triangles `v` closes entirely inside the community
   */
  def computeWccV(v: VertexData, c: CommunityData, vtC: Int, tC: Int): Double = {
    if (v.t == 0) return 0.0
    val numerator = tC.toDouble * v.vt
    val denominator = v.t * (c.r - 1 + v.vt - vtC).toDouble
    numerator / denominator
  }
}
