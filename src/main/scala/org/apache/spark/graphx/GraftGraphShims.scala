/*
 * Lives under org.apache.spark.graphx to reach the package-private
 * active-set variant of aggregateMessages — the same mechanism
 * GraphX's own Pregel uses to skip edge partitions with no active
 * vertices late in an iterative computation.
 */
package org.apache.spark.graphx

import scala.reflect.ClassTag
import org.apache.spark.graphx.impl.GraphImpl

object GraftGraphShims {

  /** aggregateMessages restricted to triplets with at least one
   * endpoint in the active set (direction Either). Semantically a
   * filter: a sendMsg that only emits from active endpoints produces
   * identical messages, but quiescent edge partitions are skipped
   * entirely instead of scanned. */
  def aggregateMessagesWithActiveSet[VD: ClassTag, ED: ClassTag, A: ClassTag](
      graph: Graph[VD, ED],
      sendMsg: EdgeContext[VD, ED, A] => Unit,
      mergeMsg: (A, A) => A,
      tripletFields: TripletFields,
      activeSet: VertexRDD[_]): VertexRDD[A] =
    graph.asInstanceOf[GraphImpl[VD, ED]].aggregateMessagesWithActiveSet(
      sendMsg, mergeMsg, tripletFields, Some((activeSet, EdgeDirection.Either)))
}
