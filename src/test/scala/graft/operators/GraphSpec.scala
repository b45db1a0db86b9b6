package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Graph]] — integer-credit PageRank against hand-computed credit flow,
  * and degree-ordered triangle counting including the case where the
  * wedge corners' degree order inverts their id order. */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("pageRankCredits: exact integer credit flow, 2 iterations") {
    // 1->2, 1->3, 2->3, 3->1; outdeg 1:2, 2:1, 3:1
    val e = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L)
    val got = Graph.pageRankCredits(e, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: c(1)=150k+850k; c(2)=150k+425k; c(3)=150k+425k+850k
    // iter2: from1=425k each, from2=(575000*85) div 100=488750,
    //        from3=(1425000*85) div 100=1211250
    assert(got == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("pageRankCredits: dangling remainder burned, teleport floor") {
    // single edge 1->2; node 2 dangling (sends nothing)
    val e = edges(1L -> 2L)
    val got = Graph.pageRankCredits(e, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 150000L, 2L -> (150000L + 850000L)))
  }

  test("triangleCounts: one triangle + pendant; symmetrization and dedup") {
    // triangle {1,2,3} given as mixed directions + a duplicate, pendant 4
    val e = edges(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 3L -> 4L)
    val got = Graph.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // 4: no triangle row
  }

  test("triangleCounts: wedge order follows degree, not id") {
    // triangle {1,2,3} with 2 a hub (extra edges to 4,5): in the wedge
    // from corner 1, the closing edge must be sought 3->2 (degree order),
    // not 2->3 (id order)
    val e = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 2L -> 4L, 2L -> 5L)
    val got = Graph.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: two triangles sharing an edge") {
    // {1,2,3} and {2,3,4} share edge {2,3}
    val e = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val got = Graph.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("connectedComponents: two components + a long chain") {
    // chain 1-2-3-4-5 (forces >1 round without doubling) and pair {10,11}
    val e = edges(2L -> 1L, 2L -> 3L, 4L -> 3L, 4L -> 5L, 10L -> 11L)
    val got = Graph.connectedComponents(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: min id sits at the chain's far end") {
    // labels must travel the whole path: 9-8-7-6-1, min (1) at one end
    val e = edges(9L -> 8L, 8L -> 7L, 7L -> 6L, 6L -> 1L)
    val got = Graph.connectedComponents(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L) && got.keySet ==
      Set(1L, 6L, 7L, 8L, 9L))
  }

  test("connectedComponents: self-loop-only node keeps its own label") {
    val e = edges(1L -> 2L, 7L -> 7L)
    val got = Graph.connectedComponents(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("seededDistance: BFS layers on a directed chain with a shortcut") {
    // 1->2->3->4, plus shortcut 1->4 and back-edge 3->1; seed = {1}
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 3L -> 1L)
    val seeds = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    def run(h: Int) = Graph.seededDistance(e, seeds, h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(0) == Map(1L -> 0L))
    assert(run(1) == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
    // shortcut keeps 4 at 1 even once 3->4 offers 3; 3 arrives at 2
    assert(run(3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("labelPropagation: hand-computed rounds with majority and ties") {
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4
    val e = edges(1L -> 2L, 1L -> 3L, 2L -> 3L,
      4L -> 5L, 4L -> 6L, 5L -> 6L, 3L -> 4L)
    // round 1 (all votes count 1, tie -> min neighbor label):
    //   1<-min{2,3}=2, 2<-min{1,3}=1, 3<-min{1,2,4}=1,
    //   4<-min{3,5,6}=3, 5<-min{4,6}=4, 6<-min{4,5}=4
    val r1 = Graph.labelPropagation(e, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 4L, 6L -> 4L))
    // round 2: 1<-{1,1}=1 (majority), 2<-{2,1} tie=1, 3<-{2,1,3} tie=1,
    //   4<-{1,4,4}=4 (majority), 5<-{3,4} tie=3, 6<-{3,4} tie=3
    val r2 = Graph.labelPropagation(e, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
  }
}
