package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized connected-components parity: driver union-find vs
  * distributed min-label propagation vs a naive test-side union-find,
  * over random graph shapes the directed DedupSpec chain test doesn't
  * generate — many components of mixed sizes, cycles, hub stars,
  * duplicate and reversed edges, self-loops, and sparse node ids with
  * large gaps. Both engine strategies must produce the naive labeling
  * exactly (cluster_id = the component's minimum id).
  */
class CcFuzzSpec extends SparkSpec {

  private def naiveComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("driver union-find and distributed propagation match a naive reference on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 4).foreach { round =>
      // sparse ids with big gaps; density varies per round
      val nodes = (0 until 60 + rnd.nextInt(60))
        .map(_ => rnd.nextInt(10000).toLong * 977L).distinct
      val nEdges = 20 + rnd.nextInt(120)
      val raw = (0 until nEdges).map { _ =>
        val a = nodes(rnd.nextInt(nodes.length))
        val b = nodes(rnd.nextInt(nodes.length))
        (a, b) // self-loops allowed
      }
      // duplicates + reversed duplicates ride along
      val edges = raw ++ raw.take(nEdges / 4).map { case (a, b) => (b, a) } ++
        raw.take(nEdges / 8)
      val expect = naiveComponents(edges)
      val pairs = edges.toDF("id1", "id2")
      val tag = s"round $round (${nodes.length} nodes, ${edges.length} edges)"

      val driver = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver == expect, s"$tag: driver union-find diverges from naive")

      // the distributed path pays multiple shuffle rounds of fixed driver
      // latency per iteration — one random round keeps the parity pinned
      // without doubling the suite's wall time (the chain-shaped directed
      // case lives in DedupSpec)
      if (round == 0) {
        val (dist, converged) =
          Dedup.connectedComponentsWithStatus(pairs, driverMaxEdges = 0L)
        assert(converged, s"$tag: distributed propagation must converge")
        val distMap = dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(distMap == expect, s"$tag: distributed propagation diverges from naive")
      }
    }
  }
}
