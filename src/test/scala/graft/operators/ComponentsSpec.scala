package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class ComponentsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)], maxIter: Int = 25) =
    Components.connectedComponents(
        pairs.toDF("id_a", "id_b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain a-b, b-c is one component even though (a,c) never paired") {
    assert(components(Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("ring converges to the minimum id") {
    assert(components(Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L))) ==
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("disjoint clusters keep distinct labels; isolated pair is its own") {
    val got = components(Seq((1L, 2L), (2L, 3L), (100L, 200L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 100L -> 100L, 200L -> 100L))
  }

  test("edge direction does not matter (id_b < id_a accepted)") {
    assert(components(Seq((5L, 4L), (3L, 4L))) ==
      Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("duplicate and self-referential edges are harmless") {
    val got = components(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("long chain converges (diameter rounds, early exit at fixpoint)") {
    // path 0-1-2-...-9: worst case for min-label propagation — the
    // label must travel the full diameter
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = components(chain, maxIter = 25)
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("componentStats reports size and drop count per cluster") {
    val labeled = Components.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (100L, 200L)).toDF("id_a", "id_b"))
    val stats = Components.componentStats(labeled)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats == Set((1L, 3L, 2L), (100L, 2L, 1L)))
  }

  test("no cached plans leak past the call") {
    val before = spark.sparkContext.getPersistentRDDs.size
    components(Seq((1L, 2L), (3L, 4L)))
    // connectedComponents persists edges + per-round labels, all
    // unpersisted before return; the only survivor is the
    // localCheckpointed result (reclaimed by ContextCleaner when the
    // returned DataFrame is released)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"persistent RDDs grew $before -> $after")
  }

  test("canonicalBy keeps the highest-quality member, id tiebreak") {
    // cluster {1,2,3}: 3 has the best quality and wins despite the
    // largest id; cluster {10,11}: tie on quality → smaller id keeps
    val labeled = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("id", "component")
    val quality = Seq((1L, 0.5), (2L, 0.7), (3L, 0.9), (10L, 0.8),
      (11L, 0.8)).toDF("id", "quality")
    val got = Components.canonicalBy(labeled, quality).collect()
      .map(r => r.getAs[Long]("component") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("keep_id"),
          r.getAs[Double]("keep_quality")))).toMap
    assert(got(1L) == ((3L, 3L, 0.9)))
    assert(got(10L) == ((2L, 10L, 0.8)))
  }

  test("maxIter exhaustion falls back to star contraction, still exact") {
    // path 0-1-...-7 has diameter 7 > maxIter=2: propagation cannot
    // finish, so the large-star/small-star fallback must take over and
    // still produce the exact merge (never a silent partial one)
    val chain = (0L until 7L).map(i => (i, i + 1))
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(components(chain, maxIter = 2) == (0L to 7L).map(_ -> 0L).toMap)
    // the fallback path must not leak working caches either
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"persistent RDDs grew $before -> $after")
  }

  test("star contraction agrees with union-find on seeded random graphs") {
    // force the fallback on every shape (maxIter=1 defeats propagation
    // for any graph of diameter > 1) and check the exact component
    // labeling against a local union-find reference — the property the
    // Kiveris alternation must hold on clumps, chains, rings and
    // disconnected mixtures alike
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val nNodes = 20 + rnd.nextInt(60)
      val nEdges = 10 + rnd.nextInt(80)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // union-find reference
        val parent = Array.tabulate(nNodes)(identity)
        def find(x: Int): Int = {
          var r = x; while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val present = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expect = present.map { id =>
          // component = min id within the union-find class among present nodes
          val root = find(id.toInt)
          id -> present.filter(p => find(p.toInt) == root).min
        }.toMap
        val got = components(edges, maxIter = 1)
        assert(got == expect, s"trial $trial: $edges")
      }
    }
  }

  test("10k-node adversarial path converges via O(log n) star rounds") {
    // diameter 9999 >> maxIter=25: label propagation would need 10k
    // rounds; the Kiveris et al. alternation contracts it in ~log2(n).
    // Two components (an even/odd split of ids via two long paths)
    // prove the fallback keeps clusters separate while merging chains.
    val pathA = (0L until 9998L by 2).map(i => (i, i + 2))     // evens 0..9998
    val pathB = (1L until 9999L by 2).map(i => (i, i + 2))     // odds 1..9999
    val got = components(pathA ++ pathB, maxIter = 25)
    assert(got.size == 10000)
    assert((0L until 10000L by 2).forall(got(_) == 0L))
    assert((1L until 10000L by 2).forall(got(_) == 1L))
  }
}
