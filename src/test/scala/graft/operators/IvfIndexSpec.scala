package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class IvfIndexSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(29)
    val base = (0L until 400L).map { id =>
      val v = Seq.fill(32)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(_ / n))
    }
    val copies = base.take(6).map { case (id, v) =>
      (id + 1000, v.map(_ * 1.001))
    }
    (base ++ copies).toDF("cid", "cvec")
  }
  private lazy val queries = corpus.where($"cid" < 6)
    .select($"cid".as("qid"), $"cvec".as("qvec"))

  test("persisted probe matches the in-memory annIvf answer") {
    val path = Files.createTempDirectory("graft_ivf").toString
    Similarity.buildIvfIndex(spark, corpus, nlist = 16, path = path)
    val got = Similarity.probeIvfIndex(spark, path, queries, k = 3,
        nprobe = 4, minSim = 0.99)
      .select("qid", "cid", "sim").as[(Long, Long, Double)]
      .collect().toSet
    val want = Similarity.annIvf(queries, corpus, k = 3, nlist = 16,
        nprobe = 4, minSim = 0.99)
      .select("qid", "cid", "sim").as[(Long, Long, Double)]
      .collect().toSet
    assert(got === want)
    assert(got.map(t => (t._1, t._2)) ===
      (0L until 6L).map(id => (id, id + 1000)).toSet)
  }

  test("append absorbs new vectors without a rebuild; probes see them") {
    val path = Files.createTempDirectory("graft_ivf").toString
    // build WITHOUT the planted near-copies, then append them
    Similarity.buildIvfIndex(spark, corpus.where($"cid" < 1000),
      nlist = 16, path = path)
    val before = Similarity.probeIvfIndex(spark, path, queries, k = 1,
        nprobe = 4, minSim = 0.99)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(before.isEmpty) // near-copies not indexed yet
    val centroidsBefore = spark.read.parquet(s"$path/centroids").collect()

    Similarity.appendToIvfIndex(spark,
      corpus.where($"cid" >= 1000), path)
    val after = Similarity.probeIvfIndex(spark, path, queries, k = 1,
        nprobe = 4, minSim = 0.99)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    // every appended near-copy is now the top-1 of its source query
    assert(after === (0L until 6L).map(id => (id, id + 1000)).toSet)
    // centroids untouched: append is assignment, never a retrain
    assert(spark.read.parquet(s"$path/centroids").collect().toSeq ==
      centroidsBefore.toSeq)
  }

  test("probe reads only probed cell directories (partition pruning)") {
    val path = Files.createTempDirectory("graft_ivf").toString
    Similarity.buildIvfIndex(spark, corpus, nlist = 16, path = path)
    val probed = Similarity.probeIvfIndex(spark, path,
      queries.limit(2), k = 3, nprobe = 2)
    // every scan of the cells table must carry the cell IN (…)
    // partition filter — planning-time directory pruning, the point of
    // the cell-partitioned layout. (DataFrame.inputFiles can't verify
    // this — it lists the relation's files ignoring pushed filters —
    // and AQE hides scan nodes from collectLeaves, so assert on the
    // rendered FileScan lines.)
    val planStr = probed.queryExecution.executedPlan.toString
    val scanLines = planStr.split('\n')
      .filter(l => l.contains("FileScan parquet") && l.contains("cells"))
    assert(scanLines.nonEmpty, planStr)
    val in = """cell#\d+ IN \(([^)]*)\)""".r
    scanLines.foreach { l =>
      assert(l.contains("PartitionFilters: ["), l)
      val hit = in.findFirstMatchIn(l)
      assert(hit.isDefined, s"cells scan missing cell IN filter: $l")
      // 2 queries × nprobe 2 → at most 4 of 16 cell directories probed
      assert(hit.get.group(1).split(",").length <= 4, l)
    }
  }

  test("large-nlist quantizer contract: planted copies land with " +
    "their originals and probe at rank 1") {
    // nlist=200 ≈ one cell per two corpus vectors — the degenerate
    // high-resolution regime. This pins the properties any future
    // quantizer swap must preserve (the round-12 two-level experiment
    // was measured against exactly these before being rejected —
    // assignCell scaladoc): argmax-over-dots is scale-invariant, so a
    // near-copy picks the same cell as its original, lands in its
    // directory, and probes back at rank 1, deterministically.
    val path = Files.createTempDirectory("graft_ivf_hier").toString
    Similarity.buildIvfIndex(spark, corpus, nlist = 200, path = path)
    // ~one vector per two cells: the planted copy must share its
    // original's cell directory
    val cells = spark.read.parquet(s"$path/cells")
      .select("cid", "cell").as[(Long, Int)].collect().toMap
    (0L until 6L).foreach { id =>
      assert(cells(id + 1000) == cells(id),
        s"copy of $id landed in cell ${cells(id + 1000)}, " +
          s"original in ${cells(id)}")
    }
    val hits = Similarity.probeIvfIndex(spark, path, queries, k = 1,
        nprobe = 4, minSim = 0.99)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(hits === (0L until 6L).map(id => (id, id + 1000)).toSet)
    // deterministic: a second probe returns the identical set
    val again = Similarity.probeIvfIndex(spark, path, queries, k = 1,
        nprobe = 4, minSim = 0.99)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(again === hits)
    // append path uses the same two-level rule: re-adding a copy of
    // vector 7 lands in vector 7's cell
    Similarity.appendToIvfIndex(spark,
      corpus.where($"cid" === 7)
        .select(($"cid" + 5000).as("cid"),
          transform($"cvec", x => x * 3.0).as("cvec")), path)
    val cells2 = spark.read.parquet(s"$path/cells")
      .select("cid", "cell").as[(Long, Int)].collect().toMap
    assert(cells2(5007L) == cells2(7L))
  }

  test("autoNlist: the √N rule, clamped to [16, 65536]") {
    assert(Similarity.autoNlist(1L) == 16)        // floor
    assert(Similarity.autoNlist(40L) == 16)       // √40 ≈ 6 → floor
    assert(Similarity.autoNlist(10000L) == 100)   // exact √
    assert(Similarity.autoNlist(1000000L) == 1000)
    assert(Similarity.autoNlist(Long.MaxValue) == 65536) // cap
    // monotone over a realistic range — a bigger table never gets a
    // smaller quantizer
    val pts = Seq(100L, 10000L, 1000000L, 100000000L, 10000000000L)
      .map(Similarity.autoNlist)
    assert(pts == pts.sorted, pts)
  }

  test("index round-trips centroids: rebuild-free probe is deterministic") {
    val path = Files.createTempDirectory("graft_ivf").toString
    Similarity.buildIvfIndex(spark, corpus, nlist = 8, path = path)
    val a = Similarity.probeIvfIndex(spark, path, queries, 3, 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val b = Similarity.probeIvfIndex(spark, path, queries, 3, 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(a === b)
  }
}
