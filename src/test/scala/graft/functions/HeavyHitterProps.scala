package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the Misra–Gries sketch's correctness contract —
  * pure JVM (reduce/merge on immutable maps), so hundreds of random
  * stream/partitioning shapes run without a SparkSession. The property
  * under test is exactly what [[graft.operators.HeavyHitters.topK]]
  * relies on: EVERY element with true frequency > N/(m+1) survives any
  * partitioning of the stream into partial buffers and any merge
  * order, and the buffer never exceeds m entries.
  */
object HeavyHitterProps extends Properties("MisraGries") {

  private val m = 8
  private def mg = new Aggregators.MisraGries(m)

  // skewed streams over a small alphabet: a few hot elements + noise
  private val genStream: Gen[List[String]] = for {
    n <- Gen.choose(50, 800)
    xs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.const("hot1"),
      5 -> Gen.const("hot2"),
      1 -> Gen.choose(0, 200).map(i => s"t$i")))
  } yield xs

  private val genChunks: Gen[Int] = Gen.choose(1, 6)

  private def sketch(stream: List[String], chunks: Int): Map[String, Long] = {
    val size = math.max(1, stream.length / chunks)
    stream.grouped(size)
      .map(part => part.foldLeft(mg.zero)(mg.reduce))
      .reduceOption(mg.merge).getOrElse(mg.zero)
  }

  property("every (N/(m+1))-heavy element survives any partitioning") =
    Prop.forAll(genStream, genChunks) { (stream, chunks) =>
      val buf = sketch(stream, chunks)
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      val threshold = stream.length.toDouble / (m + 1)
      counts.filter(_._2 > threshold).keys
        .forall(buf.contains)
    }

  property("buffer never exceeds capacity") =
    Prop.forAll(genStream, genChunks) { (stream, chunks) =>
      sketch(stream, chunks).size <= m
    }

  property("residual counts never overstate true frequency") =
    Prop.forAll(genStream, genChunks) { (stream, chunks) =>
      val buf = sketch(stream, chunks)
      val counts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      buf.forall { case (t, c) => c <= counts.getOrElse(t, 0L) }
    }

  property("merge order does not break the guarantee") =
    Prop.forAll(genStream) { stream =>
      val parts = stream.grouped(math.max(1, stream.length / 4))
        .map(p => p.foldLeft(mg.zero)(mg.reduce)).toList
      val fwd = parts.reduceOption(mg.merge).getOrElse(mg.zero)
      val rev = parts.reverse.reduceOption(mg.merge).getOrElse(mg.zero)
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      val threshold = stream.length.toDouble / (m + 1)
      val heavy = counts.filter(_._2 > threshold).keys.toList
      heavy.forall(fwd.contains) && heavy.forall(rev.contains)
    }
}
