package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the LSH banding planner — pure JVM (s-curve
  * arithmetic over divisors), so hundreds of (hash budget, target)
  * shapes run without a SparkSession. The properties are the
  * guarantees `dedup --tune` sells: full divisor coverage, valid
  * probabilities, detection probability strictly rising with the band
  * count (more bands = more collision chances at fixed budget), and a
  * recommendation that actually meets the recall floor whenever ANY
  * split does.
  */
object LshPlanProps extends Properties("LshPlan") {

  private val genHashes: Gen[Int] =
    Gen.oneOf(16, 24, 32, 48, 64, 96, 128, 192, 256)
  private val genTarget: Gen[Double] =
    Gen.choose(0.05, 0.95)

  property("covers every divisor split with b*r = numHashes") =
    Prop.forAll(genHashes, genTarget) { (h, t) =>
      val plan = Dedup.lshPlan(h, t)
      plan.forall(c => c.bands * c.rows == h) &&
        plan.map(_.bands).toSet == (1 to h).filter(h % _ == 0).toSet
    }

  property("probabilities are valid and curve thresholds in (0, 1]") =
    Prop.forAll(genHashes, genTarget) { (h, t) =>
      Dedup.lshPlan(h, t).forall(c =>
        c.pAtTarget >= 0.0 && c.pAtTarget <= 1.0 &&
          c.curveThreshold > 0.0 && c.curveThreshold <= 1.0)
    }

  property("detection probability rises with band count at fixed budget") =
    Prop.forAll(genHashes, genTarget) { (h, t) =>
      val byBands = Dedup.lshPlan(h, t).sortBy(_.bands)
      byBands.zip(byBands.tail).forall { case (lo, hi) =>
        hi.pAtTarget >= lo.pAtTarget - 1e-12
      }
    }

  property("recommendation meets the recall floor whenever any split does") =
    Prop.forAll(genHashes, genTarget) { (h, t) =>
      val plan = Dedup.lshPlan(h, t)
      val rec = Dedup.lshRecommend(h, t)
      val feasible = plan.exists(_.pAtTarget >= 0.999)
      if (feasible) rec.pAtTarget >= 0.999
      else rec.pAtTarget == plan.map(_.pAtTarget).max
    }

  property("recommendation is the fewest feasible bands (steepest curve)") =
    Prop.forAll(genHashes, genTarget) { (h, t) =>
      val plan = Dedup.lshPlan(h, t)
      val rec = Dedup.lshRecommend(h, t)
      plan.filter(_.pAtTarget >= 0.999) match {
        case Seq() => true
        case ok    => rec.bands == ok.map(_.bands).min
      }
    }
}
