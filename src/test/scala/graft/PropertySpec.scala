package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.functions.{TextFunctions, VectorFunctions}

/** Property-based checks (SURVEY §5: ScalaCheck for edge cases): the
  * as-of join is compared against an in-memory brute-force reference
  * over generated datasets; vector/text functions against mathematical
  * identities. Generators are driven by explicit seeds so every run
  * covers the same cases deterministically. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val smallRows: Gen[List[(Int, Long)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 20L)))

  test("asof join matches brute force on generated data (20 cases x 2 modes)") {
    for (seed <- 1 to 20; exact <- Seq(true, false)) {
      val ls = sample(smallRows, seed)
      // unique (k, t) on the right: reference ties are nondeterministic
      val rs = sample(smallRows, seed + 1000).distinct
        .zipWithIndex.map { case ((k, t), i) => (k, t, i) }
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
        .toDF("k", "t", "lid")
      val right = rs.toDF("k", "t", "rid")

      val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
          allowExact = exact, joinType = "left")
        .select($"lid", $"r_rid").as[(Int, Option[Int])].collect().toMap

      val expect = ls.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rs.filter { case (rk, rt, _) =>
          rk == k && (if (exact) rt <= t else rt < t) }
        i -> (if (candidates.isEmpty) None
          else Some(candidates.maxBy(c => (c._2, c._3))._3))
      }.toMap
      assert(got == expect, s"seed=$seed exact=$exact")
    }
  }

  test("cosine similarity identities hold on generated vectors") {
    val vecGen = Gen.listOfN(8, Gen.choose(-5.0, 5.0))
      .suchThat(_.exists(math.abs(_) > 0.01))
    for (seed <- 1 to 20) {
      val v = sample(vecGen, seed)
      val df = Seq(Tuple1(v)).toDF("v")
      val r = df.select(
        VectorFunctions.cosineSimilarity($"v", $"v").as("self"),
        VectorFunctions.l2Distance($"v", $"v").as("zero"),
        graft.plans.VectorExpressions.cosineSimilarity($"v", $"v").as("fused"))
        .collect().head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9, s"seed=$seed")
      assert(r.getDouble(1) == 0.0)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("tokenizer invariants on generated whitespace-noise strings") {
    val strGen = Gen.listOf(Gen.oneOf("foo", "Bar", "  ", "\t", "x1", ""))
      .map(_.mkString(" "))
    for (seed <- 1 to 20) {
      val s = sample(strGen, seed)
      val r = Seq(Tuple1(s)).toDF("t").select(
        TextFunctions.tokenCount($"t").as("n"),
        TextFunctions.tokenSet($"t").as("set")).collect().head
      val n = r.getInt(0)
      val set = r.getSeq[String](1)
      assert(n >= 0 && set.forall(_.nonEmpty), s"seed=$seed input=$s")
      assert(set == set.sorted && set.distinct == set)
      assert(set.size <= n)
    }
  }
}
