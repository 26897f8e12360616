package graft

import org.apache.spark.sql.functions._
import graft.plans.{KmvSketch, VectorExpressions}
import graft.functions.VectorFunctions

class CustomExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused cosine expression matches HOF formulation exactly") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    val both = emb.crossJoin(broadcast(probe)).select(
      VectorExpressions.cosineSimilarity($"embedding", $"p").as("fused"),
      VectorFunctions.cosineSimilarity($"embedding", $"p").as("hof"),
      VectorExpressions.l2Distance($"embedding", $"p").as("l2f"),
      VectorFunctions.l2Distance($"embedding", $"p").as("l2h"))
    val bad = both.filter(
      abs($"fused" - $"hof") > 1e-12 || abs($"l2f" - $"l2h") > 1e-12).count()
    assert(bad == 0)
  }

  test("fused hyperplane signature matches exploded-aggregate formulation bit-exactly") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bits = 16
    // the formulation HyperplaneSignature replaced: posexplode -> bits
    // signed sums keyed by xxhash64(j, i) & 1 -> OR the sign bits
    val exploded = emb.select($"vec_id".as("__hid"),
      posexplode($"embedding").as(Seq("j", "x")))
    val dots = (0 until bits).map { i =>
      sum(when(xxhash64($"j", lit(i)).bitwiseAND(lit(1L)) === 1L,
        $"x".cast("double")).otherwise(-$"x".cast("double"))).as(s"d$i")
    }
    val fp = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(when(col(s"d$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
    }
    val oldSigs = exploded.groupBy($"__hid").agg(dots.head, dots.tail: _*)
      .select($"__hid".as("vec_id"), fp.as("old_sig"))
    val fused = emb.select($"vec_id",
      VectorExpressions.hyperplaneSignature($"embedding", bits).as("new_sig"))
    val joined = fused.join(oldSigs, "vec_id")
    assert(joined.count() > 0)
    assert(joined.filter($"old_sig" =!= $"new_sig").count() == 0)
    // interpreted path (no codegen) agrees with the codegen'd path
    val interp = emb.limit(50).collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      val expr = graft.plans.HyperplaneSignature(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v.toArray),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        bits)
      (r.getAs[Number]("vec_id").longValue(), expr.eval(null).asInstanceOf[Long])
    }.toMap
    fused.limit(50).collect().foreach { r =>
      val id = r.getAs[Number]("vec_id").longValue()
      if (interp.contains(id)) assert(interp(id) == r.getAs[Long]("new_sig"))
    }
  }

  test("fused cosine registered for SQL") {
    graft.plans.VectorExpressions.registerAll(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
  }

  test("kmv sketch is exact under k and approximate above with <5% error") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val exact = li.select(countDistinct($"l_partkey")).as[Long].collect().head
    // k larger than cardinality -> exact
    val exactKmv = li.select(KmvSketch.distinctCountKmv($"l_partkey", 100000))
      .as[Long].collect().head
    assert(exactKmv == exact)
    // k = 1024 -> estimate within 5%
    val est = li.select(KmvSketch.distinctCountKmv($"l_partkey", 1024))
      .as[Long].collect().head
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"est=$est exact=$exact")
  }

  test("kmv sketch set operations estimate union/intersection/jaccard") {
    import graft.plans.{KmvSetOps, KmvSketch => KS}
    // A = [0, 60k), B = [40k, 100k) -> |A|=60k |B|=60k |A∩B|=20k |A∪B|=100k
    val a = (0L until 60000L).toDF("v")
    val b = (40000L until 100000L).toDF("v")
    val k = 4096
    val sa = a.select(KS.kmvState($"v", k)).collect().head.getAs[Array[Byte]](0)
    val sb = b.select(KS.kmvState($"v", k)).collect().head.getAs[Array[Byte]](0)
    val (uni, inter, jac) = KmvSetOps.estimate(sa, sb, k)
    assert(math.abs(uni - 100000L).toDouble / 100000 < 0.05, s"union=$uni")
    assert(math.abs(inter - 20000L).toDouble / 20000 < 0.15, s"inter=$inter")
    assert(math.abs(jac - 0.2) < 0.03, s"jac=$jac")
    // small sketches are exact
    val sx = (0L until 100L).toDF("v")
      .select(KS.kmvState($"v", k)).collect().head.getAs[Array[Byte]](0)
    val sy = (50L until 150L).toDF("v")
      .select(KS.kmvState($"v", k)).collect().head.getAs[Array[Byte]](0)
    val (u2, i2, _) = KmvSetOps.estimate(sx, sy, k)
    assert(u2 == 150L && i2 == 50L)
  }

  test("frequent items sketch surfaces heavy hitters with bounded error") {
    import graft.plans.FrequentItems
    // skewed stream: 'hot' x 5000, 'warm' x 1000, 1000 distinct cold items
    val data = (Seq.fill(5000)("hot") ++ Seq.fill(1000)("warm") ++
      (0 until 1000).map(i => s"cold$i"))
    val df = scala.util.Random.shuffle(data).toDF("s") // fixed-seed irrelevant: set-level result
    val m = df.select(FrequentItems.frequentItems($"s", 16)).collect()
      .head.getMap[String, Long](0)
    val n = data.size.toLong
    assert(m.contains("hot") && m.contains("warm"))
    // Misra-Gries bound: reported >= true - n/(k+1)
    assert(m("hot") >= 5000 - n / 17 && m("hot") <= 5000)
    assert(m("warm") >= 1000 - n / 17 && m("warm") <= 1000)
    // SQL names: FREQUENTITEMS keeps the MAP surface; the reference
    // FREQUENTSTRINGSSKETCH name returns the DataSketches wire blob
    // (FrequentSketchWireSpec covers its format in depth)
    FrequentItems.registerAll(spark)
    df.createOrReplaceTempView("fi_t")
    val viaSql = spark.sql("SELECT FREQUENTITEMS(s, 8) AS m FROM fi_t")
      .collect().head.getMap[String, Long](0)
    assert(viaSql.contains("hot"))
    val blob = spark.sql("SELECT FREQUENTSTRINGSSKETCH(s, 64) FROM fi_t")
      .collect().head.getString(0)
    assert(graft.plans.FrequentSketchDs.stringSketchEstimate(blob, "hot")
      >= 4000L)
  }

  test("kmv sketch SQL name with group-by (partial/final merge path)") {
    KmvSketch.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .createOrReplaceTempView("li_kmv")
    val rows = spark.sql(
      """SELECT l_returnflag, DISTINCTCOUNTKMV(l_partkey, 2048) AS d
        FROM li_kmv GROUP BY l_returnflag""").collect()
    assert(rows.length == 3 && rows.forall(_.getLong(1) > 0))
  }

  test("KLL quantile sketch: small-input exactness and rank-error bound") {
    import org.apache.datasketches.kll.KllDoublesSketch
    // below capacity k the sketch never compacts -> exact quantiles
    // (INCLUSIVE rule: smallest item with rank >= q)
    val small = KllDoublesSketch.newHeapInstance(256)
    (1 to 100).foreach(v => small.update(v.toDouble))
    assert(small.getQuantile(0.5) == 50.0)
    assert(small.getQuantile(0.01) == 1.0 && small.getQuantile(1.0) == 100.0)

    // 100k uniform values: estimated rank within ~2% of true rank
    val big = KllDoublesSketch.newHeapInstance(256)
    (1 to 100000).foreach(v => big.update(v.toDouble))
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = big.getQuantile(q)
      assert(math.abs(est - q * 100000) <= 2000,
        s"q=$q est=$est true=${q * 100000}")
    }

    // merge of disjoint halves stays within the bound
    val a = KllDoublesSketch.newHeapInstance(256)
    val b = KllDoublesSketch.newHeapInstance(256)
    (1 to 50000).foreach(v => a.update(v.toDouble))
    (50001 to 100000).foreach(v => b.update(v.toDouble))
    a.merge(b)
    assert(math.abs(a.getQuantile(0.5) - 50000) <= 2000)

    // serialization round-trip (reference wire format) preserves the
    // estimate exactly
    val rt = graft.plans.KllSketchOps.heapify(a.toByteArray)
    assert(rt.getQuantile(0.5) == a.getQuantile(0.5) && rt.getN == a.getN)
  }

  test("KLL blob SQL path: raw state + merge-percentile re-aggregation") {
    graft.plans.KllSketch.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .createOrReplaceTempView("li_kll")
    val est = spark.sql(
      """SELECT KLLMERGEPERCENTILE(blob, 50.0) AS p50 FROM (
           SELECT PERCENTILERAWKLL(l_quantity) AS blob
           FROM li_kll GROUP BY l_returnflag, l_linestatus)""")
      .collect().head.getDouble(0)
    val exact = spark.sql(
      "SELECT percentile(l_quantity, 0.5) FROM li_kll")
      .collect().head.getDouble(0)
    assert(math.abs(est - exact) <= 2.0, s"est=$est exact=$exact")
  }

  test("tuple sketch: exact below k, bounded estimates when saturated") {
    import graft.plans.TupleSketch
    // 20k keys, value = key % 7 → exact totals known
    val df = spark.range(0, 20000)
      .selectExpr("id % 5000 AS key", "CAST(id % 7 AS LONG) AS v")
    val exactDistinct = 5000L
    val exactSum = spark.range(0, 20000)
      .selectExpr("CAST(id % 7 AS LONG) v").agg(org.apache.spark.sql.functions.sum($"v"))
      .collect().head.getLong(0)
    // below k: all three estimators exact
    val e = df.agg(
      TupleSketch.distinctCountTuple($"key", $"v", 8192).as("d"),
      TupleSketch.sumValuesTuple($"key", $"v", 8192).as("s"),
      TupleSketch.avgValueTuple($"key", $"v", 8192).as("a")).collect().head
    assert(e.getLong(0) == exactDistinct && e.getLong(1) == exactSum)
    assert(e.getLong(2) == math.round(exactSum.toDouble / exactDistinct))
    // saturated (k=512): KMV error ~1/sqrt(k) ≈ 4.4% — allow 15%
    val s = df.agg(
      TupleSketch.distinctCountTuple($"key", $"v", 512).as("d"),
      TupleSketch.sumValuesTuple($"key", $"v", 512).as("s")).collect().head
    assert(math.abs(s.getLong(0) - exactDistinct) < exactDistinct * 0.15)
    assert(math.abs(s.getLong(1) - exactSum) < exactSum * 0.15)
    // blob remerge equals direct when exact
    val blobs = df.withColumn("part", $"key" % 4)
      .groupBy($"part").agg(TupleSketch.tupleState($"key", $"v", 8192).as("b"))
    val m = blobs.agg(
      TupleSketch.mergeDistinct($"b", 8192).as("d"),
      TupleSketch.mergeSum($"b", 8192).as("s"),
      TupleSketch.mergeAvg($"b", 8192).as("a")).collect().head
    assert(m.getLong(0) == exactDistinct && m.getLong(1) == exactSum)
  }
}
