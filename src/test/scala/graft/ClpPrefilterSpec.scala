package graft

import org.apache.spark.sql.functions._
import graft.functions.ClpFunctions

/** clpMatch's candidate/re-verify split (round 12): the compiled
  * logtype prefilter (`ClpFunctions.logtypePrefilterRegex`, the analog
  * of `ClpRewriter.java:293-345`'s logtype subqueries) must be SOUND —
  * a superset of the decode+match ground truth — and must actually
  * land on the `_logtype` column in the optimized plan. */
class ClpPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private val Dict = "\u0011"
  private val Int_ = "\u0012"

  private val msgs = Seq(
    "INFO Task 12345 completed in 250 ms",
    "ERROR node-7 failed after 3 retries: code=0xdead",
    "plain message without variables",
    "negative -42 and huge 999999999999999999999 stay safe",
    "the quick brown fox jumps over 2 lazy dogs",
    "a5b standalone",
    "x a5b y",
    "code=7 here",
    "123 456 789",
    "-0000123 padded",
    "double  space  message",
    "tail the",
    "the head",
    "themes are not the same",
    "12:30:07 time v2 2024-01-01 3.14",
    "")

  private val wildcards = Seq(
    "*the*", "* the *", "*The*", "* 123 *", "ERROR *", "*code=7*",
    "* code=7 *", "*-42*", "plain*", "*?5b*", "*a*b*", "*12*34*",
    "* completed in * ms", "*", "???", "* x*y *", "*3 retries:*",
    "*a5b*", "* -0000123 *", "INFO Task 12345 completed in 250 ms",
    "*dogs", "the*", "*fox jumps*", "* 999999999999999999999 *",
    "*5b standalone", "double  space*", "*:30:*", "* v2 *", "*?*",
    "*.*", "x*", "*e s*e*", "* ?? *")

  test("soundness: wildcard match implies prefilter match, over a diverse corpus") {
    val enc = msgs.toDF("msg")
      .withColumn("e", ClpFunctions.clpEncode($"msg"))
      .select($"msg", $"e.logtype".as("lt"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    var positives = 0
    var prefilters = 0
    for (w <- wildcards) {
      val ground = msgs.toDF("msg")
        .filter(ClpFunctions.clpWildcardMatch($"msg", w))
        .collect().map(_.getString(0)).toSet
      positives += ground.size
      ClpFunctions.logtypePrefilterRegex(w).foreach { re =>
        prefilters += 1
        val p = java.util.regex.Pattern.compile(re)
        for ((msg, lt) <- enc if ground(msg))
          assert(p.matcher(lt).matches() || p.matcher(lt).find(),
            s"prefilter dropped a true match: wildcard <$w> msg <$msg>" +
              s" logtype <${lt.replace(Dict, "[D]").replace(Int_, "[I]")}>" +
              s" regex <$re>")
      }
    }
    // the corpus/wildcard cross must exercise both sides for real
    assert(positives > 30, s"too few true matches ($positives) — vacuous")
    assert(prefilters >= 5, s"too few compiled prefilters ($prefilters)")
  }

  test("property: random wildcards carved from random messages stay sound") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val token = Gen.oneOf(
      Gen.oneOf("INFO", "error", "done", "x", "", "-", "=", "a-b", "the"),
      Gen.choose(-999999L, 999999L).map(_.toString),
      Gen.oneOf("999999999999999999999", "0xdead", "code=7", "3.14",
        "12:30:07", "v2", "2024-01-01", "a5b"))
    val msgGen = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))
    val rnd = new scala.util.Random(42)
    val corpus = (1 to 150).map(s =>
      msgGen.pureApply(Gen.Parameters.default, Seed(s.toLong)))
    // carve wildcards out of real messages so positives are guaranteed:
    // take a random substring and wrap/replace random spans with * / ?
    def carve(m: String): String =
      if (m.isEmpty) "*"
      else {
        val a = rnd.nextInt(m.length)
        val b = a + 1 + rnd.nextInt(m.length - a)
        val mid = m.substring(a, b)
          .replace("\\", "\\\\").replace("*", "\\*").replace("?", "\\?")
        val lead = if (a > 0) "*" else ""
        val trail = if (b < m.length) "*" else ""
        val core = if (mid.length > 3 && rnd.nextBoolean())
          mid.substring(0, mid.length / 2) +
            (if (rnd.nextBoolean()) "*" else "?") +
            mid.substring(mid.length / 2 + 1)
        else mid
        lead + core + trail
      }
    val enc = corpus.toDF("msg")
      .withColumn("e", ClpFunctions.clpEncode($"msg"))
      .select($"msg", $"e.logtype".as("lt"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    var positives = 0
    for (seed <- corpus; w = carve(seed)) {
      val ground = corpus.toDF("msg")
        .filter(ClpFunctions.clpWildcardMatch($"msg", w))
        .collect().map(_.getString(0)).toSet
      positives += ground.size
      ClpFunctions.logtypePrefilterRegex(w).foreach { re =>
        val p = java.util.regex.Pattern.compile(re)
        for ((msg, lt) <- enc if ground(msg))
          assert(p.matcher(lt).find(),
            s"prefilter dropped: wildcard <$w> msg <$msg> regex <$re>")
      }
    }
    assert(positives > 100, s"vacuous property run ($positives positives)")
  }

  test("compiled shapes: exact token images, placeholders, anchoring") {
    // no constraint -> None (the facade emits no prefilter at all)
    assert(ClpFunctions.logtypePrefilterRegex("*").isEmpty)
    assert(ClpFunctions.logtypePrefilterRegex("???").isEmpty)
    assert(ClpFunctions.logtypePrefilterRegex("*?*").isEmpty)
    // placeholder-satisfiable compilations are suppressed entirely:
    // every var-bearing row matches them, so they prune nothing and
    // cost a regex pass (ClpScaleProbe, PLANS.md round-12)
    assert(ClpFunctions.logtypePrefilterRegex("* 123 *").isEmpty)
    assert(ClpFunctions.logtypePrefilterRegex("* code=7 *").isEmpty)
    assert(ClpFunctions.logtypePrefilterRegex("*the*").isEmpty)
    assert(ClpFunctions.logtypePrefilterRegex("*a5b*").isEmpty)
    assert(ClpFunctions.logtypePrefilterRegex("*a*b*").isEmpty)
    // digit-free literal token -> verbatim, anchored when unstarred
    assert(ClpFunctions.logtypePrefilterRegex("ERROR *")
      .contains("(?s)^ERROR .*\\z"))
    // a strong token alongside an all-digit token: the digit token's
    // image is the EXACT int placeholder
    assert(ClpFunctions.logtypePrefilterRegex("INFO * 123 *")
      .contains(s"(?s)^INFO .* $Int_ .*\\z"))
    // digit-bearing non-int token -> dictionary placeholder, exact
    assert(ClpFunctions.logtypePrefilterRegex("ERROR * code=7 *")
      .contains(s"(?s)^ERROR .* $Dict .*\\z"))
    // verbatim-required token: the infix alternation keeps its
    // dict-var escape hatch for soundness
    val the = ClpFunctions.logtypePrefilterRegex("ok *the*").get
    assert(the == s"(?s)^ok .*(?:$Dict|the).*\\z")
    // digit-bearing infix run can never stay verbatim
    val a5b = ClpFunctions.logtypePrefilterRegex("ok *a5b*").get
    assert(!a5b.contains("a5b") && a5b.contains(Dict))
    // pure-digit infix could sit inside either variable kind
    val d12 = ClpFunctions.logtypePrefilterRegex("ok *12*").get
    assert(d12.contains(s"[$Dict$Int_]"))
    // two runs may share one variable's placeholder: a single dict
    // placeholder must satisfy the piece (token "a5b" collapses to one)
    val ab = ClpFunctions.logtypePrefilterRegex("ok *a*b*").get
    assert(java.util.regex.Pattern.compile(ab).matcher(s"ok $Dict").find())
    // fully-literal whole-message query is fully anchored
    val full = ClpFunctions.logtypePrefilterRegex("plain message").get
    assert(full == "(?s)^plain message\\z")
  }

  test("prefilter lowering: literal spans become Contains/StartsWith/EndsWith") {
    // Column.contains & co build unresolved functions in Spark 4 —
    // assert on the rendered function name
    def shape(w: String) = ClpFunctions
      .logtypePrefilterColumn(col("lt"), w).get.toString.toLowerCase
    assert(shape("* the *").startsWith("contains"), shape("* the *"))
    assert(shape("zzz *").startsWith("startswith"), shape("zzz *"))
    assert(shape("* dogs").startsWith("endswith"), shape("* dogs"))
    assert(shape("plain message").contains("="), shape("plain message"))
    // multi-span / alternation shapes keep the full regex
    assert(shape("ok *the*").contains("rlike"), shape("ok *the*"))
  }

  test("variable-membership prefilters: exact tokens route to their array") {
    import ClpFunctions.varPrefilterTokens
    // canonical int token -> encoded_vars as its parsed long
    assert(varPrefilterTokens("* 123 *") == Seq(Right(123L)))
    assert(varPrefilterTokens("* -42 *") == Seq(Right(-42L)))
    // digit-bearing non-int tokens (incl. NON-CANONICAL renderings,
    // which the encoder keeps as dictionary text) -> dictionary_vars
    assert(varPrefilterTokens("* lat_ms=99999 *") ==
      Seq(Left("lat_ms=99999")))
    assert(varPrefilterTokens("* -0 *") == Seq(Left("-0")))
    assert(varPrefilterTokens("* 007 *") == Seq(Left("007")))
    // only space-bounded fully-literal tokens qualify
    assert(varPrefilterTokens("*123*").isEmpty)
    assert(varPrefilterTokens("* 12?4 *").isEmpty)
    assert(varPrefilterTokens("INFO *").isEmpty)
    // multiple tokens, deduped
    assert(varPrefilterTokens("* 7 * code=1 * 7 *") ==
      Seq(Right(7L), Left("code=1")))
  }

  test("wildcard-variable runs: digit-bearing infix runs route to the var arrays") {
    import ClpFunctions.varWildcardRuns
    // digit+letter run -> dictionary-only (no canonical int rendering
    // can contain a letter); pure-digit run -> both arrays possible
    assert(varWildcardRuns("*lat_ms=9*") == Seq(("lat_ms=9", false)))
    assert(varWildcardRuns("*123*") == Seq(("123", true)))
    assert(varWildcardRuns("*-12*") == Seq(("-12", true)))
    // '-' not at run start pins dictionary
    assert(varWildcardRuns("*3-4*") == Seq(("3-4", false)))
    // >18 digits can't be an encoded rendering
    assert(varWildcardRuns("*1234567890123456789*") ==
      Seq(("1234567890123456789", false)))
    // digit-free runs and fully-literal pieces are excluded (the
    // latter already serve via exact membership)
    assert(varWildcardRuns("*the*").isEmpty)
    assert(varWildcardRuns("* code=7 *").isEmpty)
    // ? splits runs like *; multiple runs all qualify, deduped
    assert(varWildcardRuns("*a1?b2*c3* *a1*") ==
      Seq(("a1", false), ("b2", false), ("c3", false)))

    // soundness over the diverse corpus: wildcard match implies every
    // wildcard-var prefilter is true
    val enc = msgs.toDF("msg")
      .withColumn("e", ClpFunctions.clpEncode($"msg"))
    var checked = 0
    for (w <- Seq("*12*34*", "*-42*", "*code=7*", "*?5b*", "*a5b*",
        "*:30:*", "*0123*", "*999999*", "*12345 comp*")) {
      val pres = ClpFunctions.varWildcardPrefilters(
        $"e.dict_vars", $"e.encoded_vars", w)
      if (pres.nonEmpty) {
        val ground = enc.filter(ClpFunctions.clpWildcardMatch($"msg", w))
        val g = ground.count()
        checked += g.toInt
        assert(ground.filter(pres.reduce(_ && _)).count() == g,
          s"wildcard-var prefilter dropped a true match for <$w>")
      }
    }
    assert(checked > 5, s"vacuous wildcard-var soundness run ($checked)")
  }

  test("exactness: all-literal-or-star wildcards skip the decode re-verify") {
    import ClpFunctions.logtypePrefilterExact
    // exact: every piece a bare * or a digit-free literal token
    assert(logtypePrefilterExact("* the *"))
    assert(logtypePrefilterExact("ERROR *"))
    assert(logtypePrefilterExact("plain message without variables"))
    assert(logtypePrefilterExact("* quick brown * dogs"))
    // inexact: ?, digits (placeholder images don't pin values),
    // wildcards embedded within a token
    assert(!logtypePrefilterExact("*the*"))
    assert(!logtypePrefilterExact("* the? *"))
    assert(!logtypePrefilterExact("* 123 *"))
    assert(!logtypePrefilterExact("* code=7 *"))
    assert(!logtypePrefilterExact("ERROR* the *"))
    assert(!logtypePrefilterExact("INFO * 123 *"))

    // the facade drops clpDecode for the exact class — and the result
    // still equals the ground truth
    val grp = graft.sources.ClpLogIngest.extract(
      msgs.toDF("message"),
      graft.sources.ClpLogIngest.Config(fieldsForClpEncoding = Seq("message")))
    grp.createOrReplaceTempView("clp_exact_grp")
    for (w <- Seq("* the *", "ERROR *", "plain message without variables")) {
      val got = graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; SELECT message_logtype FROM" +
          s" clp_exact_grp WHERE clpMatch(message, '$w')")
      val plan = got.queryExecution.analyzed.toString.toLowerCase
      assert(!plan.contains("clpdecode"),
        s"exact wildcard <$w> still decodes:\n$plan")
      val want = msgs.toDF("msg")
        .filter(ClpFunctions.clpWildcardMatch($"msg", w)).count()
      assert(got.count() == want, s"exact wildcard <$w> diverged")
    }
  }

  test("facade rewrite ANDs the prefilter and keeps results identical") {
    val grp = graft.sources.ClpLogIngest.extract(
      msgs.toDF("message"),
      graft.sources.ClpLogIngest.Config(fieldsForClpEncoding = Seq("message")))
    grp.createOrReplaceTempView("clp_pref")
    for (w <- Seq("*the*", "* 123 *", "ERROR *", "*completed*",
        "*?5b*", "INFO Task 12345 completed in 250 ms",
        // variable-membership candidates: int, dict, trailing-bounded
        "* 12345 *", "* -42 *", "* code=0xdead", "* 456 *",
        // exact class (decode dropped) and near-exact controls
        "* the *", "* quick brown * dogs", "the head", "* head")) {
      val got = graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; SELECT clpDecode(message) AS m" +
          s" FROM clp_pref WHERE clpMatch(message, '$w')")
      val want = msgs.toDF("msg")
        .filter(ClpFunctions.clpWildcardMatch($"msg", w))
        .collect().map(_.getString(0)).toSet
      assert(got.collect().map(_.getString(0)).toSet == want, s"wildcard $w")
      // rewrite gate on the analyzed plan (the tiny local corpus
      // constant-folds to a LocalRelation in the optimizer, so the
      // scan-level gate lives in the parquet-backed test below)
      if (ClpFunctions.logtypePrefilterRegex(w).isDefined) {
        val plan = got.queryExecution.analyzed.toString
        assert(Seq("RLIKE", "Contains", "StartsWith", "EndsWith", " = ")
          .exists(plan.contains) &&
          plan.toLowerCase.contains("message_logtype"),
          s"no logtype prefilter in plan for $w:\n$plan")
      }
    }
  }

  test("plan gate: the prefilter survives onto the parquet logtype scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cfg = graft.sources.ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("text"), removeProcessedFields = true)
    graft.sources.ClpLogIngest.extractDurable(docs, cfg)
      .createOrReplaceTempView("clp_plan_docs")
    val q = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT doc_id FROM clp_plan_docs" +
        " WHERE clpMatch(text, '* the *')")
    // '* the *' lowers to a codegen'd Contains on the logtype column
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("Contains") &&
      opt.toLowerCase.contains("text_logtype"),
      s"prefilter missing from optimized plan:\n$opt")
    // a variable-targeting wildcard lands as array_contains on the
    // persisted var columns (ClpRewriter.java:398-437 analog)
    val qv = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT doc_id FROM clp_plan_docs" +
        " WHERE clpMatch(text, '* code=7 *')")
    val optv = qv.queryExecution.optimizedPlan.toString
    assert(optv.contains("array_contains") &&
      optv.toLowerCase.contains("text_dictionaryvars"),
      s"var prefilter missing from optimized plan:\n$optv")
    // an INFIX variable wildcard lands as a contains over the
    // space-joined var arrays (the ClpRewriter.java:438-466 analog)
    val qw = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT doc_id FROM clp_plan_docs" +
        " WHERE clpMatch(text, '*lat_ms=9*')")
    val optw = qw.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optw.contains("array_join") && optw.contains("contains") &&
      optw.contains("text_dictionaryvars"),
      s"wildcard-var prefilter missing from optimized plan:\n$optw")
    // pure-digit runs keep BOTH arrays as candidates
    val qi = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT doc_id FROM clp_plan_docs" +
        " WHERE clpMatch(text, '*1234*')")
    val opti = qi.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opti.contains("text_dictionaryvars") &&
      opti.contains("text_encodedvars"),
      s"encoded-side wildcard-var candidate missing:\n$opti")
    // and the candidate filter sits over a real file scan of the
    // durable artifact, not a re-encode projection
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("clpencode"),
      s"plan re-encodes the corpus instead of scanning the artifact:\n$phys")
  }

  test("property: end-to-end facade equivalence on a var-rich corpus") {
    // the full rewrite path (clpvarsmatch AND clplogtypematch AND
    // decode+match) must equal plain wildcard-match over the original
    // messages, for wildcards carved from real messages — exercising
    // int vars, dict vars, non-canonical numerics, and literal tokens
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val token = Gen.oneOf(
      Gen.oneOf("INFO", "error", "the", "x", "", "a-b", "sev=info"),
      Gen.choose(-99999L, 99999L).map(_.toString),
      Gen.oneOf("007", "-0", "0xdead", "code=7", "3.14", "lat_ms=42",
        "999999999999999999999"))
    val msgGen = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))
    val corpus = (1 to 80).map(s =>
      msgGen.pureApply(Gen.Parameters.default, Seed(1000L + s)))
    val grp = graft.sources.ClpLogIngest.extract(
      corpus.toDF("message"),
      graft.sources.ClpLogIngest.Config(fieldsForClpEncoding = Seq("message")))
    grp.createOrReplaceTempView("clp_prop_grp")
    val rnd = new scala.util.Random(7)
    def carve(m: String): String =
      if (m.isEmpty) "*"
      else {
        val a = rnd.nextInt(m.length)
        val b = a + 1 + rnd.nextInt(m.length - a)
        val mid = m.substring(a, b)
          .replace("\\", "\\\\").replace("*", "\\*").replace("?", "\\?")
        (if (a > 0) "*" else "") + mid + (if (b < m.length) "*" else "")
      }
    var positives = 0
    for (seed <- corpus.take(60); w = carve(seed)) {
      val want = corpus.toDF("msg")
        .filter(ClpFunctions.clpWildcardMatch($"msg", w))
        .collect().map(_.getString(0)).toSet
      positives += want.size
      val esc = w.replace("'", "''")
      val got = graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; SELECT clpDecode(message) AS m" +
          s" FROM clp_prop_grp WHERE clpMatch(message, '$esc')")
        .collect().map(_.getString(0)).toSet
      assert(got == want,
        s"facade diverged for <$w>: missing=${want -- got} extra=${got -- want}")
    }
    assert(positives > 60, s"vacuous run ($positives positives)")
  }

  test("null / non-literal wildcards degrade safely") {
    val grp = graft.sources.ClpLogIngest.extract(
      msgs.toDF("message"),
      graft.sources.ClpLogIngest.Config(fieldsForClpEncoding = Seq("message")))
    grp.createOrReplaceTempView("clp_pref_null")
    // NULL wildcard: no match, no NPE (SQL three-valued logic)
    val n = spark.sql("SELECT count(*) AS n FROM clp_pref_null WHERE " +
      "clpwildcardmatch(clpdecode(message_logtype, message_dictionaryVars," +
      " message_encodedVars), CAST(NULL AS STRING))")
      .collect().head.getLong(0)
    assert(n == 0L)
    val p = spark.sql("SELECT count(*) AS n FROM clp_pref_null WHERE " +
      "clplogtypematch(message_logtype, CAST(NULL AS STRING))")
      .collect().head.getLong(0)
    assert(p == 0L)
  }

  test("extractDurable round-trips through the IndexStore artifact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    val cfg = graft.sources.ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("text"), removeProcessedFields = true)
    val inline = graft.sources.ClpLogIngest.extract(docs, cfg)
    val durable = graft.sources.ClpLogIngest.extractDurable(docs, cfg)
    assert(durable.columns.sorted.toSeq == inline.columns.sorted.toSeq)
    val key = (d: org.apache.spark.sql.DataFrame) => d
      .select($"doc_id", graft.functions.ClpFunctions.clpDecode(
        $"text_logtype", $"text_dictionaryVars", $"text_encodedVars"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(key(durable) == key(inline))
    // second call loads the committed artifact instead of rebuilding
    val before = graft.sources.IndexStore.builds.get()
    graft.sources.ClpLogIngest.extractDurable(docs, cfg).count()
    assert(graft.sources.IndexStore.builds.get() == before,
      "second extractDurable rebuilt instead of loading")
  }
}
