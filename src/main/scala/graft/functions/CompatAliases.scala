package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Expression, ILike, Like, RLike, RegExpExtract, TryEval}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The remaining reference surface the other registries don't cover:
  * operator-name scalars (`TransformFunctionType.java:46-118` —
  * Pinot exposes EQUALS/NOT_EQUALS/… as callable functions), the
  * CityHash/MurmurHash3-x64 family, UUID v4/v7 generators, IP mask and
  * byte-conversion scalars, variable-pattern regex functions, filterMv,
  * and BigDecimal byte serialization.
  *
  * Everything is Catalyst compositions or codegen'd static invokes —
  * no UDFs. */
object CompatAliases {

  private def ex(c: Column): Expression = ColumnBridge.expression(c)
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def str(c: Column): String = ex(c).eval().toString

  private def bigSum(c: Column, p: Option[Int], s: Option[Int]): Column =
    col(graft.plans.BigDecimalSumAgg(ex(c), p, s).toAggregateExpression())

  private val ipClass = Class.forName("graft.functions.IpHelper")
  private val jvmClass = Class.forName("graft.functions.CompatJvm")

  private[functions] def ipCall(name: String, dt: DataType, args: Column*): Column =
    col(StaticInvoke(ipClass, dt, name, args.map(ex),
      returnNullable = true))

  private[functions] def jvmCall(name: String, dt: DataType, args: Column*): Column =
    col(StaticInvoke(jvmClass, dt, name, args.map(ex),
      returnNullable = true))

  /** CASE WHEN c1 THEN v1 [WHEN c2 THEN v2 …] [ELSE d] as a variadic
    * function (reference CASE transform, `CaseTransformFunction.java`). */
  private def caseWhen(cols: Seq[Column]): Column = {
    val (pairs, dflt) =
      if (cols.size % 2 == 1) (cols.init, Some(cols.last)) else (cols, None)
    var c = when(pairs.head, pairs(1))
    var i = 2
    while (i + 1 < pairs.size) {
      c = c.when(pairs(i), pairs(i + 1))
      i += 2
    }
    dflt.map(c.otherwise).getOrElse(c)
  }

  /** UUIDv7: 48-bit unix millis, version nibble 7, 74 random bits
    * (RFC 9562 layout; random bits from rand() so each row differs). */
  private def uuidV7(): Column = {
    def rhex(n: Int): Column =
      lpad(lower(hex((rand() * lit(math.pow(16, n).toLong)).cast(LongType))), n, "0")
    val tsHex = lpad(lower(hex(unix_millis(current_timestamp()))), 12, "0")
    concat(
      substring(tsHex, 1, 8), lit("-"), substring(tsHex, 9, 4), lit("-"),
      lit("7"), rhex(3), lit("-"),
      substring(lit("89ab"), (rand() * 4 + 1).cast(IntegerType), lit(1)), rhex(3),
      lit("-"), rhex(12))
  }

  /** filterMv(mvCol, 'predicate over placeholder v') — the predicate
    * literal is parsed with the SQL expression grammar and applied
    * per-element (reference `FilterMvScalarFunction.java`,
    * `FilterMvPredicateEvaluator.java`: EQ/NOT_EQ/IN/NOT_IN/RANGE/
    * REGEXP_LIKE over placeholder `v`, AND/OR/NOT combinable). */
  private def filterMv(arr: Column, pred: Column): Column = {
    val predStr = str(pred)
    filter(arr, v => {
      val parsed = CatalystSqlParser.parseExpression(predStr)
      col(parsed.transformUp {
        case a: UnresolvedAttribute if a.name.equalsIgnoreCase("v") => ex(v)
      })
    })
  }

  private def hashSeeds(cols: Seq[Column]): Seq[Long] =
    cols.map(c => ex(c).eval().toString.toDouble.toLong)

  private val registry: Map[String, Seq[Column] => Column] = Map(
    // ——— operator-name scalars (TransformFunctionType.java:46-118) ———
    "equals" -> { case Seq(a, b) => a === b },
    "notequals" -> { case Seq(a, b) => a =!= b },
    "greaterthan" -> { case Seq(a, b) => a > b },
    "greaterthanorequal" -> { case Seq(a, b) => a >= b },
    "lessthan" -> { case Seq(a, b) => a < b },
    "lessthanorequal" -> { case Seq(a, b) => a <= b },
    "notin" -> { case a +: vs => !a.isin(vs: _*) },
    "isdistinctfrom" -> { case Seq(a, b) => !(a <=> b) },
    "isnotdistinctfrom" -> { case Seq(a, b) => a <=> b },
    "istrue" -> { case Seq(a) => coalesce(a.cast(BooleanType), lit(false)) },
    "isnottrue" -> { case Seq(a) => !coalesce(a.cast(BooleanType), lit(false)) },
    "isfalse" -> { case Seq(a) => coalesce(!a.cast(BooleanType), lit(false)) },
    "isnotfalse" -> { case Seq(a) => !coalesce(!a.cast(BooleanType), lit(false)) },
    "casewhen" -> (cols => caseWhen(cols)),

    // ——— CityHash family (HashFunctions.java:289-328) ———
    "cityhash32" -> { case Seq(c) => graft.plans.CityHashExpr(c, "city_32", Nil) },
    "cityhash64" -> { case c +: seeds =>
      graft.plans.CityHashExpr(c, "city_64", hashSeeds(seeds)) },
    "cityhash128" -> { case Seq(c) => graft.plans.CityHashExpr(c, "city_128", Nil) },
    // MurmurHash3 x64 (Infinispan variant; HashFunctions.java:161-187 —
    // note the reference's Bit64 delegates to Bit32, mirrored here)
    "murmurhash3x64bit32" -> { case Seq(c, s) =>
      graft.plans.CityHashExpr(c, "mm3x64_32", hashSeeds(Seq(s))) },
    "murmurhash3x64bit64" -> { case Seq(c, s) =>
      graft.plans.CityHashExpr(c, "mm3x64_64", hashSeeds(Seq(s))) },
    "murmurhash3x64bit128" -> { case Seq(c, s) =>
      graft.plans.CityHashExpr(c, "mm3x64_128", hashSeeds(Seq(s))) },

    // ——— UUID generators / conversions (scalar/uuid/) ———
    "uuidv4" -> { case Seq() => expr("uuid()") },
    "uuidv7" -> { case Seq() => uuidV7() },
    "touuidbytes" -> { case Seq(u) => NetFunctions.uuidToBytes(u) },
    "fromuuidbytes" -> { case Seq(b) => NetFunctions.bytesToUuid(b) },
    // TO_UUID / UUID_TO_STRING (ToUuidScalarFunction.java,
    // UuidToStringScalarFunction.java): canonical lowercase UUID
    // string for the STRING input form — dashed OR dash-less 32-hex
    // (UuidUtils.toBytes hex fallback, #18927); the BYTES form is
    // fromuuidbytes/bytes_to_uuid
    "touuid" -> { case Seq(u) => NetFunctions.uuidCanonical(u) },
    "uuidtostring" -> { case Seq(u) => NetFunctions.uuidCanonical(u) },

    // ——— ASCII / string leftovers (StringFunctions.java:370,1009) ———
    "toascii" -> { case Seq(s) => encode(s, "US-ASCII") },
    "fromascii" -> { case Seq(b) => decode(b, "US-ASCII") },
    "firstline" -> { case Seq(s) => regexp_extract(s, "^[^\\n\\r]*", 0) },

    // ——— variable-pattern regex/LIKE (…Var transform functions) ———
    // likeVar is CASE-INSENSITIVE in the reference
    // (RegexpLikeVarFunctions.likeVar compiles with caseInsensitive=true)
    "likevar" -> { case Seq(s, p) => col(ILike(ex(s), ex(p), '\\')) },
    "regexplikevar" -> {
      case Seq(s, p) => col(RLike(ex(s), ex(p)))
      case Seq(s, p, f) =>
        // RegexpPatternConverterUtils.isCaseInsensitive: exactly one
        // char, 'i'/'I' insensitive, 'c'/'C' sensitive, else error
        val mp = str(f)
        if (mp.length != 1) throw new IllegalArgumentException(
          s"Match parameter must be exactly one character: '$mp'")
        val insensitive = mp match {
          case "i" | "I" => true
          case "c" | "C" => false
          case other => throw new IllegalArgumentException(
            s"Unsupported match parameter: '$other'")
        }
        val pat = if (insensitive) concat(lit("(?i)"), p) else p
        col(RLike(ex(s), ex(pat)))
    },
    // group > groupCount returns the default, not an error
    // (RegexpExtractVarFunctions.java:56-64) — TryEval absorbs Spark's
    // invalid-group-index failure, then ""/null degrade to the default
    "regexpextractvar" -> {
      case Seq(s, p) => col(RegExpExtract(ex(s), ex(p), ex(lit(0))))
      case Seq(s, p, g) =>
        coalesce(col(TryEval(
          RegExpExtract(ex(s), ex(p), ex(g.cast(IntegerType))))), lit(""))
      case Seq(s, p, g, d) =>
        val e = col(TryEval(
          RegExpExtract(ex(s), ex(p), ex(g.cast(IntegerType)))))
        when(e.isNull || e === "", d).otherwise(e)
    },

    // ——— IP masks and byte conversions (IpAddressFunctions.java) ———
    "ipnetmask" -> { case Seq(c) => ipCall("netmask", StringType, c, lit(false)) },
    "iphostmask" -> { case Seq(c) => ipCall("netmask", StringType, c, lit(true)) },
    "ipv4cidrtorange" -> { case Seq(c) =>
      when(c.contains(":"), lit(null).cast(ArrayType(StringType)))
        .otherwise(array(
          ipCall("ipSubnetMin", StringType, c),
          ipCall("ipSubnetMax", StringType, c))) },
    "ipv6tobytes" -> { case Seq(c) => ipCall("ipv6ToBytes", BinaryType, c) },
    "bytestoipv6" -> { case Seq(b) => ipCall("bytesToIpv6", StringType, b) },

    // ——— BigDecimal byte serialization (DataTypeConversionFunctions) ———
    "bigdecimaltobytes" -> { case Seq(d) =>
      jvmCall("bigDecimalToBytes", BinaryType, d.cast(DecimalType(38, 18))) },
    "bytestobigdecimal" -> { case Seq(b) =>
      jvmCall("bytesToBigDecimal", DecimalType(38, 18), b) },

    // ——— MV / period ———
    "agomv" -> { case Seq(arr) =>
      transform(arr, p =>
        unix_millis(current_timestamp()) - jvmCall("periodMillis", LongType, p)) },
    "filtermv" -> { case Seq(arr, pred) => filterMv(arr, pred) },

    // ——— aggregate alias: SUMPRECISION (arbitrary-precision sum,
    // graft.plans.BigDecimalSumAgg — no 38-digit cap) ———
    "sumprecision" -> {
      case Seq(c) => bigSum(c, None, None)
      case Seq(c, p) => bigSum(c, Some(str(p).toInt), None)
      case Seq(c, p, s) => bigSum(c, Some(str(p).toInt), Some(str(s).toInt))
    }
  )

  /** Pinot resolves function names with underscores stripped and
    * lowercased (`FunctionRegistry.canonicalize` in the reference), so
    * `ST_Contains`, `stContains` and `st_contains` are one function.
    * Spark's registry is spelling-exact and its resolver throws before
    * any extension rule could rewrite a miss, so the reference's
    * alternate spellings are registered eagerly: each name below is
    * aliased to the function whose canonical (underscore-stripped)
    * form it matches — graft registration or Spark builtin alike. */
  private val referenceSpellings = Seq(
    // geo (TransformFunctionType ST_* enum spellings)
    "st_point", "st_polygon", "st_distance", "st_contains", "st_within",
    "st_equals", "st_area", "st_astext", "st_asbinary", "st_asgeojson",
    "st_geometrytype", "st_geomfromtext", "st_geogfromtext",
    "st_geomfromwkb", "st_geogfromwkb", "st_geomfromgeojson",
    "st_geogfromgeojson", "st_union",
    // predicate spellings (FilterKind names)
    "is_null", "is_not_null", "is_true", "is_not_true", "is_false",
    "is_not_false", "is_distinct_from", "is_not_distinct_from",
    "greater_than", "greater_than_or_equal", "less_than",
    "less_than_or_equal", "not_equals", "not_in",
    // IP / UUID scalar alternate spellings
    "is_private_ip", "is_subnet_of", "ip_family", "ip_mask_len",
    "ip_netmask", "ip_hostmask", "ip_prefix", "ip_subnet_min",
    "ip_subnet_max", "ipv6_to_bytes", "bytes_to_ipv6", "ipv4_to_ipv6",
    "ipv4_cidr_to_range", "is_ipv4_string", "is_ipv6_string",
    "ipv4_to_long", "long_to_ipv4",
    "uuid_v4", "uuid_v7", "bytes_to_uuid", "uuid_to_bytes",
    "is_uuid", "to_uuid", "uuid_timestamp", "uuid_to_string",
    "uuid_version",
    // Pinot camelCase forms of Spark snake_case builtins
    "stddevpop", "stddevsamp", "varpop", "varsamp", "covarpop",
    "covarsamp", "widthbucket", "octetlength", "bitcount", "bitlength",
    "substringindex", "regexpcount", "regexpsubstr", "urlencode",
    "urldecode", "arrayagg", "booland", "boolor", "percentilecont",
    "anyvalue", "rownumber", "denserank",
    // sketch aggregate underscore spellings (the reference's query
    // suites spell these SNAKE_CASE, e.g. DISTINCT_COUNT_THETA_SKETCH)
    "distinct_count_theta_sketch", "distinct_count_raw_theta_sketch",
    "distinct_count_cpc_sketch", "distinct_count_raw_cpc_sketch",
    "distinct_count_hll", "distinct_count_raw_hll",
    "distinct_count_hll_plus", "distinct_count_raw_hll_plus",
    "frequent_strings_sketch", "frequent_longs_sketch",
    "distinct_count_tuple_sketch",
    "distinct_count_raw_integer_sum_tuple_sketch",
    "sum_values_integer_sum_tuple_sketch",
    "avg_value_integer_sum_tuple_sketch",
    // SketchFunctions scalar spellings (the integration suites write
    // these SNAKE_CASE, e.g. INT_SUM_TUPLE_SKETCH_UNION)
    "to_theta_sketch", "to_hll", "to_integer_sum_tuple_sketch",
    "to_cpc_sketch", "to_ull", "from_ull",
    "theta_sketch_union", "theta_sketch_intersect", "theta_sketch_diff",
    "theta_sketch_to_string", "get_theta_sketch_estimate",
    "cpc_sketch_union", "cpc_sketch_to_string", "get_cpc_sketch_estimate",
    "get_int_tuple_sketch_estimate",
    "int_sum_tuple_sketch_union", "int_min_tuple_sketch_union",
    "int_max_tuple_sketch_union", "int_sum_tuple_sketch_intersect",
    "int_min_tuple_sketch_intersect", "int_max_tuple_sketch_intersect",
    "int_sum_tuple_sketch_diff",
    // ARRAYS_OVERLAP (ArraysOverlapScalarFunction) — Pinot's bare
    // spelling onto Spark's arrays_overlap builtin
    "arraysoverlap")

  private def canon(s: String): String =
    s.replace("_", "").toLowerCase(java.util.Locale.ROOT)

  /** Idempotent registration; never shadows an existing function. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registry.foreach { case (name, f) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name,
          (exprs: Seq[Expression]) => ColumnBridge.expression(
            f(exprs.map(ColumnBridge.column))), "built-in")
    }
    // alias sweep: alternate reference spellings onto whatever function
    // owns the canonical form (graft or builtin); misses stay absent
    lazy val canonical: Map[String, String] = reg.listFunction()
      .map(_.funcName).sortBy(identity).groupBy(canon)
      .map { case (k, vs) => k -> vs.head }
    referenceSpellings.foreach { name =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        canonical.get(canon(name)).foreach { actual =>
          val actualId = org.apache.spark.sql.catalyst.FunctionIdentifier(actual)
          reg.createOrReplaceTempFunction(name,
            (exprs: Seq[Expression]) => reg.lookupFunction(actualId, exprs),
            "built-in")
        }
      }
    }
  }
}
