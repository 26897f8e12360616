package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pinot-named SQL function surface, registered into the session
  * FunctionRegistry so `spark.sql("SELECT ARRAYLENGTH(a) ...")` runs
  * Pinot-flavored SQL unchanged.
  *
  * Reference inventory: apache/pinot
  * `pinot-common/.../function/TransformFunctionType.java:46-258`
  * (scalars) and
  * `pinot-segment-spi/.../AggregationFunctionType.java:52-242`
  * (aggregates). Functions whose names/semantics already match Spark
  * (SUM, LOWER, CONCAT, …) are not re-registered.
  *
  * Every registration is a composition of native Catalyst expressions
  * (built through the Column API and unwrapped via the classic
  * Expression bridge) — no UDFs, so everything stays codegen'd and
  * filter-pushdown-friendly at 100 TB scan scale.
  */
object PinotFunctions {

  private def fn(f: Seq[Column] => Column): Seq[Expression] => Expression =
    exprs =>
      try ColumnBridge.expression(f(exprs.map(ColumnBridge.column)))
      catch {
        case _: MatchError => throw new IllegalArgumentException(
          s"unsupported argument count (${exprs.size}) for this function")
      }

  /** Unwrap a Column to its Catalyst expression (for literal args that
    * shape the expression tree, e.g. a round scale or format string). */
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  /** Pinot exact percentile: floor-index order statistic (no
    * interpolation), `PercentileAggregationFunction.java:246-250`. */
  private def pinotPct(c: Column, p: Column): Column = {
    val pct = ex(p).eval().toString.toDouble
    val arr = sort_array(collect_list(c))
    val idx =
      if (pct >= 100.0) size(arr)
      else least(floor(size(arr) * pct / 100.0).cast(IntegerType) + 1, size(arr))
    element_at(arr, idx)
  }

  // Column-shift variants (functions.shiftleft only takes a literal Int)
  private def shiftL(a: Column, s: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      ex(a), ex(s.cast(IntegerType))))
  private def shiftR(a: Column, s: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      ex(a), ex(s.cast(IntegerType))))
  private def shiftRU(a: Column, s: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned(
      ex(a), ex(s.cast(IntegerType))))

  /** Haversine distance in meters between two (lon, lat) points — the
    * geography mode of Pinot's ST_Distance
    * (`function/scalar/GeohashFunctions.java` family). */
  def haversineMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val r = lit(6371008.8) // mean earth radius, meters
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0) * r * asin(sqrt(a))
  }

  /** Column-builder lookup for engine-internal callers (e.g. the
    * timestamp-index ingestion transform reusing `datetrunc`). */
  def builder(name: String): Seq[Column] => Column = registry(name)

  private val registry: Map[String, Seq[Column] => Column] = Map(
    // ——— arithmetic (TransformFunctionType.java:46-66) ———
    "add" -> { case Seq(a, b) => a + b },
    "plus" -> { case Seq(a, b) => a + b },
    "sub" -> { case Seq(a, b) => a - b },
    "minus" -> { case Seq(a, b) => a - b },
    "mult" -> { case Seq(a, b) => a * b },
    "times" -> { case Seq(a, b) => a * b },
    // Pinot DIV is JAVA double division (ArithmeticFunctions.divide):
    // x/0 is ±Infinity DATA and 0/0 is NaN, never an error — Spark's
    // ANSI Divide throws DIVIDE_BY_ZERO, so the zero-divisor branch
    // computes the IEEE result as a·(b⁻¹) (pow keeps −0.0's sign, so
    // 1/−0.0 = −Inf like Java). Spark's builtin `div` is INTEGER
    // division; the facade routes the DIV spelling here via
    // CollidingFns. (DivergenceContractSpec pins the contract.)
    "pinotdiv" -> { case Seq(a, b) =>
      val bd = b.cast(DoubleType)
      when(bd =!= 0.0, a / b)
        .otherwise(a.cast(DoubleType) * pow(bd, -1.0))
    },
    "intdiv" -> { case Seq(a, b) => (a / b).cast(LongType) },
    // ——— Pinot concat: separator LAST (scalar/string/StringFunctions
    // .java:33 `concat(input1, input2, separator)`); concatWS is
    // separator-first like Spark's concat_ws. The facade rewrites the
    // reserved spelling `concat(` to `pinotconcat(`. ———
    "pinotconcat" -> {
      case Seq(a, b) => concat(a.cast(StringType), b.cast(StringType))
      case Seq(a, b, sep) =>
        concat(a.cast(StringType), sep.cast(StringType), b.cast(StringType))
      case args => concat(args.map(_.cast(StringType)): _*)
    },
    "concatws" -> { case sep +: rest =>
      ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.ConcatWs(
        (sep +: rest).map(c => ex(c.cast(StringType))))) },
    // ——— bitwise scalars (scalar/bitwise/Bit*ScalarFunction.java) ———
    // width-polymorphic like the reference (Bit*ScalarFunction int/long
    // overloads): Catalyst keeps int ops 32-bit, so int >>> stays int
    "bitand" -> { case Seq(a, b) => a.bitwiseAND(b) },
    "bitor" -> { case Seq(a, b) => a.bitwiseOR(b) },
    "bitxor" -> { case Seq(a, b) => a.bitwiseXOR(b) },
    "bitnot" -> { case Seq(a) => bitwise_not(a) },
    "bitshiftleft" -> { case Seq(a, s) => shiftL(a, s) },
    "bitshiftright" -> { case Seq(a, s) => shiftR(a, s) },
    "bitshiftrightunsigned" -> { case Seq(a, s) => shiftRU(a, s) },
    "bitshiftrightlogical" -> { case Seq(a, s) => shiftRU(a, s) },
    // BitMaskScalarFunction.java:66 — 1L << bit for bit in [0,63], else 0
    "bitmask" -> { case Seq(bit) =>
      when(bit >= 0 && bit < 64, shiftL(lit(1L), bit)).otherwise(0L) },
    "bitextract" -> { case Seq(v, bit) =>
      when(bit >= 0 && bit < 64,
        shiftRU(v.cast(LongType), bit).bitwiseAND(lit(1L))).otherwise(0L) },
    "extractbit" -> { case Seq(v, bit) =>
      when(bit >= 0 && bit < 64,
        shiftRU(v.cast(LongType), bit).bitwiseAND(lit(1L))).otherwise(0L) },
    // 1-arg roundDecimal = Math.round (ArithmeticFunctions.java)
    "roundecimal" -> { case Seq(a) => round(a).cast(DoubleType)
      case Seq(a, s) => round(a, ex(s).eval().toString.toInt) },
    "rounddecimal" -> { case Seq(a) => round(a).cast(DoubleType)
      case Seq(a, s) => round(a, ex(s).eval().toString.toInt) },
    "truncate" -> { case Seq(a) =>
      when(a >= 0, floor(a)).otherwise(ceil(a)).cast(DoubleType) },
    // ——— time (:120-157, DateTimeFunctions.java) ———
    "timeconvert" -> { case Seq(v, from, to) =>
      val unitMs: Column => Column = u => when(upper(u) === "MILLISECONDS", 1L)
        .when(upper(u) === "SECONDS", 1000L)
        .when(upper(u) === "MINUTES", 60000L)
        .when(upper(u) === "HOURS", 3600000L)
        .when(upper(u) === "DAYS", 86400000L)
      ((v * unitMs(from)) / unitMs(to)).cast(LongType) },
    // reference dateTrunc(unit, value[, inputTimeUnit[, tz[, outUnit]]])
    // → LONG in inputTimeUnit (UTC truncation), DateTimeFunctions.java
    "datetrunc" -> { case args if args.size >= 2 =>
      val unit = ex(args.head).eval().toString
      def unitMs(c: Column): Long = ex(c).eval().toString.toUpperCase match {
        case "MILLISECONDS" => 1L
        case "SECONDS" => 1000L
        case "MINUTES" => 60000L
        case "HOURS" => 3600000L
        case "DAYS" => 86400000L
      }
      val inMs = if (args.size >= 3) unitMs(args(2)) else 1L
      val tz = if (args.size >= 4) ex(args(3)).eval().toString else "UTC"
      val outMs = if (args.size >= 5) unitMs(args(4)) else inMs
      val ms = graft.plans.ScalarExprs.epochNumeric(args(1)) * lit(inMs)
      val truncated = ColumnBridge.column(
        graft.plans.DateTruncEpoch(unit, ex(ms.cast(LongType)), tz))
      if (outMs == 1L) truncated else (truncated / lit(outMs)).cast(LongType)
    },
    "datetimeconvert" -> {
      case Seq(c, in, out, gran) =>
        DateTimeConvert.dateTimeConvert(c, ex(in).eval().toString,
          ex(out).eval().toString, ex(gran).eval().toString)
      // 5th arg = bucketing time zone (DateTimeConversionHint)
      case Seq(c, in, out, gran, tz) =>
        DateTimeConvert.dateTimeConvert(c, ex(in).eval().toString,
          ex(out).eval().toString, ex(gran).eval().toString,
          Some(ex(tz).eval().toString))
    },
    "timeseriesbucket" -> { case Seq(c, unit, first, size, off) =>
      DateTimeConvert.timeSeriesBucket(c, ex(unit).eval().toString,
        ex(first).eval().toString.toLong, ex(size).eval().toString.toLong,
        ex(off).eval().toString.toLong) },
    "datetimeconvertwindowhop" -> { case Seq(c, in, out, gran, hop) =>
      DateTimeConvert.dateTimeConvertWindowHop(c, ex(in).eval().toString,
        ex(out).eval().toString, ex(gran).eval().toString,
        ex(hop).eval().toString) },
    "textmatch" -> { case Seq(c, q) => TextMatch.textMatch(c, ex(q).eval().toString) },
    "text_match" -> {
      case Seq(c, q) => TextMatch.textMatch(c, ex(q).eval().toString)
      case Seq(c, q, o) => TextMatch.textMatch(c,
        ex(q).eval().toString, ex(o).eval().toString) },
    "fromepochseconds" -> { case Seq(v) => timestamp_seconds(v.cast(LongType)) },
    "fromepochmillis" -> { case Seq(v) => timestamp_millis(v.cast(LongType)) },
    "toepochseconds" -> { case Seq(ts) => unix_seconds(ts.cast(TimestampType)) },
    "toepochmillis" -> { case Seq(ts) => unix_millis(ts.cast(TimestampType)) },
    "todatetime" -> {
      case Seq(ms, pat) =>
        date_format(timestamp_millis(ms.cast(LongType)), ex(pat).eval().toString)
      case Seq(ms, pat, zone) => CompatAliases.jvmCall("toDateTimeZoned",
        StringType, ms.cast(LongType), pat, zone) },
    // 3/4-arg forms take a zone id and a parse-failure default
    // (DateTimePatternHandler; DST-gap + offset-token contracts pinned
    // by DateTimePatternHandlerTest — see CompatJvm.fromDateTimeZoned)
    "fromdatetime" -> {
      case Seq(s, pat) =>
        unix_millis(to_timestamp(s, ex(pat).eval().toString).cast(TimestampType))
      case Seq(s, pat, zone) =>
        CompatAliases.jvmCall("fromDateTimeZoned", LongType, s, pat, zone)
      case Seq(s, pat, zone, dflt) =>
        coalesce(CompatAliases.jvmCall("fromDateTimeZoned", LongType,
          s, pat, zone), dflt.cast(LongType)) },
    "yearofweek" -> { case Seq(ts) => expr(s"extract(YEAROFWEEK FROM ${ex(ts).sql})") },
    "millisecond" -> { case Seq(ts) => (expr(s"extract(SECONDS FROM ${ex(ts).sql})") * 0 +
      date_format(ts, "SSS").cast(IntegerType)) },
    // ——— JSON (:104-117) ———
    "jsonextractscalar" -> {
      case Seq(c, path, typ) => jsonScalar(c, path, typ, lit(null))
      case Seq(c, path, typ, dflt) => jsonScalar(c, path, typ, dflt) },
    // keys come back as JsonPath strings (`$['key']`), matching
    // JsonFunctions.jsonExtractKey's path-style output
    "jsonextractkey" -> { case Seq(c, _) =>
      transform(json_object_keys(c), k => concat(lit("$['"), k, lit("']"))) },
    // jsonExtractScalarFirstMatch (TransformFunctionType.java:108): first
    // scalar matched by a (possibly wildcard) path — a wildcard path
    // yields a JSON array of matches, so take its [0]; a plain path
    // yields the scalar itself.
    "jsonextractscalarfirstmatch" -> { case Seq(c, path, typ) =>
      val raw = get_json_object(c, ex(path).eval().toString)
      val first = coalesce(get_json_object(raw, "$[0]"), raw)
      jsonCast(first, typ, lit(null)) },
    // jsonExtractIndex (TransformFunctionType.java:110): same extraction
    // semantics as jsonExtractScalar — the reference's "index" is its
    // json-index access path, an execution detail Catalyst has no
    // analog for (parquet scans have no per-doc posting lists).
    "jsonextractindex" -> {
      case Seq(c, path, typ) => jsonScalar(c, path, typ, lit(null))
      case Seq(c, path, typ, dflt) => jsonScalar(c, path, typ, dflt) },
    "jsonformat" -> { case Seq(c) => to_json(c) },
    // internal backend for the facade's JSON_MATCH rewrite: the
    // flattened SCALAR values at a path (json-index model),
    // emitted by JsonShred.compileToSql
    "jsonmatchscalars" -> { case Seq(j, p) =>
      graft.sources.JsonShred.scalarsColumn(j, p) },
    "jsonpath" -> { case Seq(c, p) => get_json_object(c, ex(p).eval().toString) },
    // ——— string (StringFunctions.java) ———
    // Pinot StringFunctions.strpos = StringUtils.indexOf: 0-based, -1 on miss
    "strpos" -> { case Seq(s, sub) =>
      val i = instr(s, ex(sub).eval().toString)
      when(i === 0, lit(-1L)).otherwise((i - 1).cast(LongType)) },
    // Pinot splitPart is 0-based with splitByWholeSeparator field
    // semantics and a literal "null" miss sentinel — NOT Spark's
    // 1-based split_part (StringFunctions.java:502-674; 4-arg form is
    // (input, delim, limit, index))
    "splitpart" -> {
      case Seq(s, sep, i) => CompatAliases.jvmCall("splitPart", StringType,
        s, sep, lit(0), i.cast(IntegerType))
      case Seq(s, sep, lim, i) => CompatAliases.jvmCall("splitPart",
        StringType, s, sep, lim.cast(IntegerType), i.cast(IntegerType))
    },
    "codepoint" -> { case Seq(s) => ascii(s) },
    "normalize" -> { case Seq(s) => lower(trim(s)) },
    // Pinot strrpos = StringUtils.lastIndexOf: 0-based, -1 on miss
    "strrpos" -> { case Seq(s, sub) =>
      val lit_ = ex(sub).eval().toString
      val revPos = instr(reverse(s), lit_.reverse)
      when(revPos === 0, lit(-1L)).otherwise(
        (length(s) - revPos - lit(lit_.length) + 1).cast(LongType)) },
    "regexpextract" -> { case Seq(s, p) => regexp_extract(s, ex(p).eval().toString, 0)
      case Seq(s, p, g) => regexp_extract(s, ex(p).eval().toString,
        ex(g).eval().toString.toInt)
      // 4-arg: default value when no match (RegexpExtractConstFunctions)
      case Seq(s, p, g, d) =>
        val hit = regexp_extract(s, ex(p).eval().toString, ex(g).eval().toString.toInt)
        when(s.rlike(ex(p).eval().toString), hit).otherwise(d) },
    "regexpreplace" -> { case Seq(s, p, r) =>
      regexp_replace(s, ex(p).eval().toString, ex(r).eval().toString) },
    // ——— array / MV (:162-172, ArrayFunctions.java) ———
    "arraylength" -> { case Seq(a) => size(a) },
    "arrayaverage" -> { case Seq(a) =>
      aggregate(a, lit(0.0), (acc, x) => acc + x.cast(DoubleType)) / size(a) },
    "arraysum" -> { case Seq(a) =>
      aggregate(a, lit(0.0), (acc, x) => acc + x.cast(DoubleType)) },
    // typed row-wise array sums (TransformFunctionType ARRAY_SUM_INT/LONG)
    "arraysumint" -> { case Seq(a) =>
      aggregate(a, lit(0L), (acc, x) => acc + x.cast(LongType)) },
    "arraysumlong" -> { case Seq(a) =>
      aggregate(a, lit(0L), (acc, x) => acc + x.cast(LongType)) },
    "arraymin" -> { case Seq(a) => array_min(a) },
    "arraymax" -> { case Seq(a) => array_max(a) },
    "arraydistinct" -> { case Seq(a) => array_distinct(a) },
    "arraysort" -> { case Seq(a) => array_sort(a) },
    "arrayreverse" -> { case Seq(a) => reverse(a) },
    "arrayconcat" -> { case cols => concat(cols: _*) },
    "arrayunion" -> { case Seq(a, b) => array_union(a, b) },
    "arrayremove" -> { case Seq(a, v) => array_remove(a, v) },
    "arrayslice" -> { case Seq(a, s, e) => slice(a, s, e - s) },
    "arrayindexof" -> { case Seq(a, v) => array_position(a, v) - 1 },
    "arrayelementat" -> { case Seq(a, i) => element_at(a, i) },
    "arraycontainsvalue" -> { case Seq(a, v) => array_contains(a, v) },
    "valuein" -> { case a +: vs => array_intersect(a, array(vs: _*)) },
    "generatearray" -> { case Seq(s, e) => sequence(s, e)
      case Seq(s, e, st) => sequence(s, e, st) },
    "item" -> { case Seq(a, i) => element_at(a, i + 1) },
    // ——— map (:174) ———
    "mapvalue" -> { case Seq(m, k) => element_at(m, k) },
    // LOOKUP (TransformFunctionType LOOKUP, reference
    // LookupTransformFunction.java): scalar dim-table join —
    // lookup('dimView', 'valueCol', 'dimKeyCol', factExpr[, k2, e2…]).
    // The reference requires dimension tables to be small and fully
    // replicated on every server; we mirror that contract exactly: the
    // registered dim view is collected ONCE at plan time into a map
    // literal that ships with the task binary (a plan-time broadcast),
    // so per-row evaluation is a hash probe with no join or shuffle.
    // Missing keys → null, matching the reference's default-null fill.
    "lookup" -> { case cols if cols.size >= 4 && cols.size % 2 == 0 =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val tbl = ex(cols(0)).eval().toString
      val valCol = ex(cols(1)).eval().toString
      val dim = org.apache.spark.sql.SparkSession.active.table(tbl)
      val pairs = cols.drop(2).grouped(2).map { p =>
        (ex(p.head).eval().toString, p(1)) }.toSeq
      val rows = dim.select((valCol +: pairs.map(_._1)).map(col): _*).collect()
      require(rows.length <= 2000000,
        s"lookup('$tbl'): ${rows.length} rows exceeds the replicated " +
          "dimension-table bound; use a broadcast join instead")
      val kvs: Map[String, Any] = rows.iterator.map { r =>
        (1 to pairs.size).map(i => String.valueOf(r.get(i)))
          .mkString("\u0000") -> r.get(0)
      }.toMap
      val mapLit = ColumnBridge.column(Literal.create(kvs,
        MapType(StringType, dim.schema(valCol).dataType)))
      element_at(mapLit,
        concat_ws("\u0000", pairs.map(_._2.cast(StringType)): _*)) },
    // ——— vector (:233-239) ———
    "cosinedistance" -> { case Seq(a, b) => VectorFunctions.cosineDistance(a, b) },
    "innerproduct" -> { case Seq(a, b) => VectorFunctions.innerProduct(a, b) },
    "l1distance" -> { case Seq(a, b) => VectorFunctions.l1Distance(a, b) },
    "l2distance" -> { case Seq(a, b) => VectorFunctions.l2Distance(a, b) },
    "vectordims" -> { case Seq(a) => VectorFunctions.vectorDims(a) },
    "vectornorm" -> { case Seq(a) => VectorFunctions.vectorNorm(a) },
    // ——— geo (subset: geography distance + point, :195-229) ———
    "stpoint" -> { case Seq(x, y) => struct(x.cast(DoubleType).as("x"),
      y.cast(DoubleType).as("y"))
      case Seq(x, y, _) => struct(x.cast(DoubleType).as("x"), y.cast(DoubleType).as("y")) },
    "stdistance" -> { case Seq(p1, p2) =>
      haversineMeters(p1.getField("x"), p1.getField("y"),
        p2.getField("x"), p2.getField("y")) },
    // WKT POINT parsing (ST_GeogFromText / ST_GeomFromText — point
    // subset; polygons are provided as array<struct> literals)
    // WKT: POLYGON when the (foldable) literal says so, else POINT —
    // the output type must be static, so dispatch happens at plan time
    "stgeogfromtext" -> { case Seq(wkt) => wktAny(wkt) },
    "stgeomfromtext" -> { case Seq(wkt) => wktAny(wkt) },
    "stpolygonfromtext" -> { case Seq(wkt) => GeoFunctions.wktPolygon(wkt) },
    // ——— H3 grid subset (TransformFunctionType.java:195-229; documented
    // axial-hex approximation, see GeoFunctions) ———
    "geotoh3" -> { case Seq(lng, lat, res) => GeoFunctions.geoToH3(lng, lat, res) },
    "h3togeo" -> { case Seq(cell) => GeoFunctions.h3ToGeo(cell) },
    "griddistance" -> { case Seq(a, b) => GeoFunctions.gridDistance(a, b) },
    "griddisk" -> { case Seq(cell, k) =>
      GeoFunctions.gridDisk(cell, ex(k).eval().toString.toInt) },
    "kring" -> { case Seq(cell, k) =>
      GeoFunctions.gridDisk(cell, ex(k).eval().toString.toInt) },
    "stcontains" -> { case Seq(poly, p) => GeoFunctions.stContains(poly, p) },
    "stwithin" -> { case Seq(p, poly) => GeoFunctions.stWithin(p, poly) },
    "starea" -> { case Seq(poly) => GeoFunctions.stArea(poly) },
    "stastext" -> { case Seq(p) => concat(lit("POINT ("),
      p.getField("x").cast(StringType), lit(" "),
      p.getField("y").cast(StringType), lit(")")) },
    // ——— WKB / GeoJSON / type / equality (ST_AS_BINARY,
    // ST_GEOM_FROM_WKB, ST_AS_GEOJSON, ST_GEOM_FROM_GEOJSON,
    // ST_GEOMETRY_TYPE, ST_EQUALS — point subset, see GeoBinary) ———
    "stasbinary" -> { case Seq(p) => GeoBinary.stAsBinary(p) },
    "stgeomfromwkb" -> { case Seq(b) => GeoBinary.stGeomFromWkb(b) },
    "stgeogfromwkb" -> { case Seq(b) => GeoBinary.stGeomFromWkb(b) },
    "stasgeojson" -> { case Seq(p) => GeoBinary.stAsGeoJson(p) },
    "stgeomfromgeojson" -> { case Seq(j) => GeoBinary.stGeomFromGeoJson(j) },
    "stgeogfromgeojson" -> { case Seq(j) => GeoBinary.stGeomFromGeoJson(j) },
    "stgeometrytype" -> { case Seq(g) => GeoBinary.stGeometryType(g) },
    "stequals" -> { case Seq(a, b) => GeoBinary.stEquals(a, b) },
    // ——— JTS blob engine (plans/GeoJts): the reference's serialized-
    // geometry BYTES layout over the FULL geometry-type surface. The
    // struct subset above keeps its names for the legacy point/polygon
    // query paths; these names (absent from the legacy registry) and
    // the GeoJts Column API carry the blob surface. ———
    "tosphericalgeography" -> { case Seq(g) =>
      graft.plans.GeoJts.toSphericalGeography(g) },
    "togeometry" -> { case Seq(g) => graft.plans.GeoJts.toGeometry(g) },
    // ——— url / ip / hash extras (UrlFunctions.java,
    // IpAddressFunctions.java, HashFunctions.java) ———
    "encodeurl" -> { case Seq(s) => call_function("url_encode", s) },
    "decodeurl" -> { case Seq(s) => call_function("url_decode", s) },
    "sha256" -> { case Seq(s) => sha2(s.cast(BinaryType), 256) },
    "sha512" -> { case Seq(s) => sha2(s.cast(BinaryType), 512) },
    "tobase64" -> { case Seq(s) => base64(s.cast(BinaryType)) },
    "frombase64" -> { case Seq(s) => unbase64(s) },
    "issubnetof" -> { case Seq(cidr, ip) =>
      ColumnBridge.column(IpIsSubnetOf(ex(cidr), ex(ip))) },
    "isipv4string" -> { case Seq(s) =>
      ColumnBridge.column(IpIsSubnetOf(ex(concat(s, lit("/0"))), ex(s))) &&
        !s.contains(":") },
    "isipv6string" -> { case Seq(s) =>
      ColumnBridge.column(IpIsSubnetOf(ex(concat(s, lit("/0"))), ex(s))) &&
        s.contains(":") },
    "ipv4tolong" -> { case Seq(ip) => NetFunctions.ipv4ToLong(ip) },
    "ipprefix" -> { case Seq(ip, bits) =>
      ColumnBridge.column(IpPrefix(ex(ip), ex(bits.cast(IntegerType)))) },
    "ipsubnetmin" -> { case Seq(cidr) =>
      ColumnBridge.column(IpSubnetEnd(ex(cidr), max = false)) },
    "ipsubnetmax" -> { case Seq(cidr) =>
      ColumnBridge.column(IpSubnetEnd(ex(cidr), max = true)) },
    "longtoipv4" -> { case Seq(v) => NetFunctions.longToIpv4(v) },
    // ipFamily/ipMaskLen/ipv4ToIpv6/isPrivateIp
    // (IpAddressFunctions.java:222-346) compose from the native IP
    // expressions — null on invalid input instead of throwing,
    // matching the family's null-column contract above. (The masks and
    // byte conversions live in CompatAliases' IpHelper StaticInvokes.)
    "ipv4toipv6" -> { case Seq(ip) =>
      CompatAliases.ipCall("ipv4MappedV6", StringType, ip) },
    "ipfamily" -> { case Seq(ip) =>
      val valid = ColumnBridge.column(
        IpIsSubnetOf(ex(concat(ip, lit("/0"))), ex(ip)))
      when(valid, when(ip.contains(":"), lit(6)).otherwise(lit(4))) },
    "ipmasklen" -> { case Seq(cidr) =>
      when(ColumnBridge.column(IpSubnetEnd(ex(cidr), max = false)).isNotNull,
        regexp_extract(cidr, "/(\\d+)$", 1).cast(IntegerType)) },
    "ipv4cidrtorange" -> { case Seq(cidr) =>
      // IPv4 only (the reference rejects IPv6 CIDRs); MV (min, max)
      val minC = ColumnBridge.column(IpSubnetEnd(ex(cidr), max = false))
      val maxC = ColumnBridge.column(IpSubnetEnd(ex(cidr), max = true))
      when(minC.isNotNull && !cidr.contains(":"), array(minC, maxC)) },
    "isprivateip" -> { case Seq(ip) =>
      // loopback + link-local + RFC 1918 + IPv6 ULA
      // (IpAddressFunctions.java:333-346); family mismatches inside
      // isSubnetOf are false, so one OR-chain covers both families
      val valid = ColumnBridge.column(
        IpIsSubnetOf(ex(concat(ip, lit("/0"))), ex(ip)))
      def in(range: String) = ColumnBridge.column(
        IpIsSubnetOf(ex(lit(range)), ex(ip)))
      when(valid,
        in("10.0.0.0/8") || in("172.16.0.0/12") || in("192.168.0.0/16") ||
        in("127.0.0.0/8") || in("169.254.0.0/16") ||
        in("::1/128") || in("fe80::/10") || in("fc00::/7")) },
    // ——— URL extraction (UrlFunctions.java:42-553, regex subset) ———
    "urlprotocol" -> { case Seq(u) => NetFunctions.urlProtocol(u) },
    "urldomain" -> { case Seq(u) => NetFunctions.urlDomain(u) },
    "urldomainwithoutwww" -> { case Seq(u) => NetFunctions.urlDomainWithoutWww(u) },
    "urltopleveldomain" -> { case Seq(u) => NetFunctions.urlTopLevelDomain(u) },
    "urlport" -> { case Seq(u) => NetFunctions.urlPort(u) },
    "urlnetloc" -> { case Seq(u) => NetFunctions.urlNetloc(u) },
    "urlpath" -> { case Seq(u) => NetFunctions.urlPath(u) },
    "urlquerystring" -> { case Seq(u) => NetFunctions.urlQueryString(u) },
    "urlfragment" -> { case Seq(u) => NetFunctions.urlFragment(u) },
    "extracturlparameter" -> { case Seq(u, name) =>
      NetFunctions.extractUrlParameter(u, ex(name).eval().toString) },
    // ——— UUID scalars (scalar/uuid/) ———
    "isuuid" -> { case Seq(u) => NetFunctions.isUuid(u) },
    "uuidversion" -> { case Seq(u) => NetFunctions.uuidVersion(u) },
    "uuidtobytes" -> { case Seq(u) => NetFunctions.uuidToBytes(u) },
    "bytestouuid" -> { case Seq(b) => NetFunctions.bytesToUuid(b) },
    "uuidtimestamp" -> { case Seq(u) => NetFunctions.uuidTimestamp(u) },
    // ——— text analysis (north-star additions) ———
    "tokencount" -> { case Seq(t) => TextFunctions.tokenCount(t) },
    "langid" -> { case Seq(t) => TextFunctions.langId(t) },
    "qualityscore" -> { case Seq(t) => TextFunctions.qualityScore(t) },
    "fingerprint" -> { case Seq(t) => TextFunctions.fingerprint(t) },
    // CAST(x AS BIG_DECIMAL) — unbounded precision (plain string form;
    // Spark decimals cap at 38 digits), facade routes the cast here
    "bigdecimal" -> { case Seq(c) =>
      ColumnBridge.column(graft.plans.ToBigDecimalString(ex(c))) },
    // ——— aggregates with Pinot names (AggregationFunctionType.java) ———
    "distinctcount" -> { case Seq(c) => size(collect_set(c)) },
    // native dense HLL (graft.plans.HllSketch): blob-compatible with
    // DISTINCTCOUNTRAWHLL / HLLMERGECOUNT, unlike Spark's HLL++ whose
    // state can't be stored or re-aggregated
    "distinctcounthll" -> {
      // SQL surface defaults to the reference's log2m = 8
      case Seq(c) => graft.plans.HllSketch.distinctCountHll(
        c, graft.plans.HllSketch.ReferenceDefaultLog2m)
      // optional 2nd arg = log2m (DistinctCountHLLAggregationFunction)
      case Seq(c, p) =>
        graft.plans.HllSketch.distinctCountHll(c, ex(p).eval().toString.toInt)
    },
    // RoaringBitmap distinct count, WIRE-FORMAT faithful: value for INT
    // columns, Type.hashCode otherwise, BYTES or-merges serialized
    // bitmaps (DistinctCountBitmapAggregationFunction.java:74-140)
    "distinctcountbitmap" -> { case Seq(c) =>
      graft.plans.IdSetSketch.distinctCountBitmap(c) },
    // sums per-SEGMENT distinct counts (reference
    // SegmentPartitionedDistinctCountAggregationFunction assumes values
    // are partitioned by segment); segment ≙ input partition here
    "segmentpartitioneddistinctcount" -> { case Seq(c) =>
      ColumnBridge.column(graft.plans.SegmentPartitionedDistinctCount(
        ex(c)).toAggregateExpression()) },
    // exact set until threshold, then clearspring HLL at log2m
    // (DistinctCountSmartHLLAggregationFunction parameters
    // 'threshold=…;log2m=…', legacy spellings hllConversionThreshold /
    // hllLog2m accepted like the reference)
    "distinctcountsmarthll" -> {
      case Seq(c) => ColumnBridge.column(graft.plans.SmartHllAgg(
        ex(c), 100000, 12).toAggregateExpression())
      case Seq(c, settings) =>
        val s = ex(settings).eval().toString
        def num(keys: String, dflt: Int): Int =
          s"(?i)(?:$keys)\\s*=\\s*(\\d+)".r.findFirstMatchIn(s)
            .map(_.group(1).toInt).getOrElse(dflt)
        ColumnBridge.column(graft.plans.SmartHllAgg(ex(c),
          num("threshold|hllConversionThreshold", 100000),
          num("log2m|hllLog2m", 12)).toAggregateExpression())
    },
    // registered expression-level in registerAll (bare AggregateFunction
    // so the analyzer can attach FILTER (WHERE ...) itself)
    // Pinot SKEWNESS/KURTOSIS are commons-math SAMPLE statistics
    // (PinotFourthMoment.java:97-103 → Skewness/Kurtosis.getResult),
    // while Spark's are population moments; apply the bias-correction
    // factors. Facade rewrites the reserved spellings here.
    // zero variance → Spark's moments are null, commons-math returns
    // 0.0 (Skewness/Kurtosis.getResult variance < 10E-20 branch)
    "pinotskewness" -> { case Seq(c) =>
      val n = count(c).cast(DoubleType)
      when(n < 3, lit(0.0)).otherwise(coalesce(
        skewness(c) * sqrt(n * (n - lit(1.0))) / (n - lit(2.0)), lit(0.0))) },
    "pinotkurtosis" -> { case Seq(c) =>
      val n = count(c).cast(DoubleType)
      when(n < 4, lit(0.0)).otherwise(coalesce(
        ((n + lit(1.0)) * kurtosis(c) + lit(6.0)) * (n - lit(1.0)) /
          ((n - lit(2.0)) * (n - lit(3.0))), lit(0.0))) },
    // Pinot ROUND(timeValue, roundTo) is DateTimeFunctions.round: FLOOR
    // to the nearest multiple (the decimal rounding is ROUNDDECIMAL)
    "pinotround" -> {
      case Seq(v) => round(v)
      case Seq(v, n) =>
        (v.cast(LongType) - pmod(v.cast(LongType), n.cast(LongType))) },
    // Pinot substr is 0-based with an END index (not a length), and
    // endIndex=-1 means to-the-end (StringFunctions.java substr)
    "pinotsubstr" -> {
      case Seq(s, b) => s.substr(b.cast(IntegerType) + 1, lit(Int.MaxValue))
      case Seq(s, b, e) =>
        val begin = b.cast(IntegerType)
        val end = e.cast(IntegerType)
        when(end === -1, s.substr(begin + 1, lit(Int.MaxValue)))
          .otherwise(s.substr(begin + 1, greatest(end - begin, lit(0))))
    },
    // Pinot exact PERCENTILE (PercentileAggregationFunction.java:249):
    // sorted values[(int)(n*pct/100)], NO interpolation (pct=100 → max).
    // Facade rewrites the reserved `percentile(` spelling here.
    "pinotpercentile" -> { case Seq(c, p) => pinotPct(c.cast(DoubleType), p) },
    // PERCENTILEEST: the real wire-format q-digest aggregate
    // (plans/QuantileDigestSketch) — on small data the trie stays
    // uncompressed and the answer IS the floor-index order statistic
    // (the upper-bound rank rule coincides with it); BYTES children
    // re-merge stored blobs under the same name, as in the reference
    "percentileest" -> { case Seq(c, p) =>
      graft.plans.QDigestSketch.percentileEst(c,
        ex(p).eval().toString.toDouble) },
    // native mergeable KLL (graft.plans.KllSketch): blob-compatible with
    // PERCENTILERAWKLL / KLLMERGEPERCENTILE re-aggregation
    "percentilekll" -> { case Seq(c, p) =>
      graft.plans.KllSketch.percentileKll(c, ex(p).eval().toString.toDouble) },
    "minmaxrangemv" -> { case Seq(a) => max(array_max(a)) - min(array_min(a)) },
    "distinctcountmv" -> { case Seq(a) =>
      size(array_distinct(flatten(collect_list(a)))) },
    // IDSET / IN_ID_SET (TransformFunctionType.java:177,
    // IdSetAggregationFunction.java): reference-WIRE-FORMAT id sets —
    // base64 of [type byte][RoaringBitmap | Roaring64NavigableMap |
    // guava BloomFilter] picked by id type, same libraries, same
    // layout (plans/IdSetSketch.scala). Second arg: either the
    // reference's 'sizeThresholdInBytes=..;expectedInsertions=..;fpp=..'
    // option string or a bare number (expectedInsertions).
    "idset" -> { case Seq(c) => graft.plans.IdSetSketch.idSet(c)
      case Seq(c, a) =>
        val s = ex(a).eval().toString
        if (s.contains("=")) {
          val kv = s.split(";").iterator.map(_.trim.split("=", 2))
            .collect { case Array(k, v) => (k.trim.toLowerCase, v.trim) }
            .toMap
          graft.plans.IdSetSketch.idSet(c,
            kv.get("sizethresholdinbytes").map(_.toInt)
              .getOrElse(graft.plans.IdSetSketch.DefaultSizeThresholdBytes),
            kv.get("expectedinsertions").map(_.toInt)
              .getOrElse(graft.plans.IdSetSketch.DefaultExpectedInsertions),
            kv.get("fpp").map(_.toDouble)
              .getOrElse(graft.plans.IdSetSketch.DefaultFpp))
        } else graft.plans.IdSetSketch.idSet(c,
          expectedInsertions = s.toDouble.toInt) },
    "inidset" -> { case Seq(c, blob) =>
      graft.plans.IdSetSketch.inIdSet(c, blob) },
    "distinctsum" -> { case Seq(c) => sum_distinct(c) },
    "distinctavg" -> { case Seq(c) => sum_distinct(c) / size(collect_set(c)) },
    "minmaxrange" -> { case Seq(c) => max(c) - min(c) },
    // PERCENTILETDIGEST: the real wire-format merging t-digest
    // (plans/TDigestSketch) — singleton centroids (small data)
    // reproduce the floor-index order statistic exactly, the behavior
    // the MSE golds exercise; BYTES children re-merge stored blobs
    // under the same name, as in the reference
    "percentiletdigest" -> {
      case Seq(c, p) => graft.plans.TDigestSketch.percentileTDigest(c,
        ex(p).eval().toString.toDouble)
      case Seq(c, p, comp) => graft.plans.TDigestSketch.percentileTDigest(c,
        ex(p).eval().toString.toDouble,
        ex(comp).eval().toString.toDouble) },
    "avgmv" -> { case Seq(a) => sum(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType))) / sum(size(a)) },
    "summv" -> { case Seq(a) => sum(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType))) },
    "countmv" -> { case Seq(a) => sum(size(a)) },
    "minmv" -> { case Seq(a) => min(array_min(a)) },
    "maxmv" -> { case Seq(a) => max(array_max(a)) },
    // MV sketch variants: the native HLL/KMV aggregates iterate array
    // elements when the child is ArrayType (HllAgg/DistinctCountKmv MV
    // path), so the MV names share one implementation
    "distinctcounthllmv" -> { case Seq(a) =>
      graft.plans.HllSketch.distinctCountHll(a) },
    "distinctcountrawhllmv" -> { case Seq(a) =>
      graft.plans.HllSketch.hllState(a) },
    // MV path: BitmapDistinctAgg iterates array elements
    "distinctcountbitmapmv" -> { case Seq(a) =>
      graft.plans.IdSetSketch.distinctCountBitmap(a) },
    // DISTINCTSUMMV / DISTINCTAVGMV: over the distinct ELEMENT set of
    // the whole group (reference DistinctSumMVAggregationFunction)
    "distinctsummv" -> { case Seq(a) =>
      aggregate(transform(array_distinct(flatten(collect_list(a))),
        x => x.cast(DoubleType)), lit(0.0), (acc, x) => acc + x) },
    "distinctavgmv" -> { case Seq(a) =>
      val distinctEls = array_distinct(flatten(collect_list(a)))
      aggregate(transform(distinctEls, x => x.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x) / size(distinctEls) },
    // SUMARRAYLONG / SUMARRAYDOUBLE: ELEMENTWISE sum of array rows
    // (reference SumArrayLongAggregationFunction) — fold of zip_with
    "sumarraylong" -> { case Seq(a) =>
      aggregate(collect_list(a.cast("array<long>")),
        array().cast("array<long>"),
        (acc, x) => when(size(acc) === 0, x)
          .otherwise(zip_with(acc, x, (p, q) => p + q))) },
    "sumarraydouble" -> { case Seq(a) =>
      aggregate(collect_list(a.cast("array<double>")),
        array().cast("array<double>"),
        (acc, x) => when(size(acc) === 0, x)
          .otherwise(zip_with(acc, x, (p, q) => p + q))) },
    // PERCENTILEMV family: EXACT interpolated percentile over all
    // elements of all arrays in the group (the reference's est/tdigest/
    // kll MV variants are approximations of exactly this value)
    "percentilemv" -> { case Seq(a, p) => percentileOverArray(a, p) },
    "percentileestmv" -> { case Seq(a, p) => percentileOverArray(a, p) },
    "percentiletdigestmv" -> { case Seq(a, p) => percentileOverArray(a, p) },
    "percentilekllmv" -> { case Seq(a, p) => percentileOverArray(a, p) },
    // typed aliases (reference keeps Int/Long/String-specialized names)
    "sumint" -> { case Seq(c) => sum(c.cast(LongType)) },
    "sumlong" -> { case Seq(c) => sum(c.cast(LongType)) },
    "minlong" -> { case Seq(c) => min(c.cast(LongType)) },
    "maxlong" -> { case Seq(c) => max(c.cast(LongType)) },
    "minstring" -> { case Seq(c) => min(c.cast(StringType)) },
    "maxstring" -> { case Seq(c) => max(c.cast(StringType)) },
    // theta / CPC families are registered expression-level by
    // graft.plans.ThetaSketchDs (DataSketches wire format); ULL is the
    // real hash4j-layout UltraLogLog (plans/UltraLogLog.scala; the
    // bare names here, RAW variants registered expression-level)
    "distinctcountull" -> { case Seq(c) =>
      graft.plans.UltraLogLogSketch.distinctCountUll(c) },
    "distinctcountsmartull" -> { case Seq(c) =>
      graft.plans.UltraLogLogSketch.distinctCountUll(c) },
    "distinctcountsmarthllplus" -> { case Seq(c) => approx_count_distinct(c) },
    // HLL++ family delegates to stream-lib HyperLogLogPlus — the exact
    // object the reference serializes (wire-compatible blobs; BYTES
    // input re-merges stored sketches). Defaults p=14, sp=0.
    "distinctcounthllplusmv" -> { case Seq(a) =>
      graft.plans.HllSketch.distinctCountHllPlus(a) },
    "distinctcountrawhllplus" -> {
      case Seq(c) => graft.plans.HllSketch.hllPlusState(c)
      case Seq(c, p) => graft.plans.HllSketch.hllPlusState(c,
        ex(p).eval().toString.toInt)
      case Seq(c, p, sp) => graft.plans.HllSketch.hllPlusState(c,
        ex(p).eval().toString.toInt, ex(sp).eval().toString.toInt) },
    "distinctcountrawhllplusmv" -> { case Seq(a) =>
      graft.plans.HllSketch.hllPlusState(a) },
    // OFFHEAP variant is an execution-memory detail in the reference;
    // the semantics are exact distinct count
    "distinctcountoffheap" -> { case Seq(c) => size(collect_set(c)) },
    "percentilesmarttdigest" -> { case Seq(c, p) =>
      percentile_approx(c, p / 100.0, lit(1000)) },
    "jsonextractscalarfast" -> {
      case Seq(c, path, typ) => jsonScalar(c, path, typ, lit(null))
      case Seq(c, path, typ, dflt) => jsonScalar(c, path, typ, dflt) },
    "monthofyear" -> { case Seq(c) => month(c) },
    // ANYVALUE: reference picks an arbitrary value; we pick min for
    // determinism (a valid "any")
    "anyvalue" -> { case Seq(c) => min(c) },
    // MODE(col[, 'reducer']) — reference ModeAggregationFunction returns
    // DOUBLE; multiple modes are reduced per MultiModeReducerType,
    // default MIN. Spark's deterministic mode IS the MIN reducer; MAX
    // maps to the reverse-ordered native Mode. AVG/SUM reducers are
    // intentionally unsupported (would need a dedicated count-map
    // buffer for a variant the reference itself flags as rarely used).
    // Registered under a non-colliding name (Spark's builtin `mode` is
    // long-typed and tie-arbitrary); QueryFacade rewrites MODE( → this.
    "pinotmode" -> { case Seq(c, rest @ _*) =>
      val d = c.cast(DoubleType)
      rest.headOption.map(e => ex(e).eval().toString.toUpperCase)
        .getOrElse("MIN") match {
        case "MIN" => mode(d, deterministic = true)
        case "MAX" => ColumnBridge.column(
          // reverseOpt polarity: Some(true) is the deterministic
          // lowest-tie mode (what mode(col, true) builds); Some(false)
          // keeps the natural key ordering in the tie maxBy → highest
          new org.apache.spark.sql.catalyst.expressions.aggregate.Mode(
            ex(d), 0, 0, Some(false)).toAggregateExpression())
        case r => throw new IllegalArgumentException(
          s"MODE reducer $r not supported (MIN/MAX only)")
      } },
    "exprmin" -> { case Seq(ret, ord) => min_by(ret, ord) },
    "exprmax" -> { case Seq(ret, ord) => max_by(ret, ord) },
    "firstwithtime" -> { case Seq(c, ts, _*) => min_by(c, ts) },
    "lastwithtime" -> { case Seq(c, ts, _*) => max_by(c, ts) },
    "booland" -> { case Seq(c) => bool_and(c) },
    "boolor" -> { case Seq(c) => bool_or(c) },
    // Calcite's internal sum-or-zero ($SUM0 — empty/all-null groups
    // yield 0, not null), surfaced in the reference's function enum;
    // coalesce's coercion picks the sum's own result type
    "$sum0" -> { case Seq(c) => coalesce(sum(c), lit(0L)) },
    // FOURTHMOMENT (reference PinotFourthMoment, the state behind
    // SKEWNESS/KURTOSIS): 4th central moment from raw-power averages —
    // E[x⁴] − 4μE[x³] + 6μ²E[x²] − 3μ⁴, all native codegen'd aggregates
    "fourthmoment" -> { case Seq(c) =>
      val x = c.cast(DoubleType)
      val m1 = avg(x); val e2 = avg(x * x)
      val e3 = avg(x * x * x); val e4 = avg(x * x * x * x)
      e4 - m1 * e3 * 4 + m1 * m1 * e2 * 6 - m1 * m1 * m1 * m1 * 3 },
    // SUM0 (Calcite $SUM0 surfaced in the reference enum): empty → 0
    "sum0" -> { case Seq(c) => coalesce(sum(c), lit(0).cast(DoubleType)) },
    // IS TRUE / IS FALSE family + IS [NOT] DISTINCT FROM
    // (TransformFunctionType IS_TRUE…IS_NOT_DISTINCT_FROM): null-safe
    "istrue" -> { case Seq(c) => c.cast(BooleanType) <=> lit(true) },
    "isnottrue" -> { case Seq(c) => !(c.cast(BooleanType) <=> lit(true)) },
    "isfalse" -> { case Seq(c) => c.cast(BooleanType) <=> lit(false) },
    "isnotfalse" -> { case Seq(c) => !(c.cast(BooleanType) <=> lit(false)) },
    "isdistinctfrom" -> { case Seq(a, b) => !(a <=> b) },
    "isnotdistinctfrom" -> { case Seq(a, b) => a <=> b },
    // STUNION (reference StUnionAggregationFunction): geometry union.
    // WKT-POINT subset — the union of a group's points is its distinct
    // point set, emitted as canonical sorted MULTIPOINT WKT
    "stunion" -> { case Seq(g) =>
      concat(lit("MULTIPOINT ("),
        array_join(array_sort(collect_set(
          regexp_replace(g, "^POINT \\(|\\)$", ""))), ", "),
        lit(")")) },
    // ARRAY_AGG(col[, 'dataType'][, isDistinct]) — the reference's
    // ArrayAggFunction; the type tag is a hint we don't need, the
    // trailing boolean switches to distinct accumulation
    // (ListAggDistinctFunction analog: first-occurrence order kept).
    // LISTAGG(col, separator) rides Spark's NATIVE listagg (the
    // registry can't shadow a builtin); the reference's 3-arg
    // isDistinct form and the MV-flatten branch
    // (ListAggFunction.java:68-74) are QueryFacade rewrites
    // (rewriteListAggMv).
    "arrayagg" -> { case Seq(c, rest @ _*) =>
      val distinct = rest.lastOption.map(ex).exists(e =>
        e.foldable && String.valueOf(e.eval()).equalsIgnoreCase("true"))
      if (distinct) array_distinct(collect_list(c)) else collect_list(c) },
    // HISTOGRAM — two modes per the reference HistogramAggregationFunction
    // avgReduce (InternalReduceFunctions.java:33-40): the multistage
    // reducer's final AVG step over (sum, count) partials — null when
    // the count is null or zero
    "avgreduce" -> { case Seq(s, n) =>
      when(n.isNull || n === 0 || s.isNull, lit(null))
        .otherwise(s.cast("double") / n) },
    // polymorphic arithmetic scalars
    // (common/function/scalar/arithmetic/{ModuloOrZero,PositiveModulo,
    // Negate}ScalarFunction.java): moduloOrZero turns a zero divisor
    // into 0 instead of erroring; positiveModulo shifts a negative
    // remainder into [0, |b|); negate is unary minus
    "moduloorzero" -> { case Seq(a, b) =>
      when(b === 0, lit(0)).otherwise(a % b) },
    "positivemodulo" -> { case Seq(a, b) =>
      val r = a % b
      when(r >= 0, r).otherwise(r + abs(b)) },
    "negate" -> { case Seq(a) => negate(a) },
    // (pinot-core/.../function/HistogramAggregationFunction.java:40-42):
    // HISTOGRAM(col, lower, upper, numBins) equal-width, or
    // HISTOGRAM(col, ARRAY[e0, e1, …]) explicit strictly-increasing bin
    // edges. Counts array out; values outside [e0, eN] are dropped. The
    // reference counts val == upper into the LAST bin via an explicit
    // branch, so the last bin is closed: [lo_i, hi_i] while the rest
    // are [lo_i, hi_i).
    "histogram" -> {
      case Seq(c, edgesC) =>
        val e = ex(edgesC)
        // the reference accepts ±Infinity edges spelled as strings
        // (`HistogramQueriesTest.java:141` ARRAY["-Infinity",1,…]);
        // Spark's array coercion wraps those literals in numeric casts
        // that fail eval — read the raw literal under the cast instead
        def rawLit(x: Expression): Any = x match {
          case org.apache.spark.sql.catalyst.expressions.Cast(in, _, _, _) =>
            rawLit(in)
          case other => other.eval()
        }
        val edges: Seq[Double] = e match {
          case ca: org.apache.spark.sql.catalyst.expressions.CreateArray =>
            ca.children.map(ch => rawLit(ch).toString.toDouble)
          case _ =>
            val et = e.dataType.asInstanceOf[ArrayType].elementType
            e.eval()
              .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toObjectArray(et).map(_.toString.toDouble).toSeq
        }
        require(edges.size > 1 && edges.sliding(2).forall(p => p(0) < p(1)),
          "histogram bin edges must be strictly increasing")
        histogramBins(c, edges)
      case Seq(c, lo, hi, bins) =>
        val l = ex(lo).eval().toString.toDouble
        val h = ex(hi).eval().toString.toDouble
        val n = ex(bins).eval().toString.toInt
        val width = (h - l) / n
        histogramBins(c, (0 until n).map(l + _ * width) :+ h)
    }
  )

  /** Per-bin conditional counts over the edge list; bins are
    * [e_i, e_{i+1}) except the last, which is closed. One scan, all
    * bins as parallel sum(when) aggregates — map-side partial agg
    * keeps this a single shuffle of numBins longs per group. */
  private def histogramBins(c: Column, edges: Seq[Double]): Column =
    array(edges.sliding(2).toSeq.zipWithIndex.map { case (Seq(a, b), i) =>
      val inBin =
        if (i == edges.length - 2) c >= a && c <= b
        else c >= a && c < b
      // ZERO counts on empty input, not SQL-null sums — the reference
      // initializes its bin array to zeros (HistogramQueriesTest :173
      // expects {0,…} for a no-match filter)
      coalesce(sum(when(inBin, 1L).otherwise(0L)), lit(0L))
    }: _*)

  /** Exact interpolated percentile (Pinot 0-100 scale) over every
    * element of every array in the group: sort the flattened elements,
    * linear-interpolate at rank (n−1)·p/100. */
  private def percentileOverArray(a: Column, p: Column): Column = {
    val s = array_sort(transform(flatten(collect_list(a)),
      x => x.cast(DoubleType)))
    val n = size(s)
    val idx = (n - 1).cast(DoubleType) * (p.cast(DoubleType) / 100.0)
    val lo = floor(idx).cast(IntegerType)
    val frac = idx - floor(idx)
    when(n === 0, lit(null).cast(DoubleType)).otherwise(
      get(s, lo) * (lit(1.0) - frac) +
        get(s, least(lo + 1, n - 1)) * frac)
  }

  private def bfAgg(c: Column, estItems: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    ColumnBridge.column(new BloomFilterAggregate(ex(xxhash64(c)),
      Literal(estItems), Literal(estItems * 8)).toAggregateExpression())
  }

  private def wktAny(wkt: Column): Column = {
    val e = ex(wkt)
    val isPoly = e.foldable &&
      Option(e.eval()).exists(_.toString.trim.toUpperCase.startsWith("POLYGON"))
    if (isPoly) GeoFunctions.wktPolygon(wkt) else wktPoint(wkt)
  }

  private def wktPoint(wkt: Column): Column = struct(
    regexp_extract(wkt, "POINT\\s*\\(\\s*(-?[0-9.]+)\\s+(-?[0-9.]+)\\s*\\)", 1)
      .cast(DoubleType).as("x"),
    regexp_extract(wkt, "POINT\\s*\\(\\s*(-?[0-9.]+)\\s+(-?[0-9.]+)\\s*\\)", 2)
      .cast(DoubleType).as("y"))

  private def jsonScalar(c: Column, path: Column, typ: Column, dflt: Column): Column =
    jsonCast(get_json_object(c, ex(path).eval().toString), typ, dflt)

  private def jsonCast(raw: Column, typ: Column, dflt: Column): Column = {
    val t = ex(typ).eval().toString.toUpperCase
    val target: DataType = t match {
      case "INT" => IntegerType
      case "LONG" => LongType
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case "BOOLEAN" => BooleanType
      case _ => StringType
    }
    // integral extraction NARROWS non-integral JSON numbers
    // (PinotDataType numeric coercion: "161.5" as INT is 161 —
    // JsonDataTypeQueriesTest.java:211); ANSI's direct string→int cast
    // rejects the decimal point. Integral-looking strings cast
    // directly (exact for 64-bit longs); anything else routes through
    // DOUBLE and truncates.
    val converted = target match {
      case IntegerType | LongType =>
        when(raw.rlike("^-?\\d+$"), raw.cast(target))
          .otherwise(raw.cast(DoubleType).cast(target))
      case _ => raw.cast(target)
    }
    coalesce(converted, dflt.cast(target))
  }

  /** Idempotently register the surface into the session.
    *
    * Never shadows an existing function: overriding a Spark builtin
    * (power, chr, percentile, …) would change its semantics session-wide
    * — and a self-referencing override (a builder whose Column body
    * parses back to the registered name) never resolves. Pinot names
    * that collide with differently-scaled builtins (PERCENTILE's 0-100
    * argument) are intentionally left to the Spark builtin; use
    * PERCENTILETDIGEST for the Pinot-scaled variant. */
  /** Sessions already carrying the full surface — registration walks
    * ~330 names through the registry, which costs real milliseconds
    * when repeated per query (the facade calls registerAll on every
    * `sql()`), so it short-circuits after the first pass. Weak keys:
    * sessions must stay collectable. */
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def registerAll(spark: SparkSession): Unit = {
    if (registered.put(spark, java.lang.Boolean.TRUE) != null) return
    val reg = spark.sessionState.functionRegistry
    registry.foreach { case (name, f) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name, fn(f), "built-in")
    }
    // Pinot semantics that must SHADOW same-named Spark builtins
    // (forced createOrReplace): initcap capitalizes after ANY
    // whitespace where Spark's only breaks on ' '
    // (StringFunctions.java:82-104); soundex('') is the SQL-standard
    // '0000' fallback where Spark returns '' (:929-937).
    // regexp_like gains the reference's 3-arg match-parameter form
    // (RegexpPatternConverterUtils.isCaseInsensitive; exercised by
    // IFSTBasedRegexpLikeQueriesTest) — Spark's builtin is 2-arg only
    reg.createOrReplaceTempFunction("regexp_like",
      fn({
        // non-literal patterns keep the builtin's per-row RLike
        case Seq(s, p) => ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.RLike(ex(s), ex(p)))
        case Seq(s, p, flags) =>
          val mp = ex(flags).eval().toString
          if (mp.length != 1) throw new IllegalArgumentException(
            s"Match parameter must be exactly one character: '$mp'")
          val pat = mp match {
            case "i" | "I" => concat(lit("(?i)"), p)
            case "c" | "C" => p
            case other => throw new IllegalArgumentException(
              s"Unsupported match parameter: '$other'")
          }
          ColumnBridge.column(
            org.apache.spark.sql.catalyst.expressions.RLike(ex(s), ex(pat)))
      }), "built-in")
    reg.createOrReplaceTempFunction("initcap",
      fn({ case Seq(s) =>
        CompatAliases.jvmCall("initcap", StringType, s) }), "built-in")
    reg.createOrReplaceTempFunction("soundex",
      fn({ case Seq(s) =>
        // direct SoundEx expression — functions.soundex resolves by
        // NAME and would loop back into this registration
        val sx = ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.SoundEx(ex(s)))
        when(s === "", lit("0000")).otherwise(sx) }), "built-in")
    // bare AggregateFunction (not pre-wrapped in AggregateExpression):
    // ResolveFunctions then supports FILTER (WHERE ...) / DISTINCT on
    // it. Delegates to stream-lib HyperLogLogPlus (reference wire
    // format, reference estimator); optional args (p[, sp]).
    reg.createOrReplaceTempFunction("distinctcounthllplus",
      (e: Seq[Expression]) => graft.plans.HllPlusAgg(e.head,
        if (e.size > 1) e(1).eval().toString.toInt else 14,
        if (e.size > 2) e(2).eval().toString.toInt else 0,
        emitBlob = false),
      "built-in")
    ScalarTail.registerAll(spark)
    CompatAliases.registerAll(spark)
    graft.plans.VectorExpressions.registerAll(spark)
    graft.plans.KmvSketch.registerAll(spark)
    graft.plans.ThetaSketchDs.registerAll(spark)
    graft.plans.FrequentItems.registerAll(spark)
    graft.plans.HllSketch.registerAll(spark)
    graft.plans.KllSketch.registerAll(spark)
    graft.plans.TDigestSketch.registerAll(spark)
    graft.plans.QDigestSketch.registerAll(spark)
    graft.plans.UltraLogLogSketch.registerAll(spark)
    graft.plans.TupleSketch.registerAll(spark)
    graft.plans.SketchScalars.registerAll(spark)
    graft.plans.FunnelAgg.registerAll(spark)
    ClpFunctions.registerAll(spark)
  }
}
