package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The long tail of the reference's scalar surface
  * (`pinot-common/.../function/scalar/` `@ScalarFunction`
  * registrations): typed array variants, the to/fromEpoch bucket
  * families, MV (`…MV`) element-wise variants, URL cut/extract helpers,
  * and datetime/string/math leftovers.
  *
  * Everything here is a composition of native Catalyst expressions —
  * typed variants (`arrayConcatInt`/`…Long`/`…String`, …) collapse onto
  * one generic Spark expression because Spark's array ops are already
  * type-parametric; MV variants are `transform(arr, elem => f(elem))`
  * which stays codegen'd. Null semantics follow the reference's
  * null-handling-enabled mode (null in → null out) rather than the
  * placeholder substitution of legacy mode
  * (`NullValuePlaceHolder.java`).
  */
object ScalarTail {

  private def ex(c: Column): Expression = ColumnBridge.expression(c)
  private def str(c: Column): String = ex(c).eval().toString

  // ——— element-wise bases reused by the `…MV` generators ———

  // epochNumeric first: the reference's DateTimeFunctions accept both
  // epoch-millis numerics AND TIMESTAMP values (whose physical type IS
  // millis) — a bare cast(ts AS LONG) would read Spark's SECONDS scale
  private def tsOf(ms: Column): Column =
    timestamp_millis(graft.plans.ScalarExprs.epochNumeric(ms).cast(LongType))

  /** Pinot dayOfWeek is ISO (1=Mon..7=Sun, Joda getDayOfWeek);
    * Spark dayofweek is 1=Sun..7=Sat. */
  private def isoDow(ms: Column): Column =
    ((dayofweek(tsOf(ms)) + 5) % 7) + 1

  private val unitMs: Map[String, Long] = Map(
    "DAYS" -> 86400000L, "HOURS" -> 3600000L,
    "MINUTES" -> 60000L, "SECONDS" -> 1000L)

  /** `timestampAdd(unit, interval, millis)` over UTC chronology
    * (`DateTimeFunctions.java:1126`): calendar-aware for
    * YEAR/QUARTER/MONTH, plain arithmetic for fixed-size units. */
  private def tsAdd(unit: String, interval: Column, ms: Column): Column =
    unit.toUpperCase.stripSuffix("S") match {
      case "YEAR" => unix_millis(tsOf(ms) +
        make_interval(lit(0), (interval * 12).cast(IntegerType)))
      case "QUARTER" => unix_millis(tsOf(ms) +
        make_interval(lit(0), (interval * 3).cast(IntegerType)))
      case "MONTH" => unix_millis(tsOf(ms) +
        make_interval(lit(0), interval.cast(IntegerType)))
      case "WEEK" => ms.cast(LongType) + interval * 604800000L
      case "DAY" => ms.cast(LongType) + interval * 86400000L
      case "HOUR" => ms.cast(LongType) + interval * 3600000L
      case "MINUTE" => ms.cast(LongType) + interval * 60000L
      case "SECOND" => ms.cast(LongType) + interval * 1000L
      case _ => ms.cast(LongType) + interval
    }

  /** `timestampDiff(unit, ts1, ts2)` = ts2 − ts1 in whole units
    * (Joda field getDifferenceAsLong: truncation toward zero). */
  private def tsDiff(unit: String, t1: Column, t2: Column): Column = {
    val d = t2.cast(LongType) - t1.cast(LongType)
    def trunc(den: Long): Column = ((d - d % den) / den).cast(LongType)
    unit.toUpperCase.stripSuffix("S") match {
      case "YEAR" =>
        val m = months_between(tsOf(t2), tsOf(t1))
        ((m - m % 12.0) / 12.0).cast(LongType)
      case "MONTH" =>
        // months_between is fractional; Joda counts whole months
        floor(abs(months_between(tsOf(t2), tsOf(t1)))).cast(LongType) *
          when(months_between(tsOf(t2), tsOf(t1)) < 0, -1L).otherwise(1L)
      case "WEEK" => trunc(604800000L)
      case "DAY" => trunc(86400000L)
      case "HOUR" => trunc(3600000L)
      case "MINUTE" => trunc(60000L)
      case "SECOND" => trunc(1000L)
      case _ => d
    }
  }

  /** Timezone offset millis of `tz` at instant `ms` —
    * `DateTimeZone.forID(tz).getOffset(ms)` re-expressed with Spark's
    * own tz database: from_utc_timestamp shifts by +offset. */
  private def tzOffsetMs(ms: Column, tz: String): Column =
    unix_millis(from_utc_timestamp(tsOf(ms), tz)) - ms.cast(LongType)

  // ——— the registry ———

  /** Generic impls keyed by every typed/MV alias the reference
    * registers. Suffix conventions: Int/Long/Float/Double/String typed
    * copies share one untyped Spark expression. */
  val registry: Map[String, Seq[Column] => Column] = {

    val b = Map.newBuilder[String, Seq[Column] => Column]

    // —— typed array family (scalar/ArrayFunctions.java) ——
    for (t <- Seq("int", "long", "float", "double", "string")) {
      b += s"arrayconcat$t" -> { case cs => concat(cs: _*) }
      // 1-based index; out-of-range → null (reference: placeholder)
      b += s"arrayelementat$t" -> { case Seq(a, i) =>
        get(a, i.cast(IntegerType) - 1) }
      b += s"arraypushback$t" -> { case Seq(a, v) => concat(a, array(v)) }
      b += s"arraypushfront$t" -> { case Seq(a, v) => concat(array(v), a) }
      // ArrayUtils.indexesOf: every 0-based position holding the value
      b += s"arrayindexesof$t" -> { case Seq(a, v) =>
        filter(transform(a, (x, i) => when(x === v, i).otherwise(-1)),
          x => x >= 0) }
    }
    for (t <- Seq("int", "long", "string")) {
      // Arrays.copyOfRange(start, end): 0-based, end-exclusive
      b += s"arrayslice$t" -> { case Seq(a, s, e) =>
        slice(a, s.cast(IntegerType) + 1,
          (e - s).cast(IntegerType)) }
    }
    for (t <- Seq("int", "string")) {
      b += s"arraycontains$t" -> { case Seq(a, v) => array_contains(a, v) }
      b += s"arraydistinct$t" -> { case Seq(a) => array_distinct(a) }
      // ArrayUtils.indexOf: 0-based, −1 when absent
      b += s"arrayindexof$t" -> { case Seq(a, v) =>
        (coalesce(array_position(a, v), lit(0L)) - 1).cast(IntegerType) }
      b += s"arrayremove$t" -> { case Seq(a, v) => array_remove(a, v) }
      b += s"arrayreverse$t" -> { case Seq(a) => reverse(a) }
      b += s"arraysort$t" -> { case Seq(a) => array_sort(a) }
      b += s"arrayunion$t" -> { case Seq(a, x) => array_union(a, x) }
    }
    b += "arraytostring" -> {
      case Seq(a, d) => array_join(a, str(d))
      case Seq(a, d, n) => array_join(a, str(d), str(n)) }
    // sorted-index-array intersection (ArrayFunctions.java:108)
    b += "intersectindices" -> { case Seq(a, x) => array_intersect(a, x) }
    b += "arrayvalueconstructor" -> { case cs => array(cs: _*) }
    // generate*Array(start, end, inc): (end−start)/inc + 1 values
    b += "generateintarray" -> { case Seq(s, e, i) =>
      sequence(s.cast(IntegerType), e.cast(IntegerType), i.cast(IntegerType)) }
    b += "generatelongarray" -> { case Seq(s, e, i) =>
      sequence(s.cast(LongType), e.cast(LongType), i.cast(LongType)) }
    for (t <- Seq("float" -> FloatType, "double" -> DoubleType)) {
      b += s"generate${t._1}array" -> { case Seq(s, e, i) =>
        transform(
          sequence(lit(0L),
            ((e - s) / i).cast(LongType)),
          k => (s + k * i).cast(t._2)) }
    }

    // —— to/fromEpoch bucket families (scalar/DateTimeFunctions.java) ——
    for ((u, sz) <- unitMs) {
      val n = u.toLowerCase.stripSuffix("s")
      def div(c: Column): Column = (c.cast(LongType) / sz).cast(LongType)
      b += s"toepoch${n}s" -> { case Seq(c) => div(c) }
      b += s"toepoch${n}srounded" -> { case Seq(c, k) =>
        (div(c) / k.cast(LongType)).cast(LongType) * k.cast(LongType) }
      b += s"toepoch${n}sbucket" -> { case Seq(c, k) =>
        (div(c) / k.cast(LongType)).cast(LongType) }
      b += s"fromepoch${n}s" -> { case Seq(c) => c.cast(LongType) * sz }
      b += s"fromepoch${n}sbucket" -> { case Seq(c, k) =>
        c.cast(LongType) * k.cast(LongType) * sz }
    }

    // —— datetime leftovers ——
    b += "ago" -> { case Seq(p) =>
      unix_millis(current_timestamp()) -
        java.time.Duration.parse(str(p)).toMillis }
    b += "toiso8601" -> { case Seq(ms) =>
      date_format(tsOf(ms), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'") }
    b += "fromiso8601" -> { case Seq(s) =>
      unix_millis(to_timestamp(regexp_replace(s, "Z$", ""),
        "yyyy-MM-dd'T'HH:mm:ss[.SSS]")) }
    b += "totimestamp" -> { case Seq(ms) => tsOf(ms) }
    b += "fromtimestamp" -> { case Seq(ts) =>
      unix_millis(ts.cast(TimestampType)) }
    b += "week" -> { case Seq(ms, _*) => weekofyear(tsOf(ms)) }
    b += "yearofweek" -> { case Seq(ms, _*) =>
      extract(lit("YEAROFWEEK"), tsOf(ms)).cast(IntegerType) }
    b += "yow" -> { case Seq(ms, _*) =>
      extract(lit("YEAROFWEEK"), tsOf(ms)).cast(IntegerType) }
    b += "dow" -> { case Seq(ms, _*) => isoDow(ms) }
    b += "doy" -> { case Seq(ms, _*) => dayofyear(tsOf(ms)) }
    b += "datebin" -> { case Seq(w, src, origin) =>
      val widthMs = java.time.Duration.parse(str(w)).toMillis
      val off = src.cast(LongType) - origin.cast(LongType)
      origin.cast(LongType) + ((off - off % widthMs) / widthMs)
        .cast(LongType) * widthMs }
    // dateAdd/timestampAdd/dateDiff/timestampDiff are reserved at the
    // Spark-grammar level; QueryFacade.rewriteReserved maps the Pinot
    // quoted-unit spelling onto these epoch-millis variants
    b += "dateaddepoch" -> { case Seq(u, i, ts) =>
      tsAdd(str(u), i.cast(LongType), ts) }
    b += "datediffepoch" -> { case Seq(u, a, x) => tsDiff(str(u), a, x) }
    // directly-callable registrations of the same epoch variants (the
    // SQL grammar intercepts the bare names only when the unit is an
    // unquoted identifier; call_function/DataFrame callers land here)
    b += "timestampadd" -> { case Seq(u, i, ts) =>
      tsAdd(str(u), i.cast(LongType), ts) }
    b += "timestampdiff" -> { case Seq(u, a, x) => tsDiff(str(u), a, x) }
    b += "timezonehour" -> {
      case Seq(tz) =>
        (tzOffsetMs(lit(0L), str(tz)) / 3600000L).cast(IntegerType)
      case Seq(tz, ms) =>
        (tzOffsetMs(ms, str(tz)) / 3600000L).cast(IntegerType) }
    b += "timezoneminute" -> {
      case Seq(tz) =>
        ((tzOffsetMs(lit(0L), str(tz)) / 60000L) % 60).cast(IntegerType)
      case Seq(tz, ms) =>
        ((tzOffsetMs(ms, str(tz)) / 60000L) % 60).cast(IntegerType) }

    // —— MV (multi-value) element-wise variants ——
    val mvBases: Map[String, Column => Column] = Map(
      "year" -> (ms => year(tsOf(ms))),
      "month" -> (ms => month(tsOf(ms))),
      "monthofyear" -> (ms => month(tsOf(ms))),
      "quarter" -> (ms => quarter(tsOf(ms))),
      "week" -> (ms => weekofyear(tsOf(ms))),
      "weekofyear" -> (ms => weekofyear(tsOf(ms))),
      "day" -> (ms => dayofmonth(tsOf(ms))),
      "dayofmonth" -> (ms => dayofmonth(tsOf(ms))),
      "dayofweek" -> isoDow,
      "dow" -> isoDow,
      "dayofyear" -> (ms => dayofyear(tsOf(ms))),
      "doy" -> (ms => dayofyear(tsOf(ms))),
      "yearofweek" -> (ms =>
        extract(lit("YEAROFWEEK"), tsOf(ms)).cast(IntegerType)),
      "yow" -> (ms =>
        extract(lit("YEAROFWEEK"), tsOf(ms)).cast(IntegerType)),
      "hour" -> (ms => hour(tsOf(ms))),
      "minute" -> (ms => minute(tsOf(ms))),
      "second" -> (ms => second(tsOf(ms))),
      "millisecond" -> (ms => pmod(ms.cast(LongType), lit(1000L))
        .cast(IntegerType)),
      "toiso8601" -> (ms =>
        date_format(tsOf(ms), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
      "totimestamp" -> (ms => tsOf(ms)),
      "fromtimestamp" -> (ts => unix_millis(ts.cast(TimestampType))))
    for ((name, f) <- mvBases)
      b += s"${name}mv" -> { case Seq(a, _*) => transform(a, f) }
    for ((u, sz) <- unitMs) {
      val n = u.toLowerCase.stripSuffix("s")
      b += s"toepoch${n}smv" -> { case Seq(a) =>
        transform(a, c => (c.cast(LongType) / sz).cast(LongType)) }
      b += s"toepoch${n}sroundedmv" -> { case Seq(a, k) =>
        transform(a, c => ((c.cast(LongType) / sz).cast(LongType) /
          k.cast(LongType)).cast(LongType) * k.cast(LongType)) }
      b += s"toepoch${n}sbucketmv" -> { case Seq(a, k) =>
        transform(a, c => ((c.cast(LongType) / sz).cast(LongType) /
          k.cast(LongType)).cast(LongType)) }
      b += s"fromepoch${n}smv" -> { case Seq(a) =>
        transform(a, c => c.cast(LongType) * sz) }
      b += s"fromepoch${n}sbucketmv" -> { case Seq(a, k) =>
        transform(a, c => c.cast(LongType) * k.cast(LongType) * sz) }
    }
    b += "timestampaddmv" -> { case Seq(u, i, a) =>
      transform(a, ts => tsAdd(str(u), i.cast(LongType), ts)) }
    b += "dateaddmv" -> { case Seq(u, i, a) =>
      transform(a, ts => tsAdd(str(u), i.cast(LongType), ts)) }
    b += "timestampdiffmv" -> { case Seq(u, a, t2) =>
      transform(a, t1 => tsDiff(str(u), t1, t2)) }
    b += "datediffmv" -> { case Seq(u, a, t2) =>
      transform(a, t1 => tsDiff(str(u), t1, t2)) }
    b += "timestampdiffmvreverse" -> { case Seq(u, t1, a) =>
      transform(a, t2 => tsDiff(str(u), t1, t2)) }
    b += "datediffmvreverse" -> { case Seq(u, t1, a) =>
      transform(a, t2 => tsDiff(str(u), t1, t2)) }
    b += "roundmv" -> { case Seq(a, k) =>
      transform(a, c => (c.cast(LongType) / k.cast(LongType))
        .cast(LongType) * k.cast(LongType)) }

    // —— URL cut/extract family (scalar/UrlFunctions.java) ——
    // regex re-expressions of the reference's java.net.URI splitting;
    // well-formed absolute URLs round-trip identically
    b += "cutfragment" -> { case Seq(u) =>
      regexp_replace(u, "#.*$", "") }
    b += "cutquerystring" -> { case Seq(u) =>
      regexp_replace(u, "\\?[^#]*", "") }
    b += "cutquerystringandfragment" -> { case Seq(u) =>
      regexp_replace(u, "[?#].*$", "") }
    b += "cutwww" -> { case Seq(u) =>
      regexp_replace(u, "^(\\w+://)www\\.", "$1") }
    b += "urlpathwithquery" -> { case Seq(u) =>
      // reference (UrlFunctions.java:228) returns getRawPath() — the
      // path only, despite the name
      nullIfEmpty(regexp_extract(u, "^\\w+://[^/?#]+(/[^?#]*)", 1)) }
    b += "urlquerystringandfragment" -> { case Seq(u) =>
      // reference (UrlFunctions.java:284-310): query and fragment are
      // STRIPPED of their '?' / '#' markers and joined with '#' — a
      // lone fragment comes back bare, both-absent is null
      val q = when(u.rlike("\\?"), regexp_extract(u, "\\?([^#]*)", 1))
      val f = when(u.rlike("#"), regexp_extract(u, "#(.*)$", 1))
      when(q.isNotNull && f.isNotNull, concat(q, lit("#"), f))
        .when(q.isNotNull, q)
        .otherwise(f) }
    b += "urlfirstsignificantsubdomain" -> { case Seq(u) =>
      firstSignificantSubdomain(u, withTld = false) }
    b += "cuttofirstsignificantsubdomain" -> { case Seq(u) =>
      firstSignificantSubdomain(u, withTld = true) }
    // keeps a "www." immediately preceding the significant part
    // (UrlFunctions.cutToFirstSignificantSubdomainWithWWW)
    b += "cuttofirstsignificantsubdomainwithwww" -> { case Seq(u) =>
      val host = regexp_extract(u, "^\\w+://(?:[^@/]*@)?([^:/?#]+)", 1)
      val fss = firstSignificantSubdomain(u, withTld = true)
      when(host === concat(lit("www."), fss), host).otherwise(fss) }
    b += "urlhierarchy" -> { case Seq(u) =>
      val base = regexp_extract(u, "^(\\w+://[^/?#]+)", 1)
      val path = regexp_extract(u, "^\\w+://[^/?#]+(/[^?#]*)?", 1)
      val parts = filter(split(path, "/"), p => p =!= "")
      when(base === "", array().cast(ArrayType(StringType)))
        .otherwise(concat(array(base),
          transform(parts, (_, i) =>
            concat(base, lit("/"),
              array_join(slice(parts, lit(1), i.cast(IntegerType) + 1), "/"))))) }
    b += "urlpathhierarchy" -> { case Seq(u) =>
      val path = regexp_extract(u, "^\\w+://[^/?#]+(/[^?#]*)?", 1)
      val parts = filter(split(path, "/"), p => p =!= "")
      transform(parts, (_, i) =>
        concat(lit("/"),
          array_join(slice(parts, lit(1), i.cast(IntegerType) + 1), "/"))) }
    b += "cuturlparameter" -> { case Seq(u, name) =>
      val n = str(name)
      regexp_replace(
        regexp_replace(u, s"([?&])${java.util.regex.Pattern.quote(n)}=[^&#]*&", "$1"),
        s"[?&]${java.util.regex.Pattern.quote(n)}=[^&#]*", "") }
    // plural form over an array of names (UrlFunctions.java:677);
    // names are processed left-to-right like the reference's loop
    b += "cuturlparameters" -> { case Seq(u, names) =>
      val cutOne = (acc: Column, n: Column) => {
        // runtime regex assembly: literal-quote each name via \Q…\E
        val quoted = concat(lit("\\Q"), n, lit("\\E"))
        regexp_replace(
          regexp_replace(acc,
            concat(lit("([?&])"), quoted, lit("=[^&#]*&")), lit("$1")),
          concat(lit("[?&]"), quoted, lit("=[^&#]*")), lit(""))
      }
      aggregate(names, u, cutOne) }
    b += "extracturlparameters" -> { case Seq(u) =>
      filter(split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
        p => p =!= "") }
    b += "extracturlparameternames" -> { case Seq(u) =>
      transform(
        filter(split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
          p => p =!= ""),
        p => regexp_extract(p, "^([^=]*)", 1)) }
    b += "urlencodeformcomponent" -> { case Seq(u) => url_encode(u) }
    b += "urldecodeformcomponent" -> { case Seq(u) => url_decode(u) }

    // —— string leftovers (scalar/StringFunctions.java) ——
    b += "leftsubstr" -> { case Seq(s, n) =>
      s.substr(lit(1), n.cast(IntegerType)) }
    b += "rightsubstr" -> { case Seq(s, n) =>
      s.substr(greatest(length(s) - n.cast(IntegerType) + 1, lit(1)),
        n.cast(IntegerType)) }
    b += "strcmp" -> { case Seq(a, x) =>
      when(a < x, -1).when(a > x, 1).otherwise(0) }
    b += "isvalidascii" -> { case Seq(s) => !s.rlike("[^\\x00-\\x7F]") }
    b += "charlength" -> { case Seq(s) => length(s) }
    b += "characterlength" -> { case Seq(s) => length(s) }
    b += "toutf8" -> { case Seq(s) => encode(s, "UTF-8") }
    b += "fromutf8" -> { case Seq(x) => decode(x, "UTF-8") }
    // Pinot's BETWEEN scalar (ObjectFunctions.between) — the operator
    // spelled as a function; three-valued like the operator (a NULL
    // bound answers NULL, NullHandlingEnabledQueriesTest:1446)
    b += "between" -> { case Seq(c, lo, hi) => c >= lo && c <= hi }
    b += "startswithcaseinsensitive" -> { case Seq(s, p) =>
      lower(s).startsWith(lower(p)) }
    b += "endswithcaseinsensitive" -> { case Seq(s, p) =>
      lower(s).endsWith(lower(p)) }
    // prefixes/suffixes (StringFunctions.java:440-496): reference
    // 2-arg forms take a max length; suffixes run SHORTEST-first
    // ("abcde" → e, de, cde); empty input / non-positive length → [].
    // idxSeq guards sequence()'s descending-range behavior when n < 1.
    def idxSeq(n: Column): Column =
      when(n >= 1, sequence(lit(1), n.cast(IntegerType)))
        .otherwise(lit(Array.emptyIntArray))
    def prefixArr(s: Column, m: Column): Column =
      transform(idxSeq(least(length(s), m.cast(IntegerType))),
        i => s.substr(lit(1), i))
    def suffixArr(s: Column, m: Column): Column =
      transform(idxSeq(least(length(s), m.cast(IntegerType))),
        i => s.substr(length(s) - i + 1, i))
    b += "prefixes" -> {
      case Seq(s) => prefixArr(s, length(s))
      case Seq(s, m) => prefixArr(s, m) }
    b += "suffixes" -> {
      case Seq(s) => suffixArr(s, length(s))
      case Seq(s, m) => suffixArr(s, m) }
    b += "prefixeswithprefix" -> {
      case Seq(s, p) => transform(prefixArr(s, length(s)), x => concat(p, x))
      case Seq(s, m, p) => transform(prefixArr(s, m), x => concat(p, x)) }
    b += "suffixeswithsuffix" -> {
      case Seq(s, p) => transform(suffixArr(s, length(s)), x => concat(x, p))
      case Seq(s, m, p) => transform(suffixArr(s, m), x => concat(x, p)) }
    // SQL DIFFERENCE: matching positions of the two 4-char soundex codes
    b += "difference" -> { case Seq(a, x) =>
      val sa = soundex(a); val sx = soundex(x)
      size(filter(sequence(lit(1), lit(4)),
        i => sa.substr(i, lit(1)) === sx.substr(i, lit(1)))) }

    // —— math leftovers (ArithmeticFunctions.java) ——
    b += "exp2" -> { case Seq(x) => pow(lit(2.0), x) }
    b += "exp10" -> { case Seq(x) => pow(lit(10.0), x) }
    b += "euler" -> { case Seq() => lit(math.E) }
    b += "sigmoid" -> { case Seq(x) =>
      lit(1.0) / (lit(1.0) + exp(-x.cast(DoubleType))) }
    b += "intdivorzero" -> { case Seq(a, d) =>
      when(d === 0, 0L).otherwise(
        ((a.cast(LongType) - a.cast(LongType) % d.cast(LongType)) /
          d.cast(LongType)).cast(LongType)) }
    b += "isfinite" -> { case Seq(x) =>
      !isnan(x.cast(DoubleType)) &&
        abs(x.cast(DoubleType)) =!= lit(Double.PositiveInfinity) }
    b += "isinfinite" -> { case Seq(x) =>
      abs(x.cast(DoubleType)) === lit(Double.PositiveInfinity) }
    b += "ifnotfinite" -> { case Seq(x, d) =>
      when(isnan(x.cast(DoubleType)) ||
        abs(x.cast(DoubleType)) === lit(Double.PositiveInfinity), d)
        .otherwise(x) }
    b += "byteswapint" -> { case Seq(x) =>
      val v = x.cast(IntegerType)
      (shiftleft(v, 24)
        .bitwiseOR(shiftleft(v.bitwiseAND(lit(0xff00)), 8))
        .bitwiseOR(shiftrightunsigned(v, 8).bitwiseAND(lit(0xff00)))
        .bitwiseOR(shiftrightunsigned(v, 24))).cast(IntegerType) }
    b += "byteswaplong" -> { case Seq(x) =>
      val v = x.cast(LongType)
      (0 until 8).map { i =>
        shiftrightunsigned(v, i * 8).bitwiseAND(lit(0xffL))
          .cast(LongType) * lit(1L << ((7 - i) * 8))
      }.reduce(_ + _) }
    // the reference accepts an optional 0x/0X prefix
    // (DataTypeConversionFunctions.java hexDecimalToLong golds);
    // Spark's conv() does not, so strip it first
    b += "hexdecimaltolong" -> { case Seq(s) =>
      conv(regexp_replace(s, "^0[xX]", ""), 16, 10).cast(LongType) }
    b += "longtohexdecimal" -> { case Seq(x) => lower(hex(x.cast(LongType))) }
    b += "sha224" -> { case Seq(x) => sha2(x, 224) }

    // —— hash family (scalar/HashFunctions.java:102-287) ——
    // native HashExpr (plans/HashExpr.scala) — static call inside
    // whole-stage codegen. The `…UTF8` variants encode first, as the
    // reference does input.getBytes(UTF_8). murmurHash3X64Bit* (the
    // Infinispan x64-adapted variant) is not carried — the standard
    // x86_32/x64_128 family is.
    def hx(algo: String, defSeed: Int = 0): Seq[Column] => Column = {
      case Seq(c) => graft.plans.HashExpr(c, algo, defSeed)
      case Seq(c, s) =>
        graft.plans.HashExpr(c, algo, str(s).toDouble.toInt)
    }
    def hxU(algo: String, defSeed: Int = 0): Seq[Column] => Column = {
      case Seq(c) =>
        graft.plans.HashExpr(encode(c, "UTF-8"), algo, defSeed)
      case Seq(c, s) =>
        graft.plans.HashExpr(encode(c, "UTF-8"), algo, str(s).toDouble.toInt)
    }
    b += "murmurhash2" -> hx("murmur2")
    b += "murmurhash2utf8" -> hxU("murmur2")
    b += "murmurhash2bit64" -> hx("murmur2_64", 0xe17a1465)
    b += "murmurhash3bit32" -> hx("murmur3_32")
    b += "murmurhash3bit64" -> hx("murmur3_64")
    b += "murmurhash3bit128" -> hx("murmur3_128")
    b += "fnv1hash32" -> hx("fnv1_32")
    b += "fnv1hash32utf8" -> hxU("fnv1_32")
    b += "fnv1ahash32" -> hx("fnv1a_32")
    b += "fnv1ahash32utf8" -> hxU("fnv1a_32")
    b += "fnv1hash64" -> hx("fnv1_64")
    b += "fnv1hash64utf8" -> hxU("fnv1_64")
    b += "fnv1ahash64" -> hx("fnv1a_64")
    b += "fnv1ahash64utf8" -> hxU("fnv1a_64")
    b += "adler32" -> hx("adler32")
    b += "crc32c" -> hx("crc32c")
    b += "md2" -> hx("md2")

    // —— JSON path family (scalar/JsonFunctions.java) ——
    def jp(c: Column, p: Column): Column = get_json_object(c, str(p))
    // ANSI-safe numeric view of an extracted json value: non-numeric
    // text is a miss (the reference falls back to the default), never
    // a query-killing cast error
    val jsonNumShape = "^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"
    def jpNum(c: Column, p: Column): Column = {
      val v = jp(c, p)
      when(v.rlike(jsonNumShape), v.cast(DoubleType))
    }
    b += "jsonpathstring" -> {
      case Seq(c, p) => jp(c, p)
      case Seq(c, p, d) => coalesce(jp(c, p), d) }
    // the no-default numeric variants return the reference's TYPE
    // defaults on a miss — Long.MIN_VALUE / NaN, not SQL NULL
    // (JsonFunctionsTest.java:92-98)
    b += "jsonpathlong" -> {
      case Seq(c, p) =>
        coalesce(jpNum(c, p).cast(LongType), lit(Long.MinValue))
      case Seq(c, p, d) => coalesce(jpNum(c, p).cast(LongType),
        d.cast(LongType)) }
    b += "jsonpathdouble" -> {
      case Seq(c, p) => coalesce(jpNum(c, p), lit(Double.NaN))
      case Seq(c, p, d) => coalesce(jpNum(c, p),
        d.cast(DoubleType)) }
    for (sfx <- Seq("fast", "firstmatch")) {
      b += s"jsonpathstring$sfx" -> { case Seq(c, p, _*) => jp(c, p) }
      b += s"jsonpathlong$sfx" -> { case Seq(c, p, _*) =>
        jpNum(c, p).cast(LongType) }
      b += s"jsonpathdouble$sfx" -> { case Seq(c, p, _*) =>
        jpNum(c, p) }
    }
    b += "jsonpath" -> { case Seq(c, p) => jp(c, p) }
    b += "jsonpathexists" -> { case Seq(c, p) => jp(c, p).isNotNull }
    b += "jsonpatharray" -> { case Seq(c, p) =>
      from_json(jp(c, p), ArrayType(StringType)) }
    b += "jsonpatharraydefaultempty" -> { case Seq(c, p) =>
      coalesce(from_json(jp(c, p), ArrayType(StringType)),
        array().cast(ArrayType(StringType))) }
    b += "jsonextractobject" -> { case Seq(c, p, _*) => jp(c, p) }
    b += "jsonstringtoarray" -> { case Seq(c) =>
      from_json(c, ArrayType(StringType)) }
    b += "jsonstringtomap" -> { case Seq(c) =>
      from_json(c, MapType(StringType, StringType)) }
    b += "tojsonmapstr" -> { case Seq(c) => to_json(c) }
    // strict Jackson parse (StringFunctions.java:920-927): trailing
    // commas false, ""→true — get_json_object's $-probe gets both wrong
    b += "isjson" -> { case Seq(c) =>
      CompatAliases.jvmCall("isJson", BooleanType, c) }

    // —— geohash (scalar/GeohashFunctions.java:121-146) ——
    b += "encodegeohash" -> { case Seq(lat, lon, p) =>
      graft.plans.ScalarExprs.encodeGeoHash(lat, lon, str(p).toDouble.toInt) }
    b += "decodegeohash" -> { case Seq(h) =>
      graft.plans.ScalarExprs.decodeGeoHash(h, "latlon") }
    for (n <- Seq("decodegeohashlat", "decodegeohashlatitude"))
      b += n -> { case Seq(h) =>
        graft.plans.ScalarExprs.decodeGeoHash(h, "lat") }
    for (n <- Seq("decodegeohashlon", "decodegeohashlongitude"))
      b += n -> { case Seq(h) =>
        graft.plans.ScalarExprs.decodeGeoHash(h, "lon") }

    // —— iterative math/string cores (plans/ScalarExprs.scala) ——
    b += "gcd" -> { case Seq(a, x) =>
      graft.plans.ScalarExprs.binaryAlgo(a, x, "gcd") }
    b += "lcm" -> { case Seq(a, x) =>
      graft.plans.ScalarExprs.binaryAlgo(a, x, "lcm") }
    b += "hammingdistance" -> { case Seq(a, x) =>
      graft.plans.ScalarExprs.binaryAlgo(a, x, "hamming") }
    b += "levenshteindistance" -> { case Seq(a, x) => levenshtein(a, x) }

    // —— conversion aliases (DataTypeConversionFunctions.java) ——
    b += "base64encode" -> { case Seq(x) => base64(x) }
    b += "base64decode" -> { case Seq(s) => unbase64(s) }
    b += "bytestohex" -> { case Seq(x) => lower(hex(x)) }
    b += "hextobytes" -> { case Seq(s) => unhex(s) }
    b += "tobytes" -> { case Seq(s) => encode(s, "UTF-8") }
    b += "frombytes" -> { case Seq(x) => decode(x, "UTF-8") }

    // —— vector/geo/string/json aliases onto existing impls ——
    b += "dotproduct" -> { case Seq(a, x) =>
      VectorFunctions.innerProduct(a, x) }
    b += "euclideandistance" -> { case Seq(a, x) =>
      graft.plans.VectorExpressions.l2Distance(a, x) }
    b += "stpolygon" -> { case Seq(wkt) => GeoFunctions.wktPolygon(wkt) }
    b += "remove" -> { case Seq(s, sub) =>
      replace(s, sub, lit("")) }
    b += "divide" -> {
      case Seq(a, x) => a.cast(DoubleType) / x.cast(DoubleType)
      case Seq(a, x, dflt) =>
        when(x.cast(DoubleType) === 0.0, dflt.cast(DoubleType))
          .otherwise(a.cast(DoubleType) / x.cast(DoubleType)) }
    b += "stringtoarray" -> {
      case Seq(s) => split(s, ";")
      case Seq(s, d) =>
        split(s, java.util.regex.Pattern.quote(str(d))) }
    b += "jsonkeyvaluearraytomap" -> { case Seq(c) =>
      map_from_entries(transform(
        from_json(c, ArrayType(MapType(StringType, StringType))),
        e => struct(element_at(e, "key"), element_at(e, "value")))) }
    b += "jsonstringtolistormap" -> { case Seq(c) =>
      // list-or-map duality collapses to string-keyed map when the
      // payload is an object, else the array form
      coalesce(to_json(from_json(c, MapType(StringType, StringType))),
        to_json(from_json(c, ArrayType(StringType)))) }

    // —— IP string helpers (IpAddressFunctions.java) ——
    b += "ipmasklen" -> { case Seq(cidr) =>
      regexp_extract(cidr, "/(\\d+)$", 1).cast(IntegerType) }
    // reference returns the int version number (IpAddressFunctions:254)
    b += "ipfamily" -> { case Seq(ip) =>
      when(ip.contains(":"), 6).otherwise(4) }
    // IPv4-mapped form in canonical RFC 5952 notation (::ffff:c0a8:101)
    b += "ipv4toipv6" -> { case Seq(ip) =>
      CompatAliases.ipCall("ipv4MappedV6", StringType, ip) }
    // RFC1918 + loopback + link-local v4; ::1 + fe80::/10 + fc00::/7 v6
    // (reference isPrivateIp, IpAddressFunctions.java:335)
    b += "isprivateip" -> { case Seq(ip) =>
      ip.rlike("^(10\\.|192\\.168\\.|172\\.(1[6-9]|2[0-9]|3[01])\\.|127\\.|169\\.254\\.)") ||
        lower(ip).rlike("^(f[cd]|fe[89ab])") || ip === "::1" }

    // —— remaining MV variants over existing bases ——
    b += "datetruncmv" -> { case Seq(u, a) =>
      transform(a, ts => date_trunc(str(u), ts)) }
    b += "todatetimemv" -> { case Seq(a, pat) =>
      transform(a, ms => date_format(tsOf(ms), str(pat))) }
    b += "fromdatetimemv" -> { case Seq(a, pat) =>
      transform(a, s => unix_millis(to_timestamp(s, str(pat)))) }
    b += "fromiso8601mv" -> { case Seq(a) =>
      transform(a, s => unix_millis(to_timestamp(
        regexp_replace(s, "Z$", ""), "yyyy-MM-dd'T'HH:mm:ss[.SSS]"))) }
    b += "timezonehourmv" -> { case Seq(tz, a) =>
      transform(a, ms =>
        (tzOffsetMs(ms, str(tz)) / 3600000L).cast(IntegerType)) }
    b += "timezoneminutemv" -> { case Seq(tz, a) =>
      transform(a, ms =>
        ((tzOffsetMs(ms, str(tz)) / 60000L) % 60).cast(IntegerType)) }

    // —— character n-grams (scalar/string/NgramFunctions.java:30-118) ——
    // unique n-grams of exactly length n, first-occurrence order (the
    // reference's LinkedOpenHashSet == array_distinct's order); empty
    // when n == 0 or n > length
    def ngramsExact(s: Column, n: Column): Column =
      when(n <= 0 || n > length(s), array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(1), length(s) - n + 1),
            i => s.substr(i, n))))
    // lengths within [minGram, maxGram], n == 0 skipped. The loop is
    // `for n = max(minGram,1) to min(maxGram, length)` and does NOT
    // run when the lower bound exceeds the string length
    // (NgramFunctions.java:51-62) — guarded explicitly because Spark's
    // sequence(a, b) DESCENDS when a > b instead of being empty.
    def ngramsRange(s: Column, lo: Column, hi: Column): Column =
      when(hi < lo || hi <= 0 || greatest(lo, lit(1)) > length(s),
        array().cast("array<string>"))
        .otherwise(array_distinct(flatten(
          transform(sequence(greatest(lo, lit(1)), least(hi, length(s))),
            n => transform(sequence(lit(1), length(s) - n + 1),
              i => s.substr(i, n))))))
    val ngramBuilder: Seq[Column] => Column = {
      case Seq(s, n) => ngramsExact(s, n.cast(IntegerType))
      case Seq(s, lo, hi) =>
        ngramsRange(s, lo.cast(IntegerType), hi.cast(IntegerType))
    }
    val ngramMvBuilder: Seq[Column] => Column = {
      case Seq(a, n) => array_distinct(flatten(
        transform(a, s => ngramsExact(s, n.cast(IntegerType)))))
      case Seq(a, lo, hi) => array_distinct(flatten(
        transform(a,
          s => ngramsRange(s, lo.cast(IntegerType), hi.cast(IntegerType)))))
    }
    Seq("uniquengrams", "generateuniquengrams")
      .foreach(n => b += n -> ngramBuilder)
    Seq("uniquengramsmv", "generateuniquengramsmv")
      .foreach(n => b += n -> ngramMvBuilder)

    // —— spelling aliases onto Spark builtins ——
    b += "concatws" -> { case cs => concat_ws(str(cs.head), cs.tail: _*) }
    b += "regexplike" -> {
      case Seq(s, p) => s.rlike(str(p))
      case Seq(s, p, flags) =>
        // match-parameter contract (RegexpPatternConverterUtils
        // .isCaseInsensitive): exactly one char, i/I insensitive,
        // c/C sensitive, anything else is an error; insensitivity via
        // the (?i) embedded flag — upper-casing the pattern would
        // corrupt escape classes (\d → \D)
        val mp = str(flags)
        if (mp.length != 1) throw new IllegalArgumentException(
          s"Match parameter must be exactly one character: '$mp'")
        mp match {
          case "i" | "I" => s.rlike("(?i)" + str(p))
          case "c" | "C" => s.rlike(str(p))
          case other => throw new IllegalArgumentException(
            s"Unsupported match parameter: '$other'")
        }
    }
    // non-literal (variable) pattern variant — Spark's regexp_replace
    // accepts column patterns natively
    b += "regexpreplacevar" -> {
      case Seq(s, p, r) => regexp_replace(s, p, r)
    }

    // —— engine introspection (scalar/InternalFunctions.java) —— the
    // reference returns broker/server identity for debugging; the Spark
    // equivalents are the application and query-session identities.
    b += "brokerid" -> { case _ => lit("spark-driver") }
    b += "queryengine" -> { case _ => lit("graft-spark") }
    b += "reqid" -> { case _ =>
      // deterministic within a query, unique across queries — the role
      // the reference's request id plays in debug output
      concat(lit("req-"), spark_partition_id().cast(StringType)) }
    b += "cid" -> { case _ =>
      concat(lit("cid-"), spark_partition_id().cast(StringType)) }
    b += "stageid" -> { case _ => spark_partition_id() }
    b += "workerid" -> { case _ => spark_partition_id() }
    b += "starttime" -> { case _ => unix_millis(now()) }
    b += "endtime" -> { case _ => unix_millis(now()) }
    // sleep(ms) returns its argument after the reference sleeps — used
    // only in latency tests; sleeping per-row inside a distributed scan
    // is an anti-pattern, so this is the identity (documented divergence)
    b += "sleep" -> { case Seq(ms) => ms }

    b.result()
  }

  private def nullIfEmpty(c: Column): Column = when(c === "", null).otherwise(c)

  /** ClickHouse-style first-significant-subdomain
    * (`UrlFunctions.java:107/133`): for short TLD lists (com/net/org/co)
    * the significant part is the label left of the TLD, otherwise one
    * label further left. */
  private def firstSignificantSubdomain(u: Column, withTld: Boolean): Column = {
    val host = regexp_extract(u, "^\\w+://(?:[^@/]*@)?([^:/?#]+)", 1)
    val parts = split(host, "\\.")
    val n = size(parts)
    val shortTld = get(parts, n - 1).isin("com", "net", "org", "co")
    val sig = when(shortTld, get(parts, n - 2)).otherwise(get(parts, n - 3))
    val out =
      if (!withTld) when(n <= 2, get(parts, lit(0))).otherwise(sig)
      else when(n <= 2, host).otherwise(
        when(shortTld,
          concat_ws(".", get(parts, n - 2), get(parts, n - 1)))
          .otherwise(concat_ws(".", get(parts, n - 3), get(parts, n - 2),
            get(parts, n - 1))))
    when(host === "", null).otherwise(out)
  }

  /** Register every name that doesn't already resolve (Spark builtins
    * and the main PinotFunctions surface win). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registry.foreach { case (name, f) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name,
          (exprs: Seq[Expression]) => ColumnBridge.expression(
            f(exprs.map(ColumnBridge.column))), "built-in")
    }
  }
}
