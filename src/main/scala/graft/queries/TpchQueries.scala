package graft.queries

import org.apache.spark.sql.DataFrame
import graft.Tables

/** The reference's OWN TPC-H suite (the numbered SQL files under
  * `pinot-integration-tests/src/test/resources/tpch`, harness
  * `TPCHQueryIntegrationTest.java`) folded into the driver's
  * correctness gate: every file the reference itself runs (it exempts
  * 15/16/17 — view DDL — and 23) executes here through plain
  * `spark.sql` over the catalog tables and is compared cell-for-cell
  * against DuckDB running the IDENTICAL adapted text.
  *
  * Adaptations are symmetric (one text, two engines) and fall in four
  * groups, all mechanical:
  *  - a WITH prelude derives the TPC-H columns the driver's synthetic
  *    schema omits (l_commitdate/receiptdate/shipmode/shipinstruct,
  *    o_shippriority/comment, c_address/phone/comment, s_*, p_mfgr/
  *    container, and the whole partsupp table) deterministically from
  *    the key columns, and exposes date columns as 'yyyy-MM-dd'
  *    strings — the reference's own TPC-H data model stores dates as
  *    STRING, which is exactly what `substring(o_orderdate, 1, 4)`
  *    in its query files assumes;
  *  - SUM/AVG are wrapped in the repo-wide exact-decimal discipline
  *    (`CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)` — scale 6 because
  *    three-factor 2-dp products are exact at six decimals, so neither
  *    engine ever rounds at a tie) so the two
  *    engines' float reductions cannot drift;
  *  - literals naming TPC-H refresh data the synthetic tables don't
  *    carry (nation names, part types) are remapped to values that
  *    exist, keeping every predicate selective;
  *  - table names are suffixed to the prelude CTE names.
  */
object TpchQueries {

  val Dir = "/root/reference/pinot-integration-tests/src/test/resources/tpch"

  /** The files the reference's own harness runs
    * (`TPCHQueryIntegrationTest.EXEMPT_QUERIES = {15, 16, 17, 23}`). */
  val Runnable: Seq[Int] =
    Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 18, 19, 20, 21, 22, 24)

  /** Deterministic derivations of the columns/tables the synthetic
    * schema omits. Every expression is portable Spark/DuckDB SQL:
    * cast/concat/CASE/%/interval '1' day arithmetic only. */
  private val Prelude: String = """
lineitem_t AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    cast(cast(l_shipdate as date) as string) AS l_shipdate,
    cast(cast(cast(l_shipdate as date) + interval '1' day
      * cast(l_orderkey % 30 - 10 as int) as date) as string) AS l_commitdate,
    cast(cast(cast(l_shipdate as date) + interval '1' day
      * cast(l_linenumber % 14 + 1 as int) as date) as string) AS l_receiptdate,
    CASE cast((l_orderkey * 7 + l_linenumber) % 6 as int)
      WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
      WHEN 3 THEN 'AIR REG' WHEN 4 THEN 'RAIL' ELSE 'TRUCK'
    END AS l_shipmode,
    CASE cast((l_orderkey + l_linenumber) % 4 as int)
      WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
      WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN'
    END AS l_shipinstruct
  FROM lineitem),
orders_t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    cast(cast(o_orderdate as date) as string) AS o_orderdate,
    o_orderpriority,
    0 AS o_shippriority,
    CASE WHEN o_orderkey % 11 = 0 THEN 'special requests noted'
         ELSE 'standard order comment' END AS o_comment
  FROM orders),
customer_t AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
    concat('Address#', cast(c_custkey as string)) AS c_address,
    concat(cast(10 + c_custkey % 25 as string), '-',
      cast(100 + c_custkey % 900 as string), '-',
      cast(1000 + c_custkey % 9000 as string)) AS c_phone,
    concat('customer comment ', cast(c_custkey % 5 as string)) AS c_comment
  FROM customer),
supplier_t AS (
  SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
    concat('SupplierAddr#', cast(s_suppkey as string)) AS s_address,
    concat(cast(10 + s_suppkey % 25 as string), '-',
      cast(100 + s_suppkey % 900 as string)) AS s_phone,
    CASE WHEN s_suppkey % 9 = 0 THEN 'frequent Customer Complaints noted'
         ELSE 'reliable supplier' END AS s_comment
  FROM supplier),
part_t AS (
  SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
    concat('Manufacturer#', cast(1 + p_partkey % 5 as string)) AS p_mfgr,
    CASE cast(p_partkey % 8 as int)
      WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'SM BOX' WHEN 2 THEN 'SM PACK'
      WHEN 3 THEN 'SM PKG' WHEN 4 THEN 'MED BAG' WHEN 5 THEN 'MED BOX'
      WHEN 6 THEN 'LG CASE' ELSE 'LG BOX'
    END AS p_container
  FROM part),
partsupp_t AS (
  SELECT p_partkey AS ps_partkey,
    cast((p_partkey + reps.i * 13) % (SELECT count(*) FROM supplier)
      as bigint) AS ps_suppkey,
    cast((p_partkey * 7 + reps.i * 11) % 9999 + 1 as int) AS ps_availqty,
    cast((p_partkey * 31 + reps.i * 17) % 100000 as double) / 100.0 + 1.0
      AS ps_supplycost
  FROM part, (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2
              UNION ALL SELECT 3) reps),
nation_t AS (SELECT * FROM nation),
region_t AS (SELECT * FROM region)
"""

  /** Literals naming TPC-H refresh values the synthetic tables don't
    * carry — remapped to values that exist so every predicate stays
    * selective. */
  private val LiteralRemaps = Seq(
    "'FRANCE'" -> "'NATION_6'",
    "'GERMANY'" -> "'NATION_7'",
    "'BRAZIL'" -> "'NATION_2'",
    "'CANADA'" -> "'NATION_3'",
    "'ECONOMY ANODIZED STEEL'" -> "'ECONOMY'",
    "'%green%'" -> "'%red%'",
    "'forest%'" -> "'small%'",
    "'%BRASS'" -> "'%PROMO'")

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Index of the ')' matching the '(' at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parens")
  }

  /** Wrap SUM/AVG in the exact-decimal discipline (symmetrically —
    * both engines run the rewritten text). */
  private[queries] def decimalize(s: String): String = {
    val out = new StringBuilder
    val lower = s.toLowerCase
    var i = 0
    while (i < s.length) {
      val boundary = i == 0 || !isIdentChar(s.charAt(i - 1))
      val isSum = boundary && lower.startsWith("sum(", i)
      val isAvg = boundary && lower.startsWith("avg(", i)
      if (isSum || isAvg) {
        val close = matchParen(s, i + 3)
        val arg = decimalize(s.substring(i + 4, close))
        // r14 perf: the exact sum accumulates as a 6-dp-scaled BIGINT
        // instead of DECIMAL(20,6). A decimal sum's buffer (precision
        // 30 > 18) cannot live in an UnsafeRow long slot, so every
        // update serializes a BigDecimal — measured 2.1× slower than
        // the long sum for identical exactness. All summed expressions
        // here are ≤3-factor products of 2-dp money values, exact at 6
        // decimals, so round(x*1e6) recovers the exact scaled integer
        // (no 6-dp ties exist; fp error ≪ 0.5) and both engines run
        // the same IEEE ops on the same text.
        //
        // r15 (round-14 verdict #2): the single long sum died loudly
        // (ANSI) around SF150 — q1's biggest group at SF100 sums to
        // ~6e18 of the 9.2e18 long range. Overflow-safe two-level
        // form, still all-long in the aggregate buffers: split the
        // scaled value S into hi = S div 1e9 and lo = S mod 1e9
        // (truncated division — both engines' % truncates, and
        // (S - S%d)/d is exact in double: |S| ≤ ~1.2e13 < 2^53 for
        // every TPC-H sum argument, quotient ≤ ~1.2e4 integer), sum
        // each as a long, and recombine EXACTLY in decimal(38,0):
        // T = sum(hi)·1e9 + sum(lo). Per-row |lo| < 1e9 ⇒ lo-sum
        // overflows only past 9.2e9 rows per group (≈ SF6000 for q1's
        // densest group at ~1.5e6 rows/SF); per-row |hi| ≤ ~1.2e4 ⇒
        // hi-sum is safe past SF1e8. cast(sum(hi) as decimal(28,0))
        // keeps the multiply inside both engines' 38-digit cap
        // (28+10 = 38; a long always fits 19 ≤ 28 digits). The final
        // double is fl(fl(T)/1e6) — identical bit-for-bit to the r14
        // form everywhere the r14 form didn't overflow, since both
        // compute the correctly-rounded cast of the same exact T.
        val s6 = s"cast(round(($arg) * 1000000) as bigint)"
        val sumT = s"cast(cast(sum(cast((($s6) - (($s6) % 1000000000))" +
          s" / 1000000000 as bigint)) as decimal(28,0)) * 1000000000" +
          s" + sum(($s6) % 1000000000) as double)"
        if (isSum)
          out.append(s"($sumT / 1000000.0)")
        else
          out.append(s"(($sumT / 1000000.0) / count($arg))")
        i = close + 1
      } else {
        out.append(s.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  private def loadRaw(n: Int): String = {
    val src = scala.io.Source.fromFile(s"$Dir/$n.sql")
    try src.getLines().filterNot(_.startsWith("#")).mkString("\n")
    finally src.close()
  }

  /** The symmetric adaptation pipeline (see class doc). */
  private[queries] def adapt(n: Int): String = {
    var s = loadRaw(n).trim.stripSuffix(";")
    // file 20 (classic Q18) has one unaliased select aggregate — both
    // engines must agree on the output column NAME
    if (n == 20)
      s = s.replaceAll("(?s)sum\\(\\s*l_quantity\\s*\\)\\s*\\nfrom",
        "sum(l_quantity) as sum_qty\nfrom")
    LiteralRemaps.foreach { case (a, b) => s = s.replace(a, b) }
    s = decimalize(s)
    Seq("partsupp", "lineitem", "orders", "customer", "supplier",
      "nation", "region", "part").foreach { t =>
      s = s.replaceAll("\\b" + t + "\\b", t + "_t")
    }
    s"WITH $Prelude\n$s"
  }

  // lazily materialized (reads the reference's .sql files once per
  // query); an absent reference checkout contributes no queries
  lazy val all: Seq[GQuery] =
    if (!new java.io.File(Dir).isDirectory) Seq.empty
    else Runnable.map { n =>
      val text = adapt(n)
      GQuery(f"q_tpch_$n%02d",
        (s, dir) => {
          Tables(s, dir).registerAll()
          s.sql(text)
        },
        Some(text))
    }
}
