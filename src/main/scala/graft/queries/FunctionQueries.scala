package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.VectorFunctions
import QH._

/** Scalar-function surface — reference inventory at apache/pinot
  * `pinot-common/.../function/TransformFunctionType.java:46-258` and
  * `function/scalar` (arithmetic, string, date/time, JSON, array/MV,
  * hash, bitwise, trig, vector). All pure Catalyst expressions inside
  * whole-stage codegen; rounding policy per QH (cross-engine libm noise
  * ≤ 1 ulp, far below round(6) resolution).
  */
object FunctionQueries {

  val all: Seq[GQuery] = Seq(

    // Arithmetic (:46-66): add/sub/mult/div/mod/abs/ceil/floor/exp/ln/
    // sqrt/power/sign/round/least/greatest.
    GQuery("q_fn_math",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.filter(col("p_partkey") <= 100)
          .select(
            col("p_partkey"),
            (col("p_size") + 7).as("add7"),
            (col("p_size") * 3 - 1).as("mul3"),
            r6(col("p_retailprice") / 7.0).as("div7"),
            pmod(col("p_size"), lit(5)).as("mod5"),
            abs(col("p_size") - 25).as("abs_d"),
            ceil(col("p_retailprice") / 100.0).as("ceil_c"),
            floor(col("p_retailprice") / 100.0).as("floor_c"),
            r6(sqrt(col("p_size"))).as("sqrt_s"),
            r6(exp(col("p_size") / 10.0)).as("exp_s"),
            r6(log(col("p_retailprice"))).as("ln_p"),
            r6(pow(col("p_size"), 2.5)).as("pow_s"),
            signum(col("p_size") - 25).cast(IntegerType).as("sign_d"),
            least(col("p_size"), lit(20)).as("least_s"),
            greatest(col("p_size"), lit(20)).as("greatest_s"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        p_size + 7 AS add7, p_size * 3 - 1 AS mul3,
        ROUND(p_retailprice / 7.0, 6) AS div7,
        p_size % 5 AS mod5, ABS(p_size - 25) AS abs_d,
        CAST(CEIL(p_retailprice / 100.0) AS BIGINT) AS ceil_c,
        CAST(FLOOR(p_retailprice / 100.0) AS BIGINT) AS floor_c,
        ROUND(SQRT(p_size), 6) AS sqrt_s,
        ROUND(EXP(p_size / 10.0), 6) AS exp_s,
        ROUND(LN(p_retailprice), 6) AS ln_p,
        ROUND(POW(p_size, 2.5), 6) AS pow_s,
        CAST(SIGN(p_size - 25) AS INT) AS sign_d,
        LEAST(p_size, 20) AS least_s, GREATEST(p_size, 20) AS greatest_s
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""")),

    // String functions (StringFunctions.java, :190 regexpExtract).
    GQuery("q_fn_string",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.filter(col("p_partkey") <= 100)
          .select(
            col("p_partkey"),
            lower(col("p_name")).as("lower_n"),
            upper(col("p_brand")).as("upper_b"),
            length(col("p_name")).as("len_n"),
            substring(col("p_name"), 1, 8).as("sub_n"),
            concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
            trim(lit("  pad  ")).as("trimmed"),
            lpad(col("p_brand"), 12, "*").as("lpad_b"),
            replace(col("p_type"), lit(" "), lit("_")).as("repl_t"),
            reverse(col("p_brand")).as("rev_b"),
            instr(col("p_name"), "a").cast(LongType).as("pos_a"),
            // Pinot strpos/strrpos: 0-based, -1 on no match
            // (StringFunctions.strpos = StringUtils.indexOf)
            expr("strpos(p_name, 'zzz')").as("pinot_pos_miss"),
            expr("strpos(p_name, 'a')").as("pinot_pos"),
            expr("strrpos(p_name, 'a')").as("pinot_rpos"),
            split_part(col("p_type"), lit(" "), lit(1)).as("first_word"),
            regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("last_word"),
            col("p_name").startsWith("b").as("starts_b"),
            col("p_name").endsWith("d").as("ends_d"),
            levenshtein(col("p_brand"), lit("Brand#11")).as("lev"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        LOWER(p_name) AS lower_n, UPPER(p_brand) AS upper_b,
        LENGTH(p_name) AS len_n,
        SUBSTRING(p_name, 1, 8) AS sub_n,
        CONCAT_WS('|', p_brand, p_type) AS cat,
        TRIM('  pad  ') AS trimmed,
        LPAD(p_brand, 12, '*') AS lpad_b,
        REPLACE(p_type, ' ', '_') AS repl_t,
        REVERSE(p_brand) AS rev_b,
        CAST(STRPOS(p_name, 'a') AS BIGINT) AS pos_a,
        CAST(-1 AS BIGINT) AS pinot_pos_miss,
        CAST(CASE WHEN STRPOS(p_name, 'a') = 0 THEN -1
             ELSE STRPOS(p_name, 'a') - 1 END AS BIGINT) AS pinot_pos,
        CAST(CASE WHEN STRPOS(p_name, 'a') = 0 THEN -1
             ELSE LENGTH(p_name) - STRPOS(REVERSE(p_name), 'a') END
             AS BIGINT) AS pinot_rpos,
        SPLIT_PART(p_type, ' ', 1) AS first_word,
        COALESCE(regexp_extract(p_type, '([A-Z]+)$', 1), '') AS last_word,
        starts_with(p_name, 'b') AS starts_b,
        ends_with(p_name, 'd') AS ends_d,
        levenshtein(p_brand, 'Brand#11') AS lev
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""")),

    // Date/time (:120-157 + DateTimeFunctions.java): extract fields,
    // dateTrunc, epoch conversion, datediff, date arithmetic.
    GQuery("q_fn_datetime",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.filter(col("o_orderkey") <= 200)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            hour(col("o_orderdate")).as("h"),
            minute(col("o_orderdate")).as("mi"),
            second(col("o_orderdate")).as("sec"),
            (dayofweek(col("o_orderdate")) - 1).as("dow"),
            dayofyear(col("o_orderdate")).as("doy"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            date_trunc("day", col("o_orderdate")).as("day_start"),
            unix_millis(col("o_orderdate").cast(TimestampType)).as("epoch_ms"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 60000").as("epoch_min"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
            date_add(col("o_orderdate").cast(DateType), 30)
              .cast(TimestampNTZType).as("plus30"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y,
        CAST(quarter(o_orderdate) AS INT) AS q,
        CAST(month(o_orderdate) AS INT) AS m,
        CAST(dayofmonth(o_orderdate) AS INT) AS d,
        CAST(hour(o_orderdate) AS INT) AS h,
        CAST(minute(o_orderdate) AS INT) AS mi,
        CAST(second(o_orderdate) AS INT) AS sec,
        CAST(dayofweek(o_orderdate) AS INT) AS dow,
        CAST(dayofyear(o_orderdate) AS INT) AS doy,
        date_trunc('month', o_orderdate) AS month_start,
        date_trunc('day', o_orderdate) AS day_start,
        epoch_ms(o_orderdate) AS epoch_ms,
        epoch_ms(o_orderdate) // 60000 AS epoch_min,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""")),

    // JSON (:104-117 jsonExtractScalar/jsonExtractKey + JsonFunctions).
    GQuery("q_fn_json",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events.filter(col("event_id") <= 300)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.absent").as("absent"),
            // sorted + joined: array cells crash the driver's checker
            array_join(array_sort(json_object_keys(col("props"))), ",")
              .as("keys_csv"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        json_extract_string(props, '$.k') AS k_str,
        json_extract_string(props, '$.absent') AS absent,
        array_to_string(list_sort(json_keys(props)), ',') AS keys_csv
        FROM events WHERE event_id <= 300 ORDER BY event_id""")),

    // Array/MV functions (:162-172 + ArrayFunctions.java): the MV-column
    // surface (ArrayType per SURVEY §1.2) incl. exists-semantics filter.
    GQuery("q_fn_array",
      (s, dir) => {
        val t = Tables(s, dir)
        val toks = split(col("text"), " ")
        t.documents.filter(col("doc_id") <= 200)
          .select(
            col("doc_id"),
            size(toks).as("arr_len"),
            element_at(toks, 1).as("first_tok"),
            element_at(toks, -1).as("last_tok"),
            array_contains(toks, "query").as("has_query"),
            array_join(slice(array_sort(array_distinct(toks)), 1, 3), ",")
              .as("top3_csv"),
            array_position(toks, "the").cast(LongType).as("pos_the"),
            size(array_distinct(toks)).as("n_distinct"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        len(string_split(text, ' ')) AS arr_len,
        string_split(text, ' ')[1] AS first_tok,
        string_split(text, ' ')[-1] AS last_tok,
        list_contains(string_split(text, ' '), 'query') AS has_query,
        array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS top3_csv,
        CAST(COALESCE(list_position(string_split(text, ' '), 'the'), 0) AS BIGINT) AS pos_the,
        len(list_distinct(string_split(text, ' '))) AS n_distinct
        FROM documents WHERE doc_id <= 200 ORDER BY doc_id""")),

    // H3 grid subset (geoToH3/gridDistance/gridDisk — documented axial
    // hex approximation, GeoFunctions.scala): the oracle re-derives the
    // full encode (fractional axial coords → cube rounding → bit-packed
    // id) in SQL, so cell ids and grid distances are checked value-for-
    // value cross-engine; disk size/membership use the 3k(k+1)+1 identity.
    GQuery("q_geo_h3",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = col("c_custkey")
        t.customer.filter(k <= 500)
          .withColumn("lng", (k * 7919 % 36000) / 100.0 - 180.0)
          .withColumn("lat", (k * 104729 % 17000) / 100.0 - 85.0)
          .withColumn("lng2", col("lng") / 2.0 + 11.17)
          .withColumn("lat2", col("lat") / 3.0 - 7.31)
          // staged projections: re-expanding geotoh3 inside every
          // downstream expression builds a tree too large for codegen
          // (interpreted fallback was 16s at sf0.1; staged: <1s)
          .withColumn("cell", expr("geotoh3(lng, lat, 8)"))
          .withColumn("cell2", expr("geotoh3(lng2, lat2, 8)"))
          .withColumn("center", expr("h3togeo(cell)"))
          .withColumn("cellrt", expr("geotoh3(center.x, center.y, 8)"))
          .withColumn("disk", expr("griddisk(cell, 2)"))
          .select(k.as("k"), col("cell"),
            expr("griddistance(cell, cell2)").as("dist"),
            size(col("disk")).as("disk_size"),
            array_contains(col("disk"), col("cell")).as("has_center"),
            expr("griddistance(cell, cellrt)").as("center_roundtrip"))
          .orderBy(col("k"))
      },
      Some("""WITH pts AS (SELECT c_custkey AS k,
          (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lng,
          (c_custkey * 104729 % 17000) / 100.0 - 85.0 AS lat
          FROM customer WHERE c_custkey <= 500),
        p2 AS (SELECT k, lng, lat, lng / 2.0 + 11.17 AS lng2,
          lat / 3.0 - 7.31 AS lat2 FROM pts),
        f AS (SELECT k,
          (lng * (sqrt(3.0)/3.0) - lat/3.0) / (20.0 / pow(sqrt(7.0), 8)) AS qf,
          lat * (2.0/3.0) / (20.0 / pow(sqrt(7.0), 8)) AS rf,
          (lng2 * (sqrt(3.0)/3.0) - lat2/3.0) / (20.0 / pow(sqrt(7.0), 8)) AS qf2,
          lat2 * (2.0/3.0) / (20.0 / pow(sqrt(7.0), 8)) AS rf2
          FROM p2),
        r AS (SELECT k, qf, rf, qf2, rf2,
          ROUND(qf) AS rx, ROUND(rf) AS rz, ROUND(-qf - rf) AS ry,
          ROUND(qf2) AS rx2, ROUND(rf2) AS rz2, ROUND(-qf2 - rf2) AS ry2
          FROM f),
        c AS (SELECT k,
          CAST(CASE WHEN abs(rx-qf) > abs(ry+qf+rf) AND abs(rx-qf) > abs(rz-rf)
            THEN -ry - rz ELSE rx END AS BIGINT) AS q,
          CAST(CASE WHEN NOT (abs(rx-qf) > abs(ry+qf+rf) AND abs(rx-qf) > abs(rz-rf))
            AND NOT (abs(ry+qf+rf) > abs(rz-rf)) THEN -rx - ry ELSE rz END AS BIGINT) AS r,
          CAST(CASE WHEN abs(rx2-qf2) > abs(ry2+qf2+rf2) AND abs(rx2-qf2) > abs(rz2-rf2)
            THEN -ry2 - rz2 ELSE rx2 END AS BIGINT) AS q2,
          CAST(CASE WHEN NOT (abs(rx2-qf2) > abs(ry2+qf2+rf2) AND abs(rx2-qf2) > abs(rz2-rf2))
            AND NOT (abs(ry2+qf2+rf2) > abs(rz2-rf2)) THEN -rx2 - ry2 ELSE rz2 END AS BIGINT) AS r2
          FROM r)
        SELECT k,
          8 * 1125899906842624 + (q + 16777216) * 33554432 + (r + 16777216) AS cell,
          (abs(q - q2) + abs(r - r2) + abs(q - q2 + r - r2)) // 2 AS dist,
          19 AS disk_size, TRUE AS has_center,
          CAST(0 AS BIGINT) AS center_roundtrip
        FROM c ORDER BY k""")),

    // ST_Distance radius predicate served from the H3-INDEX analog
    // (H3IndexFilterOperator.java:120-200 — always-match kRing cells
    // skip the exact check, boundary cells re-verify): the layout
    // stores derived hex-cell columns sorted by cell, the facade
    // rewrites the predicate to cell BETWEEN-ranges (pushed into the
    // parquet scan — used_index reads PushedFilters off the executed
    // plan) conjoined with the exact haversine, so a silent
    // fall-through to the per-row scan fails the gate. The oracle
    // re-derives haversine in SQL (same mean-radius constant).
    GQuery("q_geo_radius_indexed",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val indexed = graft.operators.IndexCache.getOrBuild(
          ("q_geo_radius_indexed", dir)) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_geoidx").toString
          val k = col("c_custkey")
          val pts = Tables(s, dir).customer.select(k)
            .withColumn("lng", (k * 7919 % 36000) / 100.0 - 180.0)
            .withColumn("lat", (k * 104729 % 17000) / 100.0 - 85.0)
          graft.sources.GeoIndex(pts, "lng", "lat", Seq(2, 4, 6))
            .repartition(4)
            .sortWithinPartitions(
              col(graft.sources.GeoIndex.cellColumn("lng", "lat", 6)))
            .write.mode("overwrite").parquet(s"$tmp/t")
          s.read.parquet(s"$tmp/t")
        }
        indexed.createOrReplaceTempView("customer_geoindexed")
        graft.sources.GeoIndex.registerTable(
          "customer_geoindexed", "lng", "lat", Seq(2, 4, 6))
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT c_custkey, lng, lat FROM customer_geoindexed
             WHERE ST_Distance(ST_Point(lng, lat), ST_Point(11.0, 22.0))
               < 2000000
             ORDER BY c_custkey""")
        val usedIndex = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("h3$lng$lat"))
        q.withColumn("used_index", lit(usedIndex))
      },
      Some("""WITH pts AS (SELECT c_custkey,
          (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lng,
          (c_custkey * 104729 % 17000) / 100.0 - 85.0 AS lat
          FROM customer)
        SELECT c_custkey, lng, lat, TRUE AS used_index FROM pts
        WHERE 2 * 6371008.8 * asin(sqrt(
          pow(sin(radians(lat - 22.0) / 2), 2) +
          cos(radians(22.0)) * cos(radians(lat)) *
          pow(sin(radians(lng - 11.0) / 2), 2))) < 2000000
        ORDER BY c_custkey""")),

    // Polygon inclusion served from the same index
    // (H3InclusionIndexFilterOperator.java): bbox candidate cells push
    // into the scan, every survivor re-verifies with the exact
    // ray-cast. Axis-aligned rectangle so the oracle states
    // containment as bounds checks (ray-cast boundary rule as in
    // q_geo_polygon).
    GQuery("q_geo_polygon_indexed",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val indexed = graft.operators.IndexCache.getOrBuild(
          ("q_geo_radius_indexed", dir)) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_geoidx").toString
          val k = col("c_custkey")
          val pts = Tables(s, dir).customer.select(k)
            .withColumn("lng", (k * 7919 % 36000) / 100.0 - 180.0)
            .withColumn("lat", (k * 104729 % 17000) / 100.0 - 85.0)
          graft.sources.GeoIndex(pts, "lng", "lat", Seq(2, 4, 6))
            .repartition(4)
            .sortWithinPartitions(
              col(graft.sources.GeoIndex.cellColumn("lng", "lat", 6)))
            .write.mode("overwrite").parquet(s"$tmp/t")
          s.read.parquet(s"$tmp/t")
        }
        indexed.createOrReplaceTempView("customer_geoindexed")
        graft.sources.GeoIndex.registerTable(
          "customer_geoindexed", "lng", "lat", Seq(2, 4, 6))
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT c_custkey, lng, lat FROM customer_geoindexed
             WHERE ST_Contains(ST_GeogFromText(
               'POLYGON ((10 20, 30 20, 30 40, 10 40, 10 20))'),
               ST_Point(lng, lat))
             ORDER BY c_custkey""")
        val usedIndex = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("h3$lng$lat"))
        q.withColumn("used_index", lit(usedIndex))
      },
      Some("""WITH pts AS (SELECT c_custkey,
          (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lng,
          (c_custkey * 104729 % 17000) / 100.0 - 85.0 AS lat
          FROM customer)
        SELECT c_custkey, lng, lat, TRUE AS used_index FROM pts
        WHERE lng >= 10 AND lng < 30 AND lat >= 20 AND lat < 40
        ORDER BY c_custkey""")),

    // WKT POLYGON parsing + ST_Contains/ST_Area over it: an axis-aligned
    // rectangle so the oracle can state containment as bounds checks
    // (ray-cast boundary rule: left/bottom edges inclusive, right/top
    // exclusive) and the shoelace area exactly.
    GQuery("q_geo_polygon",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = col("c_custkey")
        t.customer.filter(k <= 2000)
          .withColumn("lng", (k * 7919 % 36000) / 100.0 - 180.0)
          .withColumn("lat", (k * 104729 % 17000) / 100.0 - 85.0)
          .withColumn("poly",
            expr("stgeogfromtext('POLYGON ((10 20, 30 20, 30 40, 10 40, 10 20))')"))
          .withColumn("inside",
            expr("stcontains(poly, stpoint(lng, lat))"))
          .groupBy(col("inside"))
          .agg(count(lit(1)).as("n"),
            r4(max(expr("starea(poly)"))).as("area"))
          .orderBy(col("inside"))
      },
      Some("""WITH pts AS (SELECT
          (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lng,
          (c_custkey * 104729 % 17000) / 100.0 - 85.0 AS lat
          FROM customer WHERE c_custkey <= 2000)
        SELECT (lng >= 10 AND lng < 30 AND lat >= 20 AND lat < 40) AS inside,
          COUNT(*) AS n, CAST(400.0 AS DOUBLE) AS area
        FROM pts GROUP BY 1 ORDER BY inside""")),

    // WKB + GeoJSON round-trips, ST_GeometryType/ST_Equals, STUNION
    // (reference ST_AS_BINARY / ST_GEOM_FROM_WKB / ST_AS_GEOJSON /
    // StUnionAggregationFunction — point subset, see GeoBinary).
    // Round-trips must be bit-exact (WKB carries raw IEEE bits; Spark's
    // double→string is shortest-roundtrip so GeoJSON re-parses exactly).
    // The union leg uses integer-valued coordinates so Spark and DuckDB
    // print identical point strings. WKB header bytes are asserted
    // literally (01 = little-endian, 01000000 = Point).
    GQuery("q_geo_wkb",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = col("c_custkey")
        t.customer.filter(k <= 1000)
          .withColumn("lng", (k * 7919 % 36000) / 100.0 - 180.0)
          .withColumn("lat", (k * 104729 % 17000) / 100.0 - 85.0)
          .withColumn("p", expr("stpoint(lng, lat)"))
          .withColumn("wkb", expr("stasbinary(p)"))
          .withColumn("rt", expr("stgeomfromwkb(wkb)"))
          .withColumn("rt2", expr("stgeomfromgeojson(stasgeojson(p))"))
          .withColumn("g", (k % 5).cast("int"))
          .withColumn("ip", expr(
            "stpoint(CAST(CAST(c_custkey % 37 AS INT) - 18 AS DOUBLE)," +
            " CAST(CAST(c_custkey % 17 AS INT) - 8 AS DOUBLE))"))
          .groupBy(col("g"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(expr("stequals(rt, p)"), 1L).otherwise(0L))
              .as("wkb_roundtrip_ok"),
            sum(when(expr("stequals(rt2, p)"), 1L).otherwise(0L))
              .as("geojson_roundtrip_ok"),
            max(substring(hex(col("wkb")), 1, 10)).as("wkb_header"),
            max(expr("stgeometrytype(p)")).as("gtype"),
            expr("stunion(stastext(ip))").as("union_wkt"))
          .orderBy(col("g"))
      },
      Some("""WITH pts AS (SELECT c_custkey,
          c_custkey % 5 AS g,
          CAST(CAST(c_custkey % 37 AS INT) - 18 AS DOUBLE) AS ix,
          CAST(CAST(c_custkey % 17 AS INT) - 8 AS DOUBLE) AS iy
          FROM customer WHERE c_custkey <= 1000)
        SELECT CAST(g AS INT) AS g, COUNT(*) AS n,
          COUNT(*) AS wkb_roundtrip_ok, COUNT(*) AS geojson_roundtrip_ok,
          '0101000000' AS wkb_header, 'Point' AS gtype,
          'MULTIPOINT (' || array_to_string(
            list_sort(list(DISTINCT ix::VARCHAR || ' ' || iy::VARCHAR)),
            ', ') || ')' AS union_wkt
        FROM pts GROUP BY 1 ORDER BY 1""")),

    // JTS blob engine over the FULL geometry-type surface
    // (plans/GeoJts, reference GeometrySerializer layout): a
    // multipolygon with a hole, point-in-polygon over the serialized
    // blob (reference INT 0/1 contains with strict-interior boundary
    // semantics — boundary points are NOT contained, mirrored exactly
    // in the oracle's inequalities), JTS planar area, and planar
    // distance. Wire compatibility is gated in GeoJtsSpec.
    GQuery("q_geo_jts",
      (s, dir) => {
        val t = Tables(s, dir)
        import graft.plans.GeoJts
        val k = col("c_custkey")
        val mp = "MULTIPOLYGON (((0 0, 20 0, 20 20, 0 20, 0 0), " +
          "(5 5, 10 5, 10 10, 5 10, 5 5)), " +
          "((30 30, 40 30, 40 40, 30 40, 30 30)))"
        t.customer.filter(k <= 2000)
          .withColumn("x", (k * 13 % 50).cast("double"))
          .withColumn("y", (k * 29 % 50).cast("double"))
          .withColumn("inside", GeoJts.contains(
            GeoJts.geomFromText(lit(mp)), GeoJts.point(col("x"), col("y"))))
          .agg(count(lit(1)).as("n"),
            sum(col("inside")).cast("long").as("n_inside"),
            r4(max(GeoJts.area(GeoJts.geomFromText(lit(mp))))).as("area"),
            max(GeoJts.geometryType(GeoJts.geomFromText(lit(mp))))
              .as("gtype"),
            r4(max(GeoJts.distance(GeoJts.point(lit(0.0), lit(0.0)),
              GeoJts.point(lit(3.0), lit(4.0))))).as("planar_d"))
      },
      Some("""WITH pts AS (SELECT
          CAST(c_custkey * 13 % 50 AS DOUBLE) AS x,
          CAST(c_custkey * 29 % 50 AS DOUBLE) AS y
          FROM customer WHERE c_custkey <= 2000)
        SELECT COUNT(*) AS n,
          CAST(SUM(CASE WHEN
            (x > 0 AND x < 20 AND y > 0 AND y < 20
              AND NOT (x >= 5 AND x <= 10 AND y >= 5 AND y <= 10))
            OR (x > 30 AND x < 40 AND y > 30 AND y < 40)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
          CAST(475.0 AS DOUBLE) AS area,
          'MultiPolygon' AS gtype,
          CAST(5.0 AS DOUBLE) AS planar_d
        FROM pts""")),

    // LOOKUP dim-table scalar (reference LookupTransformFunction.java):
    // the dim view is collected once at plan time into a map literal
    // (the reference's replicated-dimension-table contract), so the
    // probe is a per-row hash lookup — no join, no shuffle. A miss
    // (sentinel key 0 via the 2-arg leg below) yields null.
    GQuery("q_fn_lookup",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.createOrReplaceTempView("nation_dim")
        t.orders.filter(col("o_orderkey") <= 5000)
          .withColumn("nkey", col("o_custkey") % 25)
          .select(col("o_orderkey"),
            expr("lookup('nation_dim', 'n_name', 'n_nationkey', nkey)")
              .as("nation_name"),
            expr("lookup('nation_dim', 'n_regionkey', 'n_nationkey', nkey)")
              .as("region_key"),
            expr("lookup('nation_dim', 'n_name', 'n_nationkey', o_orderkey + 1000)")
              .as("miss_is_null"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
        (SELECT n_name FROM nation WHERE n_nationkey = o_custkey % 25)
          AS nation_name,
        (SELECT n_regionkey FROM nation WHERE n_nationkey = o_custkey % 25)
          AS region_key,
        (SELECT n_name FROM nation WHERE n_nationkey = o_orderkey + 1000)
          AS miss_is_null
        FROM orders WHERE o_orderkey <= 5000 ORDER BY o_orderkey""")),

    // URL extraction family (UrlFunctions.java:42-553): URLs constructed
    // deterministically from part columns, components extracted by the
    // registered url* functions; the oracle states the expected
    // components from the same construction.
    GQuery("q_fn_url",
      (s, dir) => {
        val t = Tables(s, dir)
        val u = concat(lit("https://user@www.example"),
          (col("p_partkey") % 5).cast(StringType),
          lit(".co.uk:8443/parts/"), regexp_replace(col("p_name"), " ", "-"),
          lit("?brand="), regexp_replace(col("p_brand"), "#", ""),
          lit("&size="), col("p_size").cast(StringType), lit("#frag"))
        t.part.filter(col("p_partkey") <= 100)
          .withColumn("url", u)
          .select(col("p_partkey"),
            expr("urlprotocol(url)").as("proto"),
            expr("urldomain(url)").as("host"),
            expr("urldomainwithoutwww(url)").as("host_nw"),
            expr("urltopleveldomain(url)").as("tld"),
            expr("urlport(url)").as("port"),
            expr("urlnetloc(url)").as("netloc"),
            expr("urlpath(url)").as("path"),
            expr("urlquerystring(url)").as("qs"),
            expr("urlfragment(url)").as("frag"),
            expr("extracturlparameter(url, 'size')").as("size_param"),
            expr("extracturlparameter(url, 'absent')").as("absent_param"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        'https' AS proto,
        'www.example' || (p_partkey % 5) || '.co.uk' AS host,
        'example' || (p_partkey % 5) || '.co.uk' AS host_nw,
        'uk' AS tld,
        8443 AS port,
        'user@www.example' || (p_partkey % 5) || '.co.uk:8443' AS netloc,
        '/parts/' || replace(p_name, ' ', '-') AS path,
        'brand=' || replace(p_brand, '#', '') || '&size=' || p_size AS qs,
        'frag' AS frag,
        CAST(p_size AS VARCHAR) AS size_param,
        '' AS absent_param
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""")),

    // IP / UUID / JSON-first-match scalars (IpAddressFunctions.java,
    // scalar/uuid/, TransformFunctionType.java:104-117): inputs built
    // from order keys, so the oracle can compute every expected value
    // independently (subnet membership via modular arithmetic, UUID
    // fields via the same md5 hex slices, v1 timestamp via hex cast).
    GQuery("q_fn_net",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = col("o_orderkey")
        val m = md5(k.cast(StringType).cast(BinaryType))
        val ip4 = concat(lit("10."), (k % 128).cast(StringType), lit("."),
          (k % 256).cast(StringType), lit("."), ((k * 7) % 256).cast(StringType))
        val ip6 = when(k % 2 === 0,
          concat(lit("2001:db8::"), lower(hex(k))))
          .otherwise(concat(lit("fe80::"), lower(hex(k))))
        val uu = concat_ws("-", substring(m, 1, 8), substring(m, 9, 4),
          substring(m, 13, 4), substring(m, 17, 4), substring(m, 21, 12))
        val uu1 = concat_ws("-", substring(m, 1, 8), substring(m, 9, 4),
          concat(lit("1"), substring(m, 14, 3)), substring(m, 17, 4),
          substring(m, 21, 12))
        val js = concat(lit("""{"a":[{"v":"""), (k % 10).cast(StringType),
          lit("""},{"v":"""), (k % 7).cast(StringType), lit("}]}"))
        t.orders.filter(k <= 200)
          .withColumn("ip4", ip4).withColumn("ip6", ip6)
          .withColumn("uu", uu).withColumn("uu1", uu1).withColumn("js", js)
          .select(k,
            expr("issubnetof('10.64.0.0/10', ip4)").as("in_v4_subnet"),
            expr("issubnetof('2001:db8::/32', ip6)").as("in_v6_subnet"),
            expr("isipv4string(ip4)").as("is_v4"),
            expr("isipv6string(ip6)").as("is_v6"),
            expr("ipv4tolong(ip4)").as("ip4_long"),
            expr("longtoipv4(ipv4tolong(ip4))").as("ip4_roundtrip"),
            expr("ipprefix(ip4, 24)").as("v4_prefix"),
            expr("ipsubnetmin(ipprefix(ip4, 24))").as("v4_min"),
            expr("ipsubnetmax(ipprefix(ip4, 24))").as("v4_max"),
            expr("ipprefix(ip6, 32)").as("v6_prefix"),
            expr("ipsubnetmax(ipprefix(ip6, 32))").as("v6_max"),
            expr("isuuid(uu)").as("is_uuid"),
            expr("isuuid(o_orderpriority)").as("not_uuid"),
            expr("uuidversion(uu)").as("uu_ver"),
            expr("hex(uuidtobytes(uu))").as("uu_hex"),
            expr("bytestouuid(uuidtobytes(uu))").as("uu_roundtrip"),
            expr("uuidtimestamp(uu1)").as("uu1_ts"),
            expr("jsonextractscalarfirstmatch(js, '$.a[*].v', 'INT')").as("first_v"),
            expr("jsonextractindex(js, '$.a[1].v', 'INT')").as("second_v"))
          .orderBy(k)
      },
      Some("""SELECT o_orderkey,
        (o_orderkey % 128) >= 64 AS in_v4_subnet,
        (o_orderkey % 2) = 0 AS in_v6_subnet,
        TRUE AS is_v4, TRUE AS is_v6,
        10 * 16777216 + (o_orderkey % 128) * 65536
          + (o_orderkey % 256) * 256 + (o_orderkey * 7) % 256 AS ip4_long,
        '10.' || (o_orderkey % 128) || '.' || (o_orderkey % 256) || '.'
          || (o_orderkey * 7) % 256 AS ip4_roundtrip,
        '10.' || (o_orderkey % 128) || '.' || (o_orderkey % 256) || '.0/24'
          AS v4_prefix,
        '10.' || (o_orderkey % 128) || '.' || (o_orderkey % 256) || '.0'
          AS v4_min,
        '10.' || (o_orderkey % 128) || '.' || (o_orderkey % 256) || '.255'
          AS v4_max,
        CASE WHEN o_orderkey % 2 = 0 THEN '2001:db8::/32'
          ELSE 'fe80::/32' END AS v6_prefix,
        CASE WHEN o_orderkey % 2 = 0
          THEN '2001:db8:ffff:ffff:ffff:ffff:ffff:ffff'
          ELSE 'fe80:0:ffff:ffff:ffff:ffff:ffff:ffff' END AS v6_max,
        TRUE AS is_uuid, FALSE AS not_uuid,
        CAST(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 13, 1)) - 1 AS INT) AS uu_ver,
        upper(md5(CAST(o_orderkey AS VARCHAR))) AS uu_hex,
        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) || '-'
          || substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 4) || '-'
          || substr(md5(CAST(o_orderkey AS VARCHAR)), 13, 4) || '-'
          || substr(md5(CAST(o_orderkey AS VARCHAR)), 17, 4) || '-'
          || substr(md5(CAST(o_orderkey AS VARCHAR)), 21, 12) AS uu_roundtrip,
        (CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 14, 3)
            || substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 4)
            || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
          - 122192928000000000) // 10000 AS uu1_ts,
        CAST(o_orderkey % 10 AS INT) AS first_v,
        CAST(o_orderkey % 7 AS INT) AS second_v
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""")),

    // MV exists-semantics filter (SURVEY §7.5: mvCol = x matches if ANY
    // element equals x → array_contains).
    GQuery("q_fn_mv_filter",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .filter(array_contains(split(col("text"), " "), "stream"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM documents
        WHERE list_contains(string_split(text, ' '), 'stream')""")),

    // Hash / binary (HashFunctions.java, DataTypeConversionFunctions.java).
    GQuery("q_fn_hash",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.select(
            col("n_nationkey"),
            md5(col("n_name").cast(BinaryType)).as("md5_n"),
            sha2(col("n_name").cast(BinaryType), 256).as("sha256_n"),
            base64(col("n_name").cast(BinaryType)).as("b64_n"),
            hex(col("n_nationkey").cast(LongType)).as("hex_k"),
            octet_length(col("n_name")).as("blen"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey,
        md5(n_name) AS md5_n,
        sha256(n_name) AS sha256_n,
        to_base64(CAST(n_name AS BLOB)) AS b64_n,
        upper(to_hex(CAST(n_nationkey AS BIGINT))) AS hex_k,
        octet_length(CAST(n_name AS BLOB)) AS blen
        FROM nation ORDER BY n_nationkey""")),

    // Bitwise (function/scalar/bitwise).
    GQuery("q_fn_bitwise",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.select(
            col("n_nationkey"),
            col("n_nationkey").bitwiseAND(lit(12)).as("band"),
            col("n_nationkey").bitwiseOR(lit(5)).as("bor"),
            col("n_nationkey").bitwiseXOR(lit(9)).as("bxor"),
            shiftleft(col("n_nationkey"), 2).as("shl"),
            shiftright(col("n_nationkey"), 1).as("shr"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey,
        n_nationkey & 12 AS band,
        n_nationkey | 5 AS bor,
        xor(n_nationkey, 9) AS bxor,
        n_nationkey << 2 AS shl,
        n_nationkey >> 1 AS shr
        FROM nation ORDER BY n_nationkey""")),

    // Trig (:242-254).
    GQuery("q_fn_trig",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.select(
            col("n_nationkey"),
            r6(sin(col("n_nationkey"))).as("sin_k"),
            r6(cos(col("n_nationkey"))).as("cos_k"),
            r6(tan(col("n_nationkey"))).as("tan_k"),
            r6(atan(col("n_nationkey"))).as("atan_k"),
            r6(atan2(col("n_nationkey"), lit(3.0))).as("atan2_k"),
            r6(degrees(col("n_nationkey"))).as("deg_k"),
            r6(radians(col("n_nationkey"))).as("rad_k"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey,
        ROUND(SIN(n_nationkey), 6) AS sin_k,
        ROUND(COS(n_nationkey), 6) AS cos_k,
        ROUND(TAN(n_nationkey), 6) AS tan_k,
        ROUND(ATAN(n_nationkey), 6) AS atan_k,
        ROUND(ATAN2(n_nationkey, 3.0), 6) AS atan2_k,
        ROUND(DEGREES(n_nationkey), 6) AS deg_k,
        ROUND(RADIANS(n_nationkey), 6) AS rad_k
        FROM nation ORDER BY n_nationkey""")),

    // CAST / CASE / COALESCE / NULLIF / IS DISTINCT FROM (:69-101).
    GQuery("q_fn_cast_case",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.filter(col("c_custkey") <= 200)
          .select(
            col("c_custkey"),
            col("c_acctbal").cast(IntegerType).as("bal_int"),
            col("c_custkey").cast(StringType).as("key_str"),
            when(col("c_acctbal") > 5000.0, "high")
              .when(col("c_acctbal") > 0.0, "mid")
              .otherwise("neg").as("tier"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("REDACTED")).as("seg"),
            (col("c_mktsegment") <=> lit("AUTOMOBILE")).as("is_auto"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
        CAST(trunc(c_acctbal) AS INT) AS bal_int,
        CAST(c_custkey AS VARCHAR) AS key_str,
        CASE WHEN c_acctbal > 5000.0 THEN 'high'
          WHEN c_acctbal > 0.0 THEN 'mid' ELSE 'neg' END AS tier,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg,
        c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE' AS is_auto
        FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""")),

    // Vector functions (:233-239, VectorFunctions.java): dims, norm,
    // inner product, cosine, L1, L2 vs a fixed probe (vec_id = 0).
    GQuery("q_fn_vector",
      (s, dir) => {
        val t = Tables(s, dir)
        val probe = t.embeddings.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe_vec"))
        t.embeddings.crossJoin(broadcast(probe))
          .select(
            col("vec_id"),
            VectorFunctions.vectorDims(col("embedding")).as("dims"),
            r4(VectorFunctions.vectorNorm(col("embedding"))).as("norm"),
            r4(VectorFunctions.innerProduct(col("embedding"), col("probe_vec"))).as("dot"),
            r4(VectorFunctions.cosineSimilarity(col("embedding"), col("probe_vec"))).as("cos_sim"),
            r4(VectorFunctions.l1Distance(col("embedding"), col("probe_vec"))).as("l1"),
            r4(VectorFunctions.l2Distance(col("embedding"), col("probe_vec"))).as("l2"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p
          FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
          len(embedding) AS dims,
          ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS norm,
          ROUND(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), p),
            t -> t[1] * t[2])), 4) AS dot,
          ROUND(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), p), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
             * sqrt(list_sum(list_transform(p, x -> x * x)))), 4) AS cos_sim,
          ROUND(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), p),
            t -> abs(t[1] - t[2]))), 4) AS l1,
          ROUND(sqrt(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), p),
            t -> (t[1] - t[2]) * (t[1] - t[2])))), 4) AS l2
        FROM embeddings, probe ORDER BY vec_id""")),

    // Compat surface (CompatAliases.scala): Pinot's operator-name
    // scalars and underscore spellings (FunctionRegistry.canonicalize),
    // variadic caseWhen, firstline, filterMv, URL parameter cutting,
    // BigDecimal byte round-trip, variable-pattern regex. Exercised
    // through the registry (call_function) — the same resolution path
    // a Pinot-flavored SQL query takes.
    GQuery("q_fn_compat",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.functions.PinotFunctions.registerAll(s)
        def fc(name: String, cs: org.apache.spark.sql.Column*) =
          org.apache.spark.sql.functions.call_function(name, cs: _*)
        t.customer.filter(col("c_custkey") <= 200)
          .select(
            col("c_custkey"),
            fc("not_equals", col("c_nationkey"), lit(5)).as("ne5"),
            fc("greater_than_or_equal", col("c_acctbal"), lit(0.0)).as("ge0"),
            fc("less_than", col("c_nationkey"), lit(12)).as("lt12"),
            fc("is_distinct_from", col("c_nationkey"), col("c_custkey") % 25).as("idf"),
            fc("caseWhen",
              col("c_nationkey") < 8, lit("low"),
              col("c_nationkey") < 16, lit("mid"),
              lit("high")).as("band"),
            fc("firstline",
              concat(col("c_name"), lit("\n"), col("c_mktsegment"))).as("line1"),
            fc("fromAscii", fc("toAscii", col("c_mktsegment"))).as("seg"),
            fc("cutURLParameters",
              concat(lit("http://x.com/p?a="), col("c_custkey"),
                lit("&b=2&c=3")),
              array(lit("a"), lit("c"))).as("cut_url"),
            r6(fc("bytesToBigDecimal",
              fc("bigDecimalToBytes", col("c_acctbal").cast(DecimalType(38, 18))))
              .cast(DoubleType)).as("dec_rt"),
            fc("regexpExtractVar", col("c_name"), lit("([0-9]+)"), lit(1)).as("digits"),
            array_join(fc("filterMv",
              array(col("c_nationkey"), col("c_custkey") % 10, lit(20)),
              lit("v >= 10")), ",").as("mv_ge10"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
          c_nationkey <> 5 AS ne5,
          c_acctbal >= 0.0 AS ge0,
          c_nationkey < 12 AS lt12,
          c_nationkey IS DISTINCT FROM (c_custkey % 25) AS idf,
          CASE WHEN c_nationkey < 8 THEN 'low'
               WHEN c_nationkey < 16 THEN 'mid' ELSE 'high' END AS band,
          c_name AS line1,
          c_mktsegment AS seg,
          'http://x.com/p?b=2' AS cut_url,
          ROUND(c_acctbal, 6) AS dec_rt,
          regexp_extract(c_name, '([0-9]+)', 1) AS digits,
          array_to_string(list_filter(
            [c_nationkey, c_custkey % 10, 20], x -> x >= 10), ',') AS mv_ge10
        FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""")),

    // CLP log columns (functions/ClpFunctions.scala; reference
    // CLPEncodingEnricher → clpDecode/clpEncodedVarsMatch): encode each
    // document into (logtype, dict_vars, encoded_vars), decode it back,
    // and assert the round trip IN the engine (roundtrip_ok is computed
    // equality, not a constant) — the oracle mirrors the variable
    // classification with regexes and pins roundtrip to TRUE.
    GQuery("q_fn_clp",
      (s, dir) => {
        val t = Tables(s, dir)
        val clp = graft.functions.ClpFunctions
        t.documents
          .select(col("doc_id"), col("text"),
            clp.clpEncode(col("text")).as("e"))
          .select(col("doc_id"),
            (clp.clpDecode(col("e.logtype"), col("e.dict_vars"),
              col("e.encoded_vars")) === col("text")).as("roundtrip_ok"),
            size(col("e.dict_vars")).as("n_dict"),
            size(col("e.encoded_vars")).as("n_enc"),
            clp.clpEncodedVarsMatch(col("e.encoded_vars"), "1*")
              .as("has_var_1x"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, TRUE AS roundtrip_ok,
          len(list_filter(string_split(text, ' '),
            t -> regexp_matches(t, '[0-9]')
             AND NOT regexp_full_match(t, '-?[0-9]{1,18}'))) AS n_dict,
          len(list_filter(string_split(text, ' '),
            t -> regexp_full_match(t, '-?[0-9]{1,18}'))) AS n_enc,
          len(list_filter(string_split(text, ' '),
            t -> regexp_full_match(t, '-?[0-9]{1,18}')
             AND CAST(TRY_CAST(t AS BIGINT) AS VARCHAR) LIKE '1%')) > 0
            AS has_var_1x
        FROM documents ORDER BY doc_id""")),

    // Config-driven CLP-log ingest (sources/ClpLogIngest.scala;
    // reference pinot-clp-log CLPLogRecordExtractor): the decoder-prop
    // config names the fields to CLP-encode and the extractor lands the
    // <f>_logtype/_dictionaryVars/_encodedVars triple at ingest — the
    // query reads the config-ingested layout (original field dropped by
    // removeProcessedFields) and proves the triple round-trips and
    // classifies like q_fn_clp's hand-written projection.
    // Schema-conforming ingest (sources/SchemaConforming; reference
    // SchemaConformingTransformer): the JSON record conforms to two
    // declared dotted columns, the undeclared remainder lands in
    // json_data, and the _noIndex-suffixed field in json_data_no_idx.
    // The oracle reconstructs the conformed object byte-for-byte.
    GQuery("q_schema_conform",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = get_json_object(col("props"), "$.k").cast("long")
        val input = concat(lit("{\"event_type\":\""), col("event_type"),
          lit("\",\"k_noIndex\":"), k,
          lit(",\"nested\":{\"user\":"), col("user_id"),
          lit(",\"k\":"), k, lit("}}"))
        t.events.filter(col("event_id") <= 500)
          .select(col("event_id"),
            graft.sources.SchemaConforming.conform(input,
              Map("event_type" -> false, "nested.user" -> false),
              graft.sources.SchemaConforming.Config(
                unindexableExtrasField = Some("json_data_no_idx"),
                unindexableFieldSuffix = Some("_noIndex"))).as("conformed"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
          '{"event_type":"' || event_type || '","nested.user":' || user_id ||
          ',"json_data":{"nested":{"k":' ||
          CAST(json_extract(props, '$.k') AS BIGINT) ||
          '}},"json_data_no_idx":{"k_noIndex":' ||
          CAST(json_extract(props, '$.k') AS BIGINT) || '}}' AS conformed
        FROM events WHERE event_id <= 500 ORDER BY event_id""")),

    GQuery("q_clp_ingest",
      (s, dir) => {
        val t = Tables(s, dir)
        val clp = graft.functions.ClpFunctions
        val cfg = graft.sources.ClpLogIngest.fromProps(Map(
          "stream.kafka.decoder.prop.fieldsForClpEncoding" -> "text",
          "stream.kafka.decoder.prop.removeProcessedFields" -> "true",
          "stream.kafka.decoder.prop.topicNameDestinationColumn" -> "src_topic"))
        val ingested = graft.sources.ClpLogIngest
          .extract(t.documents, cfg, Some("docs-raw"))
        // join the decoded message back to the source to assert the
        // round trip without keeping the original column in the layout
        val decoded = ingested.select(col("doc_id"), col("src_topic"),
          clp.clpDecode(col("text_logtype"), col("text_dictionaryVars"),
            col("text_encodedVars")).as("back"),
          size(col("text_dictionaryVars")).as("n_dict"),
          size(col("text_encodedVars")).as("n_enc"))
        decoded.join(t.documents.select(col("doc_id"), col("text")), "doc_id")
          .select(col("doc_id"), col("src_topic"),
            (col("back") === col("text")).as("roundtrip_ok"),
            col("n_dict"), col("n_enc"))
          .orderBy(col("doc_id"))
      },
      // canonical int renderings only (no leading zeros / "-0") — the
      // encoded var stores the parsed long, so non-canonical numerics
      // are dictionary vars (round-trip contract, ClpCodec.isIntVar)
      Some("""SELECT doc_id, 'docs-raw' AS src_topic,
          TRUE AS roundtrip_ok,
          len(list_filter(string_split(text, ' '),
            t -> regexp_matches(t, '[0-9]')
             AND NOT regexp_full_match(t, '0|-?[1-9][0-9]{0,17}')))
            AS n_dict,
          len(list_filter(string_split(text, ' '),
            t -> regexp_full_match(t, '0|-?[1-9][0-9]{0,17}'))) AS n_enc
        FROM documents ORDER BY doc_id""")),

    // clpMatch over an ingested column group (ClpRewriter analog,
    // round 11): the wildcard must match the ENTIRE decoded message —
    // the facade rewrites clpMatch(group, 'wq') into the
    // decompress-and-match ground truth over the triple columns. The
    // DuckDB oracle runs the same wildcard as a LIKE over the raw text.
    GQuery("q_clp_match",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val t = Tables(s, dir)
        val cfg = graft.sources.ClpLogIngest.Config(
          fieldsForClpEncoding = Seq("text"), removeProcessedFields = true)
        // durable artifact: the corpus encode is a register-time index
        // build (IndexStore parquet), so warm runs scan the persisted
        // triple — and the clpMatch logtype prefilter lands on a real
        // parquet column
        graft.sources.ClpLogIngest.extractDurable(t.documents, cfg)
          .createOrReplaceTempView("clp_docs")
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT doc_id, lang FROM clp_docs
             WHERE clpMatch(text, '* the *') ORDER BY doc_id""")
      },
      // '* the *' carries a verbatim-required token, so the rewrite
      // ANDs the compiled logtype prefilter ahead of the decode+match
      // re-verify (round 12) — the driver gate exercises the split
      Some("""SELECT doc_id, lang FROM documents
        WHERE text LIKE '% the %' ORDER BY doc_id""")),

    // Infix clpMatch over a var-rich derived log line (round 13):
    // '*at_ms=9*' targets a VARIABLE with an embedded wildcard — the
    // rewrite serves it with the wildcard-variable candidate
    // (ClpRewriter.java:438-466 analog: the digit-bearing run must sit
    // inside one var token, probed via a codegen'd contains over the
    // joined var arrays) AND'd ahead of the decode+match re-verify;
    // '*le jo*' is digit-free and placeholder-satisfiable — NO sound
    // candidate exists, pinning the suppressed decode-only fallback
    // against a live oracle (round-12 verdict "what's wrong" #1). The
    // documents text carries no digits, so the log line derives vars
    // from doc_id with the identical construction in both engines.
    GQuery("q_clp_match_infix",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val t = Tables(s, dir)
        val logs = t.documents.select(col("doc_id"),
          concat(lit("req-"), col("doc_id"), lit(" sev="),
            when(col("doc_id") % 97 === 0, "panic").otherwise("info"),
            lit(" lat_ms="), (col("doc_id") % 3500) + 12,
            lit(" n "), col("doc_id") * 3,
            lit(" "), substring(col("text"), 1, 40)).as("msg"))
        val cfg = graft.sources.ClpLogIngest.Config(
          fieldsForClpEncoding = Seq("msg"), removeProcessedFields = true)
        graft.sources.ClpLogIngest.extract(logs, cfg)
          .createOrReplaceTempView("clp_logs_infix")
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT doc_id FROM clp_logs_infix
             WHERE clpMatch(msg, '*at_ms=9*') OR clpMatch(msg, '*le jo*')
             ORDER BY doc_id""")
      },
      Some("""SELECT doc_id FROM (SELECT doc_id,
          'req-' || doc_id || ' sev=' ||
          (CASE WHEN doc_id % 97 = 0 THEN 'panic' ELSE 'info' END) ||
          ' lat_ms=' || (doc_id % 3500 + 12) || ' n ' || (doc_id * 3) ||
          ' ' || substr(text, 1, 40) AS msg FROM documents)
        WHERE msg LIKE '%at_ms=9%' OR msg LIKE '%le jo%'
        ORDER BY doc_id""")),

    // Character n-grams (scalar/string/NgramFunctions.java) + the
    // concatWs/regexpLike spelling aliases — n-grams sorted in both
    // engines so set equality is order-independent.
    GQuery("q_fn_ngram",
      (s, dir) => {
        Tables(s, dir).registerAll()
        s.sql("""SELECT doc_id,
            array_join(array_sort(
              uniqueNgrams(lower(substring(text, 1, 20)), 3)), ',')
              AS tri_csv,
            size(uniqueNgrams(lower(substring(text, 1, 20)), 1, 2))
              AS n_grams_12,
            concatWs('|', lang, substring(text, 1, 3)) AS tagged,
            regexpLike(text, '[0-9]') AS has_digit
          FROM documents ORDER BY doc_id""")
      },
      Some("""WITH s AS (SELECT doc_id, lang, text,
            lower(substr(text, 1, 20)) AS t FROM documents)
        SELECT doc_id,
          array_to_string(list_sort(list_distinct(
            list_transform(range(1, len(t) - 1), i -> t[i:i+2]))), ',')
            AS tri_csv,
          len(list_distinct(list_concat(
            list_transform(range(1, len(t) + 1), i -> t[i:i]),
            list_transform(range(1, len(t)), i -> t[i:i+1]))))
            AS n_grams_12,
          concat_ws('|', lang, substr(text, 1, 3)) AS tagged,
          regexp_matches(text, '[0-9]') AS has_digit
        FROM s ORDER BY doc_id""")),

    // IDSET / IN_ID_SET round trip (reference TransformFunctionType
    // IN_ID_SET + IdSetFunctions: build a serialized id-set by
    // aggregation, probe it as a filter predicate). Here the blob is a
    // bloom filter built in one aggregation pass and shipped to the
    // orders scan as a scalar subquery — Spark plans that as a
    // broadcast subquery result, the 100 TB-safe shape (the fact table
    // never shuffles; each task probes the broadcast blob). Bloom
    // guarantees no false negatives, so every true member row matches:
    // the member-rows-matched count is EXACT and oracle-checkable, and
    // missed_members is identically 0. The false-positive rate over
    // non-member rows depends only on this engine's fixed bloom layout
    // (deterministic), asserted under 2% as a boolean the oracle pins
    // to TRUE.
    GQuery("q_fn_idset",
      (s, dir) => {
        Tables(s, dir).registerAll()
        graft.functions.PinotFunctions.registerAll(s)
        s.sql("""
          WITH probed AS (
            SELECT o_custkey,
              inidset(o_custkey,
                (SELECT idset(c_custkey) FROM customer
                 WHERE c_mktsegment = 'BUILDING')) AS bloom_hit,
              o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING') AS is_member
            FROM orders)
          SELECT
            count(CASE WHEN is_member AND bloom_hit THEN 1 END)
              AS member_rows_matched,
            count(CASE WHEN is_member AND NOT bloom_hit THEN 1 END)
              AS missed_members,
            (count(CASE WHEN NOT is_member AND bloom_hit THEN 1 END)
              <= 0.02 * count(CASE WHEN NOT is_member THEN 1 END))
              AS fp_rate_ok
          FROM probed""")
      },
      Some("""SELECT
          (SELECT count(*) FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM customer
                               WHERE c_mktsegment = 'BUILDING'))
            AS member_rows_matched,
          CAST(0 AS BIGINT) AS missed_members,
          TRUE AS fp_rate_ok"""))
  )
}
