package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** H3-index analog: serve SQL geo predicates from a derived hex-cell
  * column instead of a per-row haversine/ray-cast scan.
  *
  * The reference's H3 index answers `ST_Distance(col, point) < r` by
  * partitioning the kRing around the query point into ALWAYS-match
  * cells (fully inside the circle — their postings need no exact
  * check) and POSSIBLE-match cells (boundary — exact re-verify), then
  * unioning posting bitmaps
  * (`pinot-core/.../filter/H3IndexFilterOperator.java:120-200`:
  * `getAlwaysMatchH3Ids`/`getPossibleMatchH3Ids`;
  * polygon inclusion in `H3InclusionIndexFilterOperator.java`).
  *
  * Spark-first re-expression: ingest materializes the cell id of each
  * (lng, lat) at configured resolutions — the SAME
  * [[graft.functions.GeoFunctions.geoToH3]] axial-hex encode the query
  * surface exposes — as a stored LONG column `$h3$lng$lat$res` in a
  * cell-sorted layout. A distance/inclusion predicate rewrites to
  *
  *   (cell ∈ candidate-ranges) AND (cell ∈ full-ranges OR exact-pred)
  *
  * The first conjunct is a small OR of BETWEENs (cell ids for one
  * axial column q are CONTIGUOUS in r — see the id packing in
  * GeoFunctions) that pushes into the parquet scan: row-group min/max
  * on the sorted cell column is the posting-list analog, so I/O scales
  * with the circle's area, not the corpus. The second conjunct is the
  * reference's always/possible split: rows in interior cells
  * short-circuit past the exact predicate; boundary cells re-verify.
  *
  * EXACTNESS. For non-null coordinates in the geographic domain
  * (lng ∈ [-180,180], lat ∈ [-90,90] — the reference's H3 library
  * requires the same), candidate ranges cover every cell that can own
  * a matching point (bbox of the haversine circle, expanded by the
  * cube-rounding slack; antimeridian-crossing circles take the wrapped
  * interval too), so `candidates AND exact ≡ exact`; full ranges only
  * ever SKIP the exact test for cells provably inside the circle
  * (center distance + conservative cell radius ≤ r), so the disjunct
  * adds nothing. NULL coordinates make both the cell id and the exact
  * predicate NULL, so NULL semantics survive any NOT context.
  */
object GeoIndex {

  /** Stored derived-cell column for (lngCol, latCol) at `res` —
    * the `$col$GRANULARITY`-style spelling of TimestampIndexUtils
    * applied to the H3 family. */
  def cellColumn(lngCol: String, latCol: String, res: Int): String =
    "$h3$" + lngCol + "$" + latCol + "$" + res

  /** Materialize the derived cell columns (ingestion transform). The
    * caller writes the result sorted by the finest cell column so
    * row-group stats prune (`sortWithinPartitions(cellColumn(...))`). */
  def apply(df: DataFrame, lngCol: String, latCol: String,
      resolutions: Seq[Int]): DataFrame =
    resolutions.foldLeft(df) { (d, res) =>
      require(res >= 0 && res <= 14, s"h3 resolution: $res")
      d.withColumn(cellColumn(lngCol, latCol, res),
        graft.functions.GeoFunctions.geoToH3(
          col(lngCol), col(latCol), lit(res)))
    }

  final case class Reg(lngCol: String, latCol: String, resolutions: Seq[Int])

  private val reg = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), Reg]()

  def registerTable(table: String, lngCol: String, latCol: String,
      resolutions: Seq[Int]): Unit =
    reg.put((table.toLowerCase, lngCol.toLowerCase, latCol.toLowerCase),
      Reg(lngCol, latCol, resolutions.sorted))

  def clear(): Unit = reg.clear()

  private[graft] def isEmpty: Boolean = reg.isEmpty

  private[graft] def lookup(table: String, lngCol: String,
      latCol: String): Option[Reg] =
    Option(reg.get((table.toLowerCase, lngCol.toLowerCase,
      latCol.toLowerCase)))

  // ——— driver-side mirror of the GeoFunctions axial grid ———
  // (pure math over the LITERAL query point — never touches data)

  private val Sqrt3 = math.sqrt(3.0)
  private val EarthR = 6371008.8       // matches haversineMeters
  private val MetersPerDeg = EarthR * math.Pi / 180.0

  private def hexSize(res: Int): Double =
    20.0 / math.pow(math.sqrt(7.0), res.toDouble)

  private def packCell(res: Int, q: Long, r: Long): Long =
    res.toLong * 1125899906842624L + (q + 16777216L) * 33554432L +
      (r + 16777216L)

  private def haversineM(lng1: Double, lat1: Double,
      lng2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lng2 - lng1) / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon) * math.sin(dLon)
    2.0 * EarthR * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** One contiguous cell-id range (same axial column q, r interval). */
  final case class CellRange(lo: Long, hi: Long)
  /** Candidate ranges (superset of matching cells) + the full-match
    * subset (cells provably inside the region — exact test skippable). */
  final case class Ranges(candidates: Seq[CellRange], full: Seq[CellRange])

  /** Emitted OR-of-BETWEEN branches cap: predicate size stays bounded
    * no matter the radius/resolution mismatch. */
  val MaxRanges = 128
  /** Candidate cell-count cap across ranges. */
  val MaxCells = 65536L

  /** Cube-rounding slack: a point owned by cell (q,r) has fractional
    * coords within ±1 of (q,r) (round-then-repair moves a coordinate by
    * at most 1), so its degree offset from the cell center is bounded by
    * Δlng ≤ √3·1.5·s, Δlat ≤ 1.5·s. */
  private def cellReachDegLng(s: Double) = Sqrt3 * 1.5 * s
  private def cellReachDegLat(s: Double) = 1.5 * s
  /** Conservative meters bound of the same reach (cos factor ≤ 1). */
  private def cellReachMeters(s: Double): Double =
    (cellReachDegLng(s) + cellReachDegLat(s)) * MetersPerDeg

  /** Integer (q, r) rectangle covering a degree bbox, with the cube-
    * rounding margin. */
  private def qrRect(lngMin: Double, latMin: Double, lngMax: Double,
      latMax: Double, s: Double): (Long, Long, Long, Long) = {
    def qf(lng: Double, lat: Double) = (lng * (Sqrt3 / 3.0) - lat / 3.0) / s
    def rf(lat: Double) = lat * (2.0 / 3.0) / s
    val qLo = math.floor(qf(lngMin, latMax)).toLong - 1
    val qHi = math.ceil(qf(lngMax, latMin)).toLong + 1
    val rLo = math.floor(rf(latMin)).toLong - 1
    val rHi = math.ceil(rf(latMax)).toLong + 1
    (qLo, qHi, rLo, rHi)
  }

  /** Candidate + full cell ranges for the haversine circle
    * `ST_Distance(point, (lng0,lat0)) ≤ rMeters` at `res`. None when
    * the region needs more than the caps allow at this resolution (or
    * touches a pole) — the caller falls back or tries another
    * resolution. */
  def circleRanges(lng0: Double, lat0: Double, rMeters: Double,
      res: Int): Option[Ranges] = {
    if (rMeters < 0) return Some(Ranges(Nil, Nil)) // empty: d >= 0 always
    val s = hexSize(res)
    val cRad = rMeters / EarthR
    val dLat = math.toDegrees(cRad)
    if (math.abs(lat0) + dLat >= 89.9) return None // pole: full lng band
    val cosFar = math.cos(math.toRadians(math.abs(lat0) + dLat))
    val dLng = math.toDegrees(math.asin(
      math.min(1.0, math.sin(cRad) / cosFar))) * 1.0000001
    val latMin = lat0 - dLat; val latMax = lat0 + dLat
    // antimeridian: wrapped circles cover up to two lng intervals
    val lngIntervals: Seq[(Double, Double)] = {
      val lo = lng0 - dLng; val hi = lng0 + dLng
      if (lo < -180.0 && hi > 180.0) Seq((-180.0, 180.0))
      else if (lo < -180.0) Seq((-180.0, hi), (lo + 360.0, 180.0))
      else if (hi > 180.0) Seq((lo, 180.0), (-180.0, hi - 360.0))
      else Seq((lo, hi))
    }
    val reach = cellReachMeters(s)
    val cand = Seq.newBuilder[CellRange]
    val full = Seq.newBuilder[CellRange]
    var nRanges = 0
    var nCells = 0L
    for ((lngMin, lngMax) <- lngIntervals) {
      val (qLo, qHi, rLo, rHi) = qrRect(lngMin, latMin, lngMax, latMax, s)
      if (qHi - qLo + 1 + nRanges > MaxRanges) return None
      var q = qLo
      while (q <= qHi) {
        // trim each axial column to the circle (+ reach); keep the
        // interval hull so any convexity slop stays a superset
        var cLo = Long.MaxValue; var cHi = Long.MinValue
        var fLo = Long.MaxValue; var fHi = Long.MinValue
        var r = rLo
        while (r <= rHi) {
          val cLng = s * (q * Sqrt3 + r * (Sqrt3 / 2.0))
          val cLat = s * (r * 1.5)
          val d = haversineM(lng0, lat0,
            // wrapped interval: compare against the center as stored
            cLng, cLat)
          if (d <= rMeters + reach) {
            if (r < cLo) cLo = r
            if (r > cHi) cHi = r
            if (d + reach <= rMeters) {
              if (r < fLo) fLo = r; if (r > fHi) fHi = r
            }
          }
          r += 1
        }
        if (cLo <= cHi) {
          cand += CellRange(packCell(res, q, cLo), packCell(res, q, cHi))
          nRanges += 1
          nCells += cHi - cLo + 1
          if (nCells > MaxCells) return None
          if (fLo <= fHi)
            full += CellRange(packCell(res, q, fLo), packCell(res, q, fHi))
        }
        q += 1
      }
    }
    Some(Ranges(cand.result(), full.result()))
  }

  /** Candidate ranges for polygon inclusion: cells covering the outer
    * ring's bbox (planar, like stContains). All candidates are
    * boundary cells — the exact ray-cast re-verifies every survivor
    * (the reference's H3InclusionIndexFilterOperator computes exact
    * cell coverage; the bbox superset keeps the same contract with
    * simpler math). */
  def bboxRanges(lngMin: Double, latMin: Double, lngMax: Double,
      latMax: Double, res: Int): Option[Ranges] = {
    val s = hexSize(res)
    val (qLo, qHi, rLo, rHi) = qrRect(lngMin, latMin, lngMax, latMax, s)
    if (qHi - qLo + 1 > MaxRanges) return None
    if ((qHi - qLo + 1) * (rHi - rLo + 1) > MaxCells) return None
    val cand = (qLo to qHi).map(q =>
      CellRange(packCell(res, q, rLo), packCell(res, q, rHi)))
    Some(Ranges(cand, Nil))
  }

  /** Pick the finest registered resolution whose ranges fit the caps. */
  def bestRanges(resolutions: Seq[Int],
      f: Int => Option[Ranges]): Option[(Int, Ranges)] =
    resolutions.sorted.reverse.view.flatMap(r => f(r).map((r, _)))
      .headOption
}
