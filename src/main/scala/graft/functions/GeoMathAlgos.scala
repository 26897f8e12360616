package graft.functions

/** Static algorithm backends for the geohash and integer-math scalar
  * expressions (`plans/ScalarExprs.scala`): the standard public
  * geohash base-32 encoding (Niemeyer's scheme, as surfaced by
  * `scalar/GeohashFunctions.java`) and Euclid gcd/lcm
  * (`ArithmeticFunctions.java` gcd/lcm). Plain JVM statics so
  * whole-stage codegen can call them directly.
  */
object GeoAlgos {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash: interleave lon/lat bisection bits, 5 bits per
    * base-32 character. */
  def encodeGeoHash(latitude: Double, longitude: Double, precision: Int): String = {
    val p = math.max(1, math.min(12, precision))
    var minLat = -90.0; var maxLat = 90.0
    var minLon = -180.0; var maxLon = 180.0
    val sb = new java.lang.StringBuilder(p)
    var isEven = true
    var ch = 0
    var bit = 0
    while (sb.length < p) {
      if (isEven) {
        val mid = (minLon + maxLon) / 2
        if (longitude >= mid) { ch = (ch << 1) | 1; minLon = mid }
        else { ch = ch << 1; maxLon = mid }
      } else {
        val mid = (minLat + maxLat) / 2
        if (latitude >= mid) { ch = (ch << 1) | 1; minLat = mid }
        else { ch = ch << 1; maxLat = mid }
      }
      isEven = !isEven
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decode to the cell-center (lat, lon) — the reference's decode
    * midpoint semantics. */
  def decodeGeoHash(geohash: String): Array[Double] = {
    var minLat = -90.0; var maxLat = 90.0
    var minLon = -180.0; var maxLon = 180.0
    var isEven = true
    var i = 0
    while (i < geohash.length) {
      val cd = Base32.indexOf(geohash.charAt(i).toLower)
      var j = 4
      while (j >= 0) {
        val bit = (cd >> j) & 1
        if (isEven) {
          val mid = (minLon + maxLon) / 2
          if (bit == 1) minLon = mid else maxLon = mid
        } else {
          val mid = (minLat + maxLat) / 2
          if (bit == 1) minLat = mid else maxLat = mid
        }
        isEven = !isEven
        j -= 1
      }
      i += 1
    }
    Array((minLat + maxLat) / 2, (minLon + maxLon) / 2)
  }

  def decodeGeoHashLatitude(geohash: String): Double = decodeGeoHash(geohash)(0)

  def decodeGeoHashLongitude(geohash: String): Double = decodeGeoHash(geohash)(1)
}

object MathAlgos {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L else math.abs(a / gcd(a, b) * b)

  /** Character-position Hamming distance; −1 when lengths differ (the
    * conventional undefined case, reference `StringFunctions`). */
  def hammingDistance(a: String, b: String): Int = {
    if (a.length != b.length) return -1
    var d = 0; var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }
}
