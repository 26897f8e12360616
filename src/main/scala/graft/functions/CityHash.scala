package graft.functions

/** CityHash v1.1 (Google's public-domain hash design by Pike &
  * Alakuijala), re-implemented in Scala from the published algorithm.
  * Backs the reference's cityHash scalar surface
  * (`pinot-common/.../scalar/HashFunctions.java:289-328`,
  * `pinot-spi/.../utils/hash/CityHashFunctions.java` — itself a JVM
  * port of google/cityhash). Output parity with the reference is
  * pinned by test vectors generated from the reference implementation
  * (CityHashSpec).
  *
  * Plain static-forwardable methods so whole-stage codegen can call
  * `graft.functions.CityHash.cityHash64(bytes)` directly.
  */
object CityHash {

  // primes between 2^63 and 2^64 (published CityHash constants)
  private val K0 = 0xc3a5c85c97cb3127L
  private val K1 = 0xb492b66fbe98f273L
  private val K2 = 0x9ae16a3b2f90404fL
  private val KMul = 0x9ddfea08eb382d69L
  // 32-bit magic (shared with MurmurHash3)
  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  private def fetch32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  private def rot(v: Long, s: Int): Long = java.lang.Long.rotateRight(v, s)
  private def rot32(v: Int, s: Int): Int = Integer.rotateRight(v, s)
  private def shiftMix(v: Long): Long = v ^ (v >>> 47)
  private def bswap32(v: Int): Int = Integer.reverseBytes(v)
  private def bswap64(v: Long): Long = java.lang.Long.reverseBytes(v)

  private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= a >>> 47
    var b = (v ^ a) * mul
    b ^= b >>> 47
    b * mul
  }

  private def hashLen16(u: Long, v: Long): Long = hashLen16(u, v, KMul)

  private def hashLen0to16(s: Array[Byte], len: Int): Long = {
    if (len >= 8) {
      val mul = K2 + len * 2L
      val a = fetch64(s, 0) + K2
      val b = fetch64(s, len - 8)
      val c = rot(b, 37) * mul + a
      val d = (rot(a, 25) + b) * mul
      hashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = K2 + len * 2L
      val a = fetch32(s, 0) & 0xffffffffL
      hashLen16(len + (a << 3), fetch32(s, len - 4) & 0xffffffffL, mul)
    } else if (len > 0) {
      val a = s(0) & 0xff
      val b = s(len >> 1) & 0xff
      val c = s(len - 1) & 0xff
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * K2 ^ z * K0) * K2
    } else K2
  }

  private def hashLen17to32(s: Array[Byte], len: Int): Long = {
    val mul = K2 + len * 2L
    val a = fetch64(s, 0) * K1
    val b = fetch64(s, 8)
    val c = fetch64(s, len - 8) * mul
    val d = fetch64(s, len - 16) * K2
    hashLen16(rot(a + b, 43) + rot(c, 30) + d,
      a + rot(b + K2, 18) + c, mul)
  }

  private def hashLen33to64(s: Array[Byte], len: Int): Long = {
    val mul = K2 + len * 2L
    var a = fetch64(s, 0) * K2
    var b = fetch64(s, 8)
    val c = fetch64(s, len - 24)
    val d = fetch64(s, len - 32)
    val e = fetch64(s, 16) * K2
    val f = fetch64(s, 24) * 9L
    val g = fetch64(s, len - 8)
    val h = fetch64(s, len - 16) * mul
    val u = rot(a + g, 43) + (rot(b, 30) + c) * 9L
    val v = ((a + g) ^ d) + f + 1L
    val w = bswap64((u + v) * mul) + h
    val x = rot(e + f, 42) + c
    val y = (bswap64((v + w) * mul) + g) * mul
    val z = e + f + c
    a = bswap64((x + z) * mul + y) + b
    b = shiftMix((z + a) * mul + d + h) * mul
    b + x
  }

  /** (a, b) running pair used by the >64-byte loop. */
  private def weakHashLen32WithSeeds(w: Long, x: Long, y: Long, z: Long,
      a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rot(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rot(a, 44)
    (a + z, b + c)
  }

  private def weakHashLen32WithSeeds(s: Array[Byte], i: Int, a: Long,
      b: Long): (Long, Long) =
    weakHashLen32WithSeeds(fetch64(s, i), fetch64(s, i + 8),
      fetch64(s, i + 16), fetch64(s, i + 24), a, b)

  def cityHash64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 32) {
      if (len <= 16) hashLen0to16(s, len) else hashLen17to32(s, len)
    } else if (len <= 64) {
      hashLen33to64(s, len)
    } else {
      var x = fetch64(s, len - 40)
      var y = fetch64(s, len - 16) + fetch64(s, len - 56)
      var z = hashLen16(fetch64(s, len - 48) + len, fetch64(s, len - 24))
      var v = weakHashLen32WithSeeds(s, len - 64, len.toLong, z)
      var w = weakHashLen32WithSeeds(s, len - 32, y + K1, x)
      x = x * K1 + fetch64(s, 0)
      var pos = 0
      var remaining = (len - 1) & ~63
      while (remaining != 0) {
        x = rot(x + y + v._1 + fetch64(s, pos + 8), 37) * K1
        y = rot(y + v._2 + fetch64(s, pos + 48), 42) * K1
        x ^= w._2
        y += v._1 + fetch64(s, pos + 40)
        z = rot(z + w._1, 33) * K1
        v = weakHashLen32WithSeeds(s, pos, v._2 * K1, x + w._1)
        w = weakHashLen32WithSeeds(s, pos + 32, z + w._2, y + fetch64(s, pos + 16))
        val t = z; z = x; x = t
        pos += 64
        remaining -= 64
      }
      hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * K1 + z,
        hashLen16(v._2, w._2) + x)
    }
  }

  def cityHash64WithSeed(s: Array[Byte], seed: Long): Long =
    cityHash64WithSeeds(s, K2, seed)

  def cityHash64WithSeeds(s: Array[Byte], seed0: Long, seed1: Long): Long =
    hashLen16(cityHash64(s) - seed0, seed1)

  // ——— 32-bit ———

  private def fmix32(h0: Int): Int = {
    var h = h0
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  private def mur(a0: Int, h0: Int): Int = {
    var a = a0
    var h = h0
    a *= C1
    a = rot32(a, 17)
    a *= C2
    h ^= a
    h = rot32(h, 19)
    h * 5 + 0xe6546b64
  }

  private def hash32Len0to4(s: Array[Byte], len: Int): Int = {
    var b = 0
    var c = 9
    var i = 0
    while (i < len) {
      b = b * C1 + s(i) // signed char in the published algorithm
      c ^= b
      i += 1
    }
    fmix32(mur(b, mur(len, c)))
  }

  private def hash32Len5to12(s: Array[Byte], len: Int): Int = {
    var a = len
    var b = len * 5
    var c = 9
    val d = b
    a += fetch32(s, 0)
    b += fetch32(s, len - 4)
    c += fetch32(s, (len >> 1) & 4)
    fmix32(mur(c, mur(b, mur(a, d))))
  }

  private def hash32Len13to24(s: Array[Byte], len: Int): Int = {
    val a = fetch32(s, (len >> 1) - 4)
    val b = fetch32(s, 4)
    val c = fetch32(s, len - 8)
    val d = fetch32(s, len >> 1)
    val e = fetch32(s, 0)
    val f = fetch32(s, len - 4)
    val h = len
    fmix32(mur(f, mur(e, mur(d, mur(c, mur(b, mur(a, h)))))))
  }

  def cityHash32(s: Array[Byte]): Int = {
    val len = s.length
    if (len <= 24) {
      return if (len <= 12) {
        if (len <= 4) hash32Len0to4(s, len) else hash32Len5to12(s, len)
      } else hash32Len13to24(s, len)
    }
    var h = len
    var g = C1 * len
    var f = g
    locally {
      val a0 = rot32(fetch32(s, len - 4) * C1, 17) * C2
      val a1 = rot32(fetch32(s, len - 8) * C1, 17) * C2
      val a2 = rot32(fetch32(s, len - 16) * C1, 17) * C2
      val a3 = rot32(fetch32(s, len - 12) * C1, 17) * C2
      val a4 = rot32(fetch32(s, len - 20) * C1, 17) * C2
      h ^= a0; h = rot32(h, 19); h = h * 5 + 0xe6546b64
      h ^= a2; h = rot32(h, 19); h = h * 5 + 0xe6546b64
      g ^= a1; g = rot32(g, 19); g = g * 5 + 0xe6546b64
      g ^= a3; g = rot32(g, 19); g = g * 5 + 0xe6546b64
      f += a4; f = rot32(f, 19); f = f * 5 + 0xe6546b64
    }
    var iters = (len - 1) / 20
    var pos = 0
    while (iters > 0) {
      val a0 = rot32(fetch32(s, pos) * C1, 17) * C2
      val a1 = fetch32(s, pos + 4)
      val a2 = rot32(fetch32(s, pos + 8) * C1, 17) * C2
      val a3 = rot32(fetch32(s, pos + 12) * C1, 17) * C2
      val a4 = fetch32(s, pos + 16)
      h ^= a0; h = rot32(h, 18); h = h * 5 + 0xe6546b64
      f += a1; f = rot32(f, 19); f = f * C1
      g += a2; g = rot32(g, 18); g = g * 5 + 0xe6546b64
      h ^= a3 + a1; h = rot32(h, 19); h = h * 5 + 0xe6546b64
      g ^= a4; g = bswap32(g) * 5
      h += a4 * 5; h = bswap32(h)
      f += a0
      // PERMUTE3(f, h, g): swap(f, h) then swap(f, g)
      val f1 = g; val h1 = f; val g1 = h
      f = f1; h = h1; g = g1
      pos += 20
      iters -= 1
    }
    g = rot32(g, 11) * C1
    g = rot32(g, 17) * C1
    f = rot32(f, 11) * C1
    f = rot32(f, 17) * C1
    h = rot32(h + g, 19)
    h = h * 5 + 0xe6546b64
    h = rot32(h, 17) * C1
    h = rot32(h + f, 19)
    h = h * 5 + 0xe6546b64
    rot32(h, 17) * C1
  }

  // ——— 128-bit ———

  /** CityMurmur: the <128-byte path of CityHash128. */
  private def cityMurmur(s: Array[Byte], len: Int, seedLo: Long,
      seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    if (len <= 16) {
      a = shiftMix(a * K1) * K1
      c = b * K1 + hashLen0to16(s, len)
      d = shiftMix(a + (if (len >= 8) fetch64(s, 0) else c))
    } else {
      c = hashLen16(fetch64(s, len - 8) + K1, a)
      d = hashLen16(b + len, c + fetch64(s, len - 16))
      a += d
      var pos = 0
      var l = len
      while ({
        a ^= shiftMix(fetch64(s, pos) * K1) * K1
        a *= K1
        b ^= a
        c ^= shiftMix(fetch64(s, pos + 8) * K1) * K1
        c *= K1
        d ^= c
        pos += 16
        l -= 16
        l > 16
      }) ()
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  private def cityHash128WithSeed(s: Array[Byte], off: Int, len: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len < 128) {
      val sub =
        if (off == 0 && len == s.length) s
        else java.util.Arrays.copyOfRange(s, off, off + len)
      return cityMurmur(sub, len, seedLo, seedHi)
    }
    var x = seedLo
    var y = seedHi
    var z = len * K1
    var v1 = rot(y ^ K1, 49) * K1 + fetch64(s, off)
    var v2 = rot(v1, 42) * K1 + fetch64(s, off + 8)
    var w1 = rot(y + z, 35) * K1 + x
    var w2 = rot(x + fetch64(s, off + 88), 53) * K1
    var pos = off
    var l = len
    while ({
      var i = 0
      while (i < 2) {
        x = rot(x + y + v1 + fetch64(s, pos + 8), 37) * K1
        y = rot(y + v2 + fetch64(s, pos + 48), 42) * K1
        x ^= w2
        y += v1 + fetch64(s, pos + 40)
        z = rot(z + w1, 33) * K1
        val v = weakHashLen32WithSeeds(s, pos, v2 * K1, x + w1)
        val w = weakHashLen32WithSeeds(s, pos + 32, z + w2, y + fetch64(s, pos + 16))
        v1 = v._1; v2 = v._2
        w1 = w._1; w2 = w._2
        val t = z; z = x; x = t
        pos += 64
        i += 1
      }
      l -= 128
      l >= 128
    }) ()
    x += rot(v1 + z, 49) * K0
    y = y * K0 + rot(w2, 37)
    z = z * K0 + rot(w1, 27)
    w1 *= 9L
    v1 *= K0
    var tailDone = 0
    while (tailDone < l) {
      tailDone += 32
      y = rot(x + y, 42) * K0 + v2
      w1 += fetch64(s, pos + l - tailDone + 16)
      x = x * K0 + w1
      z += w2 + fetch64(s, pos + l - tailDone)
      w2 += v1
      val v = weakHashLen32WithSeeds(s, pos + l - tailDone, v1 + z, v2)
      v1 = v._1 * K0
      v2 = v._2
    }
    x = hashLen16(x, v1)
    y = hashLen16(y + z, w1)
    (hashLen16(x + v2, w2) + y, hashLen16(x + w2, y + v2))
  }

  /** 16-byte result, packed big-endian (low then high), matching the
    * reference's ByteBuffer packing. */
  def cityHash128(s: Array[Byte]): Array[Byte] = {
    val len = s.length
    val (lo, hi) =
      if (len >= 16)
        cityHash128WithSeed(s, 16, len - 16, fetch64(s, 0), fetch64(s, 8) + K0)
      else
        cityHash128WithSeed(s, 0, len, K0, K1)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i) = ((lo >>> (56 - 8 * i)) & 0xff).toByte
      out(8 + i) = ((hi >>> (56 - 8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }
}
