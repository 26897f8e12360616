package graft.functions

/** Stable hash algorithms backing the Pinot-named hash surface
  * (`pinot-common/.../function/scalar/HashFunctions.java`,
  * `pinot-spi/.../utils/hash/{MurmurHashFunctions,FnvHashFunctions}
  * .java`). All are standard published algorithms — MurmurHash2/3
  * (Austin Appleby's public-domain designs; murmur2 with the Kafka
  * seed 0x9747b28c the reference standardized on), FNV-1/1a with the
  * canonical offset-basis/prime constants, and JDK Adler32/CRC32C/MD2
  * — re-implemented here from their public specifications.
  *
  * Kept as plain static-forwardable JVM methods so the Catalyst
  * expression layer (`plans/HashExpr.scala`) can call them from
  * whole-stage-generated code.
  */
object HashAlgos {

  // —— MurmurHash2, 32-bit (seed 0x9747b28c as in Kafka/the reference) ——
  def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = 0x9747b28c ^ length
    var i = 0
    while (i + 4 <= length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val tail = length & ~3
    (length & 3) match {
      case 3 =>
        h ^= (data(tail + 2) & 0xff) << 16
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff; h *= m
      case 2 =>
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff; h *= m
      case 1 =>
        h ^= data(tail) & 0xff; h *= m
      case _ =>
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  // —— MurmurHash2, 64-bit (default seed 0xe17a1465) ——
  def murmur2Bit64(data: Array[Byte]): Long = murmur2Bit64(data, 0xe17a1465)

  def murmur2Bit64(data: Array[Byte], seed: Int): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    val length = data.length
    var h = (seed & 0xffffffffL) ^ (length * m)
    var i = 0
    while (i + 8 <= length) {
      var k = littleLong(data, i)
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 8
    }
    val tail = length & ~7
    var j = (length & 7) - 1
    while (j >= 0) {
      if (j == 0) { h ^= data(tail) & 0xffL; h *= m }
      else h ^= (data(tail + j) & 0xffL) << (8 * j)
      j -= 1
    }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  // —— MurmurHash3 x86_32 (the `_fixed` / canonical variant) ——
  def murmur3Bit32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val length = data.length
    var h = seed
    var i = 0
    while (i + 4 <= length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    val tail = length & ~3
    (length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((length & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h ^= k1
    }
    h ^= length
    fmix32(h)
  }

  // —— MurmurHash3 x64_128 (canonical; 64-bit = low half, as guava) ——
  def murmur3Bit128(data: Array[Byte], seed: Int): Array[Byte] = {
    val (h1, h2) = murmur3X64Core(data, seed)
    val out = new Array[Byte](16)
    putLittleLong(out, 0, h1)
    putLittleLong(out, 8, h2)
    out
  }

  def murmur3Bit64(data: Array[Byte], seed: Int): Long =
    murmur3X64Core(data, seed)._1

  private def murmur3X64Core(data: Array[Byte], seed: Int): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    val length = data.length
    var h1 = seed & 0xffffffffL
    var h2 = seed & 0xffffffffL
    var i = 0
    while (i + 16 <= length) {
      var k1 = littleLong(data, i)
      var k2 = littleLong(data, i + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5
      i += 16
    }
    val tail = length & ~15
    var k1 = 0L
    var k2 = 0L
    val rem = length & 15
    var j = rem - 1
    while (j >= 8) {
      k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1
    }
    if (rem > 8) {
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    while (j >= 0) {
      k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1
    }
    if (rem > 0) {
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= length; h2 ^= length
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  // —— MurmurHash3 x64, Infinispan variant (the reference's
  // `MurmurHashFunctions.murmurHash3X64*`, which follows the
  // Infinispan MurmurHash3 x64 design: distinct init constants
  // h1=0x9368e53c2f6af274^seed / h2=0x586dcd208f7cd3fd^seed, rotating
  // c1/c2 that evolve each block, sign-extending tail loads, and a
  // final bmix on any non-empty tail). Re-implemented from the public
  // algorithm; parity pinned by vectors in CityHashSpec. ——
  private def murmur3X64Infinispan(key: Array[Byte], seed: Int): (Long, Long) = {
    var h1 = 0x9368e53c2f6af274L ^ seed
    var h2 = 0x586dcd208f7cd3fdL ^ seed
    var c1 = 0x87c37b91114253d5L
    var c2 = 0x4cf5ad432745937fL
    var k1 = 0L
    var k2 = 0L

    def bmix(): Unit = {
      k1 *= c1
      k1 = (k1 << 23) | (k1 >>> 41)
      k1 *= c2
      h1 ^= k1
      h1 += h2
      h2 = (h2 << 41) | (h2 >>> 23)
      k2 *= c2
      k2 = (k2 << 23) | (k2 >>> 41)
      k2 *= c1
      h2 ^= k2
      h2 += h1
      h1 = h1 * 3 + 0x52dce729L
      h2 = h2 * 3 + 0x38495ab5L
      c1 = c1 * 5 + 0x7b7d159cL
      c2 = c2 * 5 + 0x6bce6396L
    }

    val length = key.length
    var i = 0
    while (i + 16 <= length) {
      k1 = littleLong(key, i)
      k2 = littleLong(key, i + 8)
      bmix()
      i += 16
    }
    k1 = 0L
    k2 = 0L
    val tail = length & 0xFFFFFFF0
    val rem = length & 15
    // tail loads sign-extend (byte → long before shifting), matching
    // the published variant
    var j = rem - 1
    while (j >= 8) {
      k2 ^= key(tail + j).toLong << ((j - 8) * 8); j -= 1
    }
    while (j >= 1) {
      k1 ^= key(tail + j).toLong << (j * 8); j -= 1
    }
    if (rem > 0) {
      k1 ^= key(tail).toLong
      bmix()
    }
    h2 ^= length
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  def murmur3X64Bit32(data: Array[Byte], seed: Int): Int =
    (murmur3X64Infinispan(data, seed)._1 >>> 32).toInt

  /** The reference's SQL-facing murmurHash3X64Bit64
    * (`HashFunctions.java:174`) delegates to the *32-bit* variant and
    * widens — an observable quirk we mirror for result parity. */
  def murmur3X64Bit64(data: Array[Byte], seed: Int): Long =
    murmur3X64Bit32(data, seed).toLong

  /** 16 bytes, big-endian h1 then h2 (reference ByteBuffer packing). */
  def murmur3X64Bit128(data: Array[Byte], seed: Int): Array[Byte] = {
    val (h1, h2) = murmur3X64Infinispan(data, seed)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i) = ((h1 >>> (56 - 8 * i)) & 0xff).toByte
      out(8 + i) = ((h2 >>> (56 - 8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }

  private def fmix32(x0: Int): Int = {
    var x = x0
    x ^= x >>> 16; x *= 0x85ebca6b; x ^= x >>> 13
    x *= 0xc2b2ae35; x ^= x >>> 16
    x
  }

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L; x ^= x >>> 33
    x
  }

  private def littleLong(data: Array[Byte], i: Int): Long =
    (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
      ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24) |
      ((data(i + 4) & 0xffL) << 32) | ((data(i + 5) & 0xffL) << 40) |
      ((data(i + 6) & 0xffL) << 48) | ((data(i + 7) & 0xffL) << 56)

  private def putLittleLong(out: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { out(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  // —— FNV-1 / FNV-1a, canonical constants ——
  def fnv1Hash32(data: Array[Byte]): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < data.length) { h = (h * 0x01000193) ^ (data(i) & 0xff); i += 1 }
    h
  }

  def fnv1aHash32(data: Array[Byte]): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < data.length) { h = (h ^ (data(i) & 0xff)) * 0x01000193; i += 1 }
    h
  }

  def fnv1Hash64(data: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < data.length) {
      h = (h * 0x100000001b3L) ^ (data(i) & 0xffL); i += 1
    }
    h
  }

  def fnv1aHash64(data: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < data.length) {
      h = (h ^ (data(i) & 0xffL)) * 0x100000001b3L; i += 1
    }
    h
  }

  // —— JDK-backed checksums / digests ——
  def adler32(data: Array[Byte]): Int = {
    val a = new java.util.zip.Adler32()
    a.update(data, 0, data.length)
    a.getValue.toInt
  }

  def crc32c(data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(data, 0, data.length)
    c.getValue.toInt
  }

  def md2Hex(data: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD2").digest(data)
    val sb = new java.lang.StringBuilder(d.length * 2)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
