package graft.functions

/** Pure-JVM bcrypt (OpenBSD `crypt`-style `$2a$` hashes), implementing the
  * public algorithm of Provos & Mazières, "A Future-Adaptable Password
  * Scheme" (USENIX 1999): Blowfish with the expensive-key-schedule
  * (eksblowfish) setup, then 64 ECB encryptions of the magic block
  * `OrpheanBeholderScryDoubt`.
  *
  * The reference stores password predicates as bcrypt hashes
  * (types/password.go Encrypt/VerifyPassword) and `checkpwd` verifies a
  * candidate against the stored hash (worker/task.go:255). This
  * implementation is hash-compatible: a `$2a$` hash written by the
  * reference verifies here and vice versa.
  *
  * Blowfish's initial P-array and S-boxes are the leading hexadecimal
  * digits of π (a "nothing-up-my-sleeve" constant). Rather than embed the
  * 1,042 opaque words, they are DERIVED at class-init from a fixed-point
  * Machin-formula computation (π = 16·atan(1/5) − 4·atan(1/239)) with
  * exact BigInteger arithmetic — 33,344 fraction bits + 128 guard bits —
  * and spot-checked against the first published words (0x243f6a88…).
  */
object Bcrypt {

  private val Rounds = 16 // Blowfish Feistel rounds
  private val MagicString = "OrpheanBeholderScryDoubt" // 3 x 64-bit blocks

  // ---- initial P/S boxes: hex digits of pi ----

  /** 18 P-words + 4×256 S-words = 1042 words = 33,344 bits of π's
    * fractional part, big-endian nibble order.
    */
  private val (p0, s0): (Array[Int], Array[Int]) = {
    import java.math.BigInteger
    val fracBits = (18 + 1024) * 32
    val guard = 128
    val shift = fracBits + guard
    // atan(1/x) in fixed point: sum (-1)^k / ((2k+1) x^(2k+1))
    def atanInv(x: Long): BigInteger = {
      val x2 = BigInteger.valueOf(x * x)
      var term = BigInteger.ONE.shiftLeft(shift).divide(BigInteger.valueOf(x))
      var sum = BigInteger.ZERO
      var k = 0
      while (term.signum != 0) {
        val t = term.divide(BigInteger.valueOf(2L * k + 1))
        sum = if (k % 2 == 0) sum.add(t) else sum.subtract(t)
        term = term.divide(x2)
        k += 1
      }
      sum
    }
    val pi = atanInv(5).shiftLeft(4).subtract(atanInv(239).shiftLeft(2))
    // fractional part, truncated to fracBits (drop guard), MSB first
    val frac = pi.subtract(BigInteger.valueOf(3).shiftLeft(shift))
      .shiftRight(guard)
    val words = new Array[Int](18 + 1024)
    for (i <- words.indices) {
      // word i = bits [fracBits-32i-32, fracBits-32i) of the fraction
      words(i) = frac.shiftRight(fracBits - 32 * (i + 1))
        .and(BigInteger.valueOf(0xffffffffL)).longValue().toInt
    }
    require(words(0) == 0x243f6a88 && words(1) == 0x85a308d3 &&
      words(2) == 0x13198a2e && words(3) == 0x03707344,
      "pi digit derivation is wrong")
    (words.slice(0, 18), words.slice(18, 18 + 1024))
  }

  // ---- Blowfish core ----

  private final class State {
    val P: Array[Int] = p0.clone()
    val S: Array[Int] = s0.clone()

    def encipher(lr: Array[Int], off: Int): Unit = {
      var l = lr(off) ^ P(0)
      var r = lr(off + 1)
      var i = 0
      while (i <= Rounds - 2) {
        var n = S((l >>> 24) & 0xff)
        n += S(0x100 | ((l >>> 16) & 0xff))
        n ^= S(0x200 | ((l >>> 8) & 0xff))
        n += S(0x300 | (l & 0xff))
        i += 1
        r ^= n ^ P(i)
        n = S((r >>> 24) & 0xff)
        n += S(0x100 | ((r >>> 16) & 0xff))
        n ^= S(0x200 | ((r >>> 8) & 0xff))
        n += S(0x300 | (r & 0xff))
        i += 1
        l ^= n ^ P(i)
      }
      lr(off) = r ^ P(Rounds + 1)
      lr(off + 1) = l
    }

    /** Next big-endian word from a cyclic byte stream. */
    private def streamWord(data: Array[Byte], off: Array[Int]): Int = {
      var word = 0
      var i = 0
      while (i < 4) {
        word = (word << 8) | (data(off(0)) & 0xff)
        off(0) = (off(0) + 1) % data.length
        i += 1
      }
      word
    }

    def key(k: Array[Byte]): Unit = {
      val off = Array(0)
      for (i <- P.indices) P(i) ^= streamWord(k, off)
      val lr = Array(0, 0)
      var i = 0
      while (i < P.length) { encipher(lr, 0); P(i) = lr(0); P(i + 1) = lr(1); i += 2 }
      i = 0
      while (i < S.length) { encipher(lr, 0); S(i) = lr(0); S(i + 1) = lr(1); i += 2 }
    }

    /** The "expensive key schedule": like key(), but the zero block is
      * XORed with alternating salt halves before each encipher.
      */
    def eksKey(salt: Array[Byte], k: Array[Byte]): Unit = {
      val koff = Array(0); val soff = Array(0)
      for (i <- P.indices) P(i) ^= streamWord(k, koff)
      val lr = Array(0, 0)
      var i = 0
      while (i < P.length) {
        lr(0) ^= streamWord(salt, soff); lr(1) ^= streamWord(salt, soff)
        encipher(lr, 0); P(i) = lr(0); P(i + 1) = lr(1); i += 2
      }
      i = 0
      while (i < S.length) {
        lr(0) ^= streamWord(salt, soff); lr(1) ^= streamWord(salt, soff)
        encipher(lr, 0); S(i) = lr(0); S(i + 1) = lr(1); i += 2
      }
    }
  }

  private def cryptRaw(password: Array[Byte], salt: Array[Byte],
      logRounds: Int): Array[Byte] = {
    require(logRounds >= 4 && logRounds <= 30, s"bad cost $logRounds")
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    val st = new State
    st.eksKey(salt, password)
    val rounds = 1L << logRounds
    var i = 0L
    while (i < rounds) { st.key(password); st.key(salt); i += 1 }
    val cdata = new Array[Int](6)
    val mb = MagicString.getBytes("US-ASCII")
    for (j <- cdata.indices)
      cdata(j) = ((mb(4 * j) & 0xff) << 24) | ((mb(4 * j + 1) & 0xff) << 16) |
        ((mb(4 * j + 2) & 0xff) << 8) | (mb(4 * j + 3) & 0xff)
    i = 0
    while (i < 64) { var j = 0; while (j < 3) { st.encipher(cdata, j << 1); j += 1 }; i += 1 }
    val out = new Array[Byte](24)
    for (j <- cdata.indices) {
      out(4 * j) = (cdata(j) >>> 24).toByte
      out(4 * j + 1) = (cdata(j) >>> 16).toByte
      out(4 * j + 2) = (cdata(j) >>> 8).toByte
      out(4 * j + 3) = cdata(j).toByte
    }
    out
  }

  // ---- bcrypt's base64 (alphabet "./A-Za-z0-9", no padding) ----

  private val B64 =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val B64Inv: Array[Byte] = {
    val inv = Array.fill[Byte](128)(-1)
    for (i <- B64.indices) inv(B64(i)) = i.toByte
    inv
  }

  private def b64Encode(d: Array[Byte], len: Int): String = {
    val sb = new StringBuilder
    var off = 0
    while (off < len) {
      var c1 = d(off) & 0xff; off += 1
      sb.append(B64(c1 >> 2))
      c1 = (c1 & 0x03) << 4
      if (off >= len) { sb.append(B64(c1)) }
      else {
        var c2 = d(off) & 0xff; off += 1
        c1 |= c2 >> 4
        sb.append(B64(c1))
        c1 = (c2 & 0x0f) << 2
        if (off >= len) { sb.append(B64(c1)) }
        else {
          c2 = d(off) & 0xff; off += 1
          c1 |= c2 >> 6
          sb.append(B64(c1))
          sb.append(B64(c2 & 0x3f))
        }
      }
    }
    sb.toString
  }

  private def b64Decode(s: String, maxLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var off = 0
    def next(): Int = { val c = B64Inv(s(off)); off += 1; c }
    while (off < s.length - 1 && out.size < maxLen) {
      val c1 = next(); val c2 = next()
      if (c1 < 0 || c2 < 0) return out.toByteArray
      out.write(((c1 << 2) | ((c2 & 0x30) >> 4)) & 0xff)
      if (out.size >= maxLen || off >= s.length) return out.toByteArray
      val c3 = next()
      if (c3 < 0) return out.toByteArray
      out.write((((c2 & 0x0f) << 4) | ((c3 & 0x3c) >> 2)) & 0xff)
      if (out.size >= maxLen || off >= s.length) return out.toByteArray
      val c4 = next()
      if (c4 < 0) return out.toByteArray
      out.write((((c3 & 0x03) << 6) | c4) & 0xff)
    }
    out.toByteArray
  }

  // ---- public API ----

  /** `hashpw(password, "$2a$NN$<22-char salt>")` → full 60-char hash.
    * Accepts `$2a$`/`$2b$`/`$2y$` prefixes (identical algorithm for
    * passwords ≤ 72 bytes; the variants differ only in a wraparound bug
    * fix for longer inputs, which we reject).
    */
  def hashpw(password: String, salt: String): String = {
    require(salt.length >= 28 && salt(0) == '$' && salt(1) == '2',
      s"invalid bcrypt salt: $salt")
    val minor = salt(2) match {
      case '$' => ' '
      case m @ ('a' | 'b' | 'y') => m
      case m => throw new IllegalArgumentException(s"bad bcrypt minor $m")
    }
    val off = if (minor == ' ') 3 else 4
    require(salt(off + 2) == '$', s"missing cost separator in $salt")
    val cost = salt.substring(off, off + 2).toInt
    val saltB = b64Decode(salt.substring(off + 3, off + 3 + 22), 16)
    val pwBytes = password.getBytes("UTF-8")
    require(pwBytes.length <= 72, "bcrypt passwords are at most 72 bytes")
    // $2a$+ append a NUL terminator to the password stream
    val key = if (minor >= 'a') pwBytes :+ 0.toByte else pwBytes
    val hashed = cryptRaw(key, saltB, cost)
    val sb = new StringBuilder("$2")
    if (minor >= 'a') sb.append(minor)
    sb.append('$')
    if (cost < 10) sb.append('0')
    sb.append(cost).append('$')
    sb.append(b64Encode(saltB, 16))
    sb.append(b64Encode(hashed, 23)) // last ciphertext byte dropped, like crypt()
    sb.toString
  }

  /** Verify candidate against a stored bcrypt hash. */
  def checkpw(candidate: String, stored: String): Boolean = {
    val recomputed = hashpw(candidate, stored)
    // constant-time compare
    recomputed.length == stored.length &&
      recomputed.zip(stored).foldLeft(0)((a, c) => a | (c._1 ^ c._2)) == 0
  }

  /** Deterministic salt string from any seed (for reproducible fixtures;
    * production callers should use SecureRandom bytes instead).
    */
  def saltFromSeed(seed: String, cost: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = md.digest(seed.getBytes("UTF-8")) // 16 bytes
    val sb = new StringBuilder("$2a$")
    if (cost < 10) sb.append('0')
    sb.append(cost).append('$').append(b64Encode(bytes, 16))
    sb.toString
  }
}
