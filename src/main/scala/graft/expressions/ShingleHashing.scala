package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared digest plumbing for the shingle-hashing kernels ([[MinHashes]],
  * [[MinShingleDigest]]) — ONE implementation of the parity-critical inner
  * loop (token byte caching, concat_ws null-skip shingle digesting), so
  * the two kernels cannot drift apart when a twin changes, plus a
  * per-thread MessageDigest so the JCA provider lookup is not paid per
  * row.
  */
private[expressions] object ShingleHashing {

  val shingleSize: Int = graft.operators.Dedup.shingleSize

  val hexDigits: Array[Byte] = "0123456789abcdef".getBytes

  private val sha = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  /** Per-thread SHA-256, defensively reset before return: digest() resets
    * after every shingle, but a mid-row failure on this thread must not
    * leak partial update state into the next row's hashes.
    */
  def sha256(): MessageDigest = {
    val md = sha.get()
    md.reset()
    md
  }

  /** Token UTF-8 bytes fetched once per row — a token appears in up to k
    * shingles, and `ArrayData.getUTF8String(i).getBytes` per use would
    * copy it k times. Null tokens stay null (skipped by
    * [[digestShingle]], exactly like concat_ws).
    */
  def tokenBytes(toks: ArrayData): Array[Array[Byte]] = {
    val n = toks.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val u = toks.getUTF8String(i)
      bytes(i) = if (u == null) null else u.getBytes
      i += 1
    }
    bytes
  }

  /** sha256 of `concat_ws(" ", bytes(s), ..., bytes(s+k-1))` into `out`
    * (32 bytes, no shingle string ever built). Null tokens are SKIPPED
    * with no doubled separator — Spark's concat_ws semantics, pinned by
    * both kernels' twin specs. `md.digest(out, 0, 32)` also RESETS md
    * for the next shingle.
    */
  def digestShingle(bytes: Array[Array[Byte]], s: Int,
      md: MessageDigest, out: Array[Byte]): Unit = {
    var first = true
    var j = s
    while (j < s + shingleSize) {
      val b = bytes(j)
      if (b != null) {
        if (!first) md.update(' '.toByte)
        md.update(b)
        first = false
      }
      j += 1
    }
    md.digest(out, 0, 32)
  }
}
