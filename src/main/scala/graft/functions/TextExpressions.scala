package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels as native codegen expressions (same design as
  * [[VectorKernel]]).
  */
object TextKernel {

  /** Distinct k-token shingles of one document, first-occurrence order.
    *
    * Tokenizer contract: single-space separator, empty tokens kept
    * (Java `split(" ", -1)` == Spark `split(text, ' ')` == DuckDB
    * `string_split`), shingles joined with a single space — exactly the
    * rows the explode→lead-window→distinct pipeline produces, but in
    * ONE linear pass per document with per-doc dedup, so the caller
    * needs no window shuffle and no distinct shuffle at all.
    */
  def distinctShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Distinct k-token shingle HASHES of one document — the fingerprint
    * stream [[distinctShingles]]→`xxhash64` produces, computed
    * zero-copy: a k-token shingle joined with single spaces is exactly
    * the byte span of the ORIGINAL text from token i's first byte to
    * token i+k-1's last byte (the tokenizer splits on single spaces, so
    * re-joining with single spaces reproduces the source bytes, empty
    * tokens included), and 0x20 never occurs inside a UTF-8 multi-byte
    * sequence — so each hash runs XXH64 (seed 42, Spark's `xxhash64`,
    * bit-identical and therefore interoperable with indexes persisted
    * by the string pipeline; spec-pinned) directly over a slice of the
    * input bytes. No shingle string, no per-shingle allocation, no
    * post-explode hash projection.
    */
  def distinctShingleHashes(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token boundaries: starts(i) = first byte of token i; ends(i) = one
    // past its last byte. numToks = spaces + 1 (split(" ", -1) contract).
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val numToks = spaces + 1
    if (numToks < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var s = 0
    while (s + k <= numToks) {
      val from = starts(s)
      val len = ends(s + k - 1) - from
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        len, 42L))
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next().longValue(); m += 1 }
    new GenericArrayData(out)
  }

  /** Tier-6 span sampling fused into one pass: md5 every char-k-gram of
    * the document, keep the digests whose HEX form starts with `sel`
    * ("0 mod p" content-defined selection), dedup within the doc, return
    * the selected hex digests. Bit-identical to the explode→substr→md5→
    * startsWith→distinct pipeline it replaces ([[graft.ops.Dedup
    * .spanFingerprints]] history), but with no per-position row
    * materialization, no hex string for the ~15/16 rejected positions
    * (the prefix check reads digest NIBBLES), and no distinct exchange
    * (dedup happens here). ASCII documents — the overwhelming case —
    * hash a sliding window of ONE byte array with zero per-position
    * allocation; multi-byte text falls back to the codepoint-exact
    * substring path (Spark `substr` counts codepoints, not UTF-16
    * units, so the fallback indexes by codepoint).
    */
  def sampledSpanHashes(text: UTF8String, k: Int, sel: String): ArrayData = {
    val s = text.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[String]
    val selN = new Array[Int](sel.length)
    var i = 0
    while (i < sel.length) {
      selN(i) = java.lang.Character.digit(sel.charAt(i), 16); i += 1
    }
    def selected(d: Array[Byte]): Boolean = {
      var j = 0
      while (j < selN.length) {
        val nib = if (j % 2 == 0) (d(j / 2) >> 4) & 0xF else d(j / 2) & 0xF
        if (nib != selN(j)) return false
        j += 1
      }
      true
    }
    def hex(d: Array[Byte]): String = {
      val out = new Array[Char](32)
      var j = 0
      while (j < 16) {
        out(2 * j) = HexDigits((d(j) >> 4) & 0xF)
        out(2 * j + 1) = HexDigits(d(j) & 0xF)
        j += 1
      }
      new String(out)
    }
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length == s.length) {
      // ASCII: bytes index == char index == codepoint index
      var p = 0
      while (p + k <= bytes.length) {
        md.reset()
        md.update(bytes, p, k)
        val d = md.digest()
        if (selected(d)) seen.add(hex(d))
        p += 1
      }
    } else {
      // codepoint-exact fallback: char offsets of each codepoint start
      val n = s.codePointCount(0, s.length)
      val starts = new Array[Int](n + 1)
      var ci = 0; var cp = 0
      while (cp < n) { starts(cp) = ci; ci = s.offsetByCodePoints(ci, 1); cp += 1 }
      starts(n) = s.length
      var p = 0
      while (p + k <= n) {
        md.reset()
        val d = md.digest(s.substring(starts(p), starts(p + k))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (selected(d)) seen.add(hex(d))
        p += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  /** Adjacent character pairs of one token, in order, non-distinct —
    * the symbol-pair stream of BPE training's counting step. Code-point
    * based (surrogate pairs stay whole) so lengths and substrings agree
    * with character-semantics engines like DuckDB, not UTF-16 units.
    */
  def charPairs(text: UTF8String): ArrayData = {
    val cps = text.toString.codePoints().toArray
    if (cps.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cps.length - 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cps.length - 1) {
      sb.setLength(0)
      sb.appendCodePoint(cps(i))
      sb.appendCodePoint(cps(i + 1))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document n-gram repetition CHAR MASSES in one pass — the raw
    * integers behind the Gopher/MassiveText character-level repetition
    * filters ("fraction of characters in the most frequent n-gram",
    * "fraction of characters in duplicated n-grams"). Returns
    * `[top_c, top_chars, dup_chars, all_chars]` (all longs):
    *
    *   - `top_c` / `top_chars`: occurrence count and character length
    *     of the doc's most frequent n-gram, ties broken by the
    *     byte-lexicographically LARGEST gram (matches both Spark's
    *     `max(struct(c, g))` and a DuckDB `ORDER BY c DESC, g DESC`
    *     window — UTF8String and DuckDB's default collation are both
    *     raw-byte orderings, so the tie-break is engine-independent
    *     even off-ASCII);
    *   - `dup_chars`: Σ c·chars(g) over grams occurring ≥ 2 times
    *     (occurrence-mass form — positions under overlapping duplicated
    *     grams count once per OCCURRENCE, the order-free definition
    *     both engines can compute without positional cover marking);
    *   - `all_chars`: Σ c·chars(g) over all grams (the denominator).
    *
    * chars(g) counts CODEPOINTS (DuckDB `length()` semantics), the
    * joining single spaces included. Tokenizer contract matches
    * [[distinctShingles]]. Docs with fewer than n tokens return all
    * zeros. Per-doc hash map is bounded by document length — the same
    * class as the shingle kernels; callers get a pure scan-side
    * projection with ZERO shuffles.
    */
  def ngramCharStats(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array(0L, 0L, 0L, 0L))
    val counts = new java.util.HashMap[String, java.lang.Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      val prev = counts.get(g)
      counts.put(g, if (prev eq null) java.lang.Long.valueOf(1L)
                    else java.lang.Long.valueOf(prev.longValue + 1L))
      i += 1
    }
    var topC = 0L
    var topG: UTF8String = null
    var topChars = 0L
    var dup = 0L
    var all = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c: Long = e.getValue.longValue
      val g = e.getKey
      val chars = g.codePointCount(0, g.length).toLong
      all += c * chars
      if (c >= 2L) dup += c * chars
      if (c > topC) {
        topC = c; topChars = chars; topG = UTF8String.fromString(g)
      } else if (c == topC) {
        val gu = UTF8String.fromString(g)
        if (topG == null || gu.compareTo(topG) > 0) {
          topChars = chars; topG = gu
        }
      }
    }
    new GenericArrayData(Array(topC, topChars, dup, all))
  }

  /** Per-document POSITIONAL-COVER duplicate-n-gram char mass — the
    * reference Gopher/MassiveText definition ("fraction of characters
    * inside duplicate n-grams", each character counted ONCE no matter
    * how many duplicated grams overlap it), complementing
    * [[ngramCharStats]]'s order-free occurrence-mass form. Returns
    * `[covered_chars, total_chars]` (longs): `covered_chars` = size of
    * the union of the char spans of every n-gram occurrence whose gram
    * appears ≥ 2 times in the doc (token codepoints + the joining
    * spaces INSIDE a covered span); `total_chars` = the doc's codepoint
    * length. Since the text is exactly tokens joined by single spaces,
    * covered ≤ total always — the ppm ratio is bounded by 10⁶ by
    * construction, so published Gopher dup-gram thresholds transfer.
    *
    * Two passes over the token array (count grams, mark cover), per-doc
    * state bounded by doc length — still a pure scan-side kernel.
    */
  def ngramCoverStats(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val total = s.codePointCount(0, s.length).toLong
    val toks = s.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array(0L, total))
    val counts = new java.util.HashMap[String, Integer]
    val grams = new Array[String](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      grams(i) = sb.toString
      val prev = counts.get(grams(i))
      counts.put(grams(i), if (prev eq null) Integer.valueOf(1)
                           else Integer.valueOf(prev.intValue + 1))
      i += 1
    }
    // mark covered token positions and covered inter-token gaps (the
    // single joining spaces) under every duplicated-gram occurrence
    val covTok = new Array[Boolean](toks.length)
    val covGap = new Array[Boolean](math.max(toks.length - 1, 0))
    i = 0
    while (i < grams.length) {
      if (counts.get(grams(i)).intValue >= 2) {
        var j = i
        while (j < i + n) {
          covTok(j) = true
          if (j < i + n - 1) covGap(j) = true
          j += 1
        }
      }
      i += 1
    }
    var cov = 0L
    var j = 0
    while (j < toks.length) {
      if (covTok(j)) cov += toks(j).codePointCount(0, toks(j).length).toLong
      if (j < covGap.length && covGap(j)) cov += 1L
      j += 1
    }
    new GenericArrayData(Array(cov, total))
  }

  /** Segment one word with a trained BPE merge table ([[graft.ops
    * .Curation.bpeTrain]]'s output, rank order): the word becomes a
    * '|'-delimited padded symbol string and each merge applies as
    * `replace("|l|r|" → "|lr|")` — the EXACT string semantics the
    * trainer (and its SQL oracle) used, so encoding a fresh word
    * reproduces the segmentation the training state reached.
    *
    * Delimiter contract: '|' is the symbol separator, so a word
    * CONTAINING '|' cannot ride the replace pipeline (phantom empty
    * symbols). Such words return their raw codepoints unmerged — a
    * total, conservative answer that matches the trainer, which
    * excludes '|'-carrying tokens from the dictionary (no merge can
    * ever target them).
    */
  def bpeSegmentWord(word: String, merges: Array[Array[String]]): Array[String] = {
    val cps = word.codePoints().toArray
    if (cps.isEmpty) return Array.empty[String]
    if (word.indexOf('|') >= 0)
      return cps.map(cp => new String(Character.toChars(cp)))
    val sb = new java.lang.StringBuilder("|")
    var i = 0
    while (i < cps.length) {
      sb.appendCodePoint(cps(i)); sb.append('|'); i += 1
    }
    var w = sb.toString
    var m = 0
    while (m < merges.length) {
      val l = merges(m)(0); val r = merges(m)(1)
      w = w.replace("|" + l + "|" + r + "|", "|" + l + r + "|")
      m += 1
    }
    w.substring(1, w.length - 1).split("\\|", -1)
  }

  /** Number of BPE symbols a document encodes to under a trained merge
    * table — Σ over (non-empty) whitespace tokens of the segmented
    * symbol count. The scan-side "token budget under MY tokenizer"
    * measurement; per-row cost O(numMerges · word length).
    */
  def bpeTokenCount(text: UTF8String, merges: Array[Array[String]]): Long = {
    val toks = text.toString.split(" ", -1)
    var total = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) total += bpeSegmentWord(toks(i), merges).length.toLong
      i += 1
    }
    total
  }

  /** Unicode NFC normalization (canonical composition) — Spark has no
    * builtin; `java.text.Normalizer` implements the same Unicode
    * algorithm DuckDB's `nfc_normalize` does, so canonicalized text
    * md5-compares across engines (spec- and oracle-pinned on planted
    * combining marks).
    */
  def normalizeNfc(text: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC))

  private def md5Bucket(md: java.security.MessageDigest, s: String, dim: Int): Int = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex digits = first 4 bytes big-endian, value in [0, 2^32)
    // — the Sampling.stringBucket convention, DuckDB-reproducible as
    // CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT) % dim
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % dim).toInt
  }

  /** Dense hashed term-frequency vector: each k-token shingle (k=1 =
    * unigrams) buckets through the md5-prefix portable hash into `dim`
    * bins; the value is the occurrence COUNT (exact integers carried
    * as doubles — lossless far beyond any document length). The
    * classical hashing-trick featurizer: text → fixed-dim vector with
    * no vocabulary state, so the output plugs straight into the
    * (id, vec) ANN stack. Keep `dim` small (≤ ~1024) — the output is
    * dense; the sparse large-dim path is [[shingleBuckets]].
    *
    * EMPTY shingles (only possible at k=1: the empty tokens the
    * `split(" ", -1)` contract keeps) are SKIPPED — otherwise every
    * empty or trailing-space document would share phantom mass at
    * md5("")'s bucket and empty docs would be mutual cosine-1.0
    * neighbors (the [[bpeTokenCount]] convention).
    */
  def hashTf(text: UTF8String, dim: Int, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val out = new Array[Double](dim)
    if (toks.length >= k) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        if (sb.length > 0) out(md5Bucket(md, sb.toString, dim)) += 1.0
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** md5-prefix bucket id of every k-token shingle position
    * (non-distinct, in order) — the SPARSE hashed-TF stream for large
    * `dim`: explode → groupBy (id, bucket) gives exact per-bucket
    * counts without materializing a dim-wide dense array per row.
    * Empty shingles skipped (the [[hashTf]] convention; only possible
    * at k=1).
    */
  def shingleBuckets(text: UTF8String, dim: Int, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    val out = new java.util.ArrayList[Any](toks.length - k + 1)
    var i = 0
    while (i + k <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (sb.length > 0) out.add(md5Bucket(md, sb.toString, dim).toLong)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<string> of a document's distinct k-shingles — the scan-side
  * generator input for every shingle-based dedup tier. Null text yields
  * null (explode drops it), matching the explode-pipeline's behavior on
  * null documents.
  */
final case class DistinctShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"
  override def nullSafeEval(input: Any): Any =
    TextKernel.distinctShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.distinctShingles($t, $k)")
  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

/** array<long> of a document's distinct k-shingle xxhash64 fingerprints
  * (zero-copy byte-span hashing — see
  * [[TextKernel.distinctShingleHashes]]). Null text yields null;
  * explode drops it.
  */
final case class DistinctShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "distinct_shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    TextKernel.distinctShingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.distinctShingleHashes($t, $k)")
  override protected def withNewChildInternal(newChild: Expression): DistinctShingleHashes =
    copy(child = newChild)
}

/** array<string> of a document's per-doc-distinct SELECTED span-gram md5
  * digests (tier-6 fingerprint sampling fused into the scan). Null text
  * yields null; explode drops it.
  */
final case class SampledSpanHashes(child: Expression, k: Int, sel: String)
    extends UnaryExpression {
  require(k >= 1, "span gram size must be >= 1")
  require(sel.forall(c => Character.digit(c, 16) >= 0),
    "sel must be hex digits (empty = sample every position)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sampled_span_hashes"
  override def nullSafeEval(input: Any): Any =
    TextKernel.sampledSpanHashes(input.asInstanceOf[UTF8String], k, sel)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selRef = ctx.addReferenceObj("sel", sel, "java.lang.String")
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextKernel.sampledSpanHashes($t, $k, $selRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): SampledSpanHashes =
    copy(child = newChild)
}

/** array<long> `[top_c, top_chars, dup_chars, all_chars]` of a
  * document's n-gram repetition char masses (Gopher-style repetition
  * filter integers — see [[TextKernel.ngramCharStats]]). Null text
  * yields null.
  */
final case class NgramCharStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_char_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernel.ngramCharStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.ngramCharStats($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramCharStats =
    copy(child = newChild)
}

/** array<long> `[covered_chars, total_chars]` of a document's
  * positional-cover duplicate-n-gram char mass (the reference Gopher
  * definition — see [[TextKernel.ngramCoverStats]]). Null text yields
  * null.
  */
final case class NgramCoverStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_cover_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernel.ngramCoverStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.ngramCoverStats($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramCoverStats =
    copy(child = newChild)
}

/** StringType Unicode-NFC normalization of a document (see
  * [[TextKernel.normalizeNfc]]). Null yields null.
  */
final case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"
  override def nullSafeEval(input: Any): Any =
    TextKernel.normalizeNfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.normalizeNfc($t)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

/** LongType count of BPE symbols a document encodes to under a fixed
  * merge table (see [[TextKernel.bpeTokenCount]]). The merge table
  * rides as one reference object. Null text yields null.
  */
final case class BpeTokenCount(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override def nullSafeEval(input: Any): Any =
    TextKernel.bpeTokenCount(input.asInstanceOf[UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("merges", merges, "java.lang.String[][]")
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.bpeTokenCount($t, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** array<double> dense hashed-TF vector of a document (see
  * [[TextKernel.hashTf]]). Null text yields null.
  */
final case class HashTfVec(child: Expression, dim: Int, k: Int)
    extends UnaryExpression {
  require(dim >= 1 && dim <= 65536, "dense hashed-TF dim out of range")
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hash_tf_vec"
  override def nullSafeEval(input: Any): Any =
    TextKernel.hashTf(input.asInstanceOf[UTF8String], dim, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.hashTf($t, $dim, $k)")
  override protected def withNewChildInternal(newChild: Expression): HashTfVec =
    copy(child = newChild)
}

/** array<long> of per-position k-shingle md5 buckets (see
  * [[TextKernel.shingleBuckets]]). Null text yields null; explode
  * drops it.
  */
final case class ShingleBuckets(child: Expression, dim: Int, k: Int)
    extends UnaryExpression {
  require(dim >= 1, "bucket count must be >= 1")
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_buckets"
  override def nullSafeEval(input: Any): Any =
    TextKernel.shingleBuckets(input.asInstanceOf[UTF8String], dim, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.shingleBuckets($t, $dim, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleBuckets =
    copy(child = newChild)
}

/** array<string> of a token's adjacent character pairs (BPE pair-count
  * generator input). Null yields null; explode drops it.
  */
final case class CharPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_pairs"
  override def nullSafeEval(input: Any): Any =
    TextKernel.charPairs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.charPairs($t)")
  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
}
