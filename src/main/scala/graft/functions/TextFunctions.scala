package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text-analysis column functions for LLM-data pipelines
  * (SURVEY.md §2.9 X1/X2/X4). All are composed from codegen'd Spark
  * built-ins (no UDFs): at 100 TB each stays inside WholeStageCodegen and
  * the only shuffles are the aggregations the caller adds.
  *
  * Hashing is md5 throughout — deterministic and portable across engines,
  * which is what makes signature-based dedup reproducible between runs and
  * verifiable against external oracles.
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), c => c =!= "")

  /** BPE-ish segmentation: word runs + punctuation runs. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]+"), lit(0))

  /** Exact-dedup content fingerprint. */
  def fingerprint(text: Column): Column = md5(text)

  /** Order/multiplicity-insensitive content signature: md5 of the sorted
    * distinct token set. Groups token-set-identical docs (Jaccard == 1).
    */
  def bagOfWordsSignature(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** MinHash signature over an arbitrary item array: per-seed minimum of
    * md5(seed || item) over the distinct items, collapsed to one md5.
    * Items sharing the full signature are near-dup candidates; at scale the
    * signature is the LSH shuffle key. Empty item arrays yield NULL, which
    * drops degenerate rows from candidacy (NULL joins nothing).
    */
  def minhashSignatureOf(items: Column, k: Int): Column = {
    require(k >= 1 && k <= 4, "md5 yields 4 independent 8-hex slices")
    // one md5 per item; the k "independent" hash functions are disjoint
    // 8-hex-char slices of the digest (4x fewer hashes than seeded md5s —
    // the hash is the hot loop at corpus scale).
    val hashes = transform(array_distinct(items), t => md5(t))
    val minima = (0 until k).map(i =>
      array_min(transform(hashes, h => substring(h, 1 + i * 8, 8))))
    md5(minima.reduce(concat(_, _)))
  }

  /** MinHash over raw tokens. NOTE: for small vocabularies token-level minima
    * collide heavily (buckets grow with corpus size — a skew bomb in the
    * candidate join); prefer [[minhashSignatureOf]] over [[shingles]], whose
    * k-gram universe is |vocab|^k, for the near-dup candidate key.
    */
  def minhashSignature(text: Column, k: Int = 4): Column =
    minhashSignatureOf(tokens(text), k)

  /** Banded MinHash (the OR-of-ANDs LSH construction): `bands` signatures,
    * each the md5 of `rowsPerBand` per-band digest slices. Docs sharing ANY
    * band signature are candidates — recall rises with `bands`, precision
    * with `rowsPerBand` (the classic S-curve). Returns an array; candidate
    * generation is `explode` + self-join on (band_index, band_sig):
    * {{{
    * df.select($"id", posexplode(minhashBands($"text", 4, 2)))  // -> pos, col
    *   .join(other side on pos + col)
    * }}}
    * Band hashes come from md5(band || item) so bands are independent.
    */
  def minhashBands(items: Column, bands: Int, rowsPerBand: Int): Column = {
    require(bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 4)
    val distinct = array_distinct(items)
    val bandSigs = (0 until bands).map { b =>
      val hashes = transform(distinct, t => md5(concat(lit(s"band$b:"), t)))
      val minima = (0 until rowsPerBand).map(i =>
        array_min(transform(hashes, h => substring(h, 1 + i * 8, 8))))
      md5(minima.reduce(concat(_, _)))
    }
    array(bandSigs: _*)
  }

  /** SimHash over `bits` hex positions of per-token md5s: majority vote per
    * position; near-dups differ in few bits. Returns a '0'/'1' string.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 32)
    val bitCols = (1 to bits).map { p =>
      val vote = aggregate(tokens(text), lit(0),
        (acc, t) => acc + when(substring(md5(t), p, 1) >= "8", 1).otherwise(-1))
      when(vote >= 0, "1").otherwise("0")
    }
    concat(bitCols: _*)
  }

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** k-token shingles ("n-grams of tokens"), the unit for n-gram Jaccard
    * near-dup detection. Returns an array of space-joined k-grams.
    */
  def shingles(text: Column, k: Int): Column = {
    require(k >= 1)
    val t = tokens(text)
    when(size(t) < k, array())
      .otherwise(transform(sequence(lit(1), size(t) - (k - 1)),
        i => array_join(slice(t, i, lit(k)), " ")))
  }

  /** Exact set Jaccard over two item arrays: |A∩B| / |A∪B|. Integer set
    * sizes + one double division — bit-identical across engines.
    */
  def jaccardOf(a: Column, b: Column): Column =
    size(array_intersect(array_distinct(a), array_distinct(b))).cast("double") /
      size(array_union(a, b))

  /** Exact token-set Jaccard similarity between two texts. */
  def jaccardTokens(a: Column, b: Column): Column =
    jaccardOf(tokens(a), tokens(b))

  /** Stopword ratio given an inline stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, c => c.isInCollection(stopwords))).cast("double") / size(t)
  }

  /** Marker-based language-ID heuristic: first matching marker set wins.
    * `markers` = (lang, tokens that indicate it), checked in order.
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])], default: String = "und"): Column = {
    val t = tokens(text)
    markers.foldRight(lit(default): Column) { case ((lang, words), els) =>
      val hit = words.map(w => array_contains(t, w)).reduce(_ && _)
      when(hit, lang).otherwise(els)
    }
  }

  /** Quality gate: token-count bounds + stopword-ratio cap. */
  def qualityPass(text: Column, minTokens: Long, maxTokens: Long,
                  stopwords: Seq[String], maxStopRatio: Double): Column =
    tokenCount(text).between(minTokens, maxTokens) &&
      stopwordRatio(text, stopwords) < maxStopRatio
}
