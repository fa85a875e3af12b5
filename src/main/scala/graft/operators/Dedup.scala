package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._

/** Document deduplication — the operator family a large-scale
  * training-data pipeline runs over a 100 TB text corpus.
  *
  * Everything here is shuffle-conscious:
  *   - exact dedup is one hash aggregation on a digest (never on the
  *     full text — the shuffle carries 32 bytes per row, not documents);
  *   - near-dup detection is MinHash + LSH banding: signatures are
  *     computed scan-side (map-only), candidate generation is an
  *     equi-self-join on band keys (hash shuffle on small keys), and the
  *     exact Jaccard check runs only on candidates — never all pairs;
  *   - SimHash gives a 16-bit fingerprint whose Hamming-neighborhoods
  *     can be bucketed for blocking.
  *
  * All hashing is [[graft.functions.PortableHash]] (MD5-based) so every
  * step is reproducible in the DuckDB oracle with identical constants.
  */
object Dedup {

  /** Canonical text form for exact dedup: lowercase, collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact dedup groups: one row per distinct normalized text with the
    * surviving (minimum) id and the duplicate count. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(normalize(col(textCol))).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Distinct word `n`-gram shingles of a text column. Tokenization is
    * single-space split of the [[normalize]]d text — deliberately, so the
    * DuckDB oracle can reproduce it without regex-split edge cases.
    * Native one-pass expression; identical (including first-occurrence
    * order) to the composable
    * `array_distinct(transform(sequence, array_join(slice)))` form —
    * pinned by TextHashFunctionsSpec. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextHashFunctions.shingleStrings(
      split(normalize(text), " "), n)

  /** Hashed shingle set: 60-bit integer per shingle, SORTED. All
    * downstream set-ops (MinHash, Jaccard intersect/union) run on
    * primitive longs — far cheaper than string comparisons, and the
    * shuffle carries 8-byte elements instead of shingle text. Sorting
    * once at build time lets [[jaccardSorted]] use an allocation-free
    * merge scan per candidate pair. Collisions are negligible (60-bit)
    * and in any case identical in the DuckDB oracle (same MD5 hash).
    *
    * Native one-pass expression (shingle → distinct → hash → sort in
    * compiled code); bit-identical to the composable
    * `array_sort(transform(shingles(text,n), hash60))` — pinned by
    * TextHashFunctionsSpec. */
  def hashedShingles(text: Column, n: Int): Column =
    graft.functions.TextHashFunctions.hashedShingles60(
      split(normalize(text), " "), n)

  /** MinHash signature: k columns `s0..s{k-1}`, each the minimum of the
    * i-th affine hash over the pre-hashed shingle set (see
    * [[hashedShingles]]). Map-only (no shuffle). All k mins come from
    * ONE compiled scan of the shingle array
    * ([[graft.functions.TextHashFunctions.MinHashSig]]) instead of k
    * interpreted `array_min(transform(...))` passes. */
  def withMinhashSignature(df: DataFrame, hashedShingleCol: String, k: Int): DataFrame = {
    val withSig = df.withColumn("__sig",
      graft.functions.TextHashFunctions.minhashSig(col(hashedShingleCol), k))
    (0 until k).foldLeft(withSig) { (d, i) =>
      d.withColumn(s"s$i", col("__sig").getItem(i))
    }.drop("__sig")
  }

  /** LSH band keys: `bands` strings, each concatenating `rowsPerBand`
    * consecutive signature values (plus the band index, so bands never
    * collide across positions). */
  def bandKeys(bands: Int, rowsPerBand: Int): Column = {
    val keys = (0 until bands).map { b =>
      val sigCols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"s$i"))
      concat_ws(",", lit(b) +: sigCols: _*)
    }
    array(keys: _*)
  }

  /** Candidate pairs (a < b) sharing at least one LSH band.
    *
    * `bucketCap` bounds each band bucket to its cap lowest-id members
    * before the self-join — the production mitigation for degenerate
    * buckets (boilerplate-heavy corpora collapse many documents into one
    * band, and an uncapped bucket of m docs costs m²/2 pairs). The cap
    * is deterministic (row_number by id), so an oracle engine computes
    * the identical candidate set, and it bounds the per-bucket quadratic
    * term at cap²/2 regardless of corpus skew. */
  def candidatePairs(signed: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int, bucketCap: Int = Int.MaxValue): DataFrame = {
    val b = signed.select(col(idCol).as("__id"),
      explode(bandKeys(bands, rowsPerBand)).as("__band"))
    val capped = if (bucketCap == Int.MaxValue) b else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__band")).orderBy(col("__id"))
      b.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= bucketCap).drop("__rn")
    }
    capped.as("x").join(capped.as("y"), col("x.__band") === col("y.__band"))
      .filter(col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two shingle-set columns (int/int IEEE
    * division — engine-portable bit-for-bit). */
  def jaccard(sa: Column, sb: Column): Column =
    size(array_intersect(sa, sb)) / size(array_union(sa, sb))

  /** Same value on SORTED distinct long arrays ([[hashedShingles]]) via
    * the native merge-scan expression: |A∩B| by one pass, |A∪B| as
    * |A|+|B|−|A∩B| — no per-pair hash-set allocation in the candidate
    * join's hot loop. */
  def jaccardSorted(sa: Column, sb: Column): Column = {
    val ic = graft.functions.SetFunctions.sortedIntersectCount(sa, sb)
    ic / (size(sa) + size(sb) - ic)
  }

  /** Full near-duplicate pipeline: shingle → MinHash(k) → LSH(bands) →
    * exact-Jaccard verification at `threshold`. Returns (a, b, jaccard).
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, bands: Int = 4, threshold: Double = 0.8,
      bucketCap: Int = Int.MaxValue): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val sh = docs.select(col(idCol).as("__id"),
      hashedShingles(col(textCol), n).as("__sh"))
    val signed = withMinhashSignature(sh, "__sh", k)
    val cand = candidatePairs(signed, "__id", bands, k / bands, bucketCap)
    cand
      .join(sh.select(col("__id").as("a"), col("__sh").as("__sha")), "a")
      .join(sh.select(col("__id").as("b"), col("__sh").as("__shb")), "b")
      .withColumn("jaccard", jaccardSorted(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Blocked exact-Jaccard near-dup pairs with a scale-safe join shape:
    * candidates must share a composite block key — the caller's blocking
    * column × a shingle-count band (near-dups have near-equal shingle
    * counts, so banding multiplies block cardinality without losing the
    * high-similarity pairs blocking is after) — and each block is capped
    * to its `cap` lowest-id documents before the self-join.
    *
    * The cap makes the quadratic term per block O(cap²) REGARDLESS of
    * corpus skew (a degenerate block can no longer go all-pairs), and it
    * is deterministic (row_number by id), so an oracle engine computes
    * the identical candidate set. The join itself is a plain shuffled
    * equi-join — nothing is broadcast, so the build side never has to
    * fit in memory and the same plan runs at 100 TB. */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, blockCol: String,
      shingleCol: String, band: Int, cap: Int, threshold: Double): DataFrame = {
    val blk = docs.withColumn("__blk",
      concat_ws(":", col(blockCol), floor(size(col(shingleCol)) / lit(band))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__blk")).orderBy(col(idCol))
    val capped = blk.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
    capped.as("x")
      .join(capped.hint("shuffle_hash").as("y"),
        col("x.__blk") === col("y.__blk") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("jaccard",
        jaccardSorted(col(s"x.$shingleCol"), col(s"y.$shingleCol")))
      .filter(col("jaccard") >= threshold)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"), col("jaccard"))
  }

  /** EXACT set-similarity self-join by prefix filtering (the AllPairs/
    * PPJoin candidate scheme): two sets with Jaccard ≥ t MUST share at
    * least one element among the first `|s| − ⌈t·|s|⌉ + 1` elements of
    * their (globally consistently) sorted shingle arrays. Exploding only
    * that prefix and equi-joining on the element yields a candidate set
    * with NO recall loss — unlike attribute blocking or MinHash, every
    * qualifying pair is found — while high thresholds keep prefixes
    * short (t = 0.8 → ~20% of each set).
    *
    * Scale shape: prefix explode is map-only; the join is a shuffled
    * equi-join on a single hashed token; candidates travel as id pairs
    * ONLY (arrays are re-attached by id join for the exact verify, so
    * the wide rows never multiply through the self-join). A size-ratio
    * prune (t·|A| ≤ |B|) cuts candidates before dedup. Prefix length
    * uses `s − floor(t·s)` — ≥ the exact bound, so correctness is
    * preserved under any floating-point rounding of t·s. */
  def prefixJaccardPairs(docs: DataFrame, idCol: String,
      shingleCol: String, threshold: Double): DataFrame = {
    val sized = docs.withColumn("__sz", size(col(shingleCol)))
    val prefLen = (col("__sz") -
      floor(col("__sz") * lit(threshold)).cast("int") + lit(1))
    val pref = sized.select(col(idCol), col("__sz"),
      explode(slice(col(shingleCol), lit(1), prefLen)).as("__tok"))
    val cand = pref.as("x")
      .join(pref.hint("shuffle_hash").as("y"),
        col("x.__tok") === col("y.__tok") &&
          col(s"x.$idCol") < col(s"y.$idCol") &&
          col("y.__sz") >= col("x.__sz") * lit(threshold) &&
          col("x.__sz") >= col("y.__sz") * lit(threshold))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
    cand
      .join(sized.select(col(idCol).as("a"), col(shingleCol).as("__sha")), "a")
      .join(sized.select(col(idCol).as("b"), col(shingleCol).as("__shb")), "b")
      .withColumn("jaccard", jaccardSorted(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Asymmetric set containment of the SMALLER shingle set in the larger:
    * `|A∩B| / min(|A|,|B|)`. Jaccard punishes length mismatch (a document
    * quoted whole inside a 10× longer one scores ≤ 0.1), so subset-style
    * duplication needs this complementary measure. Exact on sorted hashed
    * shingles via the same merge-scan intersect; int/int IEEE division —
    * engine-portable bit-for-bit. */
  def containmentSorted(sa: Column, sb: Column): Column =
    graft.functions.SetFunctions.sortedIntersectCount(sa, sb) /
      least(size(sa), size(sb))

  /** Blocked containment near-dup pairs: same scale-safe candidate shape
    * as [[blockedJaccardPairs]] (composite block key, deterministic cap,
    * plain shuffled equi-join), but blocking only on the caller's block
    * column — containment pairs have UNEQUAL sizes by nature, so the
    * shingle-count band that sharpens Jaccard blocking would split
    * exactly the pairs this measure exists to find. */
  def blockedContainmentPairs(docs: DataFrame, idCol: String, blockCol: String,
      shingleCol: String, cap: Int, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(blockCol)).orderBy(col(idCol))
    val capped = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
    capped.as("x")
      .join(capped.hint("shuffle_hash").as("y"),
        col(s"x.$blockCol") === col(s"y.$blockCol") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("containment",
        containmentSorted(col(s"x.$shingleCol"), col(s"y.$shingleCol")))
      .filter(col("containment") >= threshold)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        col("containment"))
  }

  /** Benchmark-contamination check — the train/test n-gram overlap scan
    * every training-data pipeline runs before a model ships. A training
    * document is contaminated when it shares at least `minShared`
    * distinct word n-grams with any benchmark document.
    *
    * Shape at 100 TB: both sides explode to (shingle-hash, id) pairs —
    * the shuffle carries 16 bytes per n-gram, never text — and the
    * equi-join on the hash is candidate generation, not all-pairs; the
    * per-doc aggregation counts distinct shared shingles. Benchmark
    * suites are small relative to the corpus, so Catalyst/AQE broadcasts
    * that side when it fits and shuffles otherwise — no plan rewrite
    * needed either way. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int): DataFrame = {
    def exploded(df: DataFrame, as: String) = df.select(
      col(idCol).as(as), explode(hashedShingles(col(textCol), n)).as("__h"))
    exploded(train, "doc_id")
      .join(exploded(bench, "bench_id").select(col("__h")).distinct(), "__h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("__h")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** 16-bit SimHash over word tokens (with multiplicity): bit b is set
    * when the token-weighted ±1 vote of hash-bit b is positive. One
    * compiled hash+vote pass per row
    * ([[graft.functions.TextHashFunctions.SimHash16]]). */
  def simhash16(text: Column): Column =
    graft.functions.TextHashFunctions.simhash16(split(normalize(text), " "))
}
