package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Similarity search over an embedding column (`Array[Float]` cast to
  * `Array[Double]` at the boundary for portable arithmetic).
  *
  * Two paths:
  *   - [[knnBruteForce]]: exact top-k by cosine — the correctness
  *     baseline. Cross join pruned to a query subset; per-pair cost is
  *     one fused `aggregate(zip_with(...))` (stays in codegen, no UDF).
  *   - [[withHyperplaneBuckets]] + [[knnLsh]]: random-hyperplane LSH.
  *     Buckets are sign-bit strings of dot products against
  *     deterministic pseudo-random hyperplanes (derived from
  *     [[PortableHash.seedLong]], no RNG — reproducible across engines
  *     and runs). Multiple tables boost recall. At 100 TB scale this is
  *     the only shape that works: bucketing is map-only, candidate
  *     generation is an equi-join on (table, bucket), and the exact
  *     re-rank touches only candidates.
  */
object Similarity {

  /** Σ aᵢ·bᵢ — left-to-right double accumulation (engine-portable).
    * Runs as the native codegen'd [[graft.functions.VectorFunctions.DotProduct]]
    * expression; [[dotComposable]] is the built-ins-only equivalent,
    * pinned bit-identical by VectorFunctionsSpec. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** The same dot product from composable built-ins (zip_with +
    * aggregate): allocates the product array and dispatches a lambda per
    * element — kept as the semantic reference for the native expression. */
  def dotComposable(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, t) => acc + t)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic hyperplane `p` of table `t`: 64 integer coordinates in
    * [-1000, 1000] derived from MD5 seeds. */
  def hyperplane(t: Int, p: Int, dims: Int): Seq[Double] =
    (0 until dims).map(j =>
      (PortableHash.seedLong(s"hp-$t-$p-$j") % 2001L - 1000L).toDouble)

  /** Adds `bucket_t0..bucket_t{tables-1}`: the sign-bit bucket of `vecCol`
    * in each LSH table. Map-only — safe to run scan-side at any scale. */
  def withHyperplaneBuckets(df: DataFrame, vecCol: String,
      tables: Int, planes: Int, dims: Int): DataFrame =
    (0 until tables).foldLeft(df) { (d, t) =>
      val bits = (0 until planes).map { p =>
        val hp = array(hyperplane(t, p, dims).map(lit): _*)
        when(dot(col(vecCol), hp) > 0, lit(1L << p)).otherwise(lit(0L))
      }
      d.withColumn(s"bucket_t$t", bits.reduce(_ + _))
    }

  /** Exact brute-force top-k cosine neighbors for each query row.
    * `queries` and `corpus` both need (`idCol`, `vecCol`); ties and
    * float-noise are broken by rounding the score to 9 decimals and then
    * by neighbor id, so ranks are engine-stable.
    *
    * `excludeSelfId` (default true) drops corpus rows whose id equals
    * the query's — correct ONLY when queries are corpus members (the
    * registry's self-query evaluations). A request stream with its own
    * id space must pass false: an external request id that numerically
    * collides with a corpus vec_id would otherwise silently lose that
    * corpus vector from its candidates. */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelfId: Boolean = true): DataFrame = {
    // norms are per-vector, not per-pair: compute them once on each side
    // of the O(|Q|·|C|) join (3× fewer fused dot products in the hot loop;
    // values are bit-identical — same expression over the same vector).
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    // both arms are all-pairs by design (this IS brute force); the
    // external-id-space arm additionally hints the query side broadcast —
    // a request batch is small by construction, and without the hint an
    // unconditioned join could plan as a shuffled nested loop
    val scored = (if (excludeSelfId) q.join(c,
        col("query_id") =!= col("neighbor_id"))
      else broadcast(q).join(c, lit(true)))
      .withColumn("cos9",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 9))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos9").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos9"))
  }

  /** LSH-bucketed ANN: candidates share a bucket in ≥1 table; exact
    * cosine re-rank of candidates only. Same output shape as
    * [[knnBruteForce]] (may return < k rows per query — ANN recall). */
  def knnLsh(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int = 2, planes: Int = 8, dims: Int = 64,
      queryFilter: Column = lit(true)): DataFrame = {
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n"))
    val b = withHyperplaneBuckets(vecs, "__v", tables, planes, dims)
    // candidate generation carries ids only — the distinct/dedup shuffle
    // must never haul the vectors themselves (at scale the id-pair set
    // is bytes per row; the vectors re-attach afterwards by id join)
    val exploded = b.select(col("__id"),
      explode(array((0 until tables).map(t =>
        concat_ws(":", lit(t), col(s"bucket_t$t"))): _*)).as("__bucket"))
    val q = exploded.filter(queryFilter)
      .select(col("__id").as("query_id"), col("__bucket"))
    val cand = q.join(
        exploded.select(col("__id").as("neighbor_id"), col("__bucket")),
        Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos9").desc, col("neighbor_id").asc)
    cand
      .join(vecs.select(col("__id").as("query_id"), col("__v").as("__qv"),
        col("__n").as("__qn")), Seq("query_id"))
      .join(vecs.select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        col("__n").as("__cn")), Seq("neighbor_id"))
      .withColumn("cos9",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos9"))
  }

  /** IVF (inverted-file) ANN — the other classic scale path next to LSH.
    *
    * Centroids are a deterministic id-sample of the corpus (no RNG, no
    * k-means iterations — reproducible in the oracle; a production build
    * would train centroids offline and broadcast them the same way).
    * Assignment = argmin of exact squared L2 distance to the broadcast
    * centroid set: map-only over the corpus, ties broken by centroid id.
    * Queries probe the `nprobe` nearest centroid cells and re-rank only
    * those cells' members by exact cosine. Shuffle happens once, on the
    * small (cell_id) key — never an all-pairs join.
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroidFilter: Column, nprobe: Int): (DataFrame, DataFrame) =
    ivfAssignCentroids(corpus, idCol, vecCol,
      corpus.filter(centroidFilter)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v")),
      nprobe)

  /** [[ivfAssign]] against an EXPLICIT centroid frame (`cent_id`,
    * `cent_v`) — the shape a trained index uses: centroids come out of
    * [[kmeansTrain]] (or any offline build) and broadcast identically. */
  def ivfAssignCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, nprobe: Int): (DataFrame, DataFrame) = {
    val ranked = ivfAssignRanked(corpus, idCol, vecCol, cents)
    val assigned = ranked.filter(col("__cr") === 1)
      .select(col("__id"), col("__v"), col("cent_id").as("cell_id"))
    val probes = ranked.filter(col("__cr") <= nprobe)
      .select(col("__id").as("query_id"), col("cent_id").as("cell_id"))
    (assigned, probes)
  }

  /** The full centroid ranking behind [[ivfAssignCentroids]] —
    * (__id, __v, cent_id, __cr) with `__cr` the 1-based closeness rank
    * of each centroid for each vector. Exposed so a probe-width SWEEP
    * can rank once and take every width as a `__cr ≤ w` filter instead
    * of re-scoring the corpus against the broadcast centroids per
    * width (the r16 entry-sweep fusion). */
  def ivfAssignRanked(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    // squared L2 in exact integer-valued doubles: |a|² - 2a·b + |b|²
    val d2 = dot(col("__v"), col("__v")) -
      lit(2.0) * dot(col("__v"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__d2").asc, col("cent_id").asc)
    corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__d2", d2)
      .withColumn("__cr", row_number().over(w))
      .select(col("__id"), col("__v"), col("cent_id"), col("__cr"))
  }

  /** HIERARCHICAL (coarse→fine) assignment — the measured-quadratic
    * mitigation of [[ivfAssignCentroids]]: the flat assignment scores
    * every vector against every fine centroid, and with cell SIZE held
    * (k ∝ n) that is n·k ≈ n²/cell work — the r16 scaling ladder
    * measured the exponent at 2.18 (`docs/SCALE.md`). Here each vector
    * scores only the `nprobeC` nearest COARSE cells' fine centroids:
    *
    *   1. each fine centroid maps to its nearest coarse centroid
    *      (argmin over the broadcast coarse frame — k·k_c work, index
    *      metadata);
    *   2. each vector picks its `nprobeC` nearest coarse cells
    *      (n·k_c);
    *   3. each vector argmins over ONLY those cells' fine centroids
    *      (n·nprobeC·k/k_c expected) — candidate fine sets are
    *      disjoint across coarse cells (step 1 is a function), so no
    *      dedup is needed.
    *
    * Total n·(k_c + nprobeC·k/k_c): with k_c ≈ √k this is n·√k — at
    * held cell size n^1.5 instead of n². The price is approximation:
    * a vector whose true nearest fine centroid lives in an un-probed
    * coarse cell assigns elsewhere (`sim_hier_assign` grades the
    * agreement rate against the flat assignment; the probe-width
    * sweep prices it per `nprobeC`). Both centroid frames broadcast;
    * every join is equi-keyed on broadcast-sized frames; ties break
    * by centroid id like the flat kernel. Returns (id, cell_id) —
    * the flat assignment's columns, so consumers swap freely. */
  def hierAssignCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, coarse: DataFrame, nprobeC: Int): DataFrame = {
    require(nprobeC >= 1, s"nprobeC must be >= 1, got $nprobeC")
    def d2(v: Column, c: Column): Column =
      dot(v, v) - lit(2.0) * dot(v, c) + dot(c, c)
    // 1. fine centroid -> its coarse cell (metadata-sized cross)
    val cw = Window.partitionBy(col("cent_id"))
      .orderBy(col("__cd2").asc, col("co_id").asc)
    val centAss = cents.crossJoin(broadcast(coarse))
      .withColumn("__cd2", d2(col("cent_v"), col("co_v")))
      .withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") === 1)
      .select(col("cent_id"), col("cent_v"), col("co_id"))
    // 2. vector -> top-nprobeC coarse cells
    val vw = Window.partitionBy(col("__id"))
      .orderBy(col("__vd2").asc, col("co_id").asc)
    val vecCoarse = corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(coarse))
      .withColumn("__vd2", d2(col("__v"), col("co_v")))
      .withColumn("__vr", row_number().over(vw))
      .filter(col("__vr") <= nprobeC)
      .select(col("__id"), col("__v"), col("co_id"))
    // 3. argmin over the probed cells' fine centroids only
    val fw = Window.partitionBy(col("__id"))
      .orderBy(col("__fd2").asc, col("cent_id").asc)
    vecCoarse
      .join(broadcast(centAss), Seq("co_id"))
      .withColumn("__fd2", d2(col("__v"), col("cent_v")))
      .withColumn("__fr", row_number().over(fw))
      .filter(col("__fr") === 1)
      .select(col("__id").as("id"), col("cent_id").as("cell_id"))
  }

  /** Probe-width-BRANCHED [[hierAssignCentroids]] (r16 sweep fusion):
    * the coarse probe sets nest (`__vr ≤ w` prefixes of ONE ranking),
    * so the sweep ranks vector→coarse once, tags each width, and runs
    * one fine argmin keyed by (probe_c, __id) — per-branch rows
    * identical to the standalone kernel. Returns (probe_c, id,
    * cell_id). */
  def hierAssignCentroidsNp(corpus: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame, coarse: DataFrame,
      nprobeCs: Seq[Int]): DataFrame = {
    def d2(v: Column, c: Column): Column =
      dot(v, v) - lit(2.0) * dot(v, c) + dot(c, c)
    val cw = Window.partitionBy(col("cent_id"))
      .orderBy(col("__cd2").asc, col("co_id").asc)
    val centAss = cents.crossJoin(broadcast(coarse))
      .withColumn("__cd2", d2(col("cent_v"), col("co_v")))
      .withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") === 1)
      .select(col("cent_id"), col("cent_v"), col("co_id"))
    val vw = Window.partitionBy(col("__id"))
      .orderBy(col("__vd2").asc, col("co_id").asc)
    val vecCoarseB = corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(coarse))
      .withColumn("__vd2", d2(col("__v"), col("co_v")))
      .withColumn("__vr", row_number().over(vw))
      .filter(col("__vr") <= nprobeCs.max)
      .withColumn("probe_c",
        explode(array(nprobeCs.map(p => lit(p.toLong)): _*)))
      .filter(col("__vr") <= col("probe_c"))
      .select(col("probe_c"), col("__id"), col("__v"), col("co_id"))
    val fw = Window.partitionBy(col("probe_c"), col("__id"))
      .orderBy(col("__fd2").asc, col("cent_id").asc)
    vecCoarseB
      .join(broadcast(centAss), Seq("co_id"))
      .withColumn("__fd2", d2(col("__v"), col("cent_v")))
      .withColumn("__fr", row_number().over(fw))
      .filter(col("__fr") === 1)
      .select(col("probe_c"), col("__id").as("id"),
        col("cent_id").as("cell_id"))
  }

  /** IVF top-k: probe `nprobe` cells per query, exact cosine re-rank of
    * cell members only. Same output shape as [[knnBruteForce]]. */
  def knnIvf(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidFilter: Column, nprobe: Int = 3,
      queryFilter: Column = lit(true)): DataFrame =
    knnIvfCentroids(corpus, idCol, vecCol, k,
      corpus.filter(centroidFilter)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v")),
      nprobe, queryFilter)

  /** [[knnIvf]] against an explicit (typically trained) centroid frame. */
  def knnIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, cents: DataFrame, nprobe: Int = 3,
      queryFilter: Column = lit(true)): DataFrame = {
    val (assigned, probes) =
      ivfAssignCentroids(corpus, idCol, vecCol, cents, nprobe)
    val queries = assigned.filter(queryFilter)
      .select(col("__id").as("query_id"), col("__v").as("__qv"),
        norm(col("__v")).as("__qn"))
    val cand = queries
      .join(probes, Seq("query_id"))
      .join(assigned.select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        norm(col("__v")).as("__cn"), col("cell_id")), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "__qv", "__cv", "__qn", "__cn")
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos9").desc, col("neighbor_id").asc)
    cand
      .withColumn("cos9",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos9"))
  }

  /** Metadata-FILTERED IVF top-k — vector search restricted by a
    * relational predicate (the "WHERE lang = 'en'" of vector search,
    * the join every production vector store has to serve). Same
    * probe/re-rank shape as [[knnIvfCentroids]], with the NEIGHBOR
    * side pre-filtered: `allowed` (a one-column id frame produced by
    * the metadata predicate) left-semi-joins the assigned corpus
    * BEFORE candidate generation, so each probed cell contributes only
    * predicate-passing members and the k-shortlist never wastes slots
    * on candidates a post-filter would discard (the recall difference
    * between pre- and post-filtering is exactly the slots a post-pass
    * drops). Queries are NOT filtered — asking from outside the
    * predicate is legal. At 100 TB the predicate pushes down to the
    * metadata table's scan and the semi-join is id-keyed (ids move,
    * vectors don't); everything downstream is the pinned IVF shape. */
  def knnIvfFiltered(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, cents: DataFrame, allowed: DataFrame, nprobe: Int = 3,
      queryFilter: Column = lit(true)): DataFrame = {
    val (assigned, probes) =
      ivfAssignCentroids(corpus, idCol, vecCol, cents, nprobe)
    val queries = assigned.filter(queryFilter)
      .select(col("__id").as("query_id"), col("__v").as("__qv"),
        norm(col("__v")).as("__qn"))
    val nbrs = assigned.join(
      allowed.select(col(allowed.columns.head).as("__id")),
      Seq("__id"), "left_semi")
    val cand = queries
      .join(probes, Seq("query_id"))
      .join(nbrs.select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        norm(col("__v")).as("__cn"), col("cell_id")), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "__qv", "__cv", "__qn", "__cn")
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos9").desc, col("neighbor_id").asc)
    cand
      .withColumn("cos9",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos9"))
  }

  /** Query-driven form of [[knnIvfFiltered]] — the SERVING kernel: the
    * queries arrive as their own frame (a micro-batch of a request
    * stream), while the searchable side is a PRE-BUILT
    * `(__id, __v, cell_id)` frame (the assigned corpus already
    * restricted to the predicate — built once offline, checkpointed,
    * never re-derived per batch). Each query ranks the broadcast
    * trained centroids for its `nprobe` nearest cells; candidates are
    * the probed cells' members of the pre-filtered frame; exact cosine
    * re-rank decides top-k. Per batch: one broadcast of k centroids +
    * one cell-keyed equi-join — the corpus side never reshuffles.
    *
    * `excludeSelfId` (default true) is correct only when queries ARE
    * corpus members (the registry's self-query recall rows). External
    * request streams with their own id space must pass false, or a
    * request id that numerically collides with a corpus vec_id
    * silently removes that corpus vector from its candidates. */
  def knnIvfFilteredQueries(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, assignedNbrs: DataFrame, cents: DataFrame,
      nprobe: Int, excludeSelfId: Boolean = true): DataFrame = {
    val qd2 = dot(col("__qv"), col("__qv")) -
      lit(2.0) * dot(col("__qv"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("__qd2").asc, col("cent_id").asc)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__qd2", qd2)
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cent_id").as("cell_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos9").desc, col("neighbor_id").asc)
    probes
      .join(assignedNbrs.select(col("__id").as("neighbor_id"),
        col("__v").as("__cv"), col("cell_id")), Seq("cell_id"))
      .filter(if (excludeSelfId) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .select("query_id", "neighbor_id", "__qv", "__cv")
      .distinct()
      .withColumn("cos9", round(
        dot(col("__qv"), col("__cv")) /
          (norm(col("__qv")) * norm(col("__cv"))), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos9"))
  }

  /** One distributed Lloyd (k-means) iteration — the training seam that
    * produces [[ivfAssign]]'s centroids. Assignment reuses the IVF
    * argmin (broadcast centroids, map-only distance); the update step
    * emits per-(cluster, dim) member counts, sums and means.
    *
    * At 100 TB: broadcast k centroids, one map-only pass, one shuffle
    * of (cluster, dim) partial sums — map-side combine makes the
    * shuffle k × dims rows per partition regardless of corpus size.
    * With integer-quantized vectors the sums are exact (order-free) and
    * the mean is a single IEEE division, so the whole step is
    * bit-reproducible and oracle-checkable. `outDims` bounds the
    * reported dims (the full update is the same plan over all dims). */
  def kmeansStep(corpus: DataFrame, idCol: String, vecCol: String,
      centroidFilter: Column, outDims: Int): DataFrame = {
    val (assigned, _) = ivfAssign(corpus, idCol, vecCol, centroidFilter, 1)
    assigned
      .select(col("cell_id").as("cluster_id"),
        posexplode(slice(col("__v"), 1, outDims)))
      .groupBy(col("cluster_id"), col("pos").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_members"), sum(col("col")).as("sum_q"))
      .withColumn("mean_q", col("sum_q") / col("n_members"))
  }

  /** PQ asymmetric-distance (ADC) search kernel — how a PQ index is
    * queried: each query precomputes its distance table to the 64
    * codewords (|queries| × 64 rows — tiny, BROADCAST), every coded
    * corpus vector's approximate distance is four table lookups summed
    * (a broadcast equi-join on (sub, code) + one (query, vec)
    * aggregation), and per-query top-k plans as a WindowGroupLimit.
    * The coded corpus never reshuffles and no float op touches its
    * scan. Shared verbatim by the batch `sim_pq_adc` query and the
    * per-micro-batch streaming server
    * ([[graft.streaming.StreamingSearch]]).
    *
    * `queries`: (query_id, qv) with 64-dim integer-quantized vectors;
    * `codes`: (vec_id, sub: long, code) — the PQ-coded corpus;
    * `cb`: (sub, code, cv) — the trained 16-dim per-subspace codebook. */
  /** Per-query ADC distance table: one row per (query, sub, codeword)
    * with the exact int64 sub-distance — |queries| × 64 rows, tiny by
    * construction, the frame both ADC searches BROADCAST. */
  private def adcDistTable(queries: DataFrame, cb: DataFrame): DataFrame = {
    val subD2 = (dot(col("sv"), col("sv")) -
      lit(2.0) * dot(col("sv"), col("cv")) +
      dot(col("cv"), col("cv"))).cast("long")
    queries
      .select(col("query_id"), explode(sequence(lit(0), lit(3))).as("sub"),
        col("qv"))
      .withColumn("sv", slice(col("qv"), col("sub") * 16 + 1, lit(16)))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub").cast("long").as("sub"),
        col("code"), subD2.as("dt"))
  }

  def pqAdcSearch(queries: DataFrame, codes: DataFrame, cb: DataFrame,
      k: Int): DataFrame = {
    val dt = adcDistTable(queries, cb)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    codes
      .join(broadcast(dt), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dt")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adist"))
  }

  /** The COMPOSED IVF-PQ search — the serving shape a production vector
    * index actually runs, and the scale fix for [[pqAdcSearch]]'s one
    * honest flaw (it scores the FULL coded corpus per query; at 100 TB
    * nobody full-scans codes):
    *
    *   1. each query ranks the broadcast trained centroids by exact
    *      squared L2 and keeps its `nprobe` nearest cells (a window
    *      over |queries| × k rows — query-frame-sized, never corpus);
    *   2. the ADC scan is RESTRICTED to the probed cells' codes: the
    *      (query_id, cell_id) probe frame — |queries| × nprobe rows —
    *      broadcasts onto the cell-tagged code rows, so each query
    *      scores only ~corpus·nprobe/k of the codes and the pruning
    *      join is map-only (no shuffle of the corpus);
    *   3. the per-(query, vec) ADC sum and top-k are [[pqAdcSearch]]'s
    *      kernel unchanged — same distance table, same int64 ranking.
    *
    * `cellCodes`: (vec_id, cell_id, sub, code) — the `sim_index_build`
    * row shape with codes unpacked, i.e. THE stored index. Recall is
    * NOT simply bounded by full-scan ADC: the cell restriction uses
    * exact query-to-centroid geometry, so it can evict quantization
    * false positives and RAISE recall while cutting work (measured
    * 0.29 vs 0.22 at sf0.01 — the `sim_ivfpq_recall` gate pins it). */
  def ivfPqSearch(queries: DataFrame, cellCodes: DataFrame, cb: DataFrame,
      cents: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val qd2 = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__qd2").asc, col("cent_id").asc)
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("__qd2", qd2)
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cent_id").as("cell_id"))
    val dt = adcDistTable(queries, cb)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    cellCodes
      .join(broadcast(probes), Seq("cell_id"))
      .join(broadcast(dt), Seq("query_id", "sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dt")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adist"))
  }

  /** Probe-width-BRANCHED [[ivfPqSearch]] (r16 sweep fusion): every
    * swept width's probe set is the `__pr ≤ w` prefix of ONE centroid
    * ranking (row_number with deterministic tie-break ⇒ prefixes nest),
    * so the sweep ranks the centroids once, tags each width as a
    * branch, and runs ONE cell-pruned ADC scan + top-k keyed by
    * (nprobe, query_id) — per-branch rows identical to the standalone
    * search (the sweep specs pin it), per-stage cost paid once instead
    * of once per width. Returns (nprobe, query_id, rank, vec_id,
    * adist). */
  def ivfPqSearchNp(queries: DataFrame, cellCodes: DataFrame,
      cb: DataFrame, cents: DataFrame, nprobes: Seq[Int],
      k: Int): DataFrame = {
    val qd2 = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__qd2").asc, col("cent_id").asc)
    val probesB = queries.crossJoin(broadcast(cents))
      .withColumn("__qd2", qd2)
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobes.max)
      .withColumn("nprobe",
        explode(array(nprobes.map(n => lit(n.toLong)): _*)))
      .filter(col("__pr") <= col("nprobe"))
      .select(col("nprobe"), col("query_id"), col("cent_id").as("cell_id"))
    val dt = adcDistTable(queries, cb)
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    cellCodes
      .join(broadcast(probesB), Seq("cell_id"))
      .join(broadcast(dt), Seq("query_id", "sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("nprobe"), col("query_id"), col("vec_id"))
      .agg(sum(col("dt")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("nprobe"), col("query_id"),
        col("rank").cast("long").as("rank"), col("vec_id"), col("adist"))
  }

  /** Probe-width-BRANCHED [[ivfPqResidualSearch]] — the same r16
    * fusion for the residual (IVFADC) chain: one centroid ranking, one
    * per-(branch, query, probed-cell) residual distance table, one
    * cell-restricted ADC + top-k keyed by (nprobe, query_id).
    * Returns (nprobe, query_id, rank, vec_id, adist). */
  def ivfPqResidualSearchNp(queries: DataFrame, cellCodes: DataFrame,
      cb: DataFrame, cents: DataFrame, nprobes: Seq[Int],
      k: Int): DataFrame = {
    val qd2 = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__qd2").asc, col("cent_id").asc)
    val probesB = queries.crossJoin(broadcast(cents))
      .withColumn("__qd2", qd2)
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobes.max)
      .withColumn("nprobe",
        explode(array(nprobes.map(n => lit(n.toLong)): _*)))
      .filter(col("__pr") <= col("nprobe"))
      .select(col("nprobe"), col("query_id"),
        col("cent_id").as("cell_id"),
        zip_with(col("qv"), col("cent_v"), (a, b) => a - b).as("qres"))
    val subD2 = (dot(col("sv"), col("sv")) -
      lit(2.0) * dot(col("sv"), col("cv")) +
      dot(col("cv"), col("cv"))).cast("long")
    val dt = probesB
      .select(col("nprobe"), col("query_id"), col("cell_id"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("qres"))
      .withColumn("sv", slice(col("qres"), col("sub") * 16 + 1, lit(16)))
      .join(broadcast(cb), Seq("sub"))
      .select(col("nprobe"), col("query_id"), col("cell_id"),
        col("sub").cast("long").as("sub"), col("code"), subD2.as("dt"))
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    cellCodes
      .join(broadcast(dt), Seq("cell_id", "sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("nprobe"), col("query_id"), col("vec_id"))
      .agg(sum(col("dt")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("nprobe"), col("query_id"),
        col("rank").cast("long").as("rank"), col("vec_id"), col("adist"))
  }

  /** Branch-keyed [[rerankExact]] (r16 sweep fusion): the shortlist
    * carries a branch column; one gather + one (branch, query) window
    * re-ranks every branch's shortlist at once, rows per branch
    * identical to the standalone re-rank. */
  def rerankExactBranched(bidCol: String, shortlist: DataFrame,
      queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val d2 = (dot(col("xv"), col("xv")) -
      lit(2.0) * dot(col("xv"), col("cv2")) +
      dot(col("cv2"), col("cv2"))).cast("long")
    val w = Window.partitionBy(col(bidCol), col("query_id"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    corpus.select(col("vec_id"), col("qv").as("cv2"))
      .join(broadcast(shortlist.select(col(bidCol), col("query_id"),
        col("vec_id"))), Seq("vec_id"))
      .join(broadcast(queries.select(col("query_id"), col("qv").as("xv"))),
        Seq("query_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(bidCol), col("query_id"),
        col("rank").cast("long").as("rank"), col("vec_id"), col("d2"))
  }

  /** Iterated integer-Lloyd k-means — the training loop that turns the
    * deterministic id-pick init into DATA-ADAPTED centroids for the IVF
    * cells and the PQ codebook, with zero RNG anywhere.
    *
    * `points` carries (`groupCols`…, `__id`, `__v`); `init` carries
    * (`groupCols`…, `cent_id`, `cent_v`) — with `groupCols = Seq("sub")`
    * the same loop trains all four PQ subspace codebooks at once (each
    * subspace is an independent k-means; the group key just rides the
    * keys). Per iteration:
    *
    *   1. assignment — broadcast centroids, exact squared-L2 by the dot
    *      identity, argmin as `min(struct(d2, cent_id))`: ONE
    *      map-side-combined aggregation, no per-vector window, and the
    *      broadcast cross is linear in the corpus;
    *   2. update — `posexplode` the assigned vectors, per-(cluster, dim)
    *      count/sum (map-side combine → k×dims rows per partition
    *      regardless of corpus size), then the mean RE-QUANTIZED with
    *      `round(sum/n)`. Integer-valued centroids in, integer-valued
    *      centroids out — every distance in every iteration stays an
    *      exact int64, sums are order-free, the one IEEE division and
    *      the half-away-from-zero round are bit-identical in DuckDB, so
    *      K iterations replay exactly as K unrolled CTE blocks;
    *   3. clusters that lose all members keep their previous centroid
    *      (left join + coalesce), so `cent_id`s are stable and K never
    *      silently shrinks.
    *
    * At 100 TB: per iteration one broadcast of k·dims doubles, one
    * map-only pass, two map-side-combined shuffles (corpus-width id
    * rows; k×dims partials) — the canonical distributed Lloyd shape. */
  def kmeansTrain(points: DataFrame, init: DataFrame, iters: Int,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val g = groupCols.map(col)
    val d2 = dot(col("__v"), col("__v")) -
      lit(2.0) * dot(col("__v"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    (1 to iters).foldLeft(init) { (cents, it) =>
      val joined =
        if (groupCols.isEmpty) points.crossJoin(broadcast(cents))
        else points.join(broadcast(cents), groupCols)
      val assigned = joined
        .groupBy((g :+ col("__id") :+ col("__v")): _*)
        .agg(min(struct(d2.as("d2"), col("cent_id"))).as("__m"))
        .select((g :+ col("__m.cent_id").as("cluster_id") :+ col("__v")): _*)
      val sums = assigned
        .select((g :+ col("cluster_id") :+ posexplode(col("__v"))): _*)
        .groupBy((g :+ col("cluster_id") :+ col("pos")): _*)
        .agg(count(lit(1)).as("__n"), sum(col("col")).as("__s"))
        .withColumn("__mean", round(col("__s") / col("__n"), 0))
      val next = sums
        .groupBy((g :+ col("cluster_id")): _*)
        .agg(array_sort(collect_list(struct(col("pos"), col("__mean"))))
          .as("__ps"))
        .select((g :+ col("cluster_id").as("cent_id") :+
          transform(col("__ps"), p => p.getField("__mean")).as("cent_v")): _*)
      val keys = groupCols :+ "cent_id"
      // eager checkpoint of the k×dims RESULT per NON-FINAL iteration:
      // each iteration's centroid frame is consumed twice by the next
      // (the broadcast assignment AND the empty-cluster left join), so
      // un-checkpointed lineage re-executes every earlier iteration's
      // corpus aggregation per consumer — at 100 TB that is a duplicate
      // full corpus pass per iteration (r16). The FINAL iteration's
      // frame goes back un-checkpointed: the caller consumes it once
      // (typically into a FrameCache checkpoint anyway) and PlanSpec
      // pins the trainer's plan shape off it.
      val out = cents.as("o").join(next.as("n"), keys, "left")
        .select((keys.map(col) :+
          coalesce(col("n.cent_v"), col("o.cent_v")).as("cent_v")): _*)
      if (it < iters) out.localCheckpoint(true) else out
    }
  }

  /** Residual IVF-PQ serving — [[ivfPqSearch]] with the PQ half coding
    * RESIDUALS (v − assigned centroid), the layout production IVF-PQ
    * indexes actually store (the IVFADC scheme): residual norms are far
    * smaller than vector norms, so the same 4×4-bit code budget
    * quantizes much finer and recall rises at identical serving cost.
    *
    * The distance table becomes PER (query, probed cell) — the query's
    * residual against each probed centroid, |queries| × nprobe × 64
    * rows, still broadcast-sized by construction. Joining the
    * cell-tagged residual codes on (cell_id, sub, code) restricts the
    * scan to probed cells AND resolves the table lookup in the same
    * broadcast join — pruning and ADC in one map-only stage, one
    * exchange for the per-(query, vec) sum.
    *
    * `cellCodes`: (vec_id, cell_id, sub, code) with codes from the
    * RESIDUAL codebook `cb`; `cents` must be the same trained centroids
    * the codes were built against (the residual is centroid-relative). */
  def ivfPqResidualSearch(queries: DataFrame, cellCodes: DataFrame,
      cb: DataFrame, cents: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val qd2 = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__qd2").asc, col("cent_id").asc)
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("__qd2", qd2)
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cent_id").as("cell_id"),
        zip_with(col("qv"), col("cent_v"), (a, b) => a - b).as("qres"))
    val subD2 = (dot(col("sv"), col("sv")) -
      lit(2.0) * dot(col("sv"), col("cv")) +
      dot(col("cv"), col("cv"))).cast("long")
    val dt = probes
      .select(col("query_id"), col("cell_id"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("qres"))
      .withColumn("sv", slice(col("qres"), col("sub") * 16 + 1, lit(16)))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("cell_id"),
        col("sub").cast("long").as("sub"), col("code"), subD2.as("dt"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    cellCodes
      .join(broadcast(dt), Seq("cell_id", "sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dt")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adist"))
  }

  /** Exact re-rank refinement (the "+R" of IVFADC+R): re-score an ADC
    * shortlist with exact squared-L2 on the raw vectors and keep the
    * top-k. `shortlist` carries (query_id, vec_id) candidate pairs —
    * |queries|×R rows, broadcast-small by construction — and `corpus`
    * (vec_id, qv) / `queries` (query_id, qv) the raw vectors. Both the
    * shortlist and the query frame broadcast onto the corpus scan, so
    * the gather is a per-query point-lookup: R vector reads per query,
    * vectors never shuffle. Shared by the batch `sim_ivfpq_rerank`
    * query and the streaming serving twin. */
  def rerankExact(shortlist: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val d2 = (dot(col("xv"), col("xv")) -
      lit(2.0) * dot(col("xv"), col("cv2")) +
      dot(col("cv2"), col("cv2"))).cast("long")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    corpus.select(col("vec_id"), col("qv").as("cv2"))
      .join(broadcast(shortlist.select(col("query_id"), col("vec_id"))),
        Seq("vec_id"))
      .join(broadcast(queries.select(col("query_id"), col("qv").as("xv"))),
        Seq("query_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("d2"))
  }

  /** Maximal-marginal-relevance diversification of a scored candidate
    * pool — the greedy diversity pass a retrieval server runs AFTER the
    * exact re-rank, when the top of the list is near-duplicates of one
    * answer. Entirely integer: relevance is the pool's exact squared-L2
    * `d2` (smaller = more relevant) and redundancy is the exact
    * pairwise squared-L2 among pool members, so the λ=0.5 MMR argmax
    * `max(min_{j∈S} d2(i,j) − d2(q,i))` is an int64 comparison with a
    * min-id tie-break — deterministic across partitionings and
    * replayable round-by-round as unrolled oracle CTEs (float MMR
    * would be none of those).
    *
    * `pool` carries (query_id, vec_id, d2) — |Q|×R rows from e.g.
    * [[rerankExact]]; `corpus` (vec_id, qv) supplies raw vectors.
    * Pick 1 is pure relevance (min d2, min id); picks 2..k maximize
    * the margin over the min distance to the already-selected set.
    *
    * Scale shape: the pairwise frame is |Q|·R² rows computed ONCE
    * (query-keyed self-join; vectors attach by id before the join,
    * never reshuffling the corpus), then each greedy round is one
    * anti-join + one pair-join + two map-side-combined aggregations,
    * all keyed by query_id. State per round is ≤ k rows per query;
    * `localCheckpoint` caps plan growth (the iterative-DataFrame
    * doctrine of [[kmeansTrain]] / ConnectedComponents). */
  def mmrDiversify(pool: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val p = pool.select(col("query_id"), col("vec_id"), col("d2"))
      .localCheckpoint(true)
    val withV = p.join(corpus.select(col("vec_id"), col("qv")), Seq("vec_id"))
    val dij = (dot(col("iv"), col("iv")) -
      lit(2.0) * dot(col("iv"), col("jv")) +
      dot(col("jv"), col("jv"))).cast("long")
    val pairs = withV
      .select(col("query_id"), col("vec_id").as("i"), col("qv").as("iv"))
      .join(withV.select(col("query_id"), col("vec_id").as("j"),
        col("qv").as("jv")), Seq("query_id"))
      .filter(col("i") =!= col("j"))
      .select(col("query_id"), col("i"), col("j"), dij.as("dij"))
      .localCheckpoint(true)
    // pick 1: pure relevance — min d2, ties to the smallest id
    val first = p.groupBy(col("query_id"))
      .agg(min(struct(col("d2"), col("vec_id"))).as("m"))
      .select(col("query_id"), col("m.vec_id").as("vec_id"),
        col("m.d2").as("d2"), lit(1L).as("mmr_rank"))
    var sel = first.localCheckpoint(true)
    for (t <- 2 to k) {
      val cand = p.join(sel.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_anti")
      val pick = pairs
        .join(sel.select(col("query_id"), col("vec_id").as("j")),
          Seq("query_id", "j"))
        .groupBy(col("query_id"), col("i"))
        .agg(min(col("dij")).as("ms"))
        .join(cand.select(col("query_id"), col("vec_id").as("i"),
          col("d2")), Seq("query_id", "i"))
        // argmax of the integer margin, ties to the smallest id; d2
        // rides along (unique per (margin, id) by construction)
        .groupBy(col("query_id"))
        .agg(max(struct((col("ms") - col("d2")).as("score"),
          (-col("i")).as("ni"), col("d2").as("dd"))).as("m"))
        .select(col("query_id"), (-col("m.ni")).as("vec_id"),
          col("m.dd").as("d2"), lit(t.toLong).as("mmr_rank"))
      // checkpoint per NON-FINAL round (the selected set feeds the next
      // round three ways: anti-join, pair join, union); the final
      // round's set is consumed once by the output select, so its
      // materialization job buys nothing (r16 elision, same as
      // graphBeamSearch's last hop)
      val u = sel.unionByName(pick)
      sel = if (t < k) u.localCheckpoint(true) else u
    }
    sel.select(col("query_id"), col("mmr_rank"), col("vec_id"), col("d2"))
  }

  /** Near-duplicate vector pairs: LSH candidates verified at an exact
    * cosine `threshold`. Returns (a, b) with a < b. */
  def nearDuplicateVectors(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 2, planes: Int = 8, dims: Int = 64): DataFrame = {
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n"))
    val b = withHyperplaneBuckets(vecs, "__v", tables, planes, dims)
    val exploded = b.select(col("__id"),
      explode(array((0 until tables).map(t =>
        concat_ws(":", lit(t), col(s"bucket_t$t"))): _*)).as("__bucket"))
    // ids-only candidate dedup (see knnLsh), vectors re-attached by id
    exploded.as("x")
      .join(exploded.as("y"), col("x.__bucket") === col("y.__bucket"))
      .filter(col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"))
      .distinct()
      .join(vecs.select(col("__id").as("a"), col("__v").as("__va"),
        col("__n").as("__na")), Seq("a"))
      .join(vecs.select(col("__id").as("b"), col("__v").as("__vb"),
        col("__n").as("__nb")), Seq("b"))
      .filter(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")) >= threshold)
      .select(col("a"), col("b"))
  }

  /** Bounded-degree nearest-neighbor GRAPH over IVF-probed cells — the
    * index structure of graph-traversal ANN (DiskANN / HNSW base
    * layer), built relationally: candidate pairs are vectors sharing
    * ANY of their top-`nprobe` cells (the 2nd-closest cell supplies
    * the cross-cell "bridge" edges pure Voronoi membership lacks),
    * exact-scored, and capped at `degree` out-edges per node by
    * (d2 asc, dst asc). At 100 TB each piece stays bounded: the probe
    * is a broadcast-centroid argmin (map-only), the pair join is
    * equi-keyed on cell_id with per-cell candidate counts capped by
    * cell size, and the degree cap makes the edge list O(n·degree) —
    * the serving structure a traversal touches is rows-per-hop, never
    * the corpus.
    *
    * `probes`: (id, cell_id) — one row per (vector, probed cell).
    * `vecs`: (vec_id, v). Returns (src, dst, erank, d2). */
  def nnGraph(probes: DataFrame, vecs: DataFrame, degree: Int): DataFrame =
    nnGraphPatch(probes, probes, vecs, degree)

  /** [[nnGraph]] restricted to a SOURCE cohort — the incremental edge
    * PATCH between rebuilds: build out-edges for just-admitted delta
    * vectors against the FULL probe space, leaving the base edge list
    * untouched. A rebuild's out-edges for a given src depend only on
    * that src's own probed cells (the pair join is probes ⋈ probes on
    * cell_id), so the patched rows are EXACTLY the full rebuild's
    * rows for those srcs — at |delta-cohort pair| cost instead of a
    * corpus-wide re-pair (SimilaritySpec pins the set-equality).
    * `srcProbes` ⊆ `allProbes`, both (id, cell_id). [[nnGraph]] IS the
    * `srcProbes = allProbes` case — one scoring/ranking body serves
    * both, so the full build and the patch cannot drift apart. */
  def nnGraphPatch(srcProbes: DataFrame, allProbes: DataFrame,
      vecs: DataFrame, degree: Int): DataFrame = {
    val pairs = srcProbes.select(col("id").as("src"), col("cell_id"))
      .join(allProbes.select(col("id").as("dst"), col("cell_id")),
        Seq("cell_id"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val scored = pairs
      .join(vecs.select(col("vec_id").as("src"), col("v").as("__sv")), Seq("src"))
      .join(vecs.select(col("vec_id").as("dst"), col("v").as("__dv")), Seq("dst"))
      .withColumn("d2", (dot(col("__sv"), col("__sv"))
        - lit(2.0) * dot(col("__sv"), col("__dv"))
        + dot(col("__dv"), col("__dv"))).cast("long"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("d2").asc, col("dst").asc)
    scored.withColumn("erank", row_number().over(w).cast("long"))
      .filter(col("erank") <= degree)
      .select(col("src"), col("dst"), col("erank"), col("d2"))
  }

  /** Branch-keyed [[nnGraphPatch]] (r16 build fusion): several cohort
    * configurations build their edge lists in ONE pair-join/score/rank
    * pass over branch-tagged probe frames. Every operator is keyed by
    * (`bidCol`, …): pairs join on (branch, cell), dedup per (branch,
    * src, dst), rank per (branch, src) — each branch's rows are exactly
    * the standalone kernel's (SimilaritySpec pins it). `srcProbes`:
    * (bidCol, id, cell_id); `allProbes`: (bidCol, id, cell_id) — tag
    * both sides with the branch (self-build: same frame; patch: delta
    * srcs vs the full probe space, both carrying the branch key).
    * Returns (bidCol, src, dst, erank, d2). */
  def nnGraphPatchBranched(bidCol: String, srcProbes: DataFrame,
      allProbes: DataFrame, vecs: DataFrame, degree: Int): DataFrame = {
    val pairs = srcProbes.select(col(bidCol), col("id").as("src"),
        col("cell_id"))
      .join(allProbes.select(col(bidCol), col("id").as("dst"),
        col("cell_id")), Seq(bidCol, "cell_id"))
      .filter(col("src") =!= col("dst"))
      .select(col(bidCol), col("src"), col("dst")).distinct()
    val scored = pairs
      .join(vecs.select(col("vec_id").as("src"), col("v").as("__sv")), Seq("src"))
      .join(vecs.select(col("vec_id").as("dst"), col("v").as("__dv")), Seq("dst"))
      .withColumn("d2", (dot(col("__sv"), col("__sv"))
        - lit(2.0) * dot(col("__sv"), col("__dv"))
        + dot(col("__dv"), col("__dv"))).cast("long"))
    val w = Window.partitionBy(col(bidCol), col("src"))
      .orderBy(col("d2").asc, col("dst").asc)
    scored.withColumn("erank", row_number().over(w).cast("long"))
      .filter(col("erank") <= degree)
      .select(col(bidCol), col("src"), col("dst"), col("erank"), col("d2"))
  }

  /** [[graphBeamSearch]] for an ARRIVING query frame — the serving
    * form: each query finds its entry cell by the same broadcast
    * centroid argmin every IVF consumer uses (nprobe = 1), scans that
    * cell's members off the checkpointed `assigned` corpus as the
    * seed beam, then traverses the checkpointed edge list. Per query
    * batch nothing but the batch-sized probe frame moves — the
    * corpus, the assignment, and the O(n·degree) edge list are the
    * static sides. Because cell assignment is per-vector under fixed
    * centroids, a corpus-member query gets exactly the cell the batch
    * search derived from its own assignment row — which is what makes
    * the streaming twin row-identical to `sim_graph_search`
    * (StreamingSpec pins it).
    *
    * `excludeSelfId` mirrors [[knnIvfFilteredQueries]]: `true` (the
    * default) drops any corpus candidate whose id equals the query's
    * id — correct when queries ARE corpus members (the batch twin,
    * recall grading). EXTERNAL serving whose query-id space may
    * collide with corpus vec_ids must pass `false`, else a colliding
    * id silently drops that corpus vector — possibly the true nearest
    * neighbor — from its results (the codebase's external-serving
    * contract, see [[graft.streaming.StreamingSearch
    * .serveAssignedSwappableWriter]]).
    *
    * `queries`: (query_id, qv). `cents`: (cent_id, cent_v).
    * `assigned`: (__id, __v, cell_id) — the cr = 1 corpus assignment.
    * `edges`: (src, dst, …). Returns (query_id, neighbor_id, rank, d2). */
  def graphSearchQueries(queries: DataFrame, cents: DataFrame,
      assigned: DataFrame, edges: DataFrame,
      hops: Int, beam: Int, k: Int,
      excludeSelfId: Boolean = true,
      entryCells: Int = 1): DataFrame = {
    require(entryCells >= 1, s"entryCells must be >= 1, got $entryCells")
    val qd2 = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cent_v")) +
      dot(col("cent_v"), col("cent_v"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("__qd2").asc, col("cent_id").asc)
    val ranked = queries.select(col("query_id"), col("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__qd2", qd2)
      .withColumn("__pr", row_number().over(pw))
    // entryCells > 1 widens the SEED to the query's nearest cells (the
    // serving-time knob sim_graph_entry_sweep grades; a member belongs
    // to exactly one cell, so the probed-cell join cannot duplicate a
    // candidate); the traversal frame stays one row per query
    val probes = ranked.filter(col("__pr") <= entryCells)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell_id"))
    val entry0 = probes
      .join(assigned.select(col("__id").as("cand"),
        col("__v").as("__cv"), col("cell_id")), Seq("cell_id"))
    val entry = (if (excludeSelfId)
        entry0.filter(col("cand") =!= col("query_id")) else entry0)
      .withColumn("d2", (dot(col("qv"), col("qv"))
        - lit(2.0) * dot(col("qv"), col("__cv"))
        + dot(col("__cv"), col("__cv"))).cast("long"))
      .select("query_id", "cand", "d2")
    // the traversal's query side is the CALLER's frame, not the
    // centroid-ranked derivation (row-equivalent — the rank-1 filter
    // was just a roundabout copy of (query_id, qv); any duplicate ids
    // collapse in the per-hop distinct either way). This keeps the
    // served plan free of the probe stage's broadcast cross now that
    // the final hop executes in the output job (r16 checkpoint
    // elision) instead of behind a checkpoint.
    graphBeamSearch(queries.select(col("query_id"), col("qv")), entry,
      edges, assigned.select(col("__id").as("vec_id"), col("__v").as("v")),
      hops = hops, beam = beam, k = k, excludeSelfId = excludeSelfId)
  }

  /** Beam search over a bounded-degree neighbor graph, unrolled to a
    * FIXED hop count — the relational form of DiskANN's greedy search.
    * Each hop expands the current beam's out-edges (an equi-join on
    * `src` against the O(n·degree) edge list), exact-scores the new
    * candidates against the query, and keeps the `beam` best of
    * everything visited; the final cut is top-`k` of the full visited
    * set. Per-query work is ≤ |entry| + hops·beam·degree scored rows —
    * independent of corpus size, which is what lets a traversal index
    * serve where a cell scan can't. Bounded rounds (not
    * convergence-looped) keep the plan static and oracle-replayable.
    *
    * `queries`: (query_id, qv). `entry`: (query_id, cand, d2) — the
    * seed candidates, typically the query's nearest cell's members.
    * `edges`: (src, dst, ...). `vecs`: (vec_id, v).
    * Returns (query_id, neighbor_id, rank, d2). */
  def graphBeamSearch(queries: DataFrame, entry: DataFrame, edges: DataFrame,
      vecs: DataFrame, hops: Int, beam: Int, k: Int,
      excludeSelfId: Boolean = true): DataFrame = {
    val bw = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cand").asc)
    var visited = entry.select("query_id", "cand", "d2")
    for (h <- 1 to hops) {
      val beamF = visited.withColumn("__r", row_number().over(bw))
        .filter(col("__r") <= beam).select(col("query_id"), col("cand"))
      val expanded0 = beamF
        .join(edges.select(col("src").as("cand"), col("dst")), Seq("cand"))
      val expanded = (if (excludeSelfId)
          expanded0.filter(col("dst") =!= col("query_id")) else expanded0)
        .select(col("query_id"), col("dst").as("cand")).distinct()
      val scored = expanded
        .join(queries, Seq("query_id"))
        .join(vecs.select(col("vec_id").as("cand"), col("v").as("__cv")),
          Seq("cand"))
        .withColumn("d2", (dot(col("qv"), col("qv"))
          - lit(2.0) * dot(col("qv"), col("__cv"))
          + dot(col("__cv"), col("__cv"))).cast("long"))
        .select("query_id", "cand", "d2")
      // eager checkpoint per NON-FINAL hop (the mmrDiversify pattern): the
      // visited set feeds the NEXT hop twice (beam cut + union), and
      // materializing it keeps that hop's plan a checkpoint scan instead
      // of a re-planned copy of every prior hop's subtree. The FINAL
      // hop's visited set is consumed exactly once (the top-K cut), so
      // checkpointing it would pay a materialization job + cache
      // write/read that buys nothing — r16 measured the elision, one
      // fewer job per search at identical rows.
      val u = visited.unionByName(scored)
        .select("query_id", "cand", "d2").distinct()
      visited = if (h < hops) u.localCheckpoint(true) else u
    }
    visited.withColumn("rank", row_number().over(bw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand").as("neighbor_id"),
        col("rank"), col("d2"))
  }

  /** Branch-FUSED form of [[graphBeamSearch]]: several traversal
    * configurations ("branches" — e.g. the beam/degree/entry/drift
    * sweep points) run in ONE set of jobs over a branch-keyed frame
    * instead of one full traversal per configuration. Every operator is
    * keyed by (`bidCol`, query_id), so each branch's rows evolve exactly
    * as an independent [[graphBeamSearch]] run would produce them
    * (SimilaritySpec pins the per-branch row equality): the windows
    * partition by (branch, query), the expansion equi-join carries the
    * branch key when the edge list is branch-specific, and the visited
    * dedup is per (branch, query, cand). What fuses is the COST: one
    * window + one expansion join + one distinct + one checkpoint per hop
    * for the whole sweep, instead of per branch — at 100 TB the shared
    * frames (assignment scan, edge list, vectors) are read once per hop
    * rather than once per branch per hop, and at fixture scale the
    * per-stage fixed costs collapse by the branch count.
    *
    * `queries`: (query_id, qv) — SHARED across branches (every sweep
    * varies the serving knob, not the query set).
    * `entry`: (bidCol, query_id, cand, d2) — per-branch seeds (tag a
    * shared seed frame with the branch id when seeding doesn't vary).
    * `edges`: (bidCol, src, dst) when `edgesBranched`, else (src, dst)
    * shared by all branches.
    * `beamLim`: per-row beam-width expression (a literal for uniform
    * sweeps, a function of the branch column for the beam sweep). */
  def graphBeamSearchBranched(bidCol: String, queries: DataFrame,
      entry: DataFrame, edges: DataFrame, edgesBranched: Boolean,
      vecs: DataFrame, hops: Int, beamLim: Column, k: Int,
      excludeSelfId: Boolean = true): DataFrame = {
    val bw = Window.partitionBy(col(bidCol), col("query_id"))
      .orderBy(col("d2").asc, col("cand").asc)
    var visited = entry.select(col(bidCol), col("query_id"), col("cand"),
      col("d2"))
    for (h <- 1 to hops) {
      val beamF = visited.withColumn("__r", row_number().over(bw))
        .filter(col("__r") <= beamLim)
        .select(col(bidCol), col("query_id"), col("cand"))
      val expanded0 =
        if (edgesBranched) beamF.join(
          edges.select(col(bidCol), col("src").as("cand"), col("dst")),
          Seq(bidCol, "cand"))
        else beamF.join(edges.select(col("src").as("cand"), col("dst")),
          Seq("cand"))
      val expanded = (if (excludeSelfId)
          expanded0.filter(col("dst") =!= col("query_id")) else expanded0)
        .select(col(bidCol), col("query_id"), col("dst").as("cand"))
        .distinct()
      val scored = expanded
        .join(queries, Seq("query_id"))
        .join(vecs.select(col("vec_id").as("cand"), col("v").as("__cv")),
          Seq("cand"))
        .withColumn("d2", (dot(col("qv"), col("qv"))
          - lit(2.0) * dot(col("qv"), col("__cv"))
          + dot(col("__cv"), col("__cv"))).cast("long"))
        .select(col(bidCol), col("query_id"), col("cand"), col("d2"))
      val u = visited.unionByName(scored)
        .select(col(bidCol), col("query_id"), col("cand"), col("d2"))
        .distinct()
      visited = if (h < hops) u.localCheckpoint(true) else u
    }
    visited.withColumn("rank", row_number().over(bw).cast("long"))
      .filter(col("rank") <= k)
      .select(col(bidCol), col("query_id"), col("cand").as("neighbor_id"),
        col("rank"), col("d2"))
  }

  /** Hop-depth TRACE of one [[graphBeamSearch]] traversal: the top-K
    * cut of the visited set AFTER EVERY hop 0..`hops`, tagged by hop
    * depth — (hops, query_id, neighbor_id, rank, d2). A depth-h run's
    * state is a prefix of a deeper run's evolution (same deterministic
    * per-hop step), so the hop-h slice is ROW-IDENTICAL to a standalone
    * `hops = h` search (SimilaritySpec pins it) — but the trace pays
    * ONE traversal where the hop sweep previously paid one full
    * traversal (entry scan included) per depth. Intermediate visited
    * sets get the usual eager checkpoint (each now has two consumers:
    * its snapshot cut and the next hop); the deepest set is consumed
    * once and stays un-checkpointed. */
  def graphBeamSearchTrace(queries: DataFrame, entry: DataFrame,
      edges: DataFrame, vecs: DataFrame, hops: Int, beam: Int, k: Int,
      excludeSelfId: Boolean = true): DataFrame = {
    val bw = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cand").asc)
    def cut(v: DataFrame, h: Int): DataFrame =
      v.withColumn("rank", row_number().over(bw).cast("long"))
        .filter(col("rank") <= k)
        .select(lit(h.toLong).as("hops"), col("query_id"),
          col("cand").as("neighbor_id"), col("rank"), col("d2"))
    var visited = entry.select("query_id", "cand", "d2")
    if (hops > 0) visited = visited.localCheckpoint(true)
    var out = cut(visited, 0)
    for (h <- 1 to hops) {
      val beamF = visited.withColumn("__r", row_number().over(bw))
        .filter(col("__r") <= beam).select(col("query_id"), col("cand"))
      val expanded0 = beamF
        .join(edges.select(col("src").as("cand"), col("dst")), Seq("cand"))
      val expanded = (if (excludeSelfId)
          expanded0.filter(col("dst") =!= col("query_id")) else expanded0)
        .select(col("query_id"), col("dst").as("cand")).distinct()
      val scored = expanded
        .join(queries, Seq("query_id"))
        .join(vecs.select(col("vec_id").as("cand"), col("v").as("__cv")),
          Seq("cand"))
        .withColumn("d2", (dot(col("qv"), col("qv"))
          - lit(2.0) * dot(col("qv"), col("__cv"))
          + dot(col("__cv"), col("__cv"))).cast("long"))
        .select("query_id", "cand", "d2")
      val u = visited.unionByName(scored)
        .select("query_id", "cand", "d2").distinct()
      visited = if (h < hops) u.localCheckpoint(true) else u
      out = out.unionByName(cut(visited, h))
    }
    out
  }
}
