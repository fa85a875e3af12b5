package graft.queries

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.operators.Similarity

/** Similarity-search query surface over the `embeddings` fixture.
  * Vectors are quantized (`round(x*1000)` as integer-valued doubles) so
  * every dot/norm is exact integer arithmetic — order-independent and
  * bit-identical in the DuckDB oracle.
  *
  *   - brute-force top-k = correctness baseline (quadratic — query set
  *     is a 1-in-10 sample; at 100 TB you never run this shape, you run:)
  *   - LSH top-k = the scale path: map-only bucketing, equi-join on
  *     (table, bucket) keys, exact re-rank of candidates only.
  */
object SimilarityQueries {
  import OracleSql._

  private val K = 10
  private val Dims = 64
  private val Tbls = 2
  private val Planes = 8

  /** Lloyd iterations for the trained IVF centroids / PQ codebook. Two
    * is enough to move every centroid off its id-pick init (the recall
    * gates measure the improvement); each extra iteration adds one
    * corpus pass to the build and one unrolled CTE block to the oracle.
    * MUST initialize before `defs` (the oracle CTE generators read it
    * while `defs` initializes — a later declaration would be 0 there). */
  private val TrainIters = 2

  /** Codewords per PQ subspace. 16 (4 bits per code — a 16-bit packed
    * row for 4 subspaces) lifted recall@10 from 0.16 to 0.22 at sf0.01
    * over the round-8 8-codeword book at the same training depth:
    * codebook CAPACITY was the binding constraint, not Lloyd
    * convergence (inertia was already near-flat at 2 iterations). Same
    * init-before-`defs` rule as [[TrainIters]]. */
  private val PqCodes = 16

  /** Cells probed per query in the composed IVF-PQ search — same probe
    * width as the exact-re-rank IVF path (`sim_knn_ivf`), so the two
    * serving shapes are comparable. Init-before-`defs` rule applies. */
  private val Nprobe = 3

  /** ADC shortlist width for the exact re-rank stage (IVFADC+R): each
    * query's residual-ADC ranking keeps 3·K candidates, which the
    * refinement stage re-scores against the RAW vectors. 3× is the
    * classic refinement factor — wide enough that ADC ordering errors
    * inside the probed cells are repaired, narrow enough that the
    * gather stays a per-query point-lookup. Init-before-`defs` rule
    * applies (see [[TrainIters]]). */
  private val RerankR = 3 * K

  /** MMR diversification: the re-ranked pool widened past the final
    * cut (the diversity pass needs slack to trade relevance away), and
    * the served list length. λ is fixed at 0.5, which drops out of the
    * integer argmax entirely (margin = min-distance-to-selected −
    * query-distance). Init-before-`defs` rule applies. */
  private val MmrPool = 20
  private val MmrK = 5

  /** SemDeDup cosine threshold: within a trained k-means cluster, a
    * pair at or above this exact cosine marks the higher id as a
    * semantic duplicate. Same threshold as `dedup_embedding_cosine`, so
    * the cluster-scoped and LSH-scoped near-dup surfaces are directly
    * comparable. Init-before-`defs` rule applies (see [[TrainIters]]). */
  private val SemTau = 0.35

  /** Per-cluster admission quota of `curate_cluster_balance`: a member
    * is kept when its portable hash mod the cluster's size falls under
    * the quota — keep-probability min(1, quota/|cell|), i.e. clusters
    * at or under the quota keep everything and oversized clusters are
    * down-sampled toward it. Init-before-`defs` rule applies. */
  private val BalQuota = 32L

  /** Power-iteration rounds for the SVD family. Three moves the
    * Rayleigh quotient visibly off the uniform init; each round costs
    * one corpus pass + one 64-key shuffle + one 64-row collect, and one
    * unrolled oracle CTE block. Init-before-`defs` rule applies. */
  private val SvdIters = 3

  /** ∞-norm scale of the re-quantized SVD direction. 100 keeps every
    * bound exact: |u| ≤ 64·578·100 ≈ 3.7e6, |w| ≤ n·578·|u| ≈ 4.3e12 at
    * sf0.1, w·100 ≈ 4.3e14 < 2^53 (the re-quantization quotient's
    * operands stay exact doubles), Rayleigh numerator ≤ 2.7e16 < 2^63.
    * Init-before-`defs` rule applies. */
  private val SvdScale = 100L

  /** Graph-ANN family: out-degree of the bounded-degree neighbor
    * graph, beam width and UNROLLED hop count of the traversal search.
    * Degree 6 over top-2-cell candidate pairs keeps the edge list
    * O(6n) while the 2nd-cell probes supply the cross-cell bridge
    * edges pure Voronoi membership lacks; 2 hops × beam 10 bound
    * per-query traversal work at |entry cell| + 2·10·6 scored rows
    * regardless of corpus size. Init-before-`defs` rule applies (see
    * [[TrainIters]]). */
  private val GraphDeg = 6
  private val GraphBeam = 10
  private val GraphHops = 2

  /** The degree sweep's widest build (and its branch list with
    * [[GraphDeg]] in the middle): edge-list size is n·degree rows, so
    * the sweep grades recall per byte of index. */
  private val GraphDegMax = 12
  private val GraphDegSweep = Seq(3, 6, 12)

  /** The beam sweep's widths ([[GraphBeam]] in the middle): beam is
    * the SERVING-TIME knob — per-query cost is |entry| +
    * hops·beam·degree scored rows, no index rebuild. */
  private val GraphBeamSweep = Seq(5, 10, 20)

  /** The delta-drift sweep's moduli: edges built over the
    * `vec_id % m ≠ 0` base cohort only, so the edge-less admitted
    * delta is ≈ 100/m % of the served corpus (10 / 33 / 50 %). */
  private val GraphDriftMods = Seq(10, 3, 2)

  /** The entry-seeding sweep's widths (1 = the production single-cell
    * entry every other graph row uses): serving-time only, like beam —
    * seeding scans the query's `w` nearest cells' members. */
  private val GraphEntrySweep = Seq(1, 2, 3)

  /** Hierarchical (coarse→fine) assignment: the coarse level is every
    * 8th trained fine centroid (fine init ids are multiples of 50, so
    * `cent_id % 400 = 0` ⇒ k_c = k/8 at every SF — a fixed ratio; the
    * scaling ladder's harness picks k_c ≈ √k dynamically, which a
    * fixed SQL modulus cannot express), probing [[HierProbeC]] coarse
    * cells per vector. The sweep prices the approximation per probe
    * width. Init-before-`defs` rule applies (see [[TrainIters]]). */
  private val HierCoarseMod = 400
  private val HierProbeC = 2
  private val HierProbeSweep = Seq(1, 2, 4)

  private def quantized(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1000)).as("qv"))

  private def bruteSpark(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = quantized(s, d)
    val q = e.filter(pmod(col("vec_id"), lit(10)) === 0)
    Similarity.knnBruteForce(q, e, "vec_id", "qv", K)
      .withColumn("rank", col("rank").cast("long"))
  }

  private val bruteSql =
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |s AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(${cosine("q.v", "c.v", Dims)}, 9) AS cos9
       |  FROM e q, e c
       |  WHERE q.vec_id % 10 = 0 AND c.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, rank, cos9 FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos9 DESC, neighbor_id) AS rank
       |  FROM s)
       |WHERE rank <= $K""".stripMargin

  private def lshSpark(s: org.apache.spark.sql.SparkSession, d: String) =
    Similarity.knnLsh(quantized(s, d), "vec_id", "qv", K,
        tables = Tbls, planes = Planes, dims = Dims,
        queryFilter = pmod(col("__id"), lit(10)) === 0)
      .withColumn("rank", col("rank").cast("long"))

  private val lshSql = {
    val buckets = (0 until Tbls).map(t =>
      s"SELECT vec_id, v, concat_ws(':', $t, ${lshBucket("v", t, Planes, Dims)}) AS bkt FROM e")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |b AS ($buckets),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM b q JOIN b c ON q.bkt = c.bkt
       |  WHERE q.vec_id % 10 = 0 AND c.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(${cosine("eq.v", "ec.v", Dims)}, 9) AS cos9
       |  FROM cand
       |  JOIN e eq ON eq.vec_id = cand.query_id
       |  JOIN e ec ON ec.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, rank, cos9 FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos9 DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= $K""".stripMargin
  }

  /** The IVF search (trained centroids, 3-probe, exact re-rank) —
    * shared by `sim_knn_ivf` and its recall gate. */
  private def ivfSpark(s: org.apache.spark.sql.SparkSession, d: String) =
    Similarity.knnIvfCentroids(quantized(s, d), "vec_id", "qv", K,
        cents = trainedCentroids(s, d), nprobe = 3,
        queryFilter = pmod(col("__id"), lit(10)) === 0)
      .withColumn("rank", col("rank").cast("long"))

  private def ivfSql: String = {
    def d2(v: String, c: String) =
      s"(${dot(v, v, Dims)} - 2.0 * ${dot(v, c, Dims)} + ${dot(c, c, Dims)})"
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$ivfTrainCtes,
       |scored AS (
       |  SELECT e.vec_id AS id, e.v, c.cent_id,
       |    ${d2("e.v", "c.cent_v")} AS d2
       |  FROM e, c),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY id ORDER BY d2 ASC, cent_id ASC) AS cr
       |  FROM scored),
       |assigned AS (SELECT id, v, cent_id AS cell_id FROM ranked WHERE cr = 1),
       |probes AS (SELECT id AS query_id, cent_id AS cell_id FROM ranked WHERE cr <= 3),
       |cand AS (
       |  SELECT DISTINCT q.id AS query_id, q.v AS qv, a.id AS neighbor_id, a.v AS cv
       |  FROM assigned q
       |  JOIN probes p ON p.query_id = q.id
       |  JOIN assigned a ON a.cell_id = p.cell_id AND a.id <> q.id
       |  WHERE q.id % 10 = 0),
       |s2 AS (
       |  SELECT query_id, neighbor_id,
       |    round(${cosine("qv", "cv", Dims)}, 9) AS cos9
       |  FROM cand)
       |SELECT query_id, neighbor_id, rank, cos9 FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos9 DESC, neighbor_id) AS rank
       |  FROM s2)
       |WHERE rank <= $K""".stripMargin
  }

  /** The filtered-search family's metadata predicate: the embedding's
    * document (shared id space, the SemDeDup join) is English. ~44 %
    * selective at sf0.01 — restrictive enough that filtered and
    * unfiltered top-10 differ, dense enough that probed cells still
    * hold candidates. */
  private def filteredAllowed(s: org.apache.spark.sql.SparkSession,
      d: String) = Tables.documents(s, d)
    .filter(col("lang") === "en").select(col("doc_id").as("vec_id"))

  private val filteredAllowedCte =
    "al AS (SELECT doc_id AS vec_id FROM documents WHERE lang = 'en')"

  private def filteredIvfSpark(s: org.apache.spark.sql.SparkSession,
      d: String) =
    Similarity.knnIvfFiltered(quantized(s, d), "vec_id", "qv", K,
        cents = trainedCentroids(s, d), allowed = filteredAllowed(s, d),
        nprobe = 3, queryFilter = pmod(col("__id"), lit(10)) === 0)
      .withColumn("rank", col("rank").cast("long"))

  private def filteredIvfSql: String = {
    def d2(v: String, c: String) =
      s"(${dot(v, v, Dims)} - 2.0 * ${dot(v, c, Dims)} + ${dot(c, c, Dims)})"
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$ivfTrainCtes,
       |$filteredAllowedCte,
       |scored AS (
       |  SELECT e.vec_id AS id, e.v, c.cent_id,
       |    ${d2("e.v", "c.cent_v")} AS d2
       |  FROM e, c),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY id ORDER BY d2 ASC, cent_id ASC) AS cr
       |  FROM scored),
       |assigned AS (SELECT id, v, cent_id AS cell_id FROM ranked WHERE cr = 1),
       |probes AS (SELECT id AS query_id, cent_id AS cell_id FROM ranked WHERE cr <= 3),
       |cand AS (
       |  SELECT DISTINCT q.id AS query_id, q.v AS qv, a.id AS neighbor_id, a.v AS cv
       |  FROM assigned q
       |  JOIN probes p ON p.query_id = q.id
       |  JOIN assigned a ON a.cell_id = p.cell_id AND a.id <> q.id
       |  JOIN al ON al.vec_id = a.id
       |  WHERE q.id % 10 = 0),
       |s2 AS (
       |  SELECT query_id, neighbor_id,
       |    round(${cosine("qv", "cv", Dims)}, 9) AS cos9
       |  FROM cand)
       |SELECT query_id, neighbor_id, rank, cos9 FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos9 DESC, neighbor_id) AS rank
       |  FROM s2)
       |WHERE rank <= $K""".stripMargin
  }

  /** The predicate-restricted assigned corpus `(__id, __v, cell_id)` —
    * the pre-built searchable side of filtered SERVING
    * ([[graft.streaming.StreamingSearch.serveFilteredWriter]]): built
    * once offline (assignment + predicate semi-join), checkpointed by
    * the caller, probed per micro-batch. */
  private[graft] def filteredAssignedFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val assigned = graphAssigned(s, d) // the shared memoized argmin (r16)
    assigned.join(
      filteredAllowed(s, d).withColumnRenamed("vec_id", "__id"),
      Seq("__id"), "left_semi")
  }

  /** Filtered ground truth: brute force over the predicate-passing
    * corpus only — what filtered recall is measured against. Memoized
    * (the exact_l2_topk doctrine): both the pre-filter and post-filter
    * recall rows grade against it, so the board computes the filtered
    * scan once per session/pass. */
  private def filteredBruteSpark(s: org.apache.spark.sql.SparkSession,
      d: String) =
    FrameCache.memo(s, d, "exact_filtered_topk") {
      val e = quantized(s, d)
      Similarity.knnBruteForce(
          e.filter(pmod(col("vec_id"), lit(10)) === 0),
          e.join(filteredAllowed(s, d), Seq("vec_id"), "left_semi"),
          "vec_id", "qv", K)
        .withColumn("rank", col("rank").cast("long"))
    }

  private def filteredBruteSql: String =
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$filteredAllowedCte,
       |s AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(${cosine("q.v", "c.v", Dims)}, 9) AS cos9
       |  FROM e q
       |  JOIN e c ON c.vec_id <> q.vec_id
       |  JOIN al ON al.vec_id = c.vec_id
       |  WHERE q.vec_id % 10 = 0)
       |SELECT query_id, neighbor_id, rank, cos9 FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos9 DESC, neighbor_id) AS rank
       |  FROM s)
       |WHERE rank <= $K""".stripMargin

  /** Per-label integer centroids of the nearest-centroid classifier,
    * trained on the 9/10 labeled pool (vec_id % 10 ≠ 0) and memoized —
    * the auto-labeling primitive: (label, dim, c) with c the floored
    * mean of exact integer coords (one IEEE division + floor per cell,
    * bit-reproducible). Scale shape: ONE map-side-combined (label, dim)
    * aggregation — ≤ labels × dims rows of output regardless of corpus
    * size, broadcast back to every classifier consumer. */
  private def labelCentroids(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    FrameCache.memo(s, d, "label_cents") {
      Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(10)) =!= 0)
        .select(col("label").cast("long").as("label"),
          posexplode(transform(col("embedding"),
            x => round(x.cast("double") * 1000))))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("col")).as("sq"), count(lit(1)).as("n"))
        .select(col("label"), col("pos").cast("long").as("dim"),
          floor(col("sq") / col("n")).as("c"))
    }

  /** The centroids reassembled into per-label vectors (cl, cvec). */
  private def labelCentroidVecs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    labelCentroids(s, d)
      .groupBy(col("label").as("cl"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("ps"))
      .select(col("cl"),
        transform(col("ps"), p => p.getField("c").cast("double")).as("cvec"))

  /** Shared SQL preamble of both classifier oracles: labeled quantized
    * vectors + the trained per-label centroid cells. */
  private def centroidTrainSql: String =
    s"""el AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |  ${quantVec("embedding")} AS v FROM embeddings),
       |cent AS (
       |  SELECT label AS cl, CAST(i - 1 AS BIGINT) AS dim,
       |    CAST(FLOOR(SUM(v[i]) / COUNT(*)) AS BIGINT) AS c
       |  FROM el, (SELECT unnest(range(1, ${Dims + 1})) AS i) di(i)
       |  WHERE vec_id % 10 <> 0
       |  GROUP BY 1, 2)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Nearest-centroid classifier, training half: per-label integer
    // centroids over the 9/10 labeled pool — the standard auto-labeling
    // primitive (propagate a seed taxonomy to an unlabeled corpus by
    // nearest class centroid). One (label, dim) aggregation, output
    // bounded by labels × dims — metadata-sized at any corpus scale.
    "sim_centroid_train" -> QueryDef(
      (s, d) => labelCentroids(s, d)
        .select(col("label"), col("dim"), col("c").cast("long").as("c")),
      s"""WITH $centroidTrainSql
         |SELECT cl AS label, dim, c FROM cent""".stripMargin),

    // Nearest-centroid classifier, eval half: the split-tagged
    // confusion matrix — every vector assigned to its nearest trained
    // centroid (exact integer d², min-label tie-break), counts grouped
    // by (split, true label, predicted label). The held-out 1/10 slice
    // is the honest generalization row: on this synthetic fixture the
    // labels are NOT geometrically clustered, so train-fit accuracy
    // (~0.40) towers over held-out (~chance) — exactly the overfit /
    // label-noise gap this audit exists to expose in a labeling
    // pipeline (spec-pinned). Scale shape: broadcast labels×dims
    // centroid frame onto the corpus, map-only argmin, one tiny
    // (split, label, pred) aggregation — the corpus never shuffles.
    "sim_centroid_confusion" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            transform(col("embedding"),
              x => round(x.cast("double") * 1000)).as("qv"))
        val d2 = Similarity.dot(col("qv"), col("qv")) -
          lit(2.0) * Similarity.dot(col("qv"), col("cvec")) +
          Similarity.dot(col("cvec"), col("cvec"))
        e.crossJoin(broadcast(labelCentroidVecs(s, d)))
          .select(col("vec_id"), col("label"),
            when(pmod(col("vec_id"), lit(10)) === 0, "heldout")
              .otherwise("train").as("split"),
            col("cl"), d2.as("d2"))
          .groupBy(col("vec_id"), col("label"), col("split"))
          .agg(min(struct(col("d2"), col("cl"))).as("m"))
          .groupBy(col("split"), col("label"), col("m.cl").as("pred"))
          .agg(count(lit(1)).as("n"))
      },
      s"""WITH $centroidTrainSql,
         |cv AS (SELECT cl, list(CAST(c AS DOUBLE) ORDER BY dim) AS cvec
         |       FROM cent GROUP BY cl),
         |scored AS (
         |  SELECT el.vec_id, el.label,
         |    CASE WHEN el.vec_id % 10 = 0 THEN 'heldout'
         |         ELSE 'train' END AS split,
         |    cv.cl, ${d2Sql("el.v", "cv.cvec", Dims)} AS d2
         |  FROM el, cv),
         |pred AS (
         |  SELECT vec_id, label, split, cl AS pred FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cl ASC) AS rn
         |    FROM scored) WHERE rn = 1)
         |SELECT split, label, pred, CAST(COUNT(*) AS BIGINT) AS n
         |FROM pred GROUP BY 1, 2, 3""".stripMargin),

    // Exact top-10 cosine neighbors for each sampled query vector.
    "sim_knn_brute" -> QueryDef((s, d) => bruteSpark(s, d), bruteSql),

    // IVF ANN top-10: TRAINED centroids (2 integer-Lloyd iterations off
    // the 1-in-50 id-pick init — see ivfTrainPipeline), broadcast
    // argmin-L2 cell assignment, 3-cell probe, exact re-rank.
    "sim_knn_ivf" -> QueryDef((s, d) => ivfSpark(s, d), ivfSql),

    // IVF quality gate: recall@10 of the probe-limited IVF path against
    // the exact brute force — the third of the three ANN recall gates
    // (LSH: sim_ann_recall; PQ: sim_pq_recall), so every approximate
    // path the engine serves has its accuracy pinned. Same shape: the
    // join keys on (query, neighbor) id pairs, one IEEE division of two
    // exact counts at the edge.
    "sim_ivf_recall" -> QueryDef(
      (s, d) => {
        val exact = bruteSpark(s, d).select(col("query_id"), col("neighbor_id"))
        val approx = ivfSpark(s, d)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
          .select(col("query_id"), col("n_exact"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_exact").cast("double"))
              .as("recall_at_k"))
      },
      s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($bruteSql)),
         |approx AS (SELECT query_id, neighbor_id, 1 AS hit FROM ($ivfSql))
         |SELECT b.query_id, COUNT(*) AS n_exact, COUNT(a.hit) AS n_hit,
         |  CAST(COUNT(a.hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
         |FROM brute b
         |LEFT JOIN approx a
         |  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id""".stripMargin),

    // HIERARCHICAL (coarse→fine) assignment vs the flat argmin — the
    // r16 scaling ladder measured the flat assignment's exponent at
    // 2.18 under the held-cell-size recipe (k ∝ n ⇒ n·k ≈ n²/cell
    // work, docs/SCALE.md); the coarse→fine kernel scores each vector
    // against nprobeC coarse cells' fine centroids only
    // (n·(k_c + nprobeC·k/k_c) — with k_c ≈ √k, n^1.5 at held cell
    // size). This row grades the price: per-vector agreement with the
    // flat assignment (a vector disagrees exactly when its true
    // nearest fine centroid lives in an un-probed coarse cell). The
    // oracle replays both assignments off the SAME trained-centroid
    // CTE chain.
    "sim_hier_assign" -> QueryDef(
      (s, d) => hierJoined(s, d, HierProbeC)
        .select(col("vec_id"), col("cell_flat"), col("cell_hier"),
          col("agree")),
      s"""WITH ${hierCtes(HierProbeC)}
         |SELECT f.vec_id, f.cell_flat, h.cell_hier,
         |  CAST(f.cell_flat = h.cell_hier AS BIGINT) AS agree
         |FROM hflat f JOIN hier h ON h.vec_id = f.vec_id""".stripMargin),

    // The probe-width sweep over the hierarchical assignment: the
    // agreement rate per nprobeC (1/2/4) — the knob a deployment turns
    // to trade assignment exactness against the n^1.5 build cost. The
    // division at the edge is one IEEE op over two exact counts.
    // r16 fusion: the coarse probe sets nest (prefixes of one
    // vector→coarse ranking), so one branch-keyed fine argmin + one
    // (branch)-grouped agreement aggregate replace three full kernels.
    "sim_hier_probe_sweep" -> QueryDef(
      (s, d) => {
        val flat = graphAssigned(s, d)
          .select(col("__id").as("vec_id"), col("cell_id").as("cell_flat"))
        val coarse = trainedCentroids(s, d)
          .filter(pmod(col("cent_id"), lit(HierCoarseMod)) === 0)
          .select(col("cent_id").as("co_id"), col("cent_v").as("co_v"))
        val hierB = Similarity.hierAssignCentroidsNp(quantized(s, d),
            "vec_id", "qv", trainedCentroids(s, d), coarse, HierProbeSweep)
          .select(col("probe_c"), col("id").as("vec_id"),
            col("cell_id").as("cell_hier"))
        flat.join(hierB, Seq("vec_id"))
          .withColumn("agree",
            (col("cell_flat") === col("cell_hier")).cast("long"))
          .groupBy(col("probe_c"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("agree")).as("n_agree"))
          .select(col("probe_c"), col("n_vecs"), col("n_agree"),
            (col("n_agree").cast("double") / col("n_vecs").cast("double"))
              .as("agree_rate"))
      },
      HierProbeSweep.map(p =>
        s"SELECT CAST($p AS BIGINT) AS probe_c, r.* FROM (\n" +
          s"WITH ${hierCtes(p)}\n" +
          "SELECT COUNT(*) AS n_vecs,\n" +
          "  CAST(SUM(CAST(f.cell_flat = h.cell_hier AS BIGINT)) AS BIGINT) AS n_agree,\n" +
          "  CAST(SUM(CAST(f.cell_flat = h.cell_hier AS BIGINT)) AS DOUBLE)\n" +
          "    / CAST(COUNT(*) AS DOUBLE) AS agree_rate\n" +
          "FROM hflat f JOIN hier h ON h.vec_id = f.vec_id) r")
        .mkString("\nUNION ALL\n")),

    // FILTERED vector search — ANN under a relational predicate (the
    // embedding's document is English; shared id space), served by the
    // PRE-filter strategy: the predicate's id frame left-semi-joins
    // the assigned corpus before candidate generation, so probed cells
    // contribute only predicate-passing members and no shortlist slot
    // is wasted on a candidate a post-pass would drop. The production
    // concern this family pins: filtering AFTER an unfiltered top-k
    // silently degrades recall as selectivity tightens (a 44 %
    // predicate post-filtered from an unfiltered top-10 keeps ~4.4
    // usable slots); pre-filtering keeps all k. At 100 TB the
    // predicate pushes to the documents scan, the semi-join moves ids
    // only, and the rest is the pinned trained-IVF probe shape.
    "sim_filtered_search" -> QueryDef(
      (s, d) => filteredIvfSpark(s, d), filteredIvfSql),

    // Its recall gate, against the FILTERED exact baseline (brute
    // force over predicate-passing vectors only — measuring against
    // the unfiltered baseline would conflate predicate selectivity
    // with index quality).
    "sim_filtered_recall" -> QueryDef(
      (s, d) => {
        val exact = filteredBruteSpark(s, d)
          .select(col("query_id"), col("neighbor_id"))
        val approx = filteredIvfSpark(s, d)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
          .select(col("query_id"), col("n_exact"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_exact").cast("double"))
              .as("recall_at_k"))
      },
      s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($filteredBruteSql)),
         |approx AS (SELECT query_id, neighbor_id, 1 AS hit
         |           FROM ($filteredIvfSql))
         |SELECT b.query_id, COUNT(*) AS n_exact, COUNT(a.hit) AS n_hit,
         |  CAST(COUNT(a.hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
         |FROM brute b
         |LEFT JOIN approx a
         |  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id""".stripMargin),

    // The POST-filter strategy, measured against the same filtered
    // exact baseline — the comparison row that turns the pre-vs-post
    // claim into an artifact number pair instead of prose: the
    // unfiltered IVF top-10 is computed first, THEN the predicate
    // drops non-passing hits, so every dropped hit is a shortlist slot
    // wasted (at 44 % selectivity roughly half the slots). The pre-
    // filter row (`sim_filtered_recall`) fills all k slots with
    // predicate-passing candidates. A spec pins pre ≥ post in total
    // hits on the fixture.
    "sim_postfilter_recall" -> QueryDef(
      (s, d) => {
        val exact = filteredBruteSpark(s, d)
          .select(col("query_id"), col("neighbor_id"))
        val approx = ivfSpark(s, d)
          .join(filteredAllowed(s, d)
            .withColumnRenamed("vec_id", "neighbor_id"),
            Seq("neighbor_id"), "left_semi")
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
          .select(col("query_id"), col("n_exact"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_exact").cast("double"))
              .as("recall_at_k"))
      },
      s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($filteredBruteSql)),
         |approx AS (
         |  SELECT f.query_id, f.neighbor_id, 1 AS hit
         |  FROM ($ivfSql) f
         |  JOIN documents dd ON dd.doc_id = f.neighbor_id
         |    AND dd.lang = 'en')
         |SELECT b.query_id, COUNT(*) AS n_exact, COUNT(a.hit) AS n_hit,
         |  CAST(COUNT(a.hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
         |FROM brute b
         |LEFT JOIN approx a
         |  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id""".stripMargin),

    // Index STALENESS / drift audit — the retraining trigger the
    // streaming-index story needs: a production index is trained at
    // time T while vectors keep arriving, and the decision "retrain
    // now?" should be a measured number, not a cron guess. Simulated
    // with the id-parity split: centroids train on the EVEN half only
    // (the corpus as of training time; same 1-in-50 id-pick init, same
    // integer-Lloyd chain), then the FULL corpus is assigned and each
    // cell reports occupancy and exact-int64 assignment distance per
    // cohort (trained evens vs arrived odds). A healthy stationary
    // stream shows near-equal per-cell occupancy and mean-d2 between
    // cohorts; drift shows up as arrival mass crowding a few cells
    // and/or arrival mean-d2 rising above trained mean-d2 — both read
    // directly off this frame. At 100 TB: training is the pinned
    // k-means shape over the training slice, assignment is the
    // broadcast-centroid argmin (map-only), and the audit is ONE
    // map-side-combined aggregate keyed by k cells — no corpus-keyed
    // shuffle anywhere.
    "sim_index_drift" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ef = quantized(s, d)
        val cents = cohortCentroids(s, d)
        val d2 = (Similarity.dot(col("qv"), col("qv"))
          - lit(2.0) * Similarity.dot(col("qv"), col("cent_v"))
          + Similarity.dot(col("cent_v"), col("cent_v"))).cast("long")
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("d2").asc, col("cent_id").asc)
        val asg = ef.crossJoin(broadcast(cents))
          .withColumn("d2", d2)
          .withColumn("cr", row_number().over(w))
          .filter(col("cr") === 1)
        val trained = pmod(col("vec_id"), lit(2)) === 0
        asg.groupBy(col("cent_id").as("cell_id"))
          .agg(count(when(trained, 1)).as("n_trained"),
            count(when(!trained, 1)).as("n_arrival"),
            sum(when(trained, col("d2"))).as("d2_trained"),
            sum(when(!trained, col("d2"))).as("d2_arrival"))
          .select(col("cell_id"), col("n_trained"), col("n_arrival"),
            col("d2_trained"), col("d2_arrival"),
            when(col("n_trained") > 0,
              col("d2_trained") / col("n_trained")).as("mean_d2_trained"),
            when(col("n_arrival") > 0,
              col("d2_arrival") / col("n_arrival")).as("mean_d2_arrival"))
      },
      s"""WITH ef AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |e AS (SELECT vec_id, v FROM ef WHERE vec_id % 2 = 0),
         |$ivfTrainCtes,
         |scoredf AS (
         |  SELECT ef.vec_id, c.cent_id,
         |    ${d2Sql("ef.v", "c.cent_v", Dims)} AS d2
         |  FROM ef, c),
         |asgf AS (
         |  SELECT vec_id, cent_id AS cell_id, CAST(d2 AS BIGINT) AS d2
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2 ASC, cent_id ASC) AS cr
         |    FROM scoredf) WHERE cr = 1)
         |SELECT cell_id,
         |  CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT)
         |    AS n_trained,
         |  CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT)
         |    AS n_arrival,
         |  CAST(sum(CASE WHEN vec_id % 2 = 0 THEN d2 END) AS BIGINT)
         |    AS d2_trained,
         |  CAST(sum(CASE WHEN vec_id % 2 = 1 THEN d2 END) AS BIGINT)
         |    AS d2_arrival,
         |  CASE WHEN count(CASE WHEN vec_id % 2 = 0 THEN 1 END) > 0
         |    THEN CAST(sum(CASE WHEN vec_id % 2 = 0 THEN d2 END) AS BIGINT)
         |      / count(CASE WHEN vec_id % 2 = 0 THEN 1 END) END
         |    AS mean_d2_trained,
         |  CASE WHEN count(CASE WHEN vec_id % 2 = 1 THEN 1 END) > 0
         |    THEN CAST(sum(CASE WHEN vec_id % 2 = 1 THEN d2 END) AS BIGINT)
         |      / count(CASE WHEN vec_id % 2 = 1 THEN 1 END) END
         |    AS mean_d2_arrival
         |FROM asgf GROUP BY cell_id""".stripMargin),

    // CLOSING the drift loop: sim_index_drift measured the retraining
    // trigger (the arrival cohort fits ~8 % worse under the cohort-
    // trained index); this row ACTS on it — retrain the centroids on
    // the FULL corpus with the same integer-Lloyd chain, re-assign,
    // and report the fit gap per index generation. gap_bp is the
    // arrival/trained mean-d2 ratio in basis points (10,000 = parity):
    // gen 0 (stale, evens-trained) sits above parity; gen 1 (retrained)
    // collapses to ~parity — the measured proof the retrain removed
    // the drift. All inputs to the ratio are exact int64 sums < 2^53,
    // so the IEEE double divisions are engine-identical; floor (not
    // round) avoids the half-up/half-away seam. Scale shape: two
    // broadcast-centroid assignments (k-sized builds, corpus never
    // reshuffles) + ONE map-side-combined 2-group aggregation. The
    // serving-side half of the loop is the hot-swap writer
    // (StreamingSearch.servePrunedSwappableWriter): the swap spec pins
    // pre-swap serving ≡ the stale-index batch search and post-swap
    // serving ≡ the retrained-index batch search, row-identical.
    "sim_index_retrain" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ef = quantized(s, d)
        def fit(cents: org.apache.spark.sql.DataFrame, gen: Long) = {
          val d2 = (Similarity.dot(col("qv"), col("qv"))
            - lit(2.0) * Similarity.dot(col("qv"), col("cent_v"))
            + Similarity.dot(col("cent_v"), col("cent_v"))).cast("long")
          val w = Window.partitionBy(col("vec_id"))
            .orderBy(col("d2").asc, col("cent_id").asc)
          ef.crossJoin(broadcast(cents))
            .withColumn("d2", d2)
            .withColumn("cr", row_number().over(w))
            .filter(col("cr") === 1)
            .select(lit(gen).as("index_gen"), col("vec_id"), col("d2"))
        }
        val trained = pmod(col("vec_id"), lit(2)) === 0
        fit(cohortCentroids(s, d), 0L)
          .union(fit(trainedCentroids(s, d), 1L))
          .groupBy(col("index_gen"))
          .agg(count(when(trained, 1)).as("n_trained"),
            count(when(!trained, 1)).as("n_arrival"),
            sum(when(trained, col("d2"))).as("d2_trained"),
            sum(when(!trained, col("d2"))).as("d2_arrival"))
          .select(col("index_gen"), col("n_trained"), col("n_arrival"),
            col("d2_trained"), col("d2_arrival"),
            (col("d2_trained") / col("n_trained")).as("mean_d2_trained"),
            (col("d2_arrival") / col("n_arrival")).as("mean_d2_arrival"),
            floor(lit(10000.0) * (col("d2_arrival") / col("n_arrival"))
              / (col("d2_trained") / col("n_trained"))).as("gap_bp"))
      },
      s"""WITH ef AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |e AS (SELECT vec_id, v FROM ef WHERE vec_id % 2 = 0),
         |${ivfTrainChain("e", "")},
         |${ivfTrainChain("ef", "f")},
         |cents AS (
         |  SELECT 0 AS g, cent_id, cent_v FROM c
         |  UNION ALL SELECT 1 AS g, cent_id, cent_v FROM fc),
         |scoredf AS (
         |  SELECT cn.g, ef.vec_id, cn.cent_id,
         |    ${d2Sql("ef.v", "cn.cent_v", Dims)} AS d2
         |  FROM ef, cents cn),
         |asgf AS (
         |  SELECT g, vec_id, CAST(d2 AS BIGINT) AS d2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY g, vec_id
         |      ORDER BY d2 ASC, cent_id ASC) AS cr
         |    FROM scoredf) WHERE cr = 1),
         |agg AS (
         |  SELECT g,
         |    CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT)
         |      AS n_trained,
         |    CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT)
         |      AS n_arrival,
         |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN d2 END) AS BIGINT)
         |      AS d2_trained,
         |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN d2 END) AS BIGINT)
         |      AS d2_arrival
         |  FROM asgf GROUP BY g)
         |SELECT CAST(g AS BIGINT) AS index_gen,
         |  n_trained, n_arrival, d2_trained, d2_arrival,
         |  d2_trained / n_trained AS mean_d2_trained,
         |  d2_arrival / n_arrival AS mean_d2_arrival,
         |  CAST(floor(10000.0 * (d2_arrival / n_arrival)
         |    / (d2_trained / n_trained)) AS BIGINT) AS gap_bp
         |FROM agg""".stripMargin),

    // Serving BETWEEN retrains — the missing third beat of the index
    // lifecycle (drift measures the trigger, retrain closes the gap;
    // this row proves nothing is lost WHILE you wait): the base index
    // is built offline on the training-time corpus (evens, assigned to
    // the gen-0 cohort centroids), arrivals since (odds) are ADMITTED
    // by the same stateless broadcast-argmin assignment (the
    // StreamingIndex ADD path — no retrain, no state, no corpus
    // reshuffle), and queries are served over base ∪ delta with the
    // pre-assigned probe/re-rank kernel. `from_delta` tags neighbors
    // that exist only because the ADD path ran — the measured proof
    // that admitted vectors are immediately searchable under the stale
    // generation. SimilaritySpec additionally pins union-serving
    // row-identical to rebuilding the whole index on base+delta (the
    // assignment is per-vector, so offline-build + stateless-admit ≡
    // full rebuild under the SAME centroids — exactly why the ADD path
    // needs no retrain). Scale shape: two broadcast-centroid
    // assignments + one cell-keyed equi-join; vectors shuffle once.
    "sim_index_serve_delta" -> QueryDef(
      (s, d) => {
        val cents = cohortCentroids(s, d)
        val e = quantized(s, d)
        val (baseAsg, _) = Similarity.ivfAssignCentroids(
          e.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id", "qv",
          cents, nprobe = 1)
        val (deltaAsg, _) = Similarity.ivfAssignCentroids(
          e.filter(pmod(col("vec_id"), lit(2)) =!= 0), "vec_id", "qv",
          cents, nprobe = 1)
        val queries = e.filter(pmod(col("vec_id"), lit(10)) === 0)
        Similarity.knnIvfFilteredQueries(queries, "vec_id", "qv", K,
            assignedNbrs = baseAsg.unionByName(deltaAsg), cents = cents,
            nprobe = 3)
          .withColumn("rank", col("rank").cast("long"))
          .withColumn("from_delta", pmod(col("neighbor_id"), lit(2)))
      },
      s"""WITH ef AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |e AS (SELECT vec_id, v FROM ef WHERE vec_id % 2 = 0),
         |${ivfTrainChain("e", "")},
         |scored AS (
         |  SELECT ef.vec_id AS id, ef.v, c.cent_id,
         |    ${d2Sql("ef.v", "c.cent_v", Dims)} AS d2
         |  FROM ef, c),
         |ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY id ORDER BY d2 ASC, cent_id ASC) AS cr
         |  FROM scored),
         |assigned AS (SELECT id, v, cent_id AS cell_id FROM ranked WHERE cr = 1),
         |probes AS (
         |  SELECT id AS query_id, v AS qv, cent_id AS cell_id
         |  FROM ranked WHERE cr <= 3 AND id % 10 = 0),
         |cand AS (
         |  SELECT DISTINCT p.query_id, p.qv, a.id AS neighbor_id, a.v AS cv
         |  FROM probes p
         |  JOIN assigned a ON a.cell_id = p.cell_id AND a.id <> p.query_id),
         |s2 AS (
         |  SELECT query_id, neighbor_id,
         |    round(${cosine("qv", "cv", Dims)}, 9) AS cos9
         |  FROM cand)
         |SELECT query_id, neighbor_id, rank, cos9,
         |  CAST(neighbor_id % 2 AS BIGINT) AS from_delta
         |FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos9 DESC, neighbor_id) AS rank
         |  FROM s2)
         |WHERE rank <= $K""".stripMargin),

    // Coreset by cell quota — DIVERSITY sampling for training subsets:
    // a uniform sample over-represents dense regions of embedding
    // space; capping each IVF cell at a fixed quota keeps every region
    // represented (the cheap, deterministic cousin of k-center greedy,
    // which is inherently sequential). Broadcast centroids + map-only
    // argmin assignment (ivfAssign), then one shuffle on cell_id with
    // the quota pushed below the exchange as WindowGroupLimit
    // (PlanSpec-pinned) — the op_reservoir_sample shape stratified by
    // learned cluster instead of a categorical column. Selection order
    // within a cell is portable-hash (replay-safe, engine-portable).
    "sim_coreset" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.PortableHash
        val assigned = graphAssigned(s, d) // shared memoized argmin (r16)
        val w = Window.partitionBy(col("cell_id"))
          .orderBy(PortableHash.hash60(
            concat(col("__id").cast("string"), lit("|coreset"))), col("__id"))
        assigned
          .withColumn("pick", row_number().over(w))
          .filter(col("pick") <= 10)
          .select(col("cell_id"), col("__id").as("vec_id"),
            col("pick").cast("long").as("pick"))
      }, {
        def d2(v: String, c: String) =
          s"(${dot(v, v, Dims)} - 2.0 * ${dot(v, c, Dims)} + ${dot(c, c, Dims)})"
        val hSql = graft.functions.PortableHash.hash60Sql(
          "CAST(id AS VARCHAR) || '|coreset'")
        s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
           |$ivfTrainCtes,
           |scored AS (
           |  SELECT e.vec_id AS id, c.cent_id, ${d2("e.v", "c.cent_v")} AS d2
           |  FROM e, c),
           |assigned AS (
           |  SELECT id, cent_id AS cell_id FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY id ORDER BY d2 ASC, cent_id ASC) AS cr
           |    FROM scored)
           |  WHERE cr = 1)
           |SELECT cell_id, id AS vec_id, pick FROM (
           |  SELECT cell_id, id,
           |    CAST(row_number() OVER (PARTITION BY cell_id
           |      ORDER BY $hSql, id) AS BIGINT) AS pick
           |  FROM assigned)
           |WHERE pick <= 10""".stripMargin
      }),

    // One distributed Lloyd (k-means) iteration — the training step for
    // the IVF centroids: broadcast argmin-L2 assignment, then
    // per-(cluster, dim) counts/sums/means over the first 4 dims.
    // Integer-quantized vectors make the sums exact and the mean one
    // IEEE division — bit-reproducible in the oracle.
    "sim_kmeans_step" -> QueryDef(
      (s, d) => Similarity.kmeansStep(quantized(s, d), "vec_id", "qv",
        centroidFilter = pmod(col("vec_id"), lit(50)) === 0, outDims = 4), {
        def d2(v: String, c: String) =
          s"(${dot(v, v, Dims)} - 2.0 * ${dot(v, c, Dims)} + ${dot(c, c, Dims)})"
        s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
           |c AS (SELECT vec_id AS cent_id, v AS cent_v FROM e WHERE vec_id % 50 = 0),
           |scored AS (
           |  SELECT e.vec_id AS id, e.v, c.cent_id, ${d2("e.v", "c.cent_v")} AS d2
           |  FROM e, c),
           |assigned AS (
           |  SELECT id, v, cent_id AS cluster_id FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY id ORDER BY d2 ASC, cent_id ASC) AS cr
           |    FROM scored) WHERE cr = 1)
           |SELECT cluster_id, CAST(i - 1 AS BIGINT) AS dim,
           |  COUNT(*) AS n_members, SUM(v[i]) AS sum_q,
           |  SUM(v[i]) / COUNT(*) AS mean_q
           |FROM assigned, (SELECT unnest(range(1, 5)) AS i) dims(i)
           |GROUP BY cluster_id, i""".stripMargin
      }),

    // The TRAINED IVF centroids themselves (cent_id, dim, coord) — the
    // sim_kmeans_step Lloyd kernel ITERATED into an actual training run
    // (2 integer-Lloyd iterations off the 1-in-50 id-pick init, empty
    // clusters keeping their previous centroid). The oracle replays
    // both iterations as unrolled CTE blocks, so a green row proves the
    // iteration composes — assignment, re-quantized mean, and carry-
    // forward all bit-match across engines. Every IVF consumer
    // (sim_knn_ivf / sim_coreset / sim_index_build) reads THIS frame.
    "sim_kmeans_train" -> QueryDef(
      (s, d) => trainedCentroids(s, d)
        .select(col("cent_id"), posexplode(col("cent_v")))
        .select(col("cent_id"), (col("pos") + 1).cast("long").as("dim"),
          col("col").as("q")),
      s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |$ivfTrainCtes
         |SELECT cent_id, CAST(di.i AS BIGINT) AS dim, cent_v[di.i] AS q
         |FROM c, (SELECT unnest(range(1, ${Dims + 1})) AS i) di""".stripMargin),

    // The k-means objective audited ACROSS the training run: total
    // within-cluster squared L2 (inertia) against the centroids as of
    // iteration 0 (the id-pick init), 1, and 2 — THE number that says
    // training moved the index toward its data, and the row a broken
    // update step (wrong means, dropped clusters, swapped dims) bends
    // immediately. All arithmetic is the family's exact int64, so the
    // three sums replay bit-for-bit; at 100 TB each iteration's audit
    // is one broadcast + one map-side-combined min/sum pass.
    "sim_kmeans_inertia" -> QueryDef(
      (s, d) => {
        val e = quantized(s, d)
        val pts = e.select(col("vec_id").as("__id"), col("qv").as("__v"))
        val init = e.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("cent_id"), col("qv").as("cent_v"))
        val d2 = Similarity.dot(col("__v"), col("__v")) -
          lit(2.0) * Similarity.dot(col("__v"), col("cent_v")) +
          Similarity.dot(col("cent_v"), col("cent_v"))
        (0 to TrainIters).map { t =>
          // the final iteration's centroids are exactly the shared
          // trained frame, and t = 1 is the shared training PREFIX
          // (r16 memo) — read the checkpoints instead of rebuilding
          // the training DAG per audited depth
          val cents =
            if (t == TrainIters) trainedCentroids(s, d)
            else if (t == 1) trainedCentroidsIt1(s, d)
            else Similarity.kmeansTrain(pts, init, iters = t)
          pts.crossJoin(broadcast(cents))
            .groupBy(col("__id")).agg(min(d2).as("md"))
            .agg(count(lit(1)).as("n_vecs"),
              sum(col("md")).cast("long").as("total_d2"))
            .select(lit(t.toLong).as("iter"), col("n_vecs"), col("total_d2"))
        }.reduce(_.union(_))
      }, {
        val per = (0 to TrainIters).map { t =>
          s"""SELECT CAST($t AS BIGINT) AS iter, COUNT(*) AS n_vecs,
             |  CAST(SUM(md) AS BIGINT) AS total_d2 FROM (
             |  SELECT e.vec_id, MIN(${d2Sql("e.v", "c.cent_v", Dims)}) AS md
             |  FROM e, ct$t c GROUP BY e.vec_id)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
           |$ivfTrainCtes
           |$per""".stripMargin
      }),

    // The trained PQ codebook (sub, code, dim, coord): all four
    // subspaces train as ONE grouped k-means (the subspace id rides the
    // grouping keys — no per-subspace jobs), same 2-iteration
    // integer-Lloyd replay doctrine as sim_kmeans_train.
    "sim_pq_train" -> QueryDef(
      (s, d) => trainedCodebook(s, d)
        .select(col("sub").cast("long").as("sub"), col("code"),
          posexplode(col("cv")))
        .select(col("sub"), col("code"),
          (col("pos") + 1).cast("long").as("dim"), col("col").as("q")),
      s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |$pqTrainCtes
         |SELECT CAST(sub AS BIGINT) AS sub, code,
         |  CAST(di.i AS BIGINT) AS dim, cv[di.i] AS q
         |FROM cb, (SELECT unnest(range(1, 17)) AS i) di""".stripMargin),

    // LSH-bucketed ANN top-10 for the same query sample (recall < 1 by
    // construction; identical bucketing constants on both sides).
    "sim_knn_lsh" -> QueryDef((s, d) => lshSpark(s, d), lshSql),

    // Product-quantization code assignment — the compression half of an
    // IVF-PQ index (the structure serving billion-vector ANN in
    // production): the 64-dim vector splits into 4 subspaces of 16
    // dims, each subvector snaps to its nearest of 16 codewords, and the
    // vector is thereafter 4 small codes (16 bytes of float becomes 4
    // bits per subspace). Codewords are TRAINED (2 grouped integer-Lloyd
    // iterations off the vec_id < 16 id-pick init — sim_pq_train exposes
    // them; still zero RNG, so the oracle replays the training too).
    // All arithmetic is exact: quantized integer coords, squared-L2 by
    // dot identity, and the argmin is a MIN over the collision-free key
    // d2·16+code — so assignment is ONE map-side-combined hash
    // aggregation, no per-vector window, no shuffle of the vectors
    // themselves. At 100 TB: the codebook (64 subvectors) broadcasts to
    // every executor, the subspace fan-out is map-only, and the only
    // exchange carries (vec_id, sub, partial-min key) — the same rows
    // the PQ index stores.
    "sim_pq_code" -> QueryDef(
      (s, d) => pqCodes(s, d),
      s"""WITH $pqCtes
         |SELECT vec_id, sub, k & 15 AS code, k >> 4 AS d2 FROM k""".stripMargin),

    // PQ search by asymmetric distance computation (ADC) — how a PQ
    // index is actually queried: each query precomputes its distance
    // TABLE to the 64 codewords (|queries| × 64 rows — tiny, BROADCAST),
    // and every coded corpus vector's approximate distance is then four
    // table lookups summed — a broadcast equi-join on (sub, code) plus
    // one (query, vec) aggregation; the corpus vectors themselves never
    // move and no float op touches the scan. All-int64 (codes, table
    // entries, sums), so the ranking is deterministic and
    // engine-portable. At 100 TB this composes with IVF: probe cells
    // first, ADC-scan only their members — the ADC shape here IS that
    // inner loop.
    "sim_pq_adc" -> QueryDef((s, d) => pqAdc(s, d), pqAdcSql),

    // PQ quality gate: recall@$K of the ADC search against the EXACT
    // squared-L2 brute force over the same query set — THE number a
    // quantization regression (codebook drift, subspace split, key
    // packing) silently tanks while sim_pq_adc itself still
    // hash-matches its own oracle. Same doctrine as sim_ann_recall:
    // the join keys on (query, neighbor) id pairs — k×|queries| rows —
    // and the recall is one IEEE division of two exact counts. The
    // absolute level is honestly modest on this fixture: the synthetic
    // embeddings are near-orthogonal and 4×4 bits is severe compression
    // (the id-pick 8-codeword book measured 0.0-0.3; training plus the
    // round-9 16-codeword capacity lift it — see
    // docs/SCALE.md) — the row pins the MEASURED value, so any codebook
    // / packing / lookup regression moves it and turns the row red.
    "sim_pq_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        pqAdc(s, d).select(col("query_id"), col("vec_id").as("neighbor_id"))),
      recallAgainstExactL2Sql(pqAdcSql)),

    // The COMPOSED IVF-PQ search — probe-pruned ADC, the serving shape
    // a production vector index runs (and the scale fix for sim_pq_adc,
    // which honestly full-scans the coded corpus per query): each query
    // ranks the broadcast trained centroids and keeps its nprobe
    // nearest cells, then the ADC distance-table join is RESTRICTED to
    // those cells' code rows via the broadcast (query, cell) probe
    // frame — each query scores ~nprobe/k_cells of the corpus instead
    // of all of it, and the pruning join is map-only. Inputs are the
    // stored index itself (sim_index_build's rows with codes unpacked)
    // plus the trained centroid/codebook metadata — the three
    // previously-separate components composed into one DAG, which the
    // oracle replays end-to-end (training, coding, cell assignment,
    // probing, pruned ADC, top-k).
    "sim_ivfpq_search" -> QueryDef((s, d) => ivfpqSpark(s, d), ivfpqSql),

    // IVF-PQ quality gate: recall@10 of the probe-pruned ADC against
    // exact squared-L2 — the fourth recall row, completing the gate set
    // over every serving path (LSH / IVF / full-scan PQ / IVF-PQ).
    // Measured at sf0.01: 0.29 vs full-scan ADC's 0.22 — pruning
    // HELPS recall here, not just cost: the cell restriction uses exact
    // query-to-centroid geometry, so it evicts far-away vectors whose
    // quantized codes masquerade as near (ADC false positives), the
    // classic reason production indexes run IVF-PQ rather than PQ
    // full scans even ignoring the ~nprobe/k_cells work reduction.
    "sim_ivfpq_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        ivfpqSpark(s, d).select(col("query_id"),
          col("vec_id").as("neighbor_id"))),
      recallAgainstExactL2Sql(ivfpqSql)),

    // RESIDUAL IVF-PQ search (the IVFADC scheme) — the layout a
    // production index actually stores: PQ codes the residual
    // v − centroid(cell), not the raw vector, so the same 4×4-bit
    // budget quantizes the (much smaller) residual field far finer.
    // The residual codebook trains with the SAME grouped integer-Lloyd
    // loop (residuals of integer vectors against re-quantized integer
    // centroids stay integer — the exact-int64 doctrine carries
    // through unchanged), the distance table is per (query, probed
    // cell), and the oracle replays IVF training → residuals →
    // residual-codebook training → coding → probing → pruned ADC in
    // one CTE chain.
    "sim_ivfpq_residual" -> QueryDef(
      (s, d) => ivfpqResSpark(s, d), ivfpqResSql),

    // Residual IVF-PQ quality gate — the fifth recall row. Measured at
    // sf0.01: 0.34 recall@10 vs 0.29 for the raw-vector IVF-PQ path at
    // IDENTICAL serving cost (same probes, same code budget, same join
    // shape) — the entire margin is the residual book quantizing the
    // smaller field finer, which is exactly why IVFADC is the
    // production layout. This row pins the margin.
    "sim_ivfpq_res_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        ivfpqResSpark(s, d).select(col("query_id"),
          col("vec_id").as("neighbor_id"))),
      recallAgainstExactL2Sql(ivfpqResSql)),

    // IVFADC+R — the refinement stage that completes the production
    // serving pipeline: the residual-ADC ranking keeps a 3·K shortlist
    // per query, then the top-K is decided by EXACT squared-L2 on the
    // raw vectors of just those candidates. At 100 TB the re-rank is a
    // per-query point-lookup gather (the shortlist id-pairs broadcast
    // onto the corpus — vectors never shuffle), so the exact stage
    // costs R vector reads per query while the heavy ranking still
    // runs entirely on 16-bit codes. The oracle replays the whole
    // chain: training → coding → probing → pruned ADC at width R →
    // exact re-score → top-K.
    "sim_ivfpq_rerank" -> QueryDef(
      (s, d) => ivfpqRerankSpark(s, d), ivfpqRerankSql),

    // Re-rank quality gate — the sixth recall row. The exact stage
    // repairs ADC *ordering* errors inside the probed cells (its
    // ceiling is whatever the nprobe cells contain), and the lift is
    // the largest single step on the quality ladder: measured
    // recall@10 at sf0.01 is 0.70 vs 0.34 for the same residual-ADC
    // ranking without refinement — same probes, same codes, plus R
    // raw-vector reads per query. SimilaritySpec pins rerank >= ADC.
    "sim_ivfpq_rerank_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        ivfpqRerankSpark(s, d).select(col("query_id"),
          col("vec_id").as("neighbor_id"))),
      recallAgainstExactL2Sql(ivfpqRerankSql)),

    // MMR-diversified serving: the greedy maximal-marginal-relevance
    // pass over the production IVFADC+R pool widened to MmrPool — what
    // a retrieval server runs when the exact top of the list is
    // near-duplicates of one answer. Entirely int64 (relevance and
    // redundancy are both exact squared-L2; λ=0.5 cancels out of the
    // margin argmax), deterministic min-id tie-break, and the oracle
    // replays every greedy round as an unrolled CTE block — a green
    // row proves the round-by-round selection composes identically
    // across engines. See Similarity.mmrDiversify for the per-round
    // scale shape.
    "sim_mmr_rerank" -> QueryDef(
      (s, d) => mmrSelFrame(s, d)
        .select(col("query_id"), col("mmr_rank"), col("vec_id"),
          col("d2")),
      s"""WITH $mmrCtes
         |SELECT query_id, mmr_rank, vec_id, d2 FROM sel$MmrK""".stripMargin),

    // The MMR audit: summed intra-list pairwise squared-L2 of the
    // diversified top-MmrK vs the relevance-only top-MmrK from the
    // SAME pool — the measured diversity the greedy pass buys (exact
    // int64 sums, order-free; SimilaritySpec pins mmr strictly more
    // spread than topk). Two rows: what a capacity planner reads
    // before turning the diversification knob on.
    "sim_mmr_diversity" -> QueryDef(
      (s, d) => {
        val pool = mmrPoolFrame(s, d)
        val sel = mmrSelFrame(s, d)
        val e = quantized(s, d).select(col("vec_id"), col("qv"))
        def intra(list: org.apache.spark.sql.DataFrame, method: String) = {
          val withV = list.select(col("query_id"), col("vec_id"))
            .join(e, Seq("vec_id"))
          val dij = (Similarity.dot(col("iv"), col("iv")) -
            lit(2.0) * Similarity.dot(col("iv"), col("jv")) +
            Similarity.dot(col("jv"), col("jv"))).cast("long")
          withV.select(col("query_id"), col("vec_id").as("i"),
              col("qv").as("iv"))
            .join(withV.select(col("query_id"), col("vec_id").as("j"),
              col("qv").as("jv")), Seq("query_id"))
            .filter(col("i") < col("j"))
            .agg(count(lit(1)).as("n_pairs"), sum(dij).as("sum_d2"))
            .select(lit(method).as("method"), col("n_pairs"),
              col("sum_d2"))
        }
        intra(pool.filter(col("rank") <= MmrK), "topk")
          .unionByName(intra(sel, "mmr"))
      },
      s"""WITH $mmrCtes,
         |tk AS (SELECT query_id, vec_id FROM pool WHERE rank <= $MmrK)
         |SELECT 'topk' AS method, COUNT(*) AS n_pairs,
         |  CAST(SUM(pp.dij) AS BIGINT) AS sum_d2
         |FROM pp
         |JOIN tk a ON a.query_id = pp.query_id AND a.vec_id = pp.i
         |JOIN tk b ON b.query_id = pp.query_id AND b.vec_id = pp.j
         |WHERE pp.i < pp.j
         |UNION ALL
         |SELECT 'mmr' AS method, COUNT(*) AS n_pairs,
         |  CAST(SUM(pp.dij) AS BIGINT) AS sum_d2
         |FROM pp
         |JOIN sel$MmrK a ON a.query_id = pp.query_id AND a.vec_id = pp.i
         |JOIN sel$MmrK b ON b.query_id = pp.query_id AND b.vec_id = pp.j
         |WHERE pp.i < pp.j""".stripMargin),

    // Random-projection (Johnson–Lindenstrauss) search — the SKETCH
    // point on the memory/recall frontier: each vector is projected to
    // 16 exact-integer coordinates against the SAME deterministic
    // hyperplanes the LSH path thresholds (JL keeps the full dot where
    // LSH keeps only its sign — same constants, strictly more
    // information, so this row quantifies exactly what the sign
    // truncation throws away). Candidates are ranked in the 16-dim
    // sketch space (128 B/vec vs 512 raw — 4× less data per scored
    // pair), then the top-3K shortlist is exactly re-ranked by
    // Similarity.rerankExact, the refinement kernel shared with
    // IVFADC+R. All arithmetic int64-exact (|proj| ≤ 3.7e7, squared
    // diffs summed as longs).
    "sim_rp_search" -> QueryDef((s, d) => rpSpark(s, d), rpSql),

    // JL quality gate — where the 16-dim sketch + exact re-rank lands
    // vs exact L2. Same refinement width as IVFADC+R, so the two rows
    // isolate the candidate generator: JL-sketch candidates vs
    // probed-cell residual-ADC candidates at identical re-rank cost.
    // Measured at sf0.01: 0.24 recall@10 vs 0.03 for LSH on the SAME
    // 16 hyperplanes — keeping the projection magnitudes instead of
    // just their signs is an 8× recall lift (SimilaritySpec pins the
    // sketch positive and ≥ half the same-sample PQ full-scan gate);
    // still below the residual-ADC generator's 0.70 at 64× its
    // per-vector memory, which is why sketches prefilter and codes
    // serve.
    "sim_rp_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        rpSpark(s, d).select(col("query_id"),
          col("vec_id").as("neighbor_id"))),
      recallAgainstExactL2Sql(rpSql)),

    // SQ8 scalar quantization — the third compression family on the
    // quality ladder (hash sketch / product code / per-dim affine
    // code). Each dimension is coded to 8 bits against the corpus
    // per-dim [min, max] (code = round-half-up of (x−mn)·255/range,
    // computed as floor(((x−mn)·510+r)/(2r)) — every operand an exact
    // integer-valued double, so both engines floor the same correctly
    // rounded quotient), and search ranks by symmetric code-space
    // squared-L2 with per-dim range weights ((Δcode·range)² — the true
    // dequantized d2 × 255², rank-equivalent). At 100 TB: the range
    // frame is 64 rows (one tiny aggregate, broadcast back), coding is
    // map-only, and the scan reads 64 B/vec instead of 512 — SQ8's
    // whole point is bandwidth; the IVF probe pruning composes exactly
    // as it does for PQ (sim_ivfpq_* prove that shape).
    "sim_sq8_search" -> QueryDef((s, d) => sq8Spark(s, d), sq8Sql),

    // IVF + SQ8 — the probe-pruning composition for the BANDWIDTH
    // point of the frontier: the probed cells' members are scored on
    // their 64 B/vec SQ8 codes (8× less scan bandwidth than raw) with
    // per-query work cut to ~nprobe/k_cells of the corpus, the same
    // composition sim_ivfpq_* proves for the PQ codes. Completes the
    // claim that IVF pruning composes with every coding family.
    "sim_ivfsq_search" -> QueryDef((s, d) => ivfSq8Spark(s, d), ivfSq8Sql),

    // IVF+SQ8 quality gate: near-exact coding under cell pruning
    // measures the PROBED-CELL COVERAGE ceiling itself — with SQ8 at
    // 0.99 full-scan recall, whatever this row loses vs 0.99 is what
    // the nprobe=3 cells don't contain. Measured 0.92 recall@10 at
    // sf0.01 (vs full-scan SQ8 0.99, pruned residual-PQ 0.34): the
    // ceiling is high, confirming the re-rank sweep's finding that
    // code quality, not cell coverage, binds the PQ rows.
    "sim_ivfsq_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        ivfSq8Spark(s, d).select(col("query_id"),
          col("vec_id").as("neighbor_id"))),
      recallAgainstExactL2Sql(ivfSq8Sql)),

    // SQ8 quality gate — pins where 8-bit-per-dim lands on the recall
    // ladder: near-exact (the quantization step is ~range/255 per dim),
    // far above any 16-bit-per-vector PQ row, at 32× the memory. The
    // ladder becomes a measured memory/recall frontier: LSH 0.03 <
    // PQ 0.22 < IVF-PQ 0.29 < residual IVF-PQ 0.34 < rerank 0.70 <
    // SQ8 0.99 (sf0.01); SimilaritySpec pins SQ8 above the sub-byte
    // codes.
    "sim_sq8_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        sq8Spark(s, d).select(col("query_id"),
          col("vec_id").as("neighbor_id"))),
      recallAgainstExactL2Sql(sq8Sql)),

    // Power-iteration SVD — the dominant right singular direction of
    // the embedding matrix, trained by iterating the audited step (the
    // k-means / BPE / PageRank doctrine, fourth family): per round
    // u = Xv is a map-only native dot against the broadcast direction
    // literals, w = Xᵀu is ONE posexplode + 64-key map-side-combined
    // sum (the corpus never shuffles; the shuffle carries 64 partials
    // per partition), and the next direction is w re-quantized by
    // round(w·100/max|w|) so every round's inputs stay exact
    // integer-valued. The direction a pipeline whitens/projects with
    // before ANN indexing. Oracle replays all rounds as unrolled CTEs.
    "sim_svd_power" -> QueryDef(
      (s, d) => {
        val sqlc = s
        import sqlc.implicits._
        val (v, _) = svdIterations(s, d)
        v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
          .toDF("dim", "v")
      },
      s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |$svdCtes
         |SELECT CAST(pos - 1 AS BIGINT) AS dim, CAST(v AS BIGINT) AS v
         |FROM v$SvdIters""".stripMargin),

    // SVD convergence audit — the Rayleigh quotient λ̂ = vᵀ(XᵀX)v / vᵀv
    // of each round's INPUT direction, reported as the exact integer
    // pair (rq_num, rq_den) (the ratio estimates λ_max and is
    // non-decreasing for power iteration up to the re-quantization
    // perturbation — SimilaritySpec pins the trajectory with the same
    // slack doctrine as the k-means inertia audit).
    "sim_svd_converge" -> QueryDef(
      (s, d) => {
        val sqlc = s
        import sqlc.implicits._
        svdIterations(s, d)._2.toDF("iter", "rq_num", "rq_den")
      },
      s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |$svdCtes
         |${(1 to SvdIters).map(i => s"SELECT * FROM rq$i")
           .mkString("\nUNION ALL\n")}""".stripMargin),

    // SVD projection — the trained direction's read path: each vector's
    // coordinate along the dominant singular direction, as a map-only
    // native dot against the direction literals (the same
    // metadata-broadcast shape as the streaming index twins). The 1-D
    // coordinate a pipeline range-bins, sorts, or stratifies embeddings
    // by after training; exact int64 (|proj| ≤ 64·578·100 ≈ 3.7e6).
    "sim_svd_project" -> QueryDef(
      (s, d) => {
        val (v, _) = svdIterations(s, d)
        val vlit = array(v.toIndexedSeq.map(x => lit(x.toDouble)): _*)
        quantized(s, d).filter(pmod(col("vec_id"), lit(10)) === 0)
          .select(col("vec_id"),
            Similarity.dot(col("qv"), vlit).cast("long").as("proj"))
      },
      s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |$svdCtes
         |SELECT e.vec_id, CAST(${dot("e.v", "v.vl", Dims)} AS BIGINT) AS proj
         |FROM e, v${SvdIters}l v
         |WHERE e.vec_id % 10 = 0""".stripMargin),

    // ANN index-build capstone — the composition proof for the
    // similarity family (curate_recipe's role for curation): ONE DAG
    // emits the complete IVF-PQ index row per vector — its IVF cell
    // (broadcast-centroid argmin, the sim_knn_ivf assignment), its 4
    // subspace codes PACKED into a single 16-bit int (code·16^sub — the
    // byte layout a real index stores), and the total reconstruction
    // error Σd2 (int64-exact — the quality audit column an index build
    // reports). Two id-keyed frames join on vec_id; the oracle replays
    // cell assignment, coding, packing, and the error sum in one CTE
    // chain, so the hash match proves the stages compose. At 100 TB:
    // one corpus pass per half + one id-keyed equi-join — no stage
    // shuffles vectors more than once.
    "sim_index_build" -> QueryDef(
      (s, d) => {
        val assigned = graphAssigned(s, d) // shared memoized argmin (r16)
        val pow16 = array(lit(1L), lit(16L), lit(256L), lit(4096L))
        val packed = pqCodes(s, d)
          .groupBy(col("vec_id"))
          .agg(sum(col("code") *
              element_at(pow16, (col("sub") + 1).cast("int"))).as("pq16"),
            sum(col("d2")).as("recon_d2"))
        assigned.select(col("__id").as("vec_id"), col("cell_id"))
          .join(packed, Seq("vec_id"))
          .select(col("vec_id"), col("cell_id"), col("pq16"),
            col("recon_d2"))
      },
      s"""WITH $pqCtes,
         |$ivfTrainCtes,
         |cell AS (
         |  SELECT vec_id, cent_id AS cell_id FROM (
         |    SELECT e.vec_id, c.cent_id, row_number() OVER (
         |      PARTITION BY e.vec_id ORDER BY
         |        ${dot("e.v", "e.v", Dims)} - 2.0 * ${dot("e.v", "c.cent_v", Dims)}
         |          + ${dot("c.cent_v", "c.cent_v", Dims)} ASC,
         |      c.cent_id ASC) AS cr
         |    FROM e, c)
         |  WHERE cr = 1),
         |packed AS (
         |  SELECT vec_id,
         |    CAST(SUM((k & 15) * ([1, 16, 256, 4096])[sub + 1]) AS BIGINT) AS pq16,
         |    CAST(SUM(k >> 4) AS BIGINT) AS recon_d2
         |  FROM k GROUP BY vec_id)
         |SELECT cell.vec_id, cell.cell_id, packed.pq16, packed.recon_d2
         |FROM cell JOIN packed ON cell.vec_id = packed.vec_id""".stripMargin),

    // ANN quality gate: recall@10 of the LSH path against the exact
    // brute-force baseline, per query vector. THE metric an ANN index is
    // judged by — a bucketing/constants regression that silently tanks
    // recall turns this row red even though sim_knn_lsh itself would
    // still hash-match its own oracle. The join keys on
    // (query_id, neighbor_id) pairs (k×|queries| rows — tiny), and the
    // recall is one IEEE division of two exact counts at the edge.
    "sim_ann_recall" -> QueryDef(
      (s, d) => {
        val exact = bruteSpark(s, d).select(col("query_id"), col("neighbor_id"))
        val approx = lshSpark(s, d)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
          .select(col("query_id"), col("n_exact"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_exact").cast("double"))
              .as("recall_at_k"))
      },
      s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($bruteSql)),
         |approx AS (SELECT query_id, neighbor_id, 1 AS hit FROM ($lshSql))
         |SELECT b.query_id, COUNT(*) AS n_exact, COUNT(a.hit) AS n_hit,
         |  CAST(COUNT(a.hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
         |FROM brute b
         |LEFT JOIN approx a
         |  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id""".stripMargin),

    // Graph-traversal ANN, the build half: a bounded-degree neighbor
    // graph (the DiskANN / HNSW-base-layer structure) assembled
    // relationally — candidate pairs share any of their top-2 trained
    // cells (the 2nd-closest cell supplies the cross-cell bridge edges
    // pure Voronoi membership lacks), exact-scored, capped at
    // [[GraphDeg]] out-edges per node. The missing rung of the ANN
    // ladder: IVF/PQ/SQ/RP/LSH scan CELLS per query; a traversal walks
    // EDGES — per-query serve cost bounded by hops·beam·degree,
    // independent of how many vectors a cell holds. At 100 TB the
    // probe is a broadcast-centroid argmin (map-only), pair generation
    // is equi-keyed on cell_id with per-cell counts bounded by cell
    // size, and the degree cap makes the served structure O(n·degree).
    "sim_nn_graph" -> QueryDef(
      (s, d) => nnGraphEdges(s, d),
      s"WITH $nnGraphCtes\nSELECT src, dst, erank, d2 FROM gedges"),

    // The serve half: 2-hop beam search over the neighbor graph.
    // Entry = the query's nearest cell's members (exactly what IVF
    // nprobe=1 scans), then each unrolled hop expands the current
    // top-[[GraphBeam]] beam's out-edges and re-ranks everything
    // visited; the final cut is top-K of the visited set. Bounded
    // rounds (not convergence-looped) keep the plan static and the
    // oracle an exact unrolled replay; the expansion is an equi-join
    // on the checkpointed edge list, so per-query work is
    // |entry| + hops·beam·degree scored rows whether the corpus is 2k
    // vectors or 20 B.
    "sim_graph_search" -> QueryDef(
      (s, d) => graphSearchAt(s, d, GraphHops),
      s"WITH $graphSearchCtes\n" +
        "SELECT query_id, neighbor_id, rank, d2 FROM gsearch"),

    // Measured recall@10 of the graph traversal against the exact-L2
    // baseline — the ladder row that says what the bounded-work search
    // actually buys. Hops only ADD candidates past the entry-cell
    // scan, so recall ≥ the nprobe=1 floor by construction
    // (SimilaritySpec pins the monotonicity); how far past is a
    // property of the fixture's geometry and must be measured.
    "sim_graph_recall" -> QueryDef(
      (s, d) => recallAgainstExactL2(s, d,
        graphSearchAt(s, d, GraphHops)
          .select(col("query_id"), col("neighbor_id"))),
      recallAgainstExactL2Sql(
        s"WITH $graphSearchCtes\n" +
          "SELECT query_id, neighbor_id AS vec_id FROM gsearch")),

    // The traversal's serving-knob frontier — recall@10 at hop depths
    // 0/1/2 (the nprobe-sweep doctrine applied to the graph index):
    // hop 0 IS the entry-cell scan (IVF nprobe = 1), each deeper hop
    // adds ≤ beam·degree scored rows per query, and the measured curve
    // says what each increment of bounded work buys. Measured at
    // sf0.01: 0.82 → 0.87 → 0.88 (0.83 → 0.88 → 0.88 at sf0.1) — a
    // SHALLOW curve, because this fixture's entry cells hold ~5·K
    // members, so the floor is already high and the hops buy the
    // cross-cell tail; the flattening at hop 2 says deeper traversal
    // buys nothing at degree 6. On a corpus with small cells the same
    // curve starts low and rises steeply — which is why the frontier
    // must be measured per corpus, not assumed from the index shape.
    // r16 fusion: the three depths are prefixes of ONE deterministic
    // traversal (a depth-h run's state is a deeper run's state after
    // hop h), so the row traces one hops=2 search and cuts top-K after
    // every hop — one entry scan + one traversal + one fused recall
    // compare instead of three of each (rows identical per branch,
    // SimilaritySpec pins the hop-2 slice against the standalone gate).
    "sim_graph_hop_sweep" -> QueryDef(
      (s, d) => {
        val (q, entry) = graphQueryEntry(s, d)
        val traced = Similarity.graphBeamSearchTrace(q, entry,
          nnGraphEdges(s, d), graphVecs(s, d),
          hops = GraphHops, beam = GraphBeam, k = K)
        recallBranched(s, d, "hops",
          (0 to GraphHops).map(h => lit(h.toLong)),
          traced.select(col("hops"), col("query_id"), col("neighbor_id")))
      },
      Seq(0, 1, 2).map(h =>
        s"SELECT CAST($h AS BIGINT) AS hops, r.* FROM (\n" +
          recallAgainstExactL2Sql(
            s"WITH ${graphSearchCtesAt(h)}\n" +
              "SELECT query_id, neighbor_id AS vec_id FROM gsearch") +
          ") r")
        .mkString("\nUNION ALL\n")),

    // Graph-index ADD path — serving base ∪ admitted-delta BETWEEN
    // rebuilds, the lifecycle beat the IVF family already has
    // (`sim_index_serve_delta`) and the graph index lacked (r13: a
    // streamed-in vector was unreachable until the next full build).
    // Edges are built offline over the BASE cohort (even ids) only;
    // delta vectors join the serve-side ASSIGNMENT via one stateless
    // broadcast-argmin admit under the same fixed centroids — the
    // O(n·degree) edge list is never touched. A delta vector is then
    // reachable through the ENTRY stage (the seed beam scans the
    // query's cell members off the assignment), which per-vector
    // assignment makes row-identical to a rebuild's entry seeding;
    // the bounded hops add base-side candidates on top. from_delta
    // marks served delta neighbors — the row's own evidence that the
    // admit path serves (measured: delta vectors appear in served
    // top-10s at both SFs).
    "sim_graph_serve_delta" -> QueryDef(
      (s, d) => Similarity.graphSearchQueries(
          quantized(s, d).filter(pmod(col("vec_id"), lit(50)) === 0)
            .select(col("vec_id").as("query_id"), col("qv")),
          trainedCentroids(s, d), graphDeltaAssigned(s, d),
          nnGraphEdgesBase(s, d),
          hops = GraphHops, beam = GraphBeam, k = K)
        .withColumn("from_delta", pmod(col("neighbor_id"), lit(2))),
      s"""WITH ${graphSearchCtesAt(GraphHops, " AND id % 2 = 0")}
         |SELECT query_id, neighbor_id, rank, d2,
         |  CAST(neighbor_id % 2 AS BIGINT) AS from_delta
         |FROM gsearch""".stripMargin),

    // Delta-DRIFT of the graph index — the degradation curve behind
    // the ADD path (`sim_graph_serve_delta` proved admits are
    // servable; this row measures what they COST as the delta grows):
    // recall@10 of full-corpus serving over an edge list built on the
    // (1 − 1/m) base cohort, at delta fractions ≈ 10/33/50 %. Delta
    // vectors are reachable only through entry-cell seeding (no edge
    // points at them and they point at nothing), so recall must fall
    // as the edge-less fraction grows — the measured curve prices the
    // REBUILD TRIGGER the IVF family already has (sim_index_drift →
    // retrain) and the graph family lacked: SCALE.md pins the rule
    // (rebuild before the delta reaches ~1/3). Each fraction's base
    // build is checkpointed once; serving shape is sim_graph_search's.
    // r16 fusion: the three fractions differ ONLY through the edge
    // list, so the per-fraction base builds stay (distinct cohorts, no
    // share) but the three traversals + three recall compares fuse
    // into one branch-keyed run over the tagged edge union — one
    // window/join/distinct per hop for the whole sweep.
    "sim_graph_delta_drift" -> QueryDef(
      (s, d) => {
        val (q, entry) = graphQueryEntry(s, d)
        val bids = GraphDriftMods.map(m => lit((100 / m).toLong))
        val entryB = entry.withColumn("delta_pct",
          explode(array(bids: _*)))
        val edgesB = GraphDriftMods.map { m =>
          nnGraphEdgesBaseAt(s, d, m)
            .select(lit((100 / m).toLong).as("delta_pct"),
              col("src"), col("dst"))
        }.reduce(_ unionByName _)
        val searched = Similarity.graphBeamSearchBranched("delta_pct",
          q, entryB, edgesB, edgesBranched = true, graphVecs(s, d),
          hops = GraphHops, beamLim = lit(GraphBeam), k = K)
        recallBranched(s, d, "delta_pct", bids,
          searched.select(col("delta_pct"), col("query_id"),
            col("neighbor_id")))
      },
      GraphDriftMods.map(m =>
        s"SELECT CAST(${100 / m} AS BIGINT) AS delta_pct, r.* FROM (\n" +
          recallAgainstExactL2Sql(
            s"WITH ${graphSearchCtesAt(GraphHops, s" AND id % $m <> 0")}\n" +
              "SELECT query_id, neighbor_id AS vec_id FROM gsearch") +
          ") r")
        .mkString("\nUNION ALL\n")),

    // Incremental edge PATCH — the lifecycle rung BETWEEN the free
    // ADD (entry-reachable, edge-less) and the full REBUILD: build
    // out-edges for just the admitted delta cohort against the full
    // probe space ([[Similarity.nnGraphPatch]] — the rebuild's pair
    // construction restricted to delta srcs, so the patched rows are
    // EXACTLY the rebuild's rows for those srcs, spec-pinned) and
    // serve base ∪ patch. Cost is the delta cohort's pair space, not
    // a corpus re-pair; base vectors still lack edges TOWARD the
    // delta (the one asymmetry a rebuild fixes). Measured at the
    // drift row's worst branch (50 % delta): the row reports both
    // states side by side — the patch recovers most of what the
    // drift cost.
    // r16 fusion: stale/patched differ only through the edge list —
    // same branch-keyed single traversal as the drift row (2 branches).
    "sim_graph_delta_patch" -> QueryDef(
      (s, d) => {
        val stale = nnGraphEdgesBaseAt(s, d, 2)
        val patched = stale.unionByName(graphPatchedEdges(s, d, 2))
        val (q, entry) = graphQueryEntry(s, d)
        val bids = Seq(lit("stale"), lit("patched"))
        val entryB = entry.withColumn("state", explode(array(bids: _*)))
        val edgesB = stale
          .select(lit("stale").as("state"), col("src"), col("dst"))
          .unionByName(patched
            .select(lit("patched").as("state"), col("src"), col("dst")))
        val searched = Similarity.graphBeamSearchBranched("state",
          q, entryB, edgesB, edgesBranched = true, graphVecs(s, d),
          hops = GraphHops, beamLim = lit(GraphBeam), k = K)
        recallBranched(s, d, "state", bids,
          searched.select(col("state"), col("query_id"),
            col("neighbor_id")))
      },
      Seq(("stale", ""), ("patched", " % 2 = 0")).map { case (tag, pp) =>
        s"SELECT '$tag' AS state, r.* FROM (\n" +
          recallAgainstExactL2Sql(
            s"WITH ${graphSearchCtesAt(GraphHops, " AND id % 2 <> 0",
              patchSrcPred = pp)}\n" +
              "SELECT query_id, neighbor_id AS vec_id FROM gsearch") +
          ") r"
      }.mkString("\nUNION ALL\n")),

    // The PATCHED drift curve — the r15 patch row measured one point
    // (the 50 % branch); the trigger rule ("rebuild before ~1/3")
    // still priced the UNPATCHED drift, leaving the
    // patch-per-admit-window policy priced from a single measurement.
    // This row measures patched recall@10 at ALL the drift row's
    // fractions (10/33/50 %), so SCALE.md prices patch-vs-rebuild
    // from the residual CURVE: what the base→delta in-edge asymmetry
    // (the one thing a patch cannot fix) costs as the delta grows.
    // Each fraction reuses the drift row's checkpointed base build
    // (FrameCache) and adds only the delta cohort's patch pairs; the
    // serving shape is sim_graph_search's. The direction is NOT
    // per-query guaranteed (the patch only ADDS out-edges, but the
    // fixed beam then prunes a larger candidate set, so single
    // queries can detour — the entry-sweep caveat); the spec pins the
    // MEASURED direction, mean patched ≥ mean stale per fraction, and
    // the m = 2 branch row-identical to sim_graph_delta_patch's
    // patched half.
    // r16 fusion: the delta-drift shape — per-fraction base∪patch edge
    // frames tagged into one branch-keyed traversal + one fused recall.
    "sim_graph_patch_sweep" -> QueryDef(
      (s, d) => {
        val (q, entry) = graphQueryEntry(s, d)
        val bids = GraphDriftMods.map(m => lit((100 / m).toLong))
        val entryB = entry.withColumn("delta_pct",
          explode(array(bids: _*)))
        val edgesB = GraphDriftMods.map { m =>
          nnGraphEdgesBaseAt(s, d, m)
            .unionByName(graphPatchedEdges(s, d, m))
            .select(lit((100 / m).toLong).as("delta_pct"),
              col("src"), col("dst"))
        }.reduce(_ unionByName _)
        val searched = Similarity.graphBeamSearchBranched("delta_pct",
          q, entryB, edgesB, edgesBranched = true, graphVecs(s, d),
          hops = GraphHops, beamLim = lit(GraphBeam), k = K)
        recallBranched(s, d, "delta_pct", bids,
          searched.select(col("delta_pct"), col("query_id"),
            col("neighbor_id")))
      },
      GraphDriftMods.map(m =>
        s"SELECT CAST(${100 / m} AS BIGINT) AS delta_pct, r.* FROM (\n" +
          recallAgainstExactL2Sql(
            s"WITH ${graphSearchCtesAt(GraphHops, s" AND id % $m <> 0",
              patchSrcPred = s" % $m = 0")}\n" +
              "SELECT query_id, neighbor_id AS vec_id FROM gsearch") +
          ") r")
        .mkString("\nUNION ALL\n")),

    // Entry-seeding sweep — the traversal's THIRD serving-time knob
    // (beside hops and beam), acting on the r14 scale observation
    // that beam-20 recall fell 0.94 → 0.8975 from sf0.01 → sf0.1
    // while beam-10 held: the single-nearest-cell seed covers less of
    // the true top-10's neighborhood as cells grow, so widening the
    // SEED (probe the query's 1/2/3 nearest cells' members — the
    // nprobe doctrine applied to seeding) attacks the limiter
    // directly, with no rebuild and no change to the per-hop
    // beam·degree bound. Width 1 is spec-pinned row-identical to the
    // production sim_graph_search. The direction is NOT guaranteed a
    // priori (a wider seed supersets hop-0, but the fixed beam then
    // prunes a larger candidate set, so later hops can detour), so
    // the row measures it: mean recall@10 reads 0.88 → 0.95 → 0.96
    // at widths 1/2/3 (sf0.01) — the width-2 seed recovers more than
    // beam 20 bought (0.94) at a fraction of the scored rows, and
    // the spec pins the measured width-2 ≥ width-1 gain.
    // r16 fusion: every width's probe set is a `__cr ≤ w` filter of ONE
    // centroid ranking (ivfAssignRanked), and the three traversals +
    // recall compares fuse into one branch-keyed run — the corpus is
    // scored against the broadcast centroids once per query, not once
    // per width.
    "sim_graph_entry_sweep" -> QueryDef(
      (s, d) => {
        val assigned = graphAssigned(s, d)
        val widths = GraphEntrySweep.map(ew => lit(ew.toLong))
        val ranked = Similarity.ivfAssignRanked(quantized(s, d),
          "vec_id", "qv", trainedCentroids(s, d))
        val q = assigned.filter(pmod(col("__id"), lit(50)) === 0)
          .select(col("__id").as("query_id"), col("__v").as("qv"))
        val probesB = ranked.filter(pmod(col("__id"), lit(50)) === 0)
          .withColumn("entry_cells", explode(array(widths: _*)))
          .filter(col("__cr") <= col("entry_cells"))
          .select(col("entry_cells"), col("__id").as("query_id"),
            col("cent_id").as("cell_id"))
        val entryB = q.join(probesB, Seq("query_id"))
          .join(assigned.select(col("__id").as("cand"),
            col("__v").as("__cv"), col("cell_id")), Seq("cell_id"))
          .filter(col("cand") =!= col("query_id"))
          .withColumn("d2", (Similarity.dot(col("qv"), col("qv"))
            - lit(2.0) * Similarity.dot(col("qv"), col("__cv"))
            + Similarity.dot(col("__cv"), col("__cv"))).cast("long"))
          .select(col("entry_cells"), col("query_id"), col("cand"),
            col("d2"))
          .dropDuplicates("entry_cells", "query_id", "cand")
        val searched = Similarity.graphBeamSearchBranched("entry_cells",
          q, entryB, nnGraphEdges(s, d), edgesBranched = false,
          graphVecs(s, d), hops = GraphHops, beamLim = lit(GraphBeam),
          k = K)
        recallBranched(s, d, "entry_cells", widths,
          searched.select(col("entry_cells"), col("query_id"),
            col("neighbor_id")))
      },
      GraphEntrySweep.map(ew =>
        s"SELECT CAST($ew AS BIGINT) AS entry_cells, r.* FROM (\n" +
          recallAgainstExactL2Sql(
            s"WITH ${graphSearchCtesAt(GraphHops, "", entryCells = ew)}\n" +
              "SELECT query_id, neighbor_id AS vec_id FROM gsearch") +
          ") r")
        .mkString("\nUNION ALL\n")),

    // Beam-width sweep of the graph search — the SERVING-TIME knob
    // (per-query work is |entry| + hops·beam·degree scored rows; no
    // index rebuild, the widths share one checkpointed edge list).
    // Wider beams keep strict supersets of visited candidates, so
    // recall is monotone nondecreasing in beam (SimilaritySpec pins
    // it, and pins the beam-10 branch row-identical to the standalone
    // sim_graph_recall). Measured mean recall@10: 0.87 → 0.88 → 0.94
    // at beams 5/10/20 (sf0.01) and 0.845 → 0.88 → 0.8975 (sf0.1) —
    // beam 20 is the quality point (2× scored rows for +6 recall
    // points at sf0.01); beam 10 stays the default operating point
    // (SCALE.md's graph section records the trade).
    // r16 fusion: the widths share entry seed and edge list; only the
    // per-hop beam cut differs, so one branch-keyed traversal runs all
    // three with the cut as a per-branch limit (`__r ≤ beam`).
    "sim_graph_beam_sweep" -> QueryDef(
      (s, d) => {
        val (q, entry) = graphQueryEntry(s, d)
        val bids = GraphBeamSweep.map(b => lit(b.toLong))
        val entryB = entry.withColumn("beam", explode(array(bids: _*)))
        val searched = Similarity.graphBeamSearchBranched("beam",
          q, entryB, nnGraphEdges(s, d), edgesBranched = false,
          graphVecs(s, d), hops = GraphHops, beamLim = col("beam"),
          k = K)
        recallBranched(s, d, "beam", bids,
          searched.select(col("beam"), col("query_id"),
            col("neighbor_id")))
      },
      GraphBeamSweep.map(b =>
        s"SELECT CAST($b AS BIGINT) AS beam, r.* FROM (\n" +
          recallAgainstExactL2Sql(
            s"WITH ${graphSearchCtesAt(GraphHops, "", beam = b)}\n" +
              "SELECT query_id, neighbor_id AS vec_id FROM gsearch") +
          ") r")
        .mkString("\nUNION ALL\n")),

    // Degree sweep of the graph index — the INDEX-SIZE knob (the edge
    // list is n·degree rows; serving cost scales with degree through
    // the per-hop expansion). One scored pair frame builds the widest
    // list and every narrower branch serves its erank-prefix — never
    // three builds. The direction is NOT guaranteed a priori (a wider
    // beam-step can detour), so the row measures it: mean recall@10
    // reads 0.85 → 0.88 → 0.94 at degrees 3/6/12 (sf0.01; 0.8525 →
    // 0.88 → 0.91 at sf0.1) — halving the index costs 3 recall
    // points, doubling it buys 6 at sf0.01 / 3 at sf0.1; degree 6
    // stays the default (SCALE.md's graph section records the trade).
    // r16 fusion: every width serves an erank-prefix of the ONE wide
    // build (unchanged), and the three traversals + recall compares
    // fuse into one branch-keyed run over the prefix-tagged edge union.
    "sim_graph_degree_sweep" -> QueryDef(
      (s, d) => {
        val (q, entry) = graphQueryEntry(s, d)
        val bids = GraphDegSweep.map(dg => lit(dg.toLong))
        val entryB = entry.withColumn("degree", explode(array(bids: _*)))
        val edgesB = nnGraphEdgesWide(s, d)
          .withColumn("degree", explode(array(bids: _*)))
          .filter(col("erank") <= col("degree"))
          .select(col("degree"), col("src"), col("dst"))
        val searched = Similarity.graphBeamSearchBranched("degree",
          q, entryB, edgesB, edgesBranched = true, graphVecs(s, d),
          hops = GraphHops, beamLim = lit(GraphBeam), k = K)
        recallBranched(s, d, "degree", bids,
          searched.select(col("degree"), col("query_id"),
            col("neighbor_id")))
      },
      GraphDegSweep.map(dg =>
        s"SELECT CAST($dg AS BIGINT) AS degree, r.* FROM (\n" +
          recallAgainstExactL2Sql(
            s"WITH ${graphSearchCtesAt(GraphHops, "", deg = dg)}\n" +
              "SELECT query_id, neighbor_id AS vec_id FROM gsearch") +
          ") r")
        .mkString("\nUNION ALL\n")),

    // The nprobe frontier — recall@10 of the composed IVF-PQ search at
    // probe widths 1/3/5, each against the exact-L2 baseline: the
    // MEASURED recall-vs-work curve for the index's one serving-time
    // knob (per-query scan cost is ~nprobe/k_cells of the codes, so
    // this row IS the quality/cost trade a capacity planner reads).
    // The oracle replays the full train+code+probe+ADC chain once per
    // width; each branch's CTE scope is isolated inside its UNION
    // subquery. The direction is NOT guaranteed a priori — wider
    // probes add ADC false-positive candidates along with true ones —
    // and on this fixture the measured curve actually FALLS with
    // width (0.37 → 0.29 → 0.24 at sf0.01), monotonically toward the
    // full-scan ADC limit (0.22, `sim_pq_recall`): unclustered random
    // embeddings make the exact probe geometry a better ranker than
    // the quantized codes, so tighter pruning evicts more ADC false
    // positives than true neighbors it costs. Exactly why the curve
    // must be measured rather than assumed; SimilaritySpec pins the
    // measured shape and the nprobe=3 row's consistency with
    // `sim_ivfpq_recall`.
    // r16 fusion: the widths' probe sets nest (rank-prefix of one
    // centroid ranking), so one branch-keyed ADC scan + one fused
    // recall compare replace three of each.
    "sim_nprobe_sweep" -> QueryDef(
      (s, d) => {
        val q = quantized(s, d)
          .filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("query_id"), col("qv"))
        val searched = Similarity.ivfPqSearchNp(q, indexedCodes(s, d),
          trainedCodebook(s, d), trainedCentroids(s, d),
          nprobes = Seq(1, 3, 5), k = K)
        recallBranched(s, d, "nprobe",
          Seq(1, 3, 5).map(np => lit(np.toLong)),
          searched.select(col("nprobe"), col("query_id"),
            col("vec_id").as("neighbor_id")))
      },
      Seq(1, 3, 5).map(np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, r.* FROM (\n" +
          s"${recallAgainstExactL2Sql(ivfpqSqlAt(np))}) r")
        .mkString("\nUNION ALL\n")),

    // The nprobe frontier on the PRODUCTION path — the sweep above
    // characterizes the raw ADC ranking, but nobody serves that when
    // the exact re-rank exists at 0.70: this row sweeps probe width
    // through the FULL serving chain (residual-ADC shortlist at
    // [[RerankR]] → exact re-rank → top-K). Measured at sf0.01:
    // 0.68 → 0.70 → 0.69 mean recall@10 for nprobe 1/3/5 — the
    // re-rank makes the curve essentially FLAT where the raw-ADC one
    // inverted (0.37 → 0.29 → 0.24): the exact re-score repairs the
    // ordering damage that extra probed cells' false-positive
    // candidates do to the raw ranking, and the query's own nearest
    // cell already holds most of its true neighbors on this fixture.
    // Read together with `sim_rwidth_sweep` (0.34 → 0.70 → 0.90),
    // the measured sizing fact is the OPPOSITE of folklore here:
    // shortlist width R, not probe width, is the binding recall knob
    // once refinement exists. SimilaritySpec pins the nprobe=3 branch
    // row-identical to `sim_ivfpq_rerank_recall` and every branch
    // above its raw-ADC counterpart.
    // r16 fusion: one branch-keyed residual-ADC chain (probe prefixes
    // nest) + one fused exact re-rank + one fused recall compare.
    "sim_nprobe_rerank_sweep" -> QueryDef(
      (s, d) => {
        val e = quantized(s, d)
        val q = e.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("query_id"), col("qv"))
        val sl = Similarity.ivfPqResidualSearchNp(q,
          residualCellCodes(s, d), trainedResCodebook(s, d),
          trainedCentroids(s, d), nprobes = Seq(1, 3, 5), k = RerankR)
        val reranked = Similarity.rerankExactBranched("nprobe",
          sl.select(col("nprobe"), col("query_id"), col("vec_id")),
          q, e, K)
        recallBranched(s, d, "nprobe",
          Seq(1, 3, 5).map(np => lit(np.toLong)),
          reranked.select(col("nprobe"), col("query_id"),
            col("vec_id").as("neighbor_id")))
      },
      Seq(1, 3, 5).map(np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, r.* FROM (\n" +
          s"${recallAgainstExactL2Sql(ivfpqRerankSqlAt(RerankR, np))}) r")
        .mkString("\nUNION ALL\n")),

    // The re-rank width frontier — the SECOND serving knob: how many
    // ADC candidates the exact stage re-scores (R raw-vector reads per
    // query = the refinement's memory/latency cost). Swept at
    // R ∈ {K, 3K, 10K} through the full IVFADC+R chain at the
    // production probe width. An ADC shortlist is NOT nested across
    // widths in general (ties/ordering), but in practice widening it
    // only feeds the exact picker more candidates, and the measured
    // curve rises steeply: 0.34 → 0.70 → 0.90 mean recall@10 at
    // sf0.01 — far from saturated at 3K, so on this fixture R (not
    // nprobe, whose production-path curve is flat — see
    // `sim_nprobe_rerank_sweep`) is the knob a capacity planner
    // should spend on. ADC ordering quality, not probed-cell
    // coverage, is what bounds the 4×4-bit code at this corpus size.
    // SimilaritySpec pins the R=3K branch row-identical to
    // `sim_ivfpq_rerank_recall` and the non-decreasing direction.
    // r16 fusion: the shortlists ARE nested here (each width is the
    // rank-prefix of the one deterministic residual-ADC ranking — the
    // row_number tie-break makes the general non-nesting caveat moot
    // for this implementation), so the sweep runs the ADC chain once
    // at the widest width and serves every branch as a prefix filter
    // through one fused re-rank + recall compare.
    "sim_rwidth_sweep" -> QueryDef(
      (s, d) => {
        val e = quantized(s, d)
        val q = e.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("query_id"), col("qv"))
        val widths = Seq(K, RerankR, 10 * K)
        val bids = widths.map(r => lit(r.toLong))
        val sl = ivfpqResSpark(s, d, k = widths.max, np = Nprobe)
          .withColumn("rerank_r", explode(array(bids: _*)))
          .filter(col("rank") <= col("rerank_r"))
          .select(col("rerank_r"), col("query_id"), col("vec_id"))
        val reranked = Similarity.rerankExactBranched("rerank_r",
          sl, q, e, K)
        recallBranched(s, d, "rerank_r", bids,
          reranked.select(col("rerank_r"), col("query_id"),
            col("vec_id").as("neighbor_id")))
      },
      Seq(K, RerankR, 10 * K).map(r =>
        s"SELECT CAST($r AS BIGINT) AS rerank_r, r.* FROM (\n" +
          s"${recallAgainstExactL2Sql(ivfpqRerankSqlAt(r, Nprobe))}) r")
        .mkString("\nUNION ALL\n")),

    // SemDeDup — cluster-scoped SEMANTIC deduplication (Abbas et al.
    // 2023): assign every embedding to its trained k-means cell, then
    // look for near-duplicate pairs ONLY within cells; a vector with a
    // lower-id neighbor at cosine ≥ SemTau in its cell is dropped.
    // This is the method's entire scale argument: the quadratic pair
    // space shrinks from |corpus|² to Σ|cell|² — at 100 TB k is tens
    // of thousands, cells are corpus/k-sized, and the pair join is an
    // equi-join on cell_id that never leaves the cell; assignment is
    // the map-only broadcast-centroid argmin every IVF consumer shares.
    // Output is the kept/dropped manifest the downstream recipe reads.
    "curate_semdedup" -> QueryDef(
      (s, d) => {
        val m = semAssigned(s, d)
        val dup = semDroppedIds(s, d).withColumnRenamed("vec_id", "__id")
        m.join(dup.withColumn("dropped", lit(1L)), Seq("__id"), "left")
          .select(col("__id").as("vec_id"), col("cell_id"),
            coalesce(col("dropped"), lit(0L)).as("dropped"))
      },
      s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |$semAsgCtes,
         |sdup AS (
         |  SELECT DISTINCT y.vec_id FROM sasg x JOIN sasg y
         |  ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
         |  WHERE ${cosine("x.v", "y.v", Dims)} >= $SemTau)
         |SELECT a.vec_id, a.cell_id,
         |  CAST(CASE WHEN s.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dropped
         |FROM sasg a LEFT JOIN sdup s ON s.vec_id = a.vec_id""".stripMargin),

    // SEMANTIC decontamination — the embedding-level counterpart of
    // curate_decontaminate's lexical (MinHash) scan, and the
    // contamination check modern eval suites actually need: a training
    // document that PARAPHRASES a holdout document shares no n-grams
    // (lexical scan misses it) but sits next to it in embedding space.
    // Candidates are cluster-scoped exactly like SemDeDup (pairs only
    // within trained cells — Σ|cell|², never |corpus|²); a pair is
    // contaminating when its exact cosine clears the threshold and the
    // two sides land in DIFFERENT split groups under the shared
    // "|split" hash (train <80 / holdout ≥80 — the same buckets every
    // split consumer uses); the TRAIN side is the drop. Output is the
    // per-cell audit: candidate pairs checked, contaminating pairs,
    // distinct train docs to drop.
    "curate_sem_decontaminate" -> QueryDef(
      (s, d) => {
        import graft.functions.PortableHash
        def bucket(idc: org.apache.spark.sql.Column) =
          PortableHash.hash60(
            concat(idc.cast("string"), lit("|split"))) % 100
        val m = semAssigned(s, d)
        val pairs = m.as("x").join(m.as("y"),
            col("x.cell_id") === col("y.cell_id") &&
              col("x.__id") < col("y.__id"))
          .select(col("x.cell_id").as("cell_id"),
            col("x.__id").as("a"), col("y.__id").as("b"),
            (Similarity.cosine(col("x.__v"), col("y.__v")) >= SemTau)
              .as("near"),
            (bucket(col("x.__id")) < 80).as("ta"),
            (bucket(col("y.__id")) < 80).as("tb"))
          .withColumn("cross", col("ta") =!= col("tb"))
        pairs.groupBy(col("cell_id"))
          .agg(count(when(col("cross"), 1)).as("n_cross_pairs"),
            count(when(col("cross") && col("near"), 1))
              .as("n_contaminating"),
            countDistinct(when(col("cross") && col("near"),
              when(col("ta"), col("a")).otherwise(col("b"))))
              .as("n_train_drops"))
      }, {
        import graft.functions.PortableHash
        def bucketSql(e: String) =
          s"(${PortableHash.hash60Sql(s"CAST($e AS VARCHAR) || '|split'")} % 100)"
        s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
           |$semAsgCtes,
           |pp AS (
           |  SELECT x.cell_id, x.vec_id AS a, y.vec_id AS b,
           |    (${cosine("x.v", "y.v", Dims)} >= $SemTau) AS near,
           |    (${bucketSql("x.vec_id")} < 80) AS ta,
           |    (${bucketSql("y.vec_id")} < 80) AS tb
           |  FROM sasg x JOIN sasg y
           |  ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id)
           |SELECT cell_id,
           |  CAST(count(CASE WHEN ta <> tb THEN 1 END) AS BIGINT)
           |    AS n_cross_pairs,
           |  CAST(count(CASE WHEN ta <> tb AND near THEN 1 END) AS BIGINT)
           |    AS n_contaminating,
           |  CAST(count(DISTINCT CASE WHEN ta <> tb AND near
           |    THEN (CASE WHEN ta THEN a ELSE b END) END) AS BIGINT)
           |    AS n_train_drops
           |FROM pp GROUP BY cell_id""".stripMargin
      }),

    // Cluster-balanced sampling — the diversity half of an
    // embedding-cluster curation recipe (oversampled modes crowd out
    // the tail; capping per cluster rebalances the mixture): keep a
    // member when its portable hash mod its cluster's size clears the
    // quota, i.e. keep-probability min(1, quota/|cell|) with zero RNG.
    // Shape at 100 TB: assignment is the shared map-only argmin, cell
    // sizes are a k-row aggregate BROADCAST back onto the members, and
    // admission is a pure column predicate — the only corpus-keyed
    // shuffle is the final per-cell manifest aggregate.
    "curate_cluster_balance" -> QueryDef(
      (s, d) => {
        import graft.functions.PortableHash
        val m = semAssigned(s, d)
        val counts = m.groupBy(col("cell_id"))
          .agg(count(lit(1)).as("n_cell"))
        val kept = PortableHash.hash60(
          concat(col("__id").cast("string"), lit("|bal"))) %
          col("n_cell") < lit(BalQuota)
        m.join(broadcast(counts), Seq("cell_id"))
          .groupBy(col("cell_id"))
          .agg(count(lit(1)).as("n_total"),
            count(when(kept, 1)).as("n_kept"))
      }, {
        import graft.functions.PortableHash
        val keptSql = PortableHash.hash60Sql(
          "CAST(sasg.vec_id AS VARCHAR) || '|bal'")
        s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
           |$semAsgCtes,
           |cnt AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n_cell
           |        FROM sasg GROUP BY cell_id)
           |SELECT sasg.cell_id, CAST(count(*) AS BIGINT) AS n_total,
           |  CAST(count(CASE WHEN $keptSql % cnt.n_cell < $BalQuota
           |             THEN 1 END) AS BIGINT) AS n_kept
           |FROM sasg JOIN cnt ON cnt.cell_id = sasg.cell_id
           |GROUP BY sasg.cell_id""".stripMargin
      }))

  /** Every embedding assigned to its trained k-means cell —
    * (`__id`, `__v`, `cell_id`), the frame SemDeDup and the
    * cluster-balance sampler share. Assignment is the broadcast-
    * centroid argmin ([[Similarity.ivfAssignCentroids]]); memoized per
    * (session, sf) so the two consumers (and the bench) pay it once.
    * The inner trained-centroid memo is resolved BEFORE entering this
    * memo (FrameCache's no-nesting rule). */
  private def semAssigned(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cents = trainedCentroids(s, d)
    FrameCache.memo(s, d, "sem_assign")(
      Similarity.ivfAssignCentroids(quantized(s, d), "vec_id", "qv",
        cents, 1)._1)
  }

  /** The SemDeDup dropped-id frame (vec_id) — vectors with a lower-id
    * in-cell near-duplicate at [[SemTau]]. Package-visible for the
    * `curate_pipeline` capstone, which applies the semantic-drop stage
    * against the documents sharing the vector's id. */
  private[graft] def semDroppedIds(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val m = semAssigned(s, d)
    m.as("x").join(m.as("y"),
        col("x.cell_id") === col("y.cell_id") &&
          col("x.__id") < col("y.__id"))
      .filter(Similarity.cosine(col("x.__v"), col("y.__v")) >= SemTau)
      .select(col("y.__id").as("vec_id")).distinct()
  }

  /** Self-contained SemDeDup oracle CTE chain for external composition
    * (the capstone): quantized embeddings (`e`), the training +
    * assignment chain, and the dropped-id set `sdup(vec_id)`. */
  private[queries] def semDropOracleCtes: String =
    s"""e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$semAsgCtes,
       |sdup AS (
       |  SELECT DISTINCT y.vec_id FROM sasg x JOIN sasg y
       |  ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
       |  WHERE ${cosine("x.v", "y.v", Dims)} >= $SemTau)""".stripMargin

  /** Trained-centroid assignment CTE shared by the SemDeDup and
    * cluster-balance oracles: [[ivfTrainCtes]] (requires a preceding
    * `e(vec_id, v)` CTE, defines `c`) followed by the argmin
    * assignment `sasg(vec_id, v, cell_id)` — row_number ≡ the Spark
    * side's min-struct tie order (d2 ASC, cent_id ASC). */
  private def semAsgCtes: String =
    s"""$ivfTrainCtes,
       |sasg AS (
       |  SELECT vec_id, v, cent_id AS cell_id FROM (
       |    SELECT e.vec_id, e.v, c.cent_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |    FROM e, c) WHERE cr = 1)""".stripMargin

  /** DuckDB text of the full ADC search — the `sim_pq_adc` oracle and
    * the recall gate's `approx` side. */
  private def pqAdcSql: String =
    s"""WITH $pqCtes,
       |codes AS (SELECT vec_id, sub, k & 15 AS code FROM k),
       |qx AS (
       |  SELECT p.vec_id AS query_id, p.sub, cb.code, p.sv, cb.cv
       |  FROM p16 p JOIN cb ON cb.sub = p.sub
       |  WHERE p.vec_id % 50 = 0),
       |dt AS (
       |  SELECT query_id, CAST(sub AS BIGINT) AS sub, code,
       |    ${pqD2Sql} AS dt
       |  FROM qx),
       |ad AS (
       |  SELECT dt.query_id, codes.vec_id,
       |    CAST(SUM(dt.dt) AS BIGINT) AS adist
       |  FROM codes JOIN dt ON codes.sub = dt.sub AND codes.code = dt.code
       |  WHERE codes.vec_id <> dt.query_id
       |  GROUP BY dt.query_id, codes.vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, adist FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist ASC, vec_id ASC) AS rank FROM ad)
       |WHERE rank <= $K""".stripMargin

  /** ADC top-k (the sim_pq_adc body) — shared with the recall gate. */
  private def pqAdc(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Similarity.pqAdcSearch(
      quantized(s, d).filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("qv")),
      pqCodesFrame(s, d), trainedCodebook(s, d), K)

  /** The stored index as search input: (vec_id, cell_id, sub, code) —
    * `sim_index_build`'s row shape with the codes unpacked. One
    * id-keyed equi-join of the two index halves at BUILD time; the
    * serving path then prunes on `cell_id` without touching vectors.
    * Package-visible for the streaming pruned-search twin. */
  private[graft] def indexedCodes(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    // trained-centroid generation: read the memoized argmin (r16)
    // instead of re-deriving it; the explicit-generation form below
    // stays parameterized for the swap spec's stale index
    graphAssigned(s, d).select(col("__id").as("vec_id"), col("cell_id"))
      .join(pqCodesFrame(s, d), Seq("vec_id"))

  /** [[indexedCodes]] under an EXPLICIT centroid generation — the swap
    * spec builds the stale (drift-cohort) index with it; a retrain
    * changes the cell assignment, not the PQ codes. */
  private[graft] def indexedCodesUnder(s: org.apache.spark.sql.SparkSession,
      d: String, cents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (assigned, _) = Similarity.ivfAssignCentroids(quantized(s, d),
      "vec_id", "qv", cents = cents, nprobe = 1)
    assigned.select(col("__id").as("vec_id"), col("cell_id"))
      .join(pqCodesFrame(s, d), Seq("vec_id"))
  }

  /** Probe-pruned IVF-PQ top-k (the sim_ivfpq_search body) — shared
    * with its recall gate and the streaming serving twin's bench. */
  private def ivfpqSpark(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Similarity.ivfPqSearch(
      quantized(s, d).filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("qv")),
      indexedCodes(s, d), trainedCodebook(s, d), trainedCentroids(s, d),
      nprobe = Nprobe, k = K)

  /** DuckDB text of the composed IVF-PQ search: training (both
    * families), coding, cell assignment, per-query probing, and the
    * cell-restricted ADC — one CTE chain, replayed end-to-end. */
  private def ivfpqSql: String = ivfpqSqlAt(Nprobe)

  /** [[ivfpqSql]] at an explicit probe width — the nprobe-sweep
    * frontier row re-runs the whole chain per width. */
  private def ivfpqSqlAt(np: Int): String =
    s"""WITH $pqCtes,
       |$ivfTrainCtes,
       |codes AS (SELECT vec_id, sub, k & 15 AS code FROM k),
       |cell AS (
       |  SELECT vec_id, cent_id AS cell_id FROM (
       |    SELECT e.vec_id, c.cent_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |    FROM e, c)
       |  WHERE cr = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, cent_id AS cell_id FROM (
       |    SELECT e.vec_id, c.cent_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |    FROM e, c WHERE e.vec_id % 50 = 0)
       |  WHERE cr <= $np),
       |qx AS (
       |  SELECT p.vec_id AS query_id, p.sub, cb.code, p.sv, cb.cv
       |  FROM p16 p JOIN cb ON cb.sub = p.sub
       |  WHERE p.vec_id % 50 = 0),
       |dt AS (
       |  SELECT query_id, CAST(sub AS BIGINT) AS sub, code,
       |    ${pqD2Sql} AS dt
       |  FROM qx),
       |ad AS (
       |  SELECT pr.query_id, codes.vec_id,
       |    CAST(SUM(dt.dt) AS BIGINT) AS adist
       |  FROM codes
       |  JOIN cell ON cell.vec_id = codes.vec_id
       |  JOIN qprobe pr ON pr.cell_id = cell.cell_id
       |  JOIN dt ON dt.query_id = pr.query_id
       |    AND dt.sub = codes.sub AND dt.code = codes.code
       |  WHERE codes.vec_id <> pr.query_id
       |  GROUP BY pr.query_id, codes.vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, adist FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist ASC, vec_id ASC) AS rank FROM ad)
       |WHERE rank <= $K""".stripMargin

  /** The 16 JL projection planes: both LSH tables' hyperplane sets —
    * deterministic integer entries in [-1000, 1000], shared constants
    * with the LSH path (and its oracle, via [[hyperplaneLit]]). */
  private def rpPlanes: Seq[Seq[Double]] =
    (0 until Tbls).flatMap(t =>
      (0 until Planes).map(p => Similarity.hyperplane(t, p, Dims)))

  /** JL-projected corpus (vec_id, pv array<long>): 16 exact-integer
    * coordinates per vector — the stored sketch. Map-only. */
  private def rpFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val pv = array(rpPlanes.map(hp =>
      Similarity.dot(col("qv"),
        array(hp.toIndexedSeq.map(lit(_)): _*)).cast("long")): _*)
    quantized(s, d).select(col("vec_id"), col("qv"), pv.as("pv"))
  }

  /** JL sketch search + exact re-rank (the sim_rp_search body): rank in
    * the 16-dim sketch space, refine the 3·K shortlist with
    * [[Similarity.rerankExact]] on the raw vectors. */
  private def rpSpark(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coded = rpFrame(s, d)
    val q = coded.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("pv").as("xp"))
    val d2p = aggregate(
      zip_with(col("xp"), col("cp"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2p").asc, col("vec_id").asc)
    val shortlist = coded.select(col("vec_id"), col("pv").as("cp"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2p", d2p)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= RerankR)
      .select(col("query_id"), col("vec_id"))
    val e = quantized(s, d)
    Similarity.rerankExact(shortlist,
      e.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("qv")),
      e, k = K)
  }

  /** DuckDB text of the JL search: projection (same hyperplane
    * literals as the LSH oracle), sketch-space ranking, exact re-rank. */
  private def rpSql: String = {
    val pvList = (0 until Tbls).flatMap(t => (0 until Planes).map(p =>
        s"CAST(${dot("v", hyperplaneLit(t, p, Dims), Dims)} AS BIGINT)"))
      .mkString("[", ",\n      ", "]")
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |rp AS (SELECT vec_id, $pvList AS pv FROM e),
       |scp AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    CAST(list_sum(list_transform(generate_series(1, ${Tbls * Planes}),
       |      i -> (q.pv[i] - c.pv[i]) * (q.pv[i] - c.pv[i]))) AS BIGINT) AS d2p
       |  FROM rp q, rp c
       |  WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
       |sl AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2p ASC, vec_id ASC) AS rk FROM scp)
       |  WHERE rk <= $RerankR),
       |sc AS (
       |  SELECT sl.query_id, sl.vec_id,
       |    CAST(${dot("q.v", "q.v", Dims)} - 2 * ${dot("q.v", "c.v", Dims)}
       |      + ${dot("c.v", "c.v", Dims)} AS BIGINT) AS d2
       |  FROM sl
       |  JOIN e q ON q.vec_id = sl.query_id
       |  JOIN e c ON c.vec_id = sl.vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, d2 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY d2 ASC, vec_id ASC) AS rank FROM sc)
       |WHERE rank <= $K""".stripMargin
  }

  /** SQ8-coded corpus as RANGE-WEIGHTED values (vec_id, sv): per dim,
    * sv_d = code_d · range_d where code_d is the stored 8-bit code
    * against the corpus per-dim [mn, mx]. Differences of sv are 255×
    * the dequantized differences (the mn shift cancels within a dim),
    * so code-space squared-L2 over sv ranks identically to dequantized
    * d2. All operands are exact integer-valued doubles ≤ 5.1e5, dots
    * ≤ 1.7e13 — exact in double and int64. */
  private def sq8Frame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val e = quantized(s, d)
    // 64-row per-dim range aggregate, packed into two ordered arrays on
    // a 1-row frame and broadcast back onto the corpus (the "trained"
    // metadata of an SQ8 index — min/max per dim is all it stores).
    val rng = e.select(posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .agg(sort_array(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("rs"))
      .select(transform(col("rs"), r => r.getField("mn")).as("mnl"),
        transform(col("rs"), r => r.getField("mx")).as("mxl"))
    val sv = transform(sequence(lit(0), lit(Dims - 1)), i => {
      val mn = element_at(col("mnl"), i + 1)
      val r = element_at(col("mxl"), i + 1) - mn
      val x = element_at(col("qv"), i + 1)
      when(r === 0, lit(0.0))
        .otherwise(floor(((x - mn) * 510 + r) / (r * 2)) * r)
    })
    e.crossJoin(broadcast(rng)).select(col("vec_id"), sv.as("sv"))
  }

  /** Symmetric SQ8 search (the sim_sq8_search body): the 1-in-50 query
    * sample ranks the SQ8-coded corpus by code-space squared-L2. */
  private def sq8Spark(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coded = sq8Frame(s, d)
    val q = coded.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("sv").as("xv"))
    val d2 = (Similarity.dot(col("xv"), col("xv"))
      - lit(2.0) * Similarity.dot(col("xv"), col("cv2"))
      + Similarity.dot(col("cv2"), col("cv2"))).cast("long")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    coded.select(col("vec_id"), col("sv").as("cv2"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("d2"))
  }

  /** DuckDB text of the SQ8 search: the same range aggregate, coding
    * expression (identical operation tree — both engines floor the same
    * correctly rounded quotient of exact integer-valued doubles), and
    * code-space ranking. */
  private def sq8Sql: String = {
    val code = (v: String) =>
      s"""list_transform(generate_series(1, $Dims), i -> CASE
         |    WHEN mxl[i] = mnl[i] THEN 0.0
         |    ELSE floor((($v[i] - mnl[i]) * 510 + (mxl[i] - mnl[i]))
         |      / ((mxl[i] - mnl[i]) * 2)) * (mxl[i] - mnl[i]) END)""".stripMargin
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |rng AS (
       |  SELECT t.i AS dim, MIN(v[t.i]) AS mn, MAX(v[t.i]) AS mx
       |  FROM e CROSS JOIN UNNEST(generate_series(1, $Dims)) AS t(i)
       |  GROUP BY t.i),
       |rngl AS (
       |  SELECT list(mn ORDER BY dim) AS mnl, list(mx ORDER BY dim) AS mxl
       |  FROM rng),
       |sq AS (
       |  SELECT vec_id, ${code("v")} AS sv
       |  FROM e, rngl),
       |sc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    CAST(${dot("q.sv", "q.sv", Dims)} - 2 * ${dot("q.sv", "c.sv", Dims)}
       |      + ${dot("c.sv", "c.sv", Dims)} AS BIGINT) AS d2
       |  FROM sq q, sq c
       |  WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, d2 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY d2 ASC, vec_id ASC) AS rank FROM sc)
       |WHERE rank <= $K""".stripMargin
  }

  /** Probe-pruned SQ8 search (IVF + SQ8): the bandwidth point of the
    * compression frontier composed with cell pruning — the SAME probe
    * frame shape as [[ivfpqSpark]], but the probed cells' members are
    * scored on their 64 B/vec SQ8 codes instead of 2 B/vec PQ codes.
    * Per query ~nprobe/k_cells of the corpus is read at 8× less
    * bandwidth than raw; nothing but the (query, cell) probe frame and
    * the coded query sample broadcasts. */
  private def ivfSq8Spark(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = quantized(s, d)
    val cents = trainedCentroids(s, d)
    // corpus cells (argmin) and query probes (top-Nprobe) from the
    // exact-geometry assignment every IVF consumer shares (the memoized
    // frame since r16)
    val cells = graphAssigned(s, d)
      .select(col("__id").as("vec_id"), col("cell_id"))
    val (_, probes) = Similarity.ivfAssignCentroids(
      e.filter(pmod(col("vec_id"), lit(50)) === 0), "vec_id", "qv",
      cents = cents, nprobe = Nprobe)
    val coded = sq8Frame(s, d)
    val q = coded.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("sv").as("xv"))
    val d2 = (Similarity.dot(col("xv"), col("xv"))
      - lit(2.0) * Similarity.dot(col("xv"), col("cv2"))
      + Similarity.dot(col("cv2"), col("cv2"))).cast("long")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    coded.select(col("vec_id"), col("sv").as("cv2"))
      .join(cells, Seq("vec_id"))
      .join(broadcast(probes), Seq("cell_id"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("d2"))
  }

  /** DuckDB text of the probe-pruned SQ8 search: IVF training, cell
    * assignment, probing, the SQ8 range/coding chain, and the
    * cell-restricted code-space ranking in one CTE chain. */
  private def ivfSq8Sql: String = {
    val code = (v: String) =>
      s"""list_transform(generate_series(1, $Dims), i -> CASE
         |    WHEN mxl[i] = mnl[i] THEN 0.0
         |    ELSE floor((($v[i] - mnl[i]) * 510 + (mxl[i] - mnl[i]))
         |      / ((mxl[i] - mnl[i]) * 2)) * (mxl[i] - mnl[i]) END)""".stripMargin
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$ivfTrainCtes,
       |cellv AS (
       |  SELECT vec_id, cell_id FROM (
       |    SELECT e.vec_id, c.cent_id AS cell_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |    FROM e, c)
       |  WHERE cr = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, cell_id FROM (
       |    SELECT e.vec_id, c.cent_id AS cell_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |    FROM e, c WHERE e.vec_id % 50 = 0)
       |  WHERE cr <= $Nprobe),
       |rng AS (
       |  SELECT t.i AS dim, MIN(v[t.i]) AS mn, MAX(v[t.i]) AS mx
       |  FROM e CROSS JOIN UNNEST(generate_series(1, $Dims)) AS t(i)
       |  GROUP BY t.i),
       |rngl AS (
       |  SELECT list(mn ORDER BY dim) AS mnl, list(mx ORDER BY dim) AS mxl
       |  FROM rng),
       |sq AS (
       |  SELECT vec_id, ${code("v")} AS sv
       |  FROM e, rngl),
       |sc AS (
       |  SELECT p.query_id, c2.vec_id,
       |    CAST(${dot("q.sv", "q.sv", Dims)} - 2 * ${dot("q.sv", "c2.sv", Dims)}
       |      + ${dot("c2.sv", "c2.sv", Dims)} AS BIGINT) AS d2
       |  FROM sq c2
       |  JOIN cellv ON cellv.vec_id = c2.vec_id
       |  JOIN qprobe p ON p.cell_id = cellv.cell_id
       |  JOIN sq q ON q.vec_id = p.query_id
       |  WHERE c2.vec_id <> p.query_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, d2 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY d2 ASC, vec_id ASC) AS rank FROM sc)
       |WHERE rank <= $K""".stripMargin
  }

  /** Residual frame (vec_id, cell_id, rv): each vector minus its
    * assigned trained centroid — integer-valued (both operands are),
    * so the whole residual-PQ family inherits the exact-int64 doctrine.
    * At 100 TB this is the transient the index build streams through;
    * only the codes persist. */
  private def residualFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cents = trainedCentroids(s, d)
    val assigned = graphAssigned(s, d) // shared memoized argmin (r16)
    assigned.join(
        broadcast(cents.select(col("cent_id").as("cell_id"), col("cent_v"))),
        Seq("cell_id"))
      .select(col("__id").as("vec_id"), col("cell_id"),
        zip_with(col("__v"), col("cent_v"), (a, b) => a - b).as("rv"))
  }

  /** The RESIDUAL codebook training pipeline: the same grouped
    * integer-Lloyd loop as [[pqTrainPipeline]], but over centroid
    * residuals — the codebook a production IVF-PQ (IVFADC) index
    * actually trains, since residual norms are far smaller and the
    * same code budget quantizes finer. */
  private[graft] def pqResTrainPipeline(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val pts = residualFrame(s, d)
      .select(col("vec_id").as("__id"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("rv"))
      .select(col("sub"), col("__id"),
        slice(col("rv"), col("sub") * 16 + 1, lit(16)).as("__v"))
    Similarity.kmeansTrain(pts,
      pts.filter(col("__id") < PqCodes)
        .select(col("sub"), col("__id").as("cent_id"), col("__v").as("cent_v")),
      iters = TrainIters, groupCols = Seq("sub"))
  }

  /** Trained residual codebook (sub, code, cv), FrameCache-memoized. */
  private def trainedResCodebook(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    FrameCache.memo(s, d, "pq_res_codebook")(
      pqResTrainPipeline(s, d).select(col("sub"),
        col("cent_id").as("code"), col("cent_v").as("cv")))

  /** The trained residual codebook, package-visible for the streaming
    * re-rank serving twin. */
  private[graft] def trainedResCodebookFrame(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = trainedResCodebook(s, d)

  /** The residual index rows (vec_id, cell_id, sub, code) — cell-tagged
    * codes from the residual codebook; the min-key argmin shape of
    * [[pqCodes]] with the cell id riding the grouping keys. */
  private[graft] def residualCellCodes(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // "only the codes persist" (residualFrame's doc) — so the codes are
    // the memoized artifact (r16): every ADC consumer (the residual
    // search, the re-rank rows, both serving-knob sweeps, the MMR
    // pool) re-coded the corpus per row before; the stored index is
    // coded once per pass, exactly like the trained codebook it's
    // built from. Inner memos resolve before entering (no-nesting).
    val rf = residualFrame(s, d)
    val cb = trainedResCodebook(s, d)
    FrameCache.memo(s, d, "res_cell_codes") {
      rf.select(col("vec_id"), col("cell_id"),
          explode(sequence(lit(0), lit(3))).as("sub"), col("rv"))
        .withColumn("sv", slice(col("rv"), col("sub") * 16 + 1, lit(16)))
        .join(broadcast(cb), Seq("sub"))
        .withColumn("key", pqD2 * 16 + col("code"))
        .groupBy(col("vec_id"), col("cell_id"),
          col("sub").cast("long").as("sub"))
        .agg(min(col("key")).as("k"))
        .select(col("vec_id"), col("cell_id"), col("sub"),
          col("k").bitwiseAND(lit(15L)).as("code"))
    }
  }

  /** Probe-pruned residual-ADC top-k (the sim_ivfpq_residual body);
    * `k` widens to the shortlist size for the re-rank consumer and
    * `np` to the swept probe widths (the serving knobs). */
  private def ivfpqResSpark(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int = K,
      np: Int = Nprobe): org.apache.spark.sql.DataFrame =
    Similarity.ivfPqResidualSearch(
      quantized(s, d).filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("qv")),
      residualCellCodes(s, d), trainedResCodebook(s, d),
      trainedCentroids(s, d), nprobe = np, k = k)

  /** DuckDB text of the residual IVF-PQ search: IVF training, residual
    * computation, residual-codebook training, coding, per-(query,
    * probed-cell) distance tables, and the cell-restricted ADC — the
    * full IVFADC build+serve replayed in one CTE chain. */
  private def ivfpqResSql: String = ivfpqResSqlAt(K)

  /** [[ivfpqResSql]] with parameterized top-k and probe width — the
    * re-rank oracle replays the same chain at shortlist width
    * [[RerankR]]; the serving-knob sweeps replay it per knob value. */
  private def ivfpqResSqlAt(k: Int, np: Int = Nprobe): String = {
    val resv = (v: String, c: String) =>
      s"list_transform(generate_series(1, $Dims), i -> $v[i] - $c[i])"
    s"""WITH e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$ivfTrainCtes,
       |cellv AS (
       |  SELECT vec_id, v, cent_id AS cell_id, cent_v FROM (
       |    SELECT e.vec_id, e.v, c.cent_id, c.cent_v, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |    FROM e, c)
       |  WHERE cr = 1),
       |res AS (
       |  SELECT vec_id, cell_id, ${resv("v", "cent_v")} AS rv FROM cellv),
       |rp16 AS (
       |  SELECT res.vec_id, res.cell_id, t.m AS sub,
       |    res.rv[t.m*16+1 : t.m*16+16] AS sv
       |  FROM res, UNNEST(generate_series(0, 3)) AS t(m)),
       |${pqTrainChain("rp16", "r")},
       |rdd AS (
       |  SELECT p.vec_id, p.cell_id, p.sub, c.code,
       |    CAST(${d2Sql("p.sv", "c.cv", 16)} AS BIGINT) AS d2
       |  FROM rp16 p JOIN rcb c ON c.sub = p.sub),
       |rk AS (
       |  SELECT vec_id, cell_id, CAST(sub AS BIGINT) AS sub,
       |    MIN(d2 * 16 + code) AS k
       |  FROM rdd GROUP BY vec_id, cell_id, sub),
       |rcodes AS (SELECT vec_id, cell_id, sub, k & 15 AS code FROM rk),
       |qprobe AS (
       |  SELECT vec_id AS query_id, cell_id, ${resv("v", "cent_v")} AS qres
       |  FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell_id, c.cent_v,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |    FROM e, c WHERE e.vec_id % 50 = 0)
       |  WHERE cr <= $np),
       |rqx AS (
       |  SELECT q.query_id, q.cell_id, t.m AS sub,
       |    q.qres[t.m*16+1 : t.m*16+16] AS sv, cb2.code, cb2.cv
       |  FROM qprobe q
       |  CROSS JOIN UNNEST(generate_series(0, 3)) AS t(m)
       |  JOIN rcb cb2 ON cb2.sub = t.m),
       |rdt AS (
       |  SELECT query_id, cell_id, CAST(sub AS BIGINT) AS sub, code,
       |    ${pqD2Sql} AS dt
       |  FROM rqx),
       |rad AS (
       |  SELECT rdt.query_id, rcodes.vec_id,
       |    CAST(SUM(rdt.dt) AS BIGINT) AS adist
       |  FROM rcodes
       |  JOIN rdt ON rdt.cell_id = rcodes.cell_id
       |    AND rdt.sub = rcodes.sub AND rdt.code = rcodes.code
       |  WHERE rcodes.vec_id <> rdt.query_id
       |  GROUP BY rdt.query_id, rcodes.vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, adist FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist ASC, vec_id ASC) AS rank FROM rad)
       |WHERE rank <= $k""".stripMargin
  }

  /** IVFADC+R: exact re-rank of the residual-ADC shortlist (the
    * sim_ivfpq_rerank body). The shortlist is queries×[[RerankR]] id
    * pairs — broadcast onto the corpus so the gather never shuffles
    * vectors; exact d2 then re-orders and cuts to top-[[K]]. */
  private def ivfpqRerankSpark(s: org.apache.spark.sql.SparkSession,
      d: String, r: Int = RerankR,
      np: Int = Nprobe, finalK: Int = K): org.apache.spark.sql.DataFrame = {
    val e = quantized(s, d)
    Similarity.rerankExact(
      ivfpqResSpark(s, d, k = r, np = np),
      e.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("qv")),
      e, k = finalK)
  }

  /** DuckDB text of the re-rank: the full IVFADC chain at shortlist
    * width, then exact squared-L2 on the (query, candidate) id pairs. */
  private def ivfpqRerankSql: String = ivfpqRerankSqlAt(RerankR, Nprobe)

  /** [[ivfpqRerankSql]] with parameterized shortlist width, probe
    * width, and final cut — one replay per swept knob value (the MMR
    * pool widens `finalK` past [[K]]). */
  private def ivfpqRerankSqlAt(r: Int, np: Int, finalK: Int = K): String =
    s"""WITH sl AS (
       |  SELECT query_id, vec_id FROM (${ivfpqResSqlAt(r, np)})),
       |eq AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |sc AS (
       |  SELECT sl.query_id, sl.vec_id,
       |    CAST(${dot("q.v", "q.v", Dims)} - 2 * ${dot("q.v", "c.v", Dims)}
       |      + ${dot("c.v", "c.v", Dims)} AS BIGINT) AS d2
       |  FROM sl
       |  JOIN eq q ON q.vec_id = sl.query_id
       |  JOIN eq c ON c.vec_id = sl.vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, d2 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY d2 ASC, vec_id ASC) AS rank FROM sc)
       |WHERE rank <= $finalK""".stripMargin

  /** The MMR candidate pool: the production IVFADC+R chain with its
    * final cut widened to [[MmrPool]] — memoized because both the MMR
    * list and the diversity audit read it. */
  private def mmrPoolFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // Resolve the rerank chain BEFORE entering the memo: its plan
    // construction touches the trained-model memos (quantized,
    // codebooks), and a nested computeIfAbsent throws (FrameCache
    // doctrine).
    val built = ivfpqRerankSpark(s, d, finalK = MmrPool)
      .select(col("query_id"), col("rank"), col("vec_id"), col("d2"))
    FrameCache.memo(s, d, "mmr_pool")(built)
  }

  /** The greedy MMR selection over [[mmrPoolFrame]] — memoized (served
    * by `sim_mmr_rerank` and graded by `sim_mmr_diversity`). */
  private def mmrSelFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val pool = mmrPoolFrame(s, d)
    val e = quantized(s, d).select(col("vec_id"), col("qv"))
    FrameCache.memo(s, d, "mmr_sel") {
      Similarity.mmrDiversify(pool, e, MmrK)
    }
  }

  /** Unrolled MMR CTEs over the widened re-rank pool: `pool` (with the
    * relevance rank), `pp` (exact pairwise d2 among pool members), and
    * `sel1`..`sel$MmrK` — pick 1 is pure relevance, each later round
    * re-derives the integer margin argmax (min distance to the selected
    * set minus query distance, ties to the smallest id) exactly as
    * [[graft.operators.Similarity.mmrDiversify]] computes it. */
  private def mmrCtes: String = {
    // MATERIALIZED stops DuckDB's CTE inlining: each sel_t references
    // sel_{t-1} three times, so inlined expansion is 3^k copies of the
    // whole rerank chain — enough parquet re-scans to exhaust the fd
    // limit. Materializing pool/pp/sel_t replays each frame once, which
    // is also what the Spark side does (localCheckpoint per round).
    val base =
      s"""pool AS MATERIALIZED (
         |  SELECT query_id, vec_id, d2, rank
         |  FROM (${ivfpqRerankSqlAt(RerankR, Nprobe, MmrPool)}) pr),
         |eq2 AS MATERIALIZED (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
         |pp AS MATERIALIZED (
         |  SELECT a.query_id, a.vec_id AS i, b.vec_id AS j,
         |    CAST(${dot("ia.v", "ia.v", Dims)} - 2 * ${dot("ia.v", "jb.v", Dims)}
         |      + ${dot("jb.v", "jb.v", Dims)} AS BIGINT) AS dij
         |  FROM pool a
         |  JOIN pool b ON b.query_id = a.query_id AND b.vec_id <> a.vec_id
         |  JOIN eq2 ia ON ia.vec_id = a.vec_id
         |  JOIN eq2 jb ON jb.vec_id = b.vec_id),
         |sel1 AS MATERIALIZED (
         |  SELECT query_id, vec_id, d2, CAST(1 AS BIGINT) AS mmr_rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, vec_id ASC) AS rn FROM pool)
         |  WHERE rn = 1)""".stripMargin
    val rounds = (2 to MmrK).map { t =>
      s"""sc$t AS (
         |  SELECT p.query_id, p.vec_id, p.d2, MIN(pp.dij) AS ms
         |  FROM pool p
         |  JOIN pp ON pp.query_id = p.query_id AND pp.i = p.vec_id
         |  JOIN sel${t - 1} s ON s.query_id = pp.query_id
         |    AND s.vec_id = pp.j
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} x
         |    WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id)
         |  GROUP BY 1, 2, 3),
         |pk$t AS (
         |  SELECT query_id, vec_id, d2, CAST($t AS BIGINT) AS mmr_rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY (ms - d2) DESC, vec_id ASC) AS rn FROM sc$t)
         |  WHERE rn = 1),
         |sel$t AS MATERIALIZED (SELECT * FROM sel${t - 1}
         |  UNION ALL SELECT * FROM pk$t)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** Recall@K of `approx` (query_id, neighbor_id) against the exact
    * squared-L2 top-K over the 1-in-50 query sample — the shared body
    * of the PQ-family recall gates. */
  /** The exact squared-L2 top-K of the 1-in-50 query sample — the
    * grading baseline EVERY recall gate compares against, memoized so
    * the board computes the brute-force scan once per session/pass
    * instead of once per gate (ten gate rows plus six sweep branches
    * re-derived it — the same first-consumer duplication the trained
    * centroids/codebooks already avoid). */
  private def exactL2TopK(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    FrameCache.memo(s, d, "exact_l2_topk") {
      import org.apache.spark.sql.expressions.Window
      val e = quantized(s, d)
      val q = e.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("qv").as("xv"))
      val d2full = (Similarity.dot(col("xv"), col("xv"))
        - lit(2.0) * Similarity.dot(col("xv"), col("cv2"))
        + Similarity.dot(col("cv2"), col("cv2"))).cast("long")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d2").asc, col("neighbor_id").asc)
      q.crossJoin(
          e.select(col("vec_id").as("neighbor_id"), col("qv").as("cv2")))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("d2", d2full)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("neighbor_id"))
    }

  private def recallAgainstExactL2(s: org.apache.spark.sql.SparkSession,
      d: String,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val exact = exactL2TopK(s, d)
    exact.join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall_at_k"))
  }

  /** Oracle text for [[recallAgainstExactL2]]: `approxSql` must return
    * (query_id, …, vec_id, …) ranked rows (the two ADC search shapes). */
  private def recallAgainstExactL2Sql(approxSql: String): String =
    s"""WITH exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${dot("q.v", "q.v", Dims)} - 2 * ${dot("q.v", "c.v", Dims)}
       |          + ${dot("c.v", "c.v", Dims)} ASC,
       |        c.vec_id ASC) AS rank
       |    FROM (SELECT vec_id, ${quantVec("embedding")} AS v
       |          FROM embeddings WHERE vec_id % 50 = 0) q,
       |         (SELECT vec_id, ${quantVec("embedding")} AS v
       |          FROM embeddings) c
       |    WHERE c.vec_id <> q.vec_id)
       |  WHERE rank <= $K),
       |approx AS (
       |  SELECT query_id, vec_id AS neighbor_id, 1 AS hit
       |  FROM ($approxSql))
       |SELECT e.query_id, COUNT(*) AS n_exact, COUNT(a.hit) AS n_hit,
       |  CAST(COUNT(a.hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |    AS recall_at_k
       |FROM exact e
       |LEFT JOIN approx a
       |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Spec bridge: [[recallAgainstExactL2]] over an arbitrary approx
    * frame carrying (query_id, neighbor_id, …). */
  private[graft] def recallOfApprox(s: org.apache.spark.sql.SparkSession,
      d: String,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    recallAgainstExactL2(s, d,
      approx.select(col("query_id"), col("neighbor_id")))

  /** The bounded-degree neighbor graph (src, dst, erank, d2) — an
    * INDEX: built once per (session, sf) off the trained centroids'
    * top-2 cell probes ([[Similarity.nnGraph]]), checkpointed, then
    * served read-only to every traversal. */
  private[graft] def nnGraphEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    // the production degree-[[GraphDeg]] list IS the erank ≤ GraphDeg
    // prefix of the ONE wide build (erank is assigned before any cap;
    // the degree-sweep spec pins the equality row for row) — r16 stops
    // paying the pair-join/score/rank pass twice for nested prefixes
    // of the same scored frame
    nnGraphEdgesWide(s, d).filter(col("erank") <= GraphDeg)

  /** The widest edge list of the degree sweep, built ONCE at
    * [[GraphDegMax]]: because erank is assigned before any cap, every
    * smaller degree's edge list is exactly the `erank ≤ deg` prefix
    * of this build — the sweep re-ranks one scored pair frame instead
    * of paying three index builds (the verdict's "re-ranks the same
    * scored pair frame" economy). */
  private[graft] def nnGraphEdgesWide(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cents = trainedCentroids(s, d)
    FrameCache.memo(s, d, "nn_graph_edges_wide") {
      val e = quantized(s, d)
      val (_, probes) = Similarity.ivfAssignCentroids(
        e, "vec_id", "qv", cents, nprobe = 2)
      Similarity.nnGraph(
        probes.select(col("query_id").as("id"), col("cell_id")),
        e.select(col("vec_id"), col("qv").as("v")), GraphDegMax)
    }
  }

  /** The ADD-path serving pair of the graph index: edges built over
    * the BASE cohort only (even ids — the offline build), while the
    * serve-side assignment is base ∪ delta. A streamed-in delta
    * vector is assigned to its cell under the SAME fixed centroids
    * (one broadcast argmin — no retrain, no edge-list rebuild, the
    * O(n·degree) index untouched) and becomes reachable the next
    * micro-batch through the ENTRY stage: the seed beam scans the
    * query's cell members off the assignment, so a delta member of
    * that cell is scored, ranked, and servable even though no edge
    * points at it. Because cell assignment is per-vector under fixed
    * centroids, the entry stage is row-identical to what a full
    * rebuild on base+delta would seed (SimilaritySpec pins the
    * hops=0 equality); the hops only ADD base-side candidates. */
  private[graft] def nnGraphEdgesBase(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cents = trainedCentroids(s, d)
    FrameCache.memo(s, d, "nn_graph_edges_base") {
      val e = quantized(s, d).filter(pmod(col("vec_id"), lit(2)) === 0)
      val (_, probes) = Similarity.ivfAssignCentroids(
        e, "vec_id", "qv", cents, nprobe = 2)
      Similarity.nnGraph(
        probes.select(col("query_id").as("id"), col("cell_id")),
        e.select(col("vec_id"), col("qv").as("v")), GraphDeg)
    }
  }

  /** [[nnGraphEdgesBase]] parametrized on the delta fraction — edges
    * over the `vec_id % m ≠ 0` cohort only, so the excluded 1/m of
    * the corpus models the vectors ADMITTED since the last rebuild
    * (m = 10/3/2 → delta ≈ 10/33/50 %). The drift row serves the full
    * corpus against each base build and measures what recall the
    * edge-less delta costs — the degradation curve that prices the
    * rebuild trigger. */
  /** ALL drift-fraction base builds in ONE branch-keyed pass (r16
    * build fusion): the per-m cohorts can't share pairs, but they CAN
    * share the pair-join/score/rank machinery — one tagged probe
    * frame, one distinct, one window for the three builds the drift
    * and patch-sweep rows consume every pass. Per-vector centroid
    * ranking is independent of the rest of the cohort, so filtering
    * the FULL probe frame by cohort id ≡ probing the filtered corpus
    * (the standalone kernel's form); per-m rows are exactly the
    * standalone build's (SimilaritySpec pins m = 3 against an inline
    * [[Similarity.nnGraph]] build). (__m, src, dst, erank, d2). */
  private[graft] def nnGraphEdgesBaseByM(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cents = trainedCentroids(s, d)
    FrameCache.memo(s, d, "nn_graph_edges_base_by_m") {
      val e = quantized(s, d)
      val (_, probes) = Similarity.ivfAssignCentroids(
        e, "vec_id", "qv", cents, nprobe = 2)
      val pb = probes
        .withColumn("__m",
          explode(array(GraphDriftMods.map(m => lit(m.toLong)): _*)))
        .filter(pmod(col("query_id"), col("__m")) =!= 0)
        .select(col("__m"), col("query_id").as("id"), col("cell_id"))
      Similarity.nnGraphPatchBranched("__m", pb, pb,
        e.select(col("vec_id"), col("qv").as("v")), GraphDeg)
    }
  }

  private[graft] def nnGraphEdgesBaseAt(s: org.apache.spark.sql.SparkSession,
      d: String, m: Int): org.apache.spark.sql.DataFrame =
    nnGraphEdgesBaseByM(s, d).filter(col("__m") === m.toLong)
      .select(col("src"), col("dst"), col("erank"), col("d2"))

  /** The incremental edge PATCH for the `vec_id % m = 0` delta cohort
    * ([[Similarity.nnGraphPatch]]): out-edges for the admitted
    * vectors against the full probe space — row-identical to a full
    * rebuild's rows for those srcs (spec-pinned), built without
    * touching the base list. */
  /** ALL drift-fraction PATCH builds in one branch-keyed pass —
    * [[nnGraphEdgesBaseByM]]'s fusion applied to the delta-src patch
    * kernel (srcs = the `id % m = 0` cohort per branch, probe space =
    * the full frame per branch). */
  private[graft] def graphPatchedEdgesByM(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cents = trainedCentroids(s, d)
    FrameCache.memo(s, d, "graph_patch_by_m") {
      val e = quantized(s, d)
      val (_, probes) = Similarity.ivfAssignCentroids(
        e, "vec_id", "qv", cents, nprobe = 2)
      val all = probes
        .withColumn("__m",
          explode(array(GraphDriftMods.map(m => lit(m.toLong)): _*)))
        .select(col("__m"), col("query_id").as("id"), col("cell_id"))
      Similarity.nnGraphPatchBranched("__m",
        all.filter(pmod(col("id"), col("__m")) === 0), all,
        e.select(col("vec_id"), col("qv").as("v")), GraphDeg)
    }
  }

  private[graft] def graphPatchedEdges(s: org.apache.spark.sql.SparkSession,
      d: String, m: Int): org.apache.spark.sql.DataFrame =
    graphPatchedEdgesByM(s, d).filter(col("__m") === m.toLong)
      .select(col("src"), col("dst"), col("erank"), col("d2"))

  /** The serve-side assignment base ∪ delta: the base cohort's rows
    * plus the delta cohort admitted against the SAME trained
    * centroids (the stateless ADD of serveAssignedSwappableWriter). */
  private[graft] def graphDeltaAssigned(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    // base-cohort assignment ∪ delta-cohort assignment under the SAME
    // fixed centroids ≡ the full-corpus assignment (per-vector argmin —
    // the two-call form only partitioned the same rows); r16 serves the
    // one shared memo instead of a dedicated two-assignment build. The
    // serve-delta spec's rebuild-equality pins stay green on it.
    graphAssigned(s, d)

  /** Beam-search serve over [[nnGraphEdges]] at `hops` unrolled
    * expansion rounds: entry = the query's own (nearest-cell) members,
    * then each hop expands the current beam's out-edges and re-ranks
    * everything visited. hops = 0 degenerates to the entry-cell scan
    * (IVF nprobe = 1) — the spec's monotonicity baseline. */
  private[graft] def graphSearchAt(s: org.apache.spark.sql.SparkSession,
      d: String, hops: Int): org.apache.spark.sql.DataFrame =
    graphSearchAt(s, d, hops, GraphBeam, None)

  /** [[graphSearchAt]] with the two other serving/index knobs exposed:
    * `beam` (the serving-time width — no rebuild) and an edge-list
    * override (`edges` — the degree sweep serves progressively
    * truncated erank prefixes of ONE build). */
  private[graft] def graphSearchAt(s: org.apache.spark.sql.SparkSession,
      d: String, hops: Int, beam: Int,
      edges: Option[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame = {
    // entry/query/vector sides all read the MEMOIZED assignment (r16:
    // the per-call broadcast-argmin re-derivation and the per-hop
    // parquet re-scan + re-quantize both collapse to checkpoint scans;
    // rows are identical — the assignment carries each vector verbatim)
    val (q, entry) = graphQueryEntry(s, d)
    Similarity.graphBeamSearch(
      q, entry,
      edges.getOrElse(nnGraphEdges(s, d)),
      graphVecs(s, d),
      hops = hops, beam = beam, k = K)
  }

  /** [[graphSearchAt]] with the ENTRY stage widened to the query's
    * `entryCells` nearest cells (the nprobe doctrine applied to the
    * traversal's seeding): the beam seeds from every member of the
    * probed cells, DISTINCT across cells, then the hops proceed
    * unchanged. entryCells = 1 is exactly [[graphSearchAt]] (the
    * sweep's spec pins the branch equality); wider entries are a
    * SERVING-TIME knob — per-query seed cost grows with the probed
    * cells' membership, the edge list and the per-hop bound
    * (beam·degree) never change. */
  private[graft] def graphSearchEntryAt(s: org.apache.spark.sql.SparkSession,
      d: String, hops: Int, beam: Int, entryCells: Int)
      : org.apache.spark.sql.DataFrame = {
    val e = quantized(s, d)
    val (assigned, probes) = Similarity.ivfAssignCentroids(
      e, "vec_id", "qv", trainedCentroids(s, d), nprobe = entryCells)
    val q = assigned.filter(pmod(col("__id"), lit(50)) === 0)
      .select(col("__id").as("query_id"), col("__v").as("qv"))
    val entry = q
      .join(probes.filter(pmod(col("query_id"), lit(50)) === 0),
        Seq("query_id"))
      .join(assigned.select(col("__id").as("cand"),
        col("__v").as("__cv"), col("cell_id")), Seq("cell_id"))
      .filter(col("cand") =!= col("query_id"))
      .withColumn("d2", (Similarity.dot(col("qv"), col("qv"))
        - lit(2.0) * Similarity.dot(col("qv"), col("__cv"))
        + Similarity.dot(col("__cv"), col("__cv"))).cast("long"))
      .select("query_id", "cand", "d2")
      .dropDuplicates("query_id", "cand")
    Similarity.graphBeamSearch(
      q, entry, nnGraphEdges(s, d),
      e.select(col("vec_id"), col("qv").as("v")),
      hops = hops, beam = beam, k = K)
  }

  /** The corpus' nprobe = 1 cell assignment under the trained
    * centroids — (__id, __v, cell_id), the static serve-side frame
    * every graph traversal's entry stage scans. This IS [[semAssigned]]
    * (same corpus, same trained centroids, same argmin): before r16
    * every graph/IVF row re-derived the broadcast-argmin + rank window
    * per call (~20 derivations per bench pass) for a frame that at
    * 100 TB is the STORED index artifact — assignment is computed once
    * at build time and served read-only (graphSearchQueries' scaladoc
    * already names the assignment a checkpointed static side; the
    * streaming writers serve it off an AtomicReference). */
  private[graft] def graphAssigned(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = semAssigned(s, d)

  /** The assigned corpus as the traversal's vector-lookup side —
    * (vec_id, v), identical values to the quantized scan (assignment
    * carries each vector verbatim), read off the checkpoint instead of
    * re-scanning + re-quantizing the parquet per hop. */
  private def graphVecs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graphAssigned(s, d)
      .select(col("__id").as("vec_id"), col("__v").as("v"))

  /** The production serving inputs every graph sweep shares: the
    * query sample (query_id, qv) and its single-cell entry seed
    * (query_id, cand, d2) — [[graphSearchAt]]'s derivation off the
    * memoized assignment, factored out so the fused sweeps build it
    * once per query instead of once per branch. */
  private def graphQueryEntry(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val assigned = graphAssigned(s, d)
    val q = assigned.filter(pmod(col("__id"), lit(50)) === 0)
      .select(col("__id").as("query_id"), col("__v").as("qv"),
        col("cell_id"))
    val entry = q
      .join(assigned.select(col("__id").as("cand"),
        col("__v").as("__cv"), col("cell_id")), Seq("cell_id"))
      .filter(col("cand") =!= col("query_id"))
      .withColumn("d2", (Similarity.dot(col("qv"), col("qv"))
        - lit(2.0) * Similarity.dot(col("qv"), col("__cv"))
        + Similarity.dot(col("__cv"), col("__cv"))).cast("long"))
      .select("query_id", "cand", "d2")
    (q.select("query_id", "qv"), entry)
  }

  /** Branch-fused [[recallAgainstExactL2]]: ONE exact⋈approx join and
    * ONE (branch, query) aggregate for a whole sweep, instead of one
    * join + aggregate per branch. The exact baseline is tagged with
    * every branch id, so each branch's LEFT-JOIN/count semantics — and
    * therefore its rows — are exactly the per-branch gate's (the
    * sweeps' existing branch-equality specs pin it). `approx` carries
    * (bidCol, query_id, neighbor_id). */
  private def recallBranched(s: org.apache.spark.sql.SparkSession,
      d: String, bidCol: String, bids: Seq[org.apache.spark.sql.Column],
      approx: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val exact = exactL2TopK(s, d)
      .withColumn(bidCol, explode(array(bids: _*)))
    exact.join(approx.withColumn("hit", lit(1)),
        Seq(bidCol, "query_id", "neighbor_id"), "left")
      .groupBy(col(bidCol), col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .select(col(bidCol), col("query_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall_at_k"))
  }

  /** Shared oracle CTEs of the graph-ANN family: quantized vectors,
    * the trained centroids, the top-2 cell probes, and the
    * degree-capped edge list `gedges` — must stay in lockstep with
    * [[nnGraphEdges]]. */
  private def nnGraphCtes: String = nnGraphCtesWhere("")

  /** [[nnGraphCtes]] with an optional id predicate restricting the
    * EDGE-LIST side (`gp`/`gpair`/`gsc`/`gedges`) — the serve-delta
    * oracle builds edges over the base cohort only while `gcs` (and
    * so the assignment/entry scan) stays full-corpus — and an
    * optional degree override (the degree sweep's per-branch erank
    * cap). Empty/default = the whole corpus at [[GraphDeg]] (every
    * existing consumer). */
  private def nnGraphCtesWhere(edgeIdPred: String,
      deg: Int = GraphDeg, patchSrcPred: String = ""): String = {
    // optional incremental-PATCH block: out-edges for the delta cohort
    // (src matching `patchSrcPred`) against the FULL probe space —
    // the rebuild's pair construction restricted to those srcs; the
    // traversable list becomes gall = base ∪ patch
    val patch = if (patchSrcPred.isEmpty) "" else
      s""",
         |gpp AS (SELECT id, cent_id AS cell_id FROM gcs WHERE cr <= 2),
         |gppair AS (
         |  SELECT DISTINCT a.id AS src, b.id AS dst
         |  FROM gpp a JOIN gpp b ON a.cell_id = b.cell_id
         |    AND a.id <> b.id
         |  WHERE a.id$patchSrcPred),
         |gpsc AS (
         |  SELECT p.src, p.dst,
         |    CAST(${d2Sql("sv.v", "dv.v", Dims)} AS BIGINT) AS d2
         |  FROM gppair p
         |  JOIN e sv ON sv.vec_id = p.src
         |  JOIN e dv ON dv.vec_id = p.dst),
         |gpedges AS (
         |  SELECT src, dst FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY src ORDER BY d2 ASC, dst ASC) AS erank
         |    FROM gpsc)
         |  WHERE erank <= $deg),
         |gall AS (SELECT src, dst FROM gedges
         |  UNION ALL SELECT src, dst FROM gpedges)""".stripMargin
    s"""e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$ivfTrainCtes,
       |gcs AS (
       |  SELECT e.vec_id AS id, e.v, c.cent_id, row_number() OVER (
       |    PARTITION BY e.vec_id
       |    ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
       |  FROM e, c),
       |gp AS (SELECT id, cent_id AS cell_id FROM gcs
       |  WHERE cr <= 2$edgeIdPred),
       |gpair AS (
       |  SELECT DISTINCT a.id AS src, b.id AS dst
       |  FROM gp a JOIN gp b ON a.cell_id = b.cell_id AND a.id <> b.id),
       |gsc AS (
       |  SELECT p.src, p.dst,
       |    CAST(${d2Sql("sv.v", "dv.v", Dims)} AS BIGINT) AS d2
       |  FROM gpair p
       |  JOIN e sv ON sv.vec_id = p.src
       |  JOIN e dv ON dv.vec_id = p.dst),
       |gedges AS (
       |  SELECT src, dst, erank, d2 FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY src ORDER BY d2 ASC, dst ASC) AS erank
       |    FROM gsc)
       |  WHERE erank <= $deg)$patch""".stripMargin
  }

  /** [[nnGraphCtes]] + the unrolled beam search, ending in
    * `gsearch(query_id, neighbor_id, rank, d2)` — lockstep with
    * [[graphSearchAt]] at [[GraphHops]]. */
  private def graphSearchCtes: String = graphSearchCtesAt(GraphHops)

  /** [[graphSearchCtes]] parametrized on the unrolled hop count — the
    * hop-sweep oracle replays the chain once per width (the nprobe
    * sweep pattern); h = 0 degenerates to the entry-cell scan. */
  private def graphSearchCtesAt(h: Int): String = graphSearchCtesAt(h, "")

  /** [[graphSearchCtesAt]] with the edge-side id predicate threaded
    * through to [[nnGraphCtesWhere]] — entry/assignment stay
    * full-corpus, only the traversable edge list is restricted — plus
    * the serving beam width and the index degree (the two sweep
    * knobs). */
  private def graphSearchCtesAt(h: Int, edgeIdPred: String,
      beam: Int = GraphBeam, deg: Int = GraphDeg,
      entryCells: Int = 1, patchSrcPred: String = ""): String = {
    val edgeCte = if (patchSrcPred.isEmpty) "gedges" else "gall"
    val hops = (1 to h).map { i =>
      s"""gb$i AS (
         |  SELECT query_id, cand FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY d2 ASC, cand ASC) AS r
         |    FROM gv${i - 1}) WHERE r <= $beam),
         |gx$i AS (
         |  SELECT DISTINCT b.query_id, g.dst AS cand
         |  FROM gb$i b JOIN $edgeCte g ON g.src = b.cand
         |  WHERE g.dst <> b.query_id),
         |gs$i AS (
         |  SELECT x.query_id, x.cand,
         |    CAST(${d2Sql("q.qv", "cv.v", Dims)} AS BIGINT) AS d2
         |  FROM gx$i x
         |  JOIN gq q ON q.query_id = x.query_id
         |  JOIN e cv ON cv.vec_id = x.cand),
         |gv$i AS (
         |  SELECT DISTINCT query_id, cand, d2 FROM (
         |    SELECT * FROM gv${i - 1} UNION ALL SELECT * FROM gs$i))""".stripMargin
    }.mkString(",\n")
    // entryCells = 1 keeps the original seeding text byte-identical
    // (every pre-sweep consumer's oracle is unchanged); wider widths
    // seed from the query's `entryCells` nearest cells' members
    // (DISTINCT — a member reachable via two probed cells scores once)
    val seed = if (entryCells == 1)
      s"""gq AS (
         |  SELECT id AS query_id, v AS qv, cent_id AS cell_id
         |  FROM gcs WHERE cr = 1 AND id % 50 = 0),
         |gasg AS (SELECT id, v, cent_id AS cell_id FROM gcs WHERE cr = 1),
         |gv0 AS (
         |  SELECT q.query_id, m.id AS cand,
         |    CAST(${d2Sql("q.qv", "m.v", Dims)} AS BIGINT) AS d2
         |  FROM gq q JOIN gasg m
         |    ON m.cell_id = q.cell_id AND m.id <> q.query_id)""".stripMargin
    else
      s"""gq AS (
         |  SELECT id AS query_id, v AS qv, cent_id AS cell_id
         |  FROM gcs WHERE cr = 1 AND id % 50 = 0),
         |gqp AS (
         |  SELECT id AS query_id, cent_id AS cell_id
         |  FROM gcs WHERE cr <= $entryCells AND id % 50 = 0),
         |gasg AS (SELECT id, v, cent_id AS cell_id FROM gcs WHERE cr = 1),
         |gv0 AS (
         |  SELECT DISTINCT q.query_id, m.id AS cand,
         |    CAST(${d2Sql("q.qv", "m.v", Dims)} AS BIGINT) AS d2
         |  FROM gq q
         |  JOIN gqp p ON p.query_id = q.query_id
         |  JOIN gasg m ON m.cell_id = p.cell_id
         |    AND m.id <> q.query_id)""".stripMargin
    s"""${nnGraphCtesWhere(edgeIdPred, deg, patchSrcPred)},
       |$seed,
       |${if (h > 0) hops + ",\n" else ""}gsearch AS (
       |  SELECT query_id, cand AS neighbor_id, rank, d2 FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY d2 ASC, cand ASC) AS rank
       |    FROM gv$h) WHERE rank <= $K)""".stripMargin
  }

  /** The PQ-coded corpus (vec_id, sub, code) — the batch ADC query's
    * static side, also served to the streaming search twin. */
  private[graft] def pqCodesFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    pqCodes(s, d).drop("d2")

  /** The trained codebook frame, package-visible for the streaming
    * search/index twins and their bench sections. */
  private[graft] def trainedCodebookFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    trainedCodebook(s, d)

  /** The trained centroid frame, package-visible for the streaming
    * pruned-search twin (probe side of [[Similarity.ivfPqSearch]]). */
  private[graft] def trainedCentroidsFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    trainedCentroids(s, d)

  /** TRAINED IVF centroids (cent_id, cent_v): the deterministic id-pick
    * (vec_id % 50) is only the INIT — [[Similarity.kmeansTrain]] runs
    * [[TrainIters]] integer-Lloyd iterations over the corpus, exactly
    * replayed by [[ivfTrainCtes]]. Un-memoized so PlanSpec can pin the
    * training plan's shape directly. */
  /** The FIRST Lloyd iteration's centroids, memoized (r16): the shared
    * prefix of the trained-centroid pipeline. Training is a
    * deterministic fold, so continuing from this checkpoint for the
    * remaining iterations is row-identical to training from the id-pick
    * init — and the inertia audit's t = 1 branch reads the SAME frame
    * instead of re-running the first corpus pass standalone. */
  private def trainedCentroidsIt1(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val e = quantized(s, d)
    FrameCache.memo(s, d, "ivf_centroids_it1")(
      Similarity.kmeansTrain(
        e.select(col("vec_id").as("__id"), col("qv").as("__v")),
        e.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("cent_id"), col("qv").as("cent_v")),
        iters = 1))
  }

  private[graft] def ivfTrainPipeline(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val e = quantized(s, d)
    Similarity.kmeansTrain(
      e.select(col("vec_id").as("__id"), col("qv").as("__v")),
      trainedCentroidsIt1(s, d),
      iters = TrainIters - 1)
  }

  /** The trained-centroid frame every IVF consumer reads — k·dims
    * doubles, trained ONCE per (session, sf) in [[FrameCache]] and
    * broadcast from the checkpoint thereafter (a production index
    * trains offline and broadcasts the same way). */
  private def trainedCentroids(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // construct OUTSIDE the memo: the pipeline resolves the iteration-1
    // prefix memo (no-nesting rule); construction itself stays lazy
    val built = ivfTrainPipeline(s, d)
    FrameCache.memo(s, d, "ivf_centroids")(built)
  }

  /** The DRIFT-COHORT centroids: the same integer-Lloyd chain trained
    * on the even-id half of the corpus only — the index generation the
    * drift audit measures against and the retrain row replaces. Shared
    * by `sim_index_drift`, `sim_index_retrain`, and the swap spec. */
  private[graft] def cohortCentroids(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    FrameCache.memo(s, d, "drift_cohort_cents") {
      val evens = quantized(s, d).filter(pmod(col("vec_id"), lit(2)) === 0)
      Similarity.kmeansTrain(
        evens.select(col("vec_id").as("__id"), col("qv").as("__v")),
        evens.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("cent_id"), col("qv").as("cent_v")),
        iters = TrainIters)
    }

  /** TRAINED per-subspace PQ codebook pipeline: the 4 subspaces train as
    * one grouped k-means (group key = `sub`, [[PqCodes]] codewords each,
    * init = the vec_id < [[PqCodes]] id-pick), replayed by [[pqTrainCtes]]. */
  private[graft] def pqTrainPipeline(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val e = quantized(s, d)
    val pts = e.select(col("vec_id").as("__id"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("qv"))
      .select(col("sub"), col("__id"),
        slice(col("qv"), col("sub") * 16 + 1, lit(16)).as("__v"))
    Similarity.kmeansTrain(pts,
      pts.filter(col("__id") < PqCodes)
        .select(col("sub"), col("__id").as("cent_id"), col("__v").as("cent_v")),
      iters = TrainIters, groupCols = Seq("sub"))
  }

  /** Trained PQ codebook (sub, code, cv): [[PqCodes]] × 16-dim codewords per
    * subspace, [[FrameCache]]-memoized like the IVF centroids. */
  private def trainedCodebook(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    FrameCache.memo(s, d, "pq_codebook")(
      pqTrainPipeline(s, d).select(col("sub"),
        col("cent_id").as("code"), col("cent_v").as("cv")))

  /** Build this family's shared frames eagerly (see
    * [[DedupQueries.prewarmShared]] for the bench-attribution doctrine). */
  private[graft] def prewarmShared(s: org.apache.spark.sql.SparkSession,
      d: String): Unit = {
    trainedCentroids(s, d)
    cohortCentroids(s, d)
    trainedCodebook(s, d)
    trainedResCodebook(s, d)
    semAssigned(s, d)
    exactL2TopK(s, d)
    filteredBruteSpark(s, d)
    mmrPoolFrame(s, d)
    mmrSelFrame(s, d)
    labelCentroids(s, d)
    ()
  }

  /** Driver-side rows of the trained centroid frame — the broadcastable
    * index metadata the streaming index-maintenance twin
    * ([[graft.streaming.StreamingIndex]]) folds into its plan. */
  private[graft] def trainedCentroidRows(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[(Long, Seq[Double])] =
    trainedCentroids(s, d).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

  /** Driver-side rows of the trained PQ codebook (sub, code, cv). */
  private[graft] def trainedCodebookRows(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[(Int, Long, Seq[Double])] =
    trainedCodebook(s, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSeq

  private def d2Sql(v: String, c: String, dims: Int) =
    s"(${dot(v, v, dims)} - 2.0 * ${dot(v, c, dims)} + ${dot(c, c, dims)})"

  /** Unrolled integer-Lloyd training CTEs for the IVF centroids —
    * requires a preceding `$src(vec_id, v)` CTE, ends by defining
    * `${pre}c(cent_id, cent_v)`: per iteration, argmin assignment
    * (row_number ≡ the Spark side's min-struct), per-(cluster, dim)
    * mean re-quantized with round (half away from zero in BOTH
    * engines), empty clusters keeping their previous centroid. The
    * `pre` prefix lets one oracle replay TWO index generations (the
    * retrain row trains on the drift cohort AND the full corpus). */
  private def ivfTrainChain(src: String, pre: String): String = {
    val init =
      s"${pre}ct0 AS (SELECT vec_id AS cent_id, v AS cent_v FROM $src WHERE vec_id % 50 = 0)"
    val steps = (1 to TrainIters).map { i =>
      s"""${pre}asg$i AS (
         |  SELECT vec_id, v, cent_id AS cluster_id FROM (
         |    SELECT e.vec_id, e.v, c.cent_id, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS cr
         |    FROM $src e, ${pre}ct${i - 1} c) WHERE cr = 1),
         |${pre}mu$i AS (
         |  -- + 0.0 maps IEEE -0.0 (DuckDB round is C-style) onto the
         |  -- +0.0 Spark's BigDecimal HALF_UP round always produces
         |  SELECT cluster_id, di.i, round(SUM(v[di.i]) / COUNT(*)) + 0.0 AS m
         |  FROM ${pre}asg$i, (SELECT unnest(range(1, ${Dims + 1})) AS i) di
         |  GROUP BY cluster_id, di.i),
         |${pre}nc$i AS (
         |  SELECT cluster_id AS cent_id, list(m ORDER BY i) AS cent_v
         |  FROM ${pre}mu$i GROUP BY cluster_id),
         |${pre}ct$i AS (
         |  SELECT p.cent_id, COALESCE(n.cent_v, p.cent_v) AS cent_v
         |  FROM ${pre}ct${i - 1} p LEFT JOIN ${pre}nc$i n ON n.cent_id = p.cent_id)""".stripMargin
    }
    ((init +: steps) :+
      s"${pre}c AS (SELECT cent_id, cent_v FROM ${pre}ct$TrainIters)").mkString(",\n")
  }

  private def ivfTrainCtes: String = ivfTrainChain("e", "")

  /** Flat vs hierarchical assignment joined per vector — shared by
    * `sim_hier_assign` and its probe-width sweep. Both kernels read
    * the SAME trained fine centroids; the coarse level is the fixed
    * [[HierCoarseMod]] id-pick of them. */
  private def hierJoined(s: org.apache.spark.sql.SparkSession, d: String,
      nprobeC: Int): org.apache.spark.sql.DataFrame = {
    // the flat baseline IS the memoized serving assignment (r16: was a
    // fresh per-call argmin re-derivation of the same rows)
    val flat = graphAssigned(s, d)
      .select(col("__id").as("vec_id"), col("cell_id").as("cell_flat"))
    val coarse = trainedCentroids(s, d)
      .filter(pmod(col("cent_id"), lit(HierCoarseMod)) === 0)
      .select(col("cent_id").as("co_id"), col("cent_v").as("co_v"))
    val hier = Similarity.hierAssignCentroids(quantized(s, d), "vec_id",
        "qv", trainedCentroids(s, d), coarse, nprobeC)
      .select(col("id").as("vec_id"), col("cell_id").as("cell_hier"))
    flat.join(hier, Seq("vec_id"))
      .withColumn("agree",
        (col("cell_flat") === col("cell_hier")).cast("long"))
  }

  /** CTE chain replaying BOTH assignments off the trained centroids:
    * `hco` the coarse pick, `hca` fine→coarse (argmin, ties by co_id),
    * `hvc` vector→top-nprobeC coarse, `hier` the argmin over probed
    * cells' fine centroids, `hflat` the flat argmin — tie orders
    * matching [[Similarity.hierAssignCentroids]] /
    * [[Similarity.ivfAssignCentroids]] exactly. */
  private def hierCtes(nprobeC: Int): String =
    s"""e AS (SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$ivfTrainCtes,
       |hco AS (SELECT cent_id AS co_id, cent_v AS co_v FROM c
       |  WHERE cent_id % $HierCoarseMod = 0),
       |hca AS (
       |  SELECT cent_id, cent_v, co_id FROM (
       |    SELECT c.cent_id, c.cent_v, h.co_id, row_number() OVER (
       |      PARTITION BY c.cent_id
       |      ORDER BY ${d2Sql("c.cent_v", "h.co_v", Dims)} ASC, h.co_id ASC) AS r
       |    FROM c, hco h) WHERE r = 1),
       |hvc AS (
       |  SELECT vec_id, v, co_id FROM (
       |    SELECT e.vec_id, e.v, h.co_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "h.co_v", Dims)} ASC, h.co_id ASC) AS r
       |    FROM e, hco h) WHERE r <= $nprobeC),
       |hier AS (
       |  SELECT vec_id, cent_id AS cell_hier FROM (
       |    SELECT v.vec_id, a.cent_id, row_number() OVER (
       |      PARTITION BY v.vec_id
       |      ORDER BY ${d2Sql("v.v", "a.cent_v", Dims)} ASC, a.cent_id ASC) AS r
       |    FROM hvc v JOIN hca a ON a.co_id = v.co_id) WHERE r = 1),
       |hflat AS (
       |  SELECT vec_id, cent_id AS cell_flat FROM (
       |    SELECT e.vec_id, c.cent_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY ${d2Sql("e.v", "c.cent_v", Dims)} ASC, c.cent_id ASC) AS r
       |    FROM e, c) WHERE r = 1)""".stripMargin

  /** The id-pick init + K grouped-Lloyd training steps over a subvector
    * fan-out CTE `fanout(vec_id, sub, sv)`, all CTE names prefixed with
    * `pre` — shared verbatim by the raw-vector codebook (`p16` → `cb`,
    * pre = "") and the residual codebook (`rp16` → `rcb`, pre = "r"),
    * so the tricky pieces (argmin tie order, re-quantized means, the
    * `-0.0 → +0.0` normalization, empty-codeword carry-forward) exist
    * exactly once. */
  private def pqTrainChain(fanout: String, pre: String): String = {
    val init =
      s"${pre}cb0 AS (SELECT sub, vec_id AS code, sv AS cv FROM $fanout WHERE vec_id < $PqCodes)"
    val steps = (1 to TrainIters).map { i =>
      s"""${pre}pasg$i AS (
         |  SELECT vec_id, sub, sv, code FROM (
         |    SELECT p.vec_id, p.sub, p.sv, c.code, row_number() OVER (
         |      PARTITION BY p.vec_id, p.sub
         |      ORDER BY ${d2Sql("p.sv", "c.cv", 16)} ASC, c.code ASC) AS cr
         |    FROM $fanout p JOIN ${pre}cb${i - 1} c ON c.sub = p.sub) WHERE cr = 1),
         |${pre}pmu$i AS (
         |  -- + 0.0: same -0.0 → +0.0 normalization as the IVF chain
         |  SELECT sub, code, di.i, round(SUM(sv[di.i]) / COUNT(*)) + 0.0 AS m
         |  FROM ${pre}pasg$i, (SELECT unnest(range(1, 17)) AS i) di
         |  GROUP BY sub, code, di.i),
         |${pre}pnc$i AS (
         |  SELECT sub, code, list(m ORDER BY i) AS cv
         |  FROM ${pre}pmu$i GROUP BY sub, code),
         |${pre}cb$i AS (
         |  SELECT p.sub, p.code, COALESCE(n.cv, p.cv) AS cv
         |  FROM ${pre}cb${i - 1} p LEFT JOIN ${pre}pnc$i n ON n.sub = p.sub AND n.code = p.code)""".stripMargin
    }
    ((init +: steps) :+
      s"${pre}cb AS (SELECT sub, code, cv FROM ${pre}cb$TrainIters)").mkString(",\n")
  }

  /** Unrolled training CTEs for the per-subspace PQ codebook — requires
    * `e`, defines `p16(vec_id, sub, sv)` (the subvector fan-out, reused
    * by the coding CTEs) and ends with `cb(sub, code, cv)`. */
  private def pqTrainCtes: String =
    s"""p16 AS (
       |  SELECT e.vec_id, t.m AS sub, e.v[t.m*16+1 : t.m*16+16] AS sv
       |  FROM e, UNNEST(generate_series(0, 3)) AS t(m)),
       |${pqTrainChain("p16", "")}""".stripMargin

  /** Exact squared L2 between the sliced subvectors `sv`/`cv` via the
    * dot identity — integer-valued quantized coords, so the result is
    * an exact int64. */
  private def pqD2 =
    (Similarity.dot(col("sv"), col("sv"))
      - lit(2.0) * Similarity.dot(col("sv"), col("cv"))
      + Similarity.dot(col("cv"), col("cv"))).cast("long")

  private def pqD2Sql: String =
    s"""CAST(${dot("sv", "sv", 16)} - 2 * ${dot("sv", "cv", 16)}
       |      + ${dot("cv", "cv", 16)} AS BIGINT)""".stripMargin

  /** PQ code assignment (vec_id, sub, code, d2): each 16-dim subvector
    * snaps to its nearest codeword; the argmin rides a MIN over the
    * collision-free key d2·16+code, so assignment is one map-side-
    * combined aggregation — no per-vector window. */
  /** The PQ coding plan UN-memoized — the build inside [[pqCodes]]'s
    * memo, package-visible so PlanSpec keeps pinning the coding SHAPE
    * (broadcast codebook equi-join + min-key aggregation, no window)
    * after the r16 memoization turned the registered row into a
    * checkpoint scan. */
  private[graft] def pqCodesBuild(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cb = trainedCodebook(s, d)
    quantized(s, d).select(col("vec_id"), col("qv"),
        explode(sequence(lit(0), lit(3))).as("sub"))
      .withColumn("sv", slice(col("qv"), col("sub") * 16 + 1, lit(16)))
      .join(broadcast(cb), Seq("sub"))
      .withColumn("key", pqD2 * 16 + col("code"))
      .groupBy(col("vec_id"), col("sub").cast("long").as("sub"))
      .agg(min(col("key")).as("k"))
      .select(col("vec_id"), col("sub"),
        col("k").bitwiseAND(lit(15L)).as("code"),
        shiftright(col("k"), 4).as("d2"))
  }

  private def pqCodes(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // memoized since r16 — same persisted-index doctrine as
    // [[residualCellCodes]]: the codes row, the packed index-build
    // capstone, and every indexedCodes consumer coded the corpus per
    // row before
    val built = pqCodesBuild(s, d)
    FrameCache.memo(s, d, "pq_codes")(built)
  }

  /** DuckDB CTE block shared by the PQ family: quantized corpus `e`,
    * the TRAINED codebook chain ([[pqTrainCtes]] — subvector fan-out
    * `p16`, trained `cb`), per-(vector, sub, codeword) distances `dd`,
    * and the min-key argmin `k`. */
  private def pqCtes: String =
    s"""e AS (
       |  SELECT vec_id, ${quantVec("embedding")} AS v FROM embeddings),
       |$pqTrainCtes,
       |x AS (
       |  SELECT p.vec_id, p.sub, cb.code, p.sv, cb.cv
       |  FROM p16 p JOIN cb ON cb.sub = p.sub),
       |dd AS (
       |  SELECT vec_id, sub, code, ${pqD2Sql} AS d2
       |  FROM x),
       |k AS (
       |  SELECT vec_id, CAST(sub AS BIGINT) AS sub,
       |    MIN(d2 * 16 + code) AS k
       |  FROM dd GROUP BY vec_id, sub)""".stripMargin

  // ---------------------------------------------------------------------
  // Power-iteration SVD: the dominant right singular direction of the
  // (uncentered) embedding matrix — the fourth family trained by
  // iterating an audited step (k-means / BPE / PageRank doctrine).

  /** One distributed power step: u = Xv (map-only native dot per row
    * against the broadcast direction literals — index-metadata-sized,
    * like the streaming twins' centroid folds), then w = Xᵀu as ONE
    * posexplode + 64-key map-side-combined sum. The corpus is touched
    * exactly once per step and never shuffles — the shuffle carries 64
    * partial sums per partition. Every value is an exact integer-valued
    * double (< 2^53), collected as int64. */
  private def svdStep(s: org.apache.spark.sql.SparkSession, d: String,
      v: Array[Long]): Array[Long] = {
    val vlit = array(v.toIndexedSeq.map(x => lit(x.toDouble)): _*)
    quantized(s, d)
      .select(col("qv"), Similarity.dot(col("qv"), vlit).as("u"))
      .select(posexplode(col("qv")).as(Seq("pos", "x")), col("u"))
      .groupBy(col("pos"))
      .agg(sum(col("x") * col("u")).cast("long").as("w"))
      .collect()
      .sortBy(_.getAs[Int]("pos"))
      .map(_.getAs[Long]("w"))
  }

  /** The full training run: v₀ = uniform(SvdScale); per round, the
    * distributed step, the exact-int Rayleigh pair (vᵀw, vᵀv) — the
    * objective the audit row reports, λ̂ = num/den → λ_max — and the
    * re-quantized next direction round(w·scale/max|w|). The rounding
    * replicates the engines bit-for-bit: the quotient is the IEEE
    * double (w·100).toDouble / m (operands exact, division correctly
    * rounded — identical in Spark, DuckDB, and here), and HALF_UP on
    * that double is exactly both engines' round(). Returns the final
    * direction and the per-round Rayleigh pairs. */
  private[graft] def svdIterations(s: org.apache.spark.sql.SparkSession,
      d: String): (Array[Long], Seq[(Long, Long, Long)]) = {
    var v = Array.fill(Dims)(SvdScale)
    val rqs = Seq.newBuilder[(Long, Long, Long)]
    for (t <- 1 to SvdIters) {
      val w = svdStep(s, d, v)
      val num = v.zip(w).map { case (a, b) => a * b }.sum
      val den = v.map(x => x * x).sum
      rqs += ((t.toLong, num, den))
      val m = w.map(math.abs).max
      require(m > 0, "svd power step produced the zero vector")
      v = w.map { x =>
        val q = (x * 100L).toDouble / m.toDouble
        BigDecimal(q).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    (v, rqs.result())
  }

  /** The unrolled oracle chain: per round, u/w as the same two dots,
    * the Rayleigh pair from the PREVIOUS direction, and the
    * re-quantized next direction (round + the `-0.0 → +0.0`
    * normalization, the kmeans-chain doctrine). Ends defining
    * `v$SvdIters(pos, v)` and `rq1..rq$SvdIters(iter, rq_num, rq_den)`. */
  private def svdCtes: String = {
    val init =
      s"v0l AS (SELECT list_transform(generate_series(1, $Dims), i -> ${SvdScale}.0) AS vl)"
    val steps = (1 to SvdIters).map { i =>
      s"""u$i AS (
         |  SELECT e.vec_id, ${dot("e.v", "v.vl", Dims)} AS u
         |  FROM e, v${i - 1}l v),
         |w$i AS (
         |  SELECT di.i AS pos, CAST(SUM(e.v[di.i] * u$i.u) AS BIGINT) AS w
         |  FROM e JOIN u$i USING (vec_id),
         |    (SELECT unnest(range(1, ${Dims + 1})) AS i) di
         |  GROUP BY di.i),
         |rq$i AS (
         |  SELECT CAST($i AS BIGINT) AS iter,
         |    CAST(SUM(CAST(v.vl[w.pos] AS BIGINT) * w.w) AS BIGINT) AS rq_num,
         |    CAST(SUM(CAST(v.vl[w.pos] AS BIGINT)
         |      * CAST(v.vl[w.pos] AS BIGINT)) AS BIGINT) AS rq_den
         |  FROM w$i w, v${i - 1}l v),
         |m$i AS (SELECT MAX(ABS(w)) AS m FROM w$i),
         |v$i AS (
         |  SELECT pos, round(w * 100 / m) + 0.0 AS v FROM w$i, m$i),
         |v${i}l AS (SELECT list(v ORDER BY pos) AS vl FROM v$i)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }
}
