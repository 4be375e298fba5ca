package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the
  * (small) query set against the corpus; exact, embarrassingly
  * parallel, the right answer when |queries| · |corpus| fits the
  * cluster. Scale path: IVF — corpus pre-partitioned by
  * nearest-centroid cell; queries probe only `nprobe` cells, cutting
  * scanned vectors by ~|cells|/nprobe at the cost of recall.
  *
  * All element arithmetic is widened to double before multiply/fold so
  * results are IEEE-deterministic (and match the DuckDB oracle).
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic accumulation order.
    * Session-free Column form (interpreted HOF); the frame-level
    * operators below use the native codegen'd [[graft.functions.DotProduct]]
    * instead, which computes the same left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 dp (absorbs engine-side FP noise
    * while keeping 1e-6 discrimination). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, round(dot(a, b) / d, 6)).otherwise(0.0)
  }

  // ---- native codegen'd kernels (need a session to register) ----

  /** Codegen'd dot product — identical fold order and values to
    * [[dot]], but a primitive loop inside whole-stage codegen instead
    * of an interpreted lambda. */
  private[ext] def nDot(spark: org.apache.spark.sql.SparkSession,
                        a: Column, b: Column): Column = {
    graft.GraftFunctions.register(spark)
    call_function("dot_product", a, b)
  }

  /** Cosine from a per-pair dot and PRE-STAGED per-side norms (pass
    * attributes). A self-contained per-pair cosine expression would
    * recompute both norms per row — and the `when` guard duplicates
    * the divisor subtree, so ~5 dot passes per pair where one
    * suffices; every frame-level operator therefore stages
    * `sqrt(dot(v,v))` once per vector BEFORE its join and combines
    * here. Values match the naive form exactly: same folds, same
    * operand order (left norm multiplies first). */
  private[ext] def cosineFromNorms(dot: Column, normA: Column,
                                   normB: Column): Column = {
    val d = normA * normB
    when(d > 0, round(dot / d, 6)).otherwise(0.0)
  }

  /** Brute-force exact top-k: every query scored against every corpus
    * vector (query side broadcast), ranked per query with id
    * tie-break. Norms are computed once per VECTOR before the join —
    * the per-pair work is a single dot product. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val s = corpus.sparkSession
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("__cn", sqrt(nDot(s, col("cv"), col("cv"))))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineFromNorms(
        nDot(s, col("qv"), col("cv")), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic ±1 plane pattern for pseudo-plane `p` over `dim`
    * dimensions, derived from md5 at PLAN time (the pattern depends
    * only on (p, j), so hashing per row/element would be pure waste —
    * it becomes a literal array in the plan). Public so oracle
    * generators can emit the identical patterns as SQL literals. */
  def planeSigns(p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      val h = md.digest(s"$p|$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Sign-bucket key from `nBits` deterministic pseudo-planes: plane p
    * is a ±1 literal pattern over dimensions, so the bucket of a vector
    * is stable across runs with no stored plane matrix. Nearby vectors
    * likely share buckets. `dim` must match the embedding length. */
  def signBucket(vec: Column, nBits: Int, dim: Int = 64): Column = {
    val bits = (0 until nBits).map { p =>
      val signs = lit(planeSigns(p, dim))
      val proj = aggregate(
        zip_with(vec, signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** [[signBucket]] on the native dot kernel — same values (identical
    * fold order), codegen'd projections. */
  private[ext] def signBucketNative(spark: org.apache.spark.sql.SparkSession,
                                    vec: Column, nBits: Int,
                                    dim: Int = 64): Column =
    (0 until nBits).map { p =>
      val proj = nDot(spark, vec, lit(planeSigns(p, dim)))
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  // ---- IVF: k-means cells, centroids held on the driver ----
  //
  // Centroids are k·dim doubles (a few KB) — small enough to live in
  // the PLAN as literal arrays. Cell assignment is then a narrow
  // per-row projection: no join, no window, no shuffle. Lloyd
  // refinement is the classic distributed k-means: assign (narrow) →
  // per-(cell,dim) partial sums (map-side combinable groupBy of
  // k·dim rows) → collect k·dim rows → new literals. Every step
  // survives a 1000-executor 100 TB corpus; the only data collected
  // to the driver is O(k·dim) per iteration.

  // Centroid arithmetic uses the native dot kernel with plan-literal
  // centroid arrays: tiny expression trees (planning is instant), each
  // value computed exactly once per row under its own alias in a
  // staged projection (below). Unrolling over the dimension into
  // element_at chains was tried and rejected: 16 centroids × 64 dims
  // of multiply/add nodes makes whole-stage codegen emit >100 KB
  // methods whose janino compilation costs seconds per stage — pure
  // fixed overhead that dwarfs row work until the corpus reaches
  // hundreds of millions of rows.

  /** Cosine columns `__s0..__s{k-1}` of `vecCol` against each literal
    * centroid, staged as SEPARATE projections (norm first, then sims):
    * each non-cheap value is computed once under its own alias and
    * later steps reference it by attribute. CollapseProject leaves
    * multi-referenced non-cheap aliases alone, so the plan keeps these
    * stages — building the same logic as one nested Column expression
    * duplicates whole subtrees per reference and the optimizer then
    * walks a ~10^5-node tree (measured: minutes of planning). */
  private def withSimCols(df: DataFrame, vecCol: String,
                          cents: Array[Array[Double]]): (DataFrame, Seq[String]) = {
    val spark = df.sparkSession
    val staged = df.withColumn("__vn",
      sqrt(nDot(spark, col(vecCol), col(vecCol))))
    val simCols = cents.toSeq.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val s = if (cn == 0) lit(0.0)
      else when(col("__vn") > 0,
        nDot(spark, col(vecCol), lit(c)) / (col("__vn") * cn)).otherwise(0.0)
      s.as(s"__s$i")
    }
    (staged.select(col("*") +: simCols: _*), cents.indices.map(i => s"__s$i"))
  }

  /** Nearest-centroid index (0-based; first max wins ties) as a
    * `cell` column. */
  private def withBestCell(df: DataFrame, vecCol: String,
                           cents: Array[Array[Double]]): DataFrame = {
    val (withS, names) = withSimCols(df, vecCol, cents)
    val refs = names.map(col)
    val cellExpr = refs.zipWithIndex.init.foldRight(lit(cents.length - 1): Column) {
      case ((s, i), acc) => when(s === col("__m"), lit(i)).otherwise(acc)
    }.cast("int")
    withS.withColumn("__m", greatest(refs: _*))
      .withColumn("cell", cellExpr)
      .drop("__vn" +: "__m" +: names: _*)
  }

  /** Explode the `nprobe` nearest-centroid indices per row into a
    * `cell` column (ties broken by cell index). */
  private def withProbeCells(df: DataFrame, vecCol: String,
                             cents: Array[Array[Double]],
                             nprobe: Int): DataFrame = {
    val (withS, names) = withSimCols(df, vecCol, cents)
    val pairs = array(names.zipWithIndex.map { case (n, i) =>
      struct((-col(n)).as("negs"), lit(i).as("cell"))
    }: _*)
    withS.withColumn("cell", explode(
        slice(transform(array_sort(pairs), p => p.getField("cell")), 1, nprobe)))
      .drop("__vn" +: names: _*)
  }

  /** Deterministic seed centroids: the `k` corpus vectors with the
    * smallest `md5(id)` — a TakeOrdered (per-partition top-k + driver
    * merge of k rows), never a global window/sort. */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int): Array[Array[Double]] =
    corpus.select(asDouble(col(vecCol)).as("__v"),
        md5(col(idCol).cast("string")).as("__h"))
      .orderBy("__h").limit(k)
      .collect().map(_.getSeq[Double](0).toArray)

  /** `iters` Lloyd iterations from the md5 seed. Cells that lose all
    * members keep their previous centroid. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 2): Array[Array[Double]] = {
    var cents = seedCentroids(corpus, idCol, vecCol, k)
    // keep the RAW vector column: pre-casting via transform() is a
    // lambda expr that CollapseProject would inline into every
    // element_at reference; elemD casts per element instead.
    val vecs = corpus.select(col(vecCol).as("__v"))
    for (_ <- 0 until iters) {
      val stats = withBestCell(vecs, "__v", cents)
        .select(col("cell").as("__cell"),
          posexplode(asDouble(col("__v"))).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos")
        .agg(sum("__x").as("__s"), count(lit(1)).as("__n"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** IVF index: corpus + `cell` (nearest k-means centroid, 0-based).
    * At scale `cell` is the partitioning/bucketing key of the stored
    * index; assignment itself is a narrow projection. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int, iters: Int = 2): DataFrame =
    assignCells(corpus, vecCol,
      kmeansCentroids(corpus, idCol, vecCol, nCells, iters))

  /** Add a `cell` column from driver-held centroids. */
  def assignCells(df: DataFrame, vecCol: String,
                  cents: Array[Array[Double]]): DataFrame =
    withBestCell(df, vecCol, cents)

  /** IVF approximate top-k: probe the `nprobe` cells nearest each
    * query (computed in the same narrow projection), exact cosine
    * within those cells only. The probe side is |queries|·nprobe rows
    * — broadcast, so the corpus never shuffles. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16,
              nprobe: Int = 4, iters: Int = 2): DataFrame =
    ivfTopKWith(queries, corpus, idCol, vecCol, k,
      kmeansCentroids(corpus, idCol, vecCol, nCells, iters), nprobe)

  // ---- PQ: product quantization (compressed codes + ADC scan) ----
  //
  // The memory/IO half of the ANN scale story: each corpus vector is
  // stored as m small integer codes (one per dim/m-dim subspace, each
  // the id of the nearest sub-centroid) instead of dim floats — 64
  // floats (256 B) become 4 codes (4 B), a 64× smaller index to scan,
  // cache, and shuffle. Queries never touch raw corpus vectors:
  // per-query lookup tables (dot of the query's sub-slice against each
  // literal sub-centroid, m·ksub doubles) turn scoring into m O(1)
  // array lookups per candidate — asymmetric distance computation.
  // Codebooks are m·ksub·dsub doubles, plan literals like the IVF
  // centroids; composable with IVF (cell-prune, then ADC-score).

  /** L2 nearest-centroid scores, staged one alias per centroid (same
    * CollapseProject reasoning as [[withSimCols]]): score_i =
    * dot(v, cᵢ) − |cᵢ|²/2, whose argmax is the argmin of L2 distance
    * (the classic PQ assignment; cosine would mis-assign unnormalized
    * sub-vectors). */
  private def withL2Scores(df: DataFrame, vecCol: String,
                           cents: Array[Array[Double]]): (DataFrame, Seq[String]) = {
    val spark = df.sparkSession
    val scoreCols = cents.toSeq.zipWithIndex.map { case (c, i) =>
      (nDot(spark, col(vecCol), lit(c)) - lit(c.map(x => x * x).sum / 2))
        .as(s"__p$i")
    }
    (df.select(col("*") +: scoreCols: _*), cents.indices.map(i => s"__p$i"))
  }

  /** Nearest sub-centroid id (0-based, first max wins ties) of
    * `vecCol` as `outCol`. */
  private def withCodeCol(df: DataFrame, vecCol: String,
                          cents: Array[Array[Double]],
                          outCol: String): DataFrame = {
    val (withS, names) = withL2Scores(df, vecCol, cents)
    val refs = names.map(col)
    val codeExpr = refs.zipWithIndex.init.foldRight(lit(cents.length - 1): Column) {
      case ((sc, i), acc) => when(sc === col("__pm"), lit(i)).otherwise(acc)
    }.cast("int")
    withS.withColumn("__pm", greatest(refs: _*))
      .withColumn(outCol, codeExpr)
      .drop("__pm" +: names: _*)
  }

  /** Lloyd iterations with L2 assignment from the md5 seed — the PQ
    * sub-codebook trainer; same distributed shape as
    * [[kmeansCentroids]] (narrow assign → k·dim partial sums →
    * O(k·dim) collect). */
  def kmeansL2(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int = 1): Array[Array[Double]] = {
    var cents = seedCentroids(corpus, idCol, vecCol, k)
    val vecs = corpus.select(col(vecCol).as("__v"))
    for (_ <- 0 until iters) {
      val stats = withCodeCol(vecs, "__v", cents, "__cell")
        .select(col("__cell"),
          posexplode(asDouble(col("__v"))).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos")
        .agg(sum("__x").as("__s"), count(lit(1)).as("__n"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** Per-subspace PQ codebooks: `books(s)(j)` is sub-centroid `j`
    * (dsub = dim/m doubles) of subspace `s`. `m` distributed k-means
    * runs over array slices; requires `m` divides `dim`. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, ksub: Int,
                  iters: Int = 1): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub >= 2, "ksub must be >= 2")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      kmeansL2(
        corpus.select(col(idCol),
          slice(col(vecCol), s * dsub + 1, dsub).as("__sub")),
        idCol, "__sub", ksub, iters)
    }
  }

  /** Encode vectors as PQ codes: adds `code_0..code_{m-1}` (int,
    * 0-based sub-centroid ids). Narrow per-row projection — at scale
    * this runs once at ingest and only the codes are stored. */
  def pqEncode(df: DataFrame, vecCol: String,
               books: Array[Array[Array[Double]]]): DataFrame = {
    val dsub = books(0)(0).length
    books.indices.foldLeft(df) { (acc, s) =>
      withCodeCol(
        acc.withColumn(s"__sub$s", slice(col(vecCol), s * dsub + 1, dsub)),
        s"__sub$s", books(s), s"code_$s")
        .drop(s"__sub$s")
    }
  }

  /** PQ approximate top-k by asymmetric distance: the corpus side is
    * its CODES only (raw corpus vectors are never read after encode);
    * each query carries m lookup-table array columns and scores a
    * candidate with m `element_at`s. Approximate cosine =
    * Σₛ lut_s[code_s] / (|q| · √Σₛ|c_{s,code_s}|²), rounded like the
    * exact path; ties broken by neighbor id. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int,
             books: Array[Array[Array[Double]]]): DataFrame = {
    val s = corpus.sparkSession
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    val cnorm2 = books.map(_.map(c => c.map(x => x * x).sum))
    val codeCols = (0 until m).map(i => s"code_$i")
    val encoded = pqEncode(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "cv", books)
      .withColumn("__cxn", sqrt((0 until m).map(i =>
        element_at(lit(cnorm2(i)), col(s"code_$i") + 1)).reduce(_ + _)))
      .select((("neighbor_id" +: codeCols) :+ "__cxn").map(col): _*)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
    val withLuts = (0 until m).foldLeft(q0) { (acc, i) =>
      acc.withColumn(s"__lut$i", array((0 until ksub).map(j =>
        nDot(s, slice(col("qv"), i * dsub + 1, dsub), lit(books(i)(j)))): _*))
    }.drop("qv")
    val adot = (0 until m).map(i =>
      element_at(col(s"__lut$i"), col(s"code_$i") + 1)).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    encoded.join(broadcast(withLuts), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", when(col("__qn") * col("__cxn") > 0,
        round(adot / (col("__qn") * col("__cxn")), 6)).otherwise(0.0))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Per-dimension scalar-quantization bounds (FAISS `SQ8` analog):
    * ONE bounded aggregation — posexplode → groupBy(dim index) →
    * (min, max) — produces `dim` rows, collected to the driver and
    * re-entering the plan as literals. Unlike k-means centroids these
    * bounds are EXACT and fold-order deterministic (min/max, not
    * floating sums), so an oracle can recompute the identical values
    * in SQL — no memoization needed. Returns `(mins, steps)` with
    * `step = (max - min) / 255`, or 0 for a constant dimension (its
    * codes are all 0 and dequantization returns `min` exactly). */
  def sqBounds(corpus: DataFrame, vecCol: String,
               dim: Int): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(asDouble(col(vecCol))).as(Seq("__pos", "__x")))
      .groupBy("__pos")
      .agg(min(col("__x")).as("__mn"), max(col("__x")).as("__mx"))
      .collect()
    require(rows.length == dim,
      s"sqBounds: saw ${rows.length} dimensions, expected $dim")
    val mins = new Array[Double](dim)
    val steps = new Array[Double](dim)
    rows.foreach { r =>
      val p = r.getInt(0)
      val mn = r.getDouble(1); val mx = r.getDouble(2)
      mins(p) = mn
      steps(p) = if (mx > mn) (mx - mn) / 255.0 else 0.0
    }
    (mins, steps)
  }

  /** Encode vectors as int8 scalar-quantized codes (`sq_code`:
    * array of ints in [0, 255]) — 4× smaller than float32 storage,
    * dequantizable per-dimension as `min + code·step`. Narrow per-row
    * projection; at scale this runs once at ingest and only the codes
    * (plus the staged dequantized norm, if scoring) are stored. */
  def sqEncode(df: DataFrame, vecCol: String,
               mins: Array[Double], steps: Array[Double]): DataFrame = {
    val code =
      zip_with(
        zip_with(asDouble(col(vecCol)), lit(mins), (x, mn) => x - mn),
        lit(steps),
        (d, st) => when(st > 0,
          least(greatest(round(d / st, 0), lit(0.0)), lit(255.0)).cast("int"))
          .otherwise(lit(0)))
    df.withColumn("sq_code", code)
  }

  /** Scalar-quantized approximate top-k: the corpus side is its int8
    * CODES plus one staged dequantized norm — raw vectors are never
    * read after encode. The asymmetric trick keeps per-pair work to a
    * single dot product: with dequantized candidate
    * `c'_i = min_i + code_i·step_i`,
    * `q·c' = Σ q_i·min_i + Σ (q_i·step_i)·code_i`, and both the first
    * term (`__qm`) and the scaled query (`__qs`) are computed ONCE per
    * query before the broadcast join — so scoring a candidate is one
    * codegen'd dot of `__qs` against the code array. Same rounding
    * (6 dp) and `(cosine DESC, id)` tie-break as every other ANN
    * path. */
  def sqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int,
             mins: Array[Double], steps: Array[Double]): DataFrame = {
    val s = corpus.sparkSession
    val dequant =
      zip_with(
        zip_with(col("sq_code"), lit(steps), (c, st) => c * st),
        lit(mins), (x, mn) => x + mn)
    val encoded = sqEncode(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "cv", mins, steps)
      .withColumn("__dq", dequant)
      .withColumn("__cxn", sqrt(nDot(s, col("__dq"), col("__dq"))))
      .select(col("neighbor_id"),
        transform(col("sq_code"), _.cast("double")).as("__cd"), col("__cxn"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
      .withColumn("__qm", nDot(s, col("qv"), lit(mins)))
      .withColumn("__qs", zip_with(col("qv"), lit(steps), (x, st) => x * st))
      .drop("qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    encoded.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("__qn") * col("__cxn") > 0,
          round((col("__qm") + nDot(s, col("__qs"), col("__cd"))) /
            (col("__qn") * col("__cxn")), 6)).otherwise(0.0))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVFPQ — the production ANN composition (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search"): IVF centroids prune
    * the candidate set to the `nprobe` cells nearest each query, and
    * PQ codes score what's left by asymmetric distance. The index the
    * scan reads is `(cell, m codes, code-norm)` per vector — raw
    * corpus vectors are consumed once at encode time and never
    * shuffle; the join is an equi-join on `cell` against the
    * broadcast (queries × nprobe) probe side carrying per-query
    * lookup tables; per-candidate work is m `element_at`s. Both
    * prunings compound: cells cut candidates ~nCells/nprobe-fold,
    * codes cut bytes-per-candidate ~(4·dim/m)-fold. Same
    * tie-breaking and rounding as [[pqTopK]], so with
    * `nprobe = nCells` the result is exactly [[pqTopK]]'s. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, cents: Array[Array[Double]],
                nprobe: Int, books: Array[Array[Array[Double]]]): DataFrame = {
    val s = corpus.sparkSession
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    val cnorm2 = books.map(_.map(c => c.map(x => x * x).sum))
    val codeCols = (0 until m).map(i => s"code_$i")
    val indexed = pqEncode(
        assignCells(corpus, vecCol, cents)
          .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
            col("cell")),
        "cv", books)
      .withColumn("__cxn", sqrt((0 until m).map(i =>
        element_at(lit(cnorm2(i)), col(s"code_$i") + 1)).reduce(_ + _)))
      .select((Seq("neighbor_id", "cell") ++ codeCols :+ "__cxn").map(col): _*)
    val probed = withProbeCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "qv", cents, nprobe)
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
    val withLuts = (0 until m).foldLeft(probed) { (acc, i) =>
      acc.withColumn(s"__lut$i", array((0 until ksub).map(j =>
        nDot(s, slice(col("qv"), i * dsub + 1, dsub), lit(books(i)(j)))): _*))
    }.drop("qv")
    val adot = (0 until m).map(i =>
      element_at(col(s"__lut$i"), col(s"code_$i") + 1)).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    indexed.join(broadcast(withLuts), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", when(col("__qn") * col("__cxn") > 0,
        round(adot / (col("__qn") * col("__cxn")), 6)).otherwise(0.0))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Per-subspace PQ codebooks trained on RESIDUALS `v − cent(cell)`
    * — the codebook half of IVFADC ([[ivfPqResidualTopK]]). Residuals
    * concentrate around the origin once the coarse quantizer has
    * explained the cell structure, so the same ksub codes spend their
    * resolution on the LOCAL geometry instead of re-describing cell
    * positions — the reason FAISS's IVFPQ encodes residuals by
    * default. One narrow residual projection (per-row centroid from
    * one nested literal lookup), then the same distributed
    * sub-k-means as [[pqCodebooks]]. */
  def pqResidualBooks(corpus: DataFrame, idCol: String, vecCol: String,
                      cents: Array[Array[Double]], m: Int, ksub: Int,
                      iters: Int = 1): Array[Array[Array[Double]]] = {
    val dim = cents(0).length
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    val withResid = assignCells(corpus, vecCol, cents)
      .withColumn("__resid", zip_with(asDouble(col(vecCol)),
        element_at(centsLit, col("cell") + 1), (x, c) => x - c))
    pqCodebooks(withResid, idCol, "__resid", dim, m, ksub, iters)
  }

  /** IVFADC proper (Jégou et al. §III): IVF cells prune, PQ codes on
    * the RESIDUAL `v − cent(cell)` score. Versus [[ivfPqTopK]] (which
    * quantizes raw vectors), the stored code only has to describe the
    * within-cell offset, so the same (m, ksub) budget reconstructs
    * tighter and the probed-cell recall ceiling lifts — the exact
    * lever the raw-code variant lacks.
    *
    * Estimated inner product decomposes as
    * `⟨q, v⟩ ≈ ⟨q, cent(cell)⟩ + Σₛ lutₛ[codeₛ]` — the first term is
    * one per (query, probed cell), the LUTs are cell-independent
    * (dot of query sub-slices against the residual sub-centroids,
    * m·ksub doubles per query). The reconstruction norm
    * `|cent + r̂| = √(|cent|² + 2⟨cent, r̂⟩ + |r̂|²)` is assembled
    * per-row from three LITERAL tables (|cent|² per cell; the
    * ⟨cent-slice, sub-centroid⟩ cross table, nCells·ksub doubles per
    * subspace; |sub-centroid|² per code) — computed once on the
    * driver, never shuffled. Index rows are `(cell, m codes, norm)`;
    * raw vectors are consumed at encode time and never move. Same
    * rounding/tie-breaks as [[pqTopK]]. */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        cents: Array[Array[Double]], nprobe: Int,
                        books: Array[Array[Array[Double]]]): DataFrame = {
    val s = corpus.sparkSession
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    val dim = cents(0).length
    require(m * dsub == dim,
      s"books cover ${m * dsub} dims, centroids have $dim")
    val rn2 = books.map(_.map(c => c.map(x => x * x).sum))
    val cnorm2 = cents.map(c => c.map(x => x * x).sum)
    // crTable(s)(cell·ksub + j) = ⟨cent(cell) sub-slice s, books(s)(j)⟩
    val crTable: Array[Array[Double]] = Array.tabulate(m) { sub =>
      val out = new Array[Double](cents.length * ksub)
      for (c <- cents.indices; j <- 0 until ksub) {
        var acc = 0.0
        var t = 0
        while (t < dsub) {
          acc += cents(c)(sub * dsub + t) * books(sub)(j)(t)
          t += 1
        }
        out(c * ksub + j) = acc
      }
      out
    }
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    val codeCols = (0 until m).map(i => s"code_$i")
    val indexed = pqEncode(
        assignCells(corpus, vecCol, cents)
          .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
            col("cell"))
          .withColumn("__resid", zip_with(asDouble(col("cv")),
            element_at(centsLit, col("cell") + 1), (x, c) => x - c)),
        "__resid", books)
      .withColumn("__cr", (0 until m).map(i =>
        element_at(lit(crTable(i)),
          col("cell") * ksub + col(s"code_$i") + 1)).reduce(_ + _))
      .withColumn("__rn2", (0 until m).map(i =>
        element_at(lit(rn2(i)), col(s"code_$i") + 1)).reduce(_ + _))
      .withColumn("__cxn", sqrt(
        element_at(lit(cnorm2), col("cell") + 1) +
          lit(2.0) * col("__cr") + col("__rn2")))
      .select((Seq("neighbor_id", "cell") ++ codeCols :+ "__cxn").map(col): _*)
    val probed = withProbeCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "qv", cents, nprobe)
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
      .withColumn("__qc",
        nDot(s, col("qv"), element_at(centsLit, col("cell") + 1)))
    val withLuts = (0 until m).foldLeft(probed) { (acc, i) =>
      acc.withColumn(s"__lut$i", array((0 until ksub).map(j =>
        nDot(s, slice(col("qv"), i * dsub + 1, dsub), lit(books(i)(j)))): _*))
    }.drop("qv")
    val adot = (0 until m).map(i =>
      element_at(col(s"__lut$i"), col(s"code_$i") + 1)).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    indexed.join(broadcast(withLuts), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", when(col("__qn") * col("__cxn") > 0,
        round((col("__qc") + adot) / (col("__qn") * col("__cxn")), 6))
        .otherwise(0.0))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** [[ivfTopK]] against caller-held centroids — lets a caller build
    * the index once (or persist centroids) and share them across
    * queries and oracle generation. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, k: Int, cents: Array[Array[Double]],
                  nprobe: Int): DataFrame = {
    val s = corpus.sparkSession
    val indexed = assignCells(corpus, vecCol, cents)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
      .withColumn("__cn", sqrt(nDot(s, col("cv"), col("cv"))))
    val probed = withProbeCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "qv", cents, nprobe)
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    indexed.join(broadcast(probed), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineFromNorms(
        nDot(s, col("qv"), col("cv")), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF as a STORAGE layout: the corpus written `partitionBy(cell)`,
    * so serving skips non-probed cells at the SCAN — partition
    * pruning, not a post-scan filter. This is the on-disk shape of a
    * production vector index: at 100 TB the win is not arithmetic but
    * IO — a `nprobe/nCells` fraction of the index FILES is read at
    * all. Rewrite cost is one cell exchange, paid once per index
    * build. */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    cents: Array[Array[Double]], outDir: String): Unit = {
    // repartition on cell first: one file per cell dir instead of up
    // to tasks×cells (same file-count audit as Dedup.writeHashIndex);
    // explicit core-count parallelism — the write is file-count-bound
    // (see Dedup.layoutWriteParallelism)
    JobLabel(corpus.sparkSession, "writeIvfIndex: build+write layout") {
      assignCells(corpus, vecCol, cents)
        .select(col(idCol), col(vecCol), col("cell"))
        .repartition(Dedup.layoutWriteParallelism(corpus.sparkSession,
          cents.length.toLong), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(outDir)
    }
    writeIvfLayout(outDir, cents, corpus.sparkSession)
  }

  private val IvfLayoutMarker = "_graft_ivf_layout"

  /** Persist the centroids IN the layout (one line per centroid,
    * shortest-round-trip `Double.toString` — parses back to the
    * identical bits), the vector twin of `Dedup`'s band/hash layout
    * markers: the centroids ARE the index's layout constants, and a
    * maintainer assigning new rows under different centroids than
    * the stored rows silently corrupts cells. */
  private def writeIvfLayout(dir: String, cents: Array[Array[Double]],
                             s: org.apache.spark.sql.SparkSession): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/$IvfLayoutMarker"), true)
    try out.write(cents.map(_.mkString(",")).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The centroids persisted in a [[writeIvfIndex]] marker — the
    * EXACT doubles the build assigned cells with (bit-identical
    * through the decimal round trip). Raises on a dir that is not a
    * [[writeIvfIndex]] layout. The streaming maintenance sink reads
    * these instead of accepting centroids, so an unattended
    * maintainer can never drift from the on-disk assignment. */
  def ivfIndexCentroids(indexDir: String,
                        s: org.apache.spark.sql.SparkSession): Array[Array[Double]] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir), s.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$IvfLayoutMarker")
    require(fs.exists(p), {
      // distinguish "pre-marker index" (cell= partition dirs present,
      // marker absent) from "not an index at all"
      val dirP = new org.apache.hadoop.fs.Path(indexDir)
      val preMarker = fs.exists(dirP) &&
        fs.listStatus(dirP).exists(_.getPath.getName.startsWith("cell="))
      if (preMarker)
        s"$indexDir has cell= partition dirs but no $IvfLayoutMarker " +
          "marker — a pre-marker writeIvfIndex layout; rebuild it with " +
          "writeIvfIndex (indexes are rebuildable) to persist the centroids"
      else
        s"$indexDir is not a writeIvfIndex layout (no $IvfLayoutMarker marker)"
    })
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    text.linesIterator.filter(_.nonEmpty)
      .map(_.split(",").map(_.toDouble)).toArray
  }

  /** The distinct probe-cell union of a query set — bounded at
    * `nCells` ints (driver-data class of the centroids). Public so
    * callers can gate on HOW MUCH of a [[writeIvfIndex]] layout a
    * query batch will actually read. */
  def probeCellSet(queries: DataFrame, vecCol: String,
                   cents: Array[Array[Double]], nprobe: Int): Array[Int] =
    withProbeCells(queries.select(col(vecCol).as("__pv")), "__pv",
      cents, nprobe)
      .select("cell").distinct().collect().map(_.getInt(0)).sorted

  /** Serve top-k from a [[writeIvfIndex]] layout: probe cells are
    * collected once (bounded — at most `nCells` ints, the same driver
    * class as the centroids) and pushed into the scan as a partition
    * `IN` filter; everything after is [[ivfTopKWith]]'s scoring join.
    * Results are identical to [[ivfTopKWith]] with the same centroids
    * and `nprobe` — the layout changes WHERE the bytes come from, not
    * the answer. */
  def ivfPartitionedTopK(indexDir: String, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int,
                         cents: Array[Array[Double]],
                         nprobe: Int): DataFrame =
    ivfPartitionedTopKWithEvidence(
      indexDir, queries, idCol, vecCol, k, cents, nprobe)._1

  /** [[ivfPartitionedTopK]] plus its narrowing EVIDENCE — the probed
    * cell set (the serve's own internal collect) and the layout's
    * cell count. The streaming gate sinks previously called
    * [[probeCellSet]] first and the serve second, paying the
    * assignment pass twice for a number the serve had already
    * computed (see `Dedup.minhashMatchesIndexedWithEvidence`). */
  def ivfPartitionedTopKWithEvidence(
      indexDir: String, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: Array[Array[Double]],
      nprobe: Int): (DataFrame, Array[Int], Int) = {
    val s = queries.sparkSession
    val probed = withProbeCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "qv", cents, nprobe)
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
    val cellSet = probed.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    // list + read ONLY the probed cell dirs (Dedup.
    // readPrunedIntPartitions): a query batch against a billion-row
    // layout must not pay a full-layout file listing to open nprobe
    // cells
    val indexed = Dedup.readPrunedIntPartitions(s, indexDir, "cell", cellSet)
      .where(col("cell").isin(cellSet.toIndexedSeq.map(_.asInstanceOf[Any]): _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
      .withColumn("__cn", sqrt(nDot(s, col("cv"), col("cv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = indexed.join(broadcast(probed), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineFromNorms(
        nDot(s, col("qv"), col("cv")), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
    (topk, cellSet, cents.length)
  }

  /** Incremental maintenance of a [[writeIvfIndex]] layout under a CDC
    * change set — the weekly operation of a LIVING vector corpus,
    * where the 100 TB anti-pattern is rebuilding the whole index for
    * an upsert batch. Composes [[graft.etl.Merge.latestChanges]]
    * (latest-`seqCol` change per key wins) with cell-local rewrite:
    *
    *  1. LOCATE: one column-pruned scan of the index projecting only
    *     `(id, cell)` against the broadcast touched-id set finds the
    *     cells that currently HOLD a touched id (an updated vector may
    *     move cells, so its old cell must rewrite too; a delete's cell
    *     is only discoverable here). No vector bytes are read.
    *  2. ASSIGN: upserted vectors take their cells from the broadcast
    *     centroid literals — the same [[assignCells]] the build used.
    *  3. REWRITE: only the union of old+new cells re-materializes —
    *     survivors (touched cells minus touched ids) plus the freshly
    *     assigned upserts land in a sibling temp layout, and each
    *     touched `cell=K/` directory is swapped in whole (a cell
    *     emptied by deletes is removed). Untouched cells' files are
    *     never opened for write — byte-identical before and after,
    *     which `q_sim_ivf_update` gates on checksums.
    *
    * Serving ([[ivfPartitionedTopK]]) over the updated layout is
    * hash-exact with a full rebuild from the CDC-applied corpus — the
    * layout changes WHERE bytes live, never the answer. Returns the
    * touched cell ids (sorted). */
  def updateIvfIndex(indexDir: String, changes: DataFrame, idCol: String,
                     vecCol: String, cents: Array[Array[Double]],
                     seqCol: String = "seq", opCol: String = "op"): Array[Int] = {
    val s = changes.sparkSession
    // the layout's own marker is the source of truth: assigning new
    // rows under DIFFERENT centroids than the stored rows corrupts
    // cells silently (the mismatch class the band/hash markers close)
    val stored = ivfIndexCentroids(indexDir, s)
    require(stored.length == cents.length &&
        stored.indices.forall(i =>
          java.util.Arrays.equals(stored(i), cents(i))),
      s"caller centroids differ from the $IvfLayoutMarker marker at " +
        s"$indexDir — maintain with ivfIndexCentroids(indexDir) or " +
        "rebuild the index")
    val latest = graft.etl.Merge.latestChanges(changes, idCol, seqCol)
    val touchedIds = latest.select(col(idCol)).distinct()
    val upserts = latest.where(col(opCol) =!= lit("d"))
      .select(col(idCol), col(vecCol))
    val newAssigned = assignCells(upserts, vecCol, cents)
      .select(col(idCol), col(vecCol), col("cell"))
    // old cells and new cells in ONE distinct+collect (see
    // Dedup.updateBandIndex) — one driver round trip per micro-batch
    val touched = JobLabel(s, "updateIvfIndex: locate touched cells") {
      s.read.parquet(indexDir)
        .select(col(idCol), col("cell"))
        .join(broadcast(touchedIds), Seq(idCol))
        .select("cell")
        .unionByName(newAssigned.select("cell"))
        .distinct().collect().map(_.getInt(0)).sorted
    }
    if (touched.isEmpty) return touched
    val touchedAny = touched.toIndexedSeq.map(_.asInstanceOf[Any])
    // survivors live only in the touched cells — list+read exactly
    // those dirs instead of discovering the whole layout's files
    val survivors = Dedup.readPrunedIntPartitions(s, indexDir, "cell", touched)
      .where(col("cell").isin(touchedAny: _*))
      .join(broadcast(touchedIds), Seq(idCol), "left_anti")
      .select(col(idCol), col(vecCol), col("cell"))
    val tmpDir = s"$indexDir.upd-${java.util.UUID.randomUUID().toString.take(8)}"
    // temp layout fully materializes BEFORE any index file moves — a
    // failure mid-write leaves the live index untouched
    JobLabel(s, "updateIvfIndex: rewrite touched cells") {
      survivors.unionByName(newAssigned)
        // one file per rewritten dir; explicit core-count parallelism —
        // the write is file-count-bound (see Dedup.layoutWriteParallelism)
        .repartition(Dedup.layoutWriteParallelism(s, cents.length.toLong),
          col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(tmpDir)
    }
    // crash-safe swap (see Dedup.swapPrefixDirs): live dirs rename
    // ASIDE into tmpDir before replacements install; tmpDir — holding
    // every displaced dir — is deleted only after all cells land
    Dedup.swapPrefixDirs(s, indexDir, tmpDir,
      touched.toIndexedSeq.map(k => s"cell=$k"))
    touched
  }

  /** Exact re-rank (refine) of a quantized shortlist — the second
    * stage of the standard two-stage production ANN shape (FAISS's
    * `IndexRefineFlat`): any approximate path (PQ / SQ8 / IVFPQ / IVF)
    * run with `k = shortlist ≫ final k` proposes candidates cheaply,
    * and only those |queries|·shortlist (query, neighbor) pairs are
    * re-scored with EXACT full-width cosine. This is what turns the
    * quantized menu's compressed-domain recall (0.2-ish on hard
    * fixtures) into production recall: the ranking that decides the
    * final top-k is exact; the quantizer only has to get the true
    * neighbors INTO the shortlist.
    *
    * Scale shape: `shortlist` must expose (query_id, neighbor_id) —
    * bounded at |queries|·shortlist rows, so it BROADCASTS; the full
    * corpus vectors are fetched by one broadcast equi-join on
    * neighbor id (the corpus never shuffles and is scanned once,
    * pruned to id+vector columns); queries broadcast likewise. Same
    * 6-dp rounding and (cosine DESC, id) tie-break as every other ANN
    * path, so `rerank(bruteTopK(k=shortlist))` is exactly
    * [[bruteTopK]] — the identity the spec pins. */
  def rerankTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, k: Int, shortlist: DataFrame): DataFrame = {
    val s = corpus.sparkSession
    val pairs = shortlist.select(col("query_id"), col("neighbor_id"))
    val full = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("__cn", sqrt(nDot(s, col("cv"), col("cv"))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    full.join(broadcast(pairs), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", cosineFromNorms(
        nDot(s, col("qv"), col("cv")), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Matryoshka funnel retrieval (Kusupati et al., arXiv:2205.13147):
    * embeddings trained with matryoshka losses pack most of their
    * signal into the leading components, so serving can SHORTLIST with
    * only the first `dims` components and RE-RANK the shortlist at
    * full width — the published two-stage funnel.
    *
    * Scale shape: stage 1 is the corpus-sized scan, and it touches
    * only the `dims`-prefix (store the prefix as its own column and
    * parquet column pruning makes the byte saving real — dims/dim of
    * the vector bytes, e.g. 16/64 = 4×); the full vectors are fetched
    * by id in stage 2 for |queries|·`shortlist` rows only — a
    * broadcast-able fraction, never a second corpus scan of vector
    * arithmetic. Both stages rank with 6-dp-rounded cosine and id
    * tie-breaks, so results are deterministic and oracle-exact.
    * `shortlist >= corpus` degenerates to exact [[bruteTopK]]. */
  def matryoshkaTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int, dims: Int,
                     shortlist: Int): DataFrame = {
    require(dims > 0, s"dims=$dims")
    require(k > 0 && shortlist >= k, s"k=$k shortlist=$shortlist")
    val s = corpus.sparkSession
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        slice(col(vecCol), 1, dims).as("qt"))
      .withColumn("__qtn", sqrt(nDot(s, col("qt"), col("qt"))))
    // stage 1: truncated-prefix scan — the only corpus-sized pass
    val ct = corpus.select(col(idCol).as("neighbor_id"),
        slice(col(vecCol), 1, dims).as("ct"))
      .withColumn("__ctn", sqrt(nDot(s, col("ct"), col("ct"))))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("tcos").desc, col("neighbor_id"))
    val shortl = ct.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("tcos", cosineFromNorms(
        nDot(s, col("qt"), col("ct")), col("__qtn"), col("__ctn")))
      .withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("qv"))
    // stage 2: full-width re-rank of the shortlist only (vectors
    // fetched by id — bounded rows, not a corpus scan)
    val full = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    shortl.join(full, Seq("neighbor_id"))
      .withColumn("__qn", sqrt(nDot(s, col("qv"), col("qv"))))
      .withColumn("__cn", sqrt(nDot(s, col("cv"), col("cv"))))
      .withColumn("cosine", cosineFromNorms(
        nDot(s, col("qv"), col("cv")), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
