package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ml.Featurize

/** Sparse full-text retrieval over a document corpus — the BM25
  * inverted-index scorer every training-data pipeline ends up needing
  * (contamination probes, targeted data selection, eval-set retrieval,
  * hard-negative mining).
  *
  * Shape at 100 TB: the corpus side is a POSTINGS build — one tokenize
  * pass, one explode, one map-side-combinable `(doc, term)` count —
  * exactly the layout a stored inverted index would persist
  * (term-bucketed parquet); the query side is tiny and BROADCAST
  * end-to-end, so the corpus never reshuffles to answer a query batch.
  * Global collection statistics (N, average doc length) reduce to one
  * row; per-term document frequencies are semi-joined down to the
  * query vocabulary BEFORE broadcasting, so the plan never carries the
  * full vocabulary anywhere. Scoring is a narrow projection over the
  * postings scan; the only wide step is the final
  * `(query, doc) -> sum` partial-aggregated hash agg plus the
  * per-query top-k window over candidate rows (bounded by postings of
  * query terms, not the corpus).
  */
object Retrieval {

  /** The stored inverted index: `postings` is one row per
    * `(__did, __len, __term, __tf)` — at scale this is written once,
    * term-bucketed, and every query batch reads it instead of the
    * corpus; `docLens` is one `(__did, __len)` row per document
    * (INCLUDING zero-token documents, which carry no postings but
    * still count toward N and avgdl). Both sides of the one tokenize
    * pass a build performs. */
  final case class Bm25Index(postings: DataFrame, docLens: DataFrame)

  /** Build the BM25 index from a corpus: one tokenize pass feeds both
    * the postings explode+count (map-side partials shrink the shuffle
    * to distinct `(doc, term)` pairs per task) and the per-doc length
    * table. Callers at scale persist both frames (e.g.
    * `partitionBy(bucket of __term)` for postings) and serve every
    * query batch from the materialized index — the corpus is never
    * touched again. */
  def buildBm25Index(corpus: DataFrame, idCol: String,
                     textCol: String): Bm25Index = {
    val docToks = corpus.select(col(idCol).as("__did"),
      Featurize.tokensCol(col(textCol)).as("__t"))
    val postings = docToks
      .select(col("__did"), size(col("__t")).cast("long").as("__len"),
        explode(col("__t")).as("__term"))
      .groupBy("__did", "__len", "__term")
      .agg(count(lit(1)).cast("double").as("__tf"))
    val docLens = docToks
      .select(col("__did"), size(col("__t")).cast("long").as("__len"))
    Bm25Index(postings, docLens)
  }

  /** Okapi BM25 top-k: for each query document, the `k` highest-scoring
    * corpus documents under
    * `idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))` summed
    * over the query's DISTINCT terms, with the Lucene idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` (always positive). Scores are
    * rounded to 6 dp BEFORE ranking and ties break on `doc_id`, so the
    * ranking is FP-noise-proof and cross-engine deterministic. Queries
    * that are themselves corpus members match themselves (callers
    * filter `query_id = doc_id` if self-hits are unwanted).
    *
    * Ad-hoc convenience form — builds the index inline (the plan
    * re-derives the tokenize per index use; fine for one-shot runs).
    * Repeated query batches should [[buildBm25Index]] once, persist,
    * and call [[bm25TopKWith]]. Output:
    * `(query_id, doc_id, score, rank)`. */
  def bm25TopK(queries: DataFrame, corpus: DataFrame,
               idCol: String, textCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKWith(buildBm25Index(corpus, idCol, textCol), queries,
      idCol, textCol, k, k1, b)

  /** [[bm25TopK]] against a pre-built (typically materialized)
    * [[Bm25Index]]: query-time work never tokenizes the corpus — the
    * collection stats reduce from the `(doc, len)` table, document
    * frequencies from the postings (semi-joined down to the query
    * vocabulary BEFORE aggregating), and scoring is a narrow
    * projection over the postings scan. */
  def bm25TopKWith(index: Bm25Index, queries: DataFrame,
                   idCol: String, textCol: String, k: Int,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k=$k")
    // collection stats: one row (exact integer sums — avgdl is the
    // same double in every engine)
    val stats = index.docLens
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__len")).as("__sumlen"))
    // distinct query terms; tiny, broadcast everywhere below
    val qTerms = queries
      .select(col(idCol).as("query_id"),
        explode(Featurize.tokensCol(col(textCol))).as("__term"))
      .distinct()
    // document frequency ONLY for the query vocabulary: semi-join the
    // per-term counts down before they go near a broadcast
    val dfreq = index.postings
      .join(broadcast(qTerms.select("__term").distinct()), Seq("__term"),
        "left_semi")
      .groupBy("__term")
      .agg(count(lit(1)).cast("double").as("__df"))
    val avgdl = col("__sumlen").cast("double") / col("__n").cast("double")
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("__df") + 0.5) / (col("__df") + 0.5))
    val tfNorm = col("__tf") * (k1 + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("__len") / avgdl))
    val contrib = index.postings
      .join(broadcast(qTerms), Seq("__term"))
      .join(broadcast(dfreq), Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("__did").as("doc_id"),
        (idf * tfNorm).as("__c"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    contrib.groupBy("query_id", "doc_id")
      .agg(round(sum(col("__c")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }

  /** TF-IDF keyword extraction: the `k` highest `tf·idf` terms per
    * document — the corpus-contrastive summarizer behind datasheet
    * topic columns, dedup explainers, and cheap doc tags. Uses the
    * smoothed idf `ln((N+1)/(df+1)) + 1` (the sklearn `smooth_idf`
    * form — never negative, defined even for df = N); scores round to
    * 6 dp BEFORE ranking and ties break on the term string, so the
    * ranking is FP-noise-proof and cross-engine deterministic.
    * `minDf` prunes the long hapax tail at the document-frequency agg
    * (a term in fewer than `minDf` docs never reaches the join).
    *
    * Scale shape: ONE tokenize pass (the [[buildBm25Index]] postings
    * explode, map-side combined to distinct `(doc, term)` rows); df
    * is one fixed-width agg over postings; the postings⇄df join
    * shuffles on `__term` — both sides term-partitioned, never
    * broadcast (vocabulary scales with the corpus); the collection
    * size rides a broadcast 1-row cross join; top-k is a per-doc
    * window over that document's distinct terms only. Output:
    * `(id, term, tf, df, score, rank)`, rank 1..k. */
  def tfIdfKeywords(corpus: DataFrame, idCol: String, textCol: String,
                    k: Int = 5, minDf: Long = 1): DataFrame = {
    require(k > 0, s"k=$k")
    require(minDf >= 1, s"minDf=$minDf")
    val idx = buildBm25Index(corpus, idCol, textCol)
    val stats = idx.docLens.agg(count(lit(1)).cast("double").as("__n"))
    val dfreq = idx.postings.groupBy("__term")
      .agg(count(lit(1)).cast("double").as("__df"))
      .where(col("__df") >= minDf.toDouble)
    val idf = log((col("__n") + 1.0) / (col("__df") + 1.0)) + 1.0
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    idx.postings
      .join(dfreq, Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col("__did").as(idCol), col("__term").as("term"),
        col("__tf").cast("long").as("tf"),
        col("__df").cast("long").as("df"),
        round(col("__tf") * idf, 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Reciprocal-rank fusion of two ranked candidate lists (the
    * standard hybrid-search combiner, Cormack et al.):
    * `rrf = Σ 1/(c + rank)` over the lists an item appears in.
    * Inputs are `(query_id, doc_id, rank)`-shaped top-k outputs
    * (e.g. [[bm25TopK]] and `Similarity.bruteTopK`/`ivfPqTopK`
    * renamed), so BOTH sides are already bounded by |queries|·k —
    * the fusion is a full-outer join on `(query_id, doc_id)` plus a
    * per-query top-k window over at most 2k candidates per query:
    * broadcast-scale work no matter how big the corpus behind the
    * lists was. Scores round to 6 dp before ranking; ties break on
    * doc_id. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int,
              c: Int = 60): DataFrame = {
    require(k > 0 && c >= 0, s"k=$k c=$c")
    def side(df: DataFrame, out: String): DataFrame =
      df.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(c).cast("double") + col("rank").cast("double")))
          .as(out))
    val fused = side(sparse, "__s")
      .join(side(dense, "__d"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(coalesce(col("__s"), lit(0.0)) + coalesce(col("__d"), lit(0.0)),
          6).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "rrf", "rank")
  }

  /** Hard-negative mining for contrastive retrieval training (the
    * BM25-negatives recipe of DPR, Karpukhin et al.,
    * arXiv:2004.04906): retrieve `depth` candidates per query, remove
    * the KNOWN positives, keep the `nNeg` highest-ranked
    * non-positives — documents the ranker finds plausible but that
    * are not relevant, exactly the training signal a bi-encoder
    * needs.
    *
    * Scale shape: the corpus-sized work is [[bm25TopK]]'s (audited
    * there); everything after operates on |queries|·depth rows — the
    * positives anti-join (positives are |queries|·few, broadcast) and
    * a per-query re-rank window. Output:
    * `(query_id, doc_id, score, neg_rank)`. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    positives: DataFrame, idCol: String, textCol: String,
                    nNeg: Int, depth: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(nNeg > 0 && depth >= nNeg, s"nNeg=$nNeg depth=$depth")
    val retrieved = bm25TopK(queries, corpus, idCol, textCol, depth, k1, b)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rank"))
    retrieved
      .join(broadcast(positives.select("query_id", "doc_id")),
        Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .where(col("neg_rank") <= nNeg)
      .select("query_id", "doc_id", "score", "neg_rank")
  }

  /** Ranking-quality evaluation of a retrieval run against a binary
    * relevance truth set — recall@k, precision@k, reciprocal rank and
    * nDCG@k per query, as a DataFrame operator (the retrieval-stack
    * analog of `ml.Evaluator`: the metric lives IN the engine, so
    * serving-path evaluation and the recall benchmark harness share
    * one implementation and cannot drift).
    *
    * Inputs: `results` shaped `(queryCol, docCol, rankCol)` (any
    * top-k output here — [[bm25TopK]], [[rrfFuse]],
    * `Similarity.*TopK`); `truth` shaped `(queryCol, docCol)`, one
    * row per relevant document (deduped defensively). The metric
    * universe is the TRUTH's query set: a query with no surviving
    * results scores 0 everywhere, and result-set queries absent from
    * truth are dropped (they have no defined relevance).
    *
    * Determinism: recall/precision/RR are exact rationals; DCG and
    * IDCG fold 1/log2(rank+1) in ASCENDING rank order over an
    * at-most-k element array (collect_list → array_sort → aggregate),
    * so the floating sum ORDER is fixed and two engines produce the
    * identical double, rounded to 6 dp. No metric touches corpus
    * text: the whole evaluation is |truth| + |queries|·k rows —
    * broadcast-scale regardless of corpus size, one equi-join + two
    * aggregations.
    *
    * Output: `(queryCol, n_rel, n_hit, recall_at_k, precision_at_k,
    * rr, ndcg_at_k)`, one row per truth query. Mean the columns for
    * corpus-level MRR/recall (see [[rankingSummary]]). */
  def rankingMetrics(results: DataFrame, truth: DataFrame,
                     queryCol: String, docCol: String, rankCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val res = results.select(col(queryCol).as("__q"),
        col(docCol).as("__d"), col(rankCol).cast("long").as("__r"))
      .where(col("__r") <= k)
    val tr = truth.select(col(queryCol).as("__q"), col(docCol).as("__d"))
      .distinct()
    val rel = tr.groupBy("__q").agg(count(lit(1)).as("n_rel"))
    // hit ranks per query, folded in sorted order (deterministic FP)
    def dcgOf(ranks: Column): Column =
      aggregate(array_sort(ranks), lit(0.0),
        (acc, r) => acc + lit(1.0) / log2(r.cast("double") + lit(1.0)))
    val perQ = res.join(tr, Seq("__q", "__d"))
      .groupBy("__q")
      .agg(count(lit(1)).as("__nh"),
        min(col("__r")).as("__minr"),
        dcgOf(collect_list(col("__r"))).as("__dcg"))
    val idcg = dcgOf(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))))
    rel.join(perQ, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        col("n_rel"),
        coalesce(col("__nh"), lit(0L)).as("n_hit"),
        round(coalesce(col("__nh"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), 6).as(s"recall_at_$k"),
        round(coalesce(col("__nh"), lit(0L)).cast("double") / k, 6)
          .as(s"precision_at_$k"),
        round(coalesce(lit(1.0) / col("__minr").cast("double"), lit(0.0)), 6)
          .as("rr"),
        round(coalesce(col("__dcg"), lit(0.0)) / idcg, 6).as(s"ndcg_at_$k"))
  }

  /** Corpus-level summary of [[rankingMetrics]]: one row —
    * `(n_queries, recall_at_k, precision_at_k, mrr, ndcg_at_k)`,
    * each the mean of the per-query column (MRR is by definition the
    * mean RR). One extra aggregation over |queries| rows. */
  def rankingSummary(results: DataFrame, truth: DataFrame,
                     queryCol: String, docCol: String, rankCol: String,
                     k: Int): DataFrame = {
    val m = rankingMetrics(results, truth, queryCol, docCol, rankCol, k)
    m.agg(count(lit(1)).as("n_queries"),
      round(avg(col(s"recall_at_$k")), 6).as(s"recall_at_$k"),
      round(avg(col(s"precision_at_$k")), 6).as(s"precision_at_$k"),
      round(avg(col("rr")), 6).as("mrr"),
      round(avg(col(s"ndcg_at_$k")), 6).as(s"ndcg_at_$k"))
  }
}
