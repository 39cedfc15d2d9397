package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): k-means-cluster the embedding space, then look for
  * near-duplicate pairs ONLY within each cluster — pairwise cosine work
  * drops from O(n²) to Σ mᵢ² over cluster sizes, the property that makes
  * exact near-dup pruning tractable at corpus scale (raise `nClusters`
  * so mᵢ ≈ n/k stays bounded; the paper runs ~50k clusters over LAION).
  *
  * Complements [[Ann.cosineNearDupPairs]] (random-hyperplane LSH): LSH
  * bounds candidates by signature agreement per band, SemDeDup by
  * cluster co-membership. The cluster form costs a k-means pass but
  * yields the per-cluster structure curation policies key on (prune
  * rate per semantic region, cluster-aware keep rules), and its recall
  * within a cluster is EXACT — a near-dup pair is missed only when
  * k-means separates it, never by signature chance.
  *
  * Reference scope: the reference engine has no embedding operators —
  * this is a scale extension in the same family as the ANN surface.
  */
object SemDedup {
  import Ann.{asDouble, normalize}

  /** Within-cluster near-duplicate pairs: (id_a < id_b, sim) with exact
    * cosine ≥ `threshold`, candidates bounded by k-means co-membership
    * (deterministic seeding — [[Ann.ivfIndex]]). `nClusters = 1`
    * degenerates to exact all-pairs cosine: the lossless setting the
    * oracle gate pins, proving the cluster plumbing drops nothing when
    * clustering is trivial.
    *
    * Plan shape: centroids broadcast (k×dim doubles); the candidate
    * self-join runs ids-only on the slim (cluster, id) assignment and
    * is merge-pinned — the assignment is one row per corpus document,
    * and the static post-aggregate estimate would happily broadcast it
    * at small SF, a plan that cannot survive corpus scale. Vectors
    * attach by id AFTER pair generation, so the cluster join never
    * ships payloads, and each id belongs to exactly one cluster, so no
    * candidate pair is ever generated twice (no dedup step — unlike the
    * banded LSH front). Cluster-size skew is the residual risk at
    * scale: a hot cluster concentrates its mᵢ² pairs in one task, the
    * shape AQE skew-join splitting handles; the structural fix is
    * raising `nClusters`.
    */
  def semanticNearDupPairs(corpus: DataFrame, id: Column, vec: Column,
                           nClusters: Int = 16, threshold: Double = 0.95,
                           iters: Int = 2, maxTrainRows: Int = 0): DataFrame = {
    val c = corpus.select(id.as("cid"), vec.as("cvec"))
    val (assign, _) = Ann.ivfIndex(c, nClusters, iters, maxTrainRows)
    val slim = assign.select(col("cluster"), col("cid"))
    val cands = slim.select(col("cluster"), col("cid").as("id_a"))
      .hint("merge")
      .join(slim.select(col("cluster"), col("cid").as("id_b")), Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // verify tail shared with cosineNearDupPairs (Ann.verifyCosinePairs)
    // — same normalize-once payload join and rounding by construction,
    // so the two fronts stay interchangeable upstream of a threshold
    Ann.verifyCosinePairs(cands,
      c.select(col("cid").as("id"), normalize(asDouble(col("cvec"))).as("v")),
      threshold)
  }

  /** Canonical survivor labels over the within-cluster pair graph:
    * (doc_id, canonical_id), every document labeled with the minimum id
    * reachable through [[semanticNearDupPairs]] — keep-min-id via
    * large-star/small-star connected components
    * ([[graft.dedup.Dedup.canonicalFromPairs]]), consistent with every
    * pairwise dedup family in the engine. The paper's
    * keep-lowest-centroid-similarity policy is a different choice
    * WITHIN the same component structure — components don't depend on
    * the keep rule, so a caller wanting the paper's policy joins the
    * component labels back to centroid similarities and ranks inside
    * each component. */
  def semanticDedup(corpus: DataFrame, id: Column, vec: Column,
                    nClusters: Int = 16, threshold: Double = 0.95,
                    iters: Int = 2, maxIters: Int = 50,
                    maxTrainRows: Int = 0): DataFrame =
    graft.dedup.Dedup.canonicalFromPairs(
      corpus.select(id.as("doc_id")), col("doc_id"),
      semanticNearDupPairs(corpus, id, vec, nClusters, threshold, iters,
        maxTrainRows),
      maxIters)
}
