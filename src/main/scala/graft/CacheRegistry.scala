package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry for the engine's memoized + persisted lineages
  * (minhash/embedding pair sets and their intermediate materializations).
  *
  * Why central: several query families share one expensive lineage
  * (dedup_minhash_pairs / dedup_minhash_survivors; emb_near_dup_pairs /
  * emb_text_crosscheck). Sharing is by memoized DataFrame + persist() of
  * the bounded results, so the SECOND consumer reuses materialized rows,
  * not just a plan. That storage must also be releasable: the harness
  * (Verify/Bench) calls [[clear]] before stopping its session, so no
  * pinned blocks outlive a verify+bench cycle, and a long-lived session
  * can evict explicitly between scale factors.
  *
  * ASSUMPTION (documented contract): the parquet tables under a given
  * `dir` are immutable for the lifetime of a session's cache entry.
  * Rewriting an input dir mid-session without calling [[clear]] would
  * serve stale cached pair results — the bench/verify flow never does
  * this; interactive users get `clear(session)`.
  */
object CacheRegistry {

  private val memos =
    new ConcurrentHashMap[(String, SparkSession, String), DataFrame]()
  private val tracked =
    new ConcurrentHashMap[SparkSession, java.util.List[DataFrame]]()

  /** Memoize `build` per (tag, session, dir). Dead-session entries are
    * evicted on the way in (their cached blocks died with the executor,
    * so only the map entry needs dropping).
    */
  def memo(tag: String, s: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    memos.keySet.removeIf(k => k._2.sparkContext.isStopped)
    tracked.keySet.removeIf(k => k.sparkContext.isStopped)
    // NOT computeIfAbsent: memoized lineages nest (dedup_cc_labels
    // builds on the dedup_minhash_pairs memo), and a computeIfAbsent
    // whose mapping function re-enters the same ConcurrentHashMap
    // throws "Recursive update" WHEN the two keys land in one bin — a
    // hash-dependent intermittent failure. get + putIfAbsent tolerates
    // re-entry; a concurrent race at worst builds a plan twice.
    val key = (tag, s, dir)
    val existing = memos.get(key)
    if (existing != null) existing
    else {
      val built = build
      val prev = memos.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  private val buildLocks =
    new ConcurrentHashMap[(String, SparkSession, String), Object]()

  /** [[memo]] for builders with FILESYSTEM SIDE EFFECTS (the served
    * index writers): serializes the build per key so it runs exactly
    * once per (session, dir). The plain memo's documented race —
    * "at worst builds a plan twice" — is benign for pure plans but NOT
    * for a build that appends to an on-disk index (a double build would
    * append the upsert batch twice, silently corrupting codes_upsert
    * for the session). Monitors are per-key; JVM monitors are
    * reentrant, so the side-effecting builders' same-thread nesting
    * (upsert-applied -> upsert-base -> served-index) is safe, and
    * because that nesting always acquires in the same fixed order,
    * cross-thread acquisition cannot deadlock.
    */
  def memoExactlyOnce(tag: String, s: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    val key = (tag, s, dir)
    val existing = memos.get(key)
    if (existing != null) existing
    else {
      val lock = buildLocks.computeIfAbsent(key, _ => new Object)
      lock.synchronized {
        val again = memos.get(key)
        if (again != null) again
        else {
          val built = build
          memos.put(key, built)
          built
        }
      }
    }
  }

  /** Read an existing memo entry without building — for frames that are
    * registered as a SIDE EFFECT of another tag's build (e.g. the CC
    * star-edge frame registered by the minhash pair build). Callers
    * must have forced the owning build first.
    */
  def get(tag: String, s: SparkSession, dir: String): Option[DataFrame] =
    Option(memos.get((tag, s, dir)))

  /** Persist `df` and record the handle so [[clear]] can unpersist it. */
  def track(s: SparkSession, df: DataFrame): DataFrame = {
    df.persist()
    tracked
      .computeIfAbsent(s,
        _ => java.util.Collections.synchronizedList(
          new java.util.ArrayList[DataFrame]()))
      .add(df)
    df
  }

  /** Unpersist every tracked lineage of `s` and drop its memo entries —
    * the eviction hook the harness calls between scale factors / before
    * session stop.
    */
  def clear(s: SparkSession): Unit = {
    val dfs = tracked.remove(s)
    if (dfs != null && !s.sparkContext.isStopped) {
      dfs.forEach(df => df.unpersist())
    }
    memos.keySet.removeIf(k => k._2 == s)
    buildLocks.keySet.removeIf(k => k._2 == s)
  }
}
