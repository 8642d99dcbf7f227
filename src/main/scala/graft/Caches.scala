package graft

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames cached inside query builders.
  *
  * Query functions cache subtrees that feed multiple consumers within
  * ONE query run (both sides of a self-join, multi-job merge applies).
  * Those caches must not outlive the query: in a 57-query suite they
  * accumulate, evict each other, and force recomputation of exactly
  * the subtrees they were meant to protect (round-1 bench showed a
  * 10× inflation of cdc_apply_full from this). Builders register every
  * cache here; the harness (Bench/Verify) calls [[clear]] after each
  * query's consuming action.
  */
object Caches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val hooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Cache `df` and track it for the next [[clear]]. */
  def register(df: DataFrame): DataFrame = synchronized {
    live += df
    df.cache()
  }

  /** Run `hook` on every [[clear]] (for module-local cache maps). */
  def onClear(hook: () => Unit): Unit = synchronized { hooks += hook }

  /** Unpersist everything registered since the last clear. */
  def clear(): Unit = synchronized {
    live.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    live.clear()
    hooks.foreach(h => try h() catch { case _: Throwable => () })
  }
}
