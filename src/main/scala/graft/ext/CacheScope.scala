package graft.ext

import org.apache.spark.sql.DataFrame

/** Call-scoped caching for operators whose pipeline consumes an expensive
  * intermediate more than once (both sides of a self-join, signature branch +
  * verification branch, ...).
  *
  * The intermediates are persisted only for the duration of the call: the
  * result is eagerly materialized with `localCheckpoint` — which cuts its
  * lineage so it no longer references the cached inputs — and the inputs are
  * released before returning. No cache entries outlive the call, so a session
  * running many such operators (e.g. a benchmark loop) does not accumulate
  * orphaned blocks; the checkpoint blocks themselves are reclaimed by the
  * ContextCleaner once the returned frame is garbage-collected.
  */
private[graft] object CacheScope {

  /** Persist `frames` while `body` builds the result; return the result
    * materialized and detached from the caches.
    */
  def withCached(frames: DataFrame*)(body: => DataFrame): DataFrame = {
    frames.foreach(_.persist())
    try body.localCheckpoint(eager = true)
    finally frames.foreach(_.unpersist(blocking = false))
  }
}
