package graft.ext

import org.apache.spark.sql.DataFrame

/** The contract a persisted gate index offers an exactly-once ingest
  * loop ([[graft.streaming.EventStream.runIndexedIngest]]): gate a batch
  * against the stored layout (excluding the batch's OWN possibly-committed
  * append on replay), then append the survivors idempotently under the
  * batch token. Seven modalities implement it — [[NearDupIndex]]
  * (near-duplicate documents), [[SubstrIndex]] (verbatim window
  * overlap), [[IvfStore]] (semantic cosine dedup), [[NgramLmStore]]
  * (fluency band), [[QualityProbeStore]] (mean-quality gate),
  * [[MediaDigestIndex]] (byte-identical binary payloads), and
  * [[MediaSigIndex]] (near-identical binary payloads) — so ONE
  * streaming loop serves every gated curation modality.
  */
trait IngestIndex {

  /** The batch rows the gate accepts, with `excludeToken`'s committed
    * append (if any) invisible — the micro-batch replay view. */
  def gateKeep(batch: DataFrame, idCol: String, textCol: String,
      excludeToken: Option[String]): DataFrame

  /** Append `df` (a materialized gate result) under an idempotence token:
    * a replay with the same token is a no-op. */
  def appendToken(df: DataFrame, idCol: String, textCol: String,
      token: String): Unit

  /** Whether the store's FIRST committed manifest carries `token` — i.e.
    * the run that minted this token SEEDED the store. A build-if-absent
    * caller ([[graft.plan.CurationConfig]]'s gate stages) that crashed
    * after its seed build uses this on rerun to recognize the store as
    * its own seed (every row of the batch was kept) instead of gating
    * the batch against a store that already contains it — which would
    * silently emit an empty result from a dedup gate and double-fold a
    * statistics gate. */
  def seededBy(token: String): Boolean
}
