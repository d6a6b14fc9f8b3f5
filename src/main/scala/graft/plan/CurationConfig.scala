package graft.plan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ext.{BpeStore, Dedup, IvfStore, MediaDigestIndex, NearDupIndex, NgramLm, NgramLmStore, QualityProbeStore, Sampling, StrataCountStore, SubstrIndex, TextAnalysis}

/** Config-driven CURATION pipeline — the EXT analogue of [[ReportConfig]]'s
  * declare-a-report-then-run workflow (the reference runner loads a typed
  * config and executes it, Main.scala:28-39,146): a small JSON document
  * declares dedup / quality / fluency stages over a text table, and the
  * pipeline compiles to ONE composed DataFrame plan — Catalyst sees the
  * whole chain, not a sequence of independently-run jobs, so filters fold
  * and each stage's work feeds the next without materialization.
  *
  * {{{
  * {
  *   "table":  "documents",
  *   "id":     "doc_id",
  *   "text":   "text",
  *   "stages": [
  *     { "stage": "exact_dedup" },
  *     { "stage": "quality_gate", "minTokens": 6, "maxTokens": 10000 },
  *     { "stage": "fluency_band", "loMicro": 30000, "hiMicro": 42000 }
  *   ]
  * }
  * }}}
  *
  * Stages (each delegating to the EXT operator it names, so pipeline
  * behavior and standalone behavior can never drift):
  *  - `exact_dedup` — [[Dedup.exactByContent]]: keep the lowest-id row
  *    per content digest (dq13's semantics on text).
  *  - `quality_gate` — token-count band over [[TextAnalysis.tokens]]:
  *    `minTokens` (required, ≥ 0) and optional `maxTokens`.
  *  - `fluency_band` — [[NgramLm.fluencyReport]] TRAINED ON THE CURRENT
  *    SURVIVORS (the composition point: dedup first means the model is
  *    not skewed by duplicates), keeping docs whose integer micro-unit
  *    mean lies in `[loMicro, hiMicro]`.
  *
  * Parsing is strict: an unknown stage name or a missing/ill-typed
  * parameter fails at parse time with the offending stage named — a
  * pipeline can never fail mid-run on config it already accepted (the
  * [[ReportConfig]] sink-format rule).
  */
object CurationConfig {

  sealed trait Stage {
    /** Run the stage. `runToken` is this pipeline RUN's identity for this
      * stage position (minted by [[PipelineDef.run]] from the caller's
      * `runId`) — the persisted-index gate stages ride it for their
      * exactly-once crash-replay contract; pure stages ignore it. */
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame

    /** The `dir`-aware form [[PipelineDef.run]] calls: stages that
      * resolve AUXILIARY tables from the run's data directory (e.g.
      * [[DecontamGate]]'s benchmark corpus) override this; the default
      * ignores `dir`. */
    def applyIn(dir: String)(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      apply(df, idCol, textCol, runToken)

    /** True for stages whose semantics derive STATISTICS FROM THE INPUT
      * FRAME (mixing rates from stratum counts, budget prefix sums, a
      * self-trained fluency model): in a batch run the frame is the
      * declared corpus, so those are corpus statistics; run per
      * micro-batch they silently become batch statistics — a different
      * answer with no error. The streamed runners
      * ([[graft.streaming.EventStream.runConfigPipeline]] and its audit
      * twin) REFUSE a pipeline containing one; the store-mediated gate
      * stages are stream-correct precisely because their state lives in
      * the store, and the per-row stages carry no state at all. */
    def batchScoped: Boolean = false

    /** The stage's output schema for a given input schema — the
      * zero-batch contract of the streamed runners: a stream with no
      * input files never fires a micro-batch, and the empty result's
      * shape must be derived WITHOUT running the stage (a store-gate
      * stage applied to an empty frame would attempt an empty SEED —
      * a side effect, and a refused one). Identity for the
      * row-preserving majority; the column-adding stages override. */
    def outputSchema(in: StructType, idCol: String,
        textCol: String): StructType = in
  }

  case object ExactDedup extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      Dedup.exactByContent(df, textCol, idCol)
  }

  final case class QualityGate(minTokens: Long,
      maxTokens: Option[Long]) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val n = size(TextAnalysis.tokens(col(textCol))).cast("long")
      val lo = df.filter(n >= minTokens)
      maxTokens.fold(lo)(mx => lo.filter(n <= mx))
    }
  }

  final case class FluencyBand(loMicro: Long, hiMicro: Long) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val keep = NgramLm.fluencyReport(df, idCol, textCol)
        .filter(col("mean_micro").between(loMicro, hiMicro))
        .select(col(idCol))
      df.join(keep, Seq(idCol), "left_semi")
    }
    // trains the LM on the current survivors FRAME — corpus statistics
    // in a batch run, batch statistics per micro-batch (use lm_gate, the
    // store-mediated form, in a stream)
    override def batchScoped: Boolean = true
  }

  final case class TokenBudget(strataCol: String,
      budgets: Map[String, Long]) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      Sampling.tokenBudgetPortable(df, strataCol, idCol, textCol, budgets)
    // prefix-sums stratum token totals of the input FRAME
    override def batchScoped: Boolean = true
  }

  /** Language-ID gate ([[graft.ext.TextAnalysis.languageId]]): keep
    * documents whose detected language is in the declared allow-list —
    * the first filter of most real curation pipelines. Pure (per-row
    * stopword-ratio argmax, one scan, nothing shuffles); 'und' rows are
    * kept only if 'und' is declared. */
  final case class LangGate(keep: Set[String]) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      df.filter(graft.ext.TextAnalysis.languageId(col(textCol))
        .isin(keep.toSeq: _*))
  }

  /** MULTIMODAL INGEST GATE — the declared form of the header kernels
    * ([[graft.functions.ImageMeta]]/[[graft.functions.AudioMeta]]/
    * [[graft.functions.VideoMeta]], dq73/79/80): keep rows whose binary
    * payload PARSES as the declared modality AND whose headline
    * dimension falls in the declared band — "the image decodes and is at
    * least 64×64", the first filter of any multimodal curation pipeline.
    * Per kind the band means:
    *   - `image`: width in [loA, hiA] and height in [loB, hiB];
    *   - `audio`: sample rate in [loA, hiA];
    *   - `video`: duration in seconds×1e6 in [loA, hiA], compared
    *     EXACTLY as `duration·1e6 between loA·timescale and
    *     hiA·timescale` (integer arithmetic — no float division, so any
    *     engine re-derives the same survivors).
    * Unparseable payloads drop here (the audit runner counts them
    * against this stage by name, like every gate); survivors carry the
    * PARSED header fields as appended `media_*` columns so downstream
    * stages and the oracle see what the gate saw. Pure per-row byte
    * arithmetic — one scan, nothing shuffles, stream-safe. */
  final case class MediaGate(kind: String, binaryCol: String,
      loA: Long, hiA: Long, loB: Long, hiB: Long) extends Stage {
    private def appended: Seq[String] = kind match {
      case "image" => Seq("media_format", "media_w", "media_h")
      case "audio" => Seq("media_channels", "media_rate")
      case _ => Seq("media_brand", "media_timescale", "media_duration")
    }
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      require(df.columns.contains(binaryCol),
        s"media_gate: no '$binaryCol' binary column in the input")
      // the appended parse columns and the scratch struct are reserved
      // (the ShardWriter rule: refuse by name, never silently replace)
      (appended :+ "__m").filter(df.columns.contains).headOption
        .foreach(c => throw new IllegalArgumentException(
          s"media_gate: input already has a '$c' column (reserved for " +
            "the parsed header fields)"))
      val out = df.columns.map(col)
      kind match {
        case "image" =>
          val m = graft.functions.ImageMeta(col(binaryCol))
          df.withColumn("__m", m)
            .filter(col("__m").isNotNull &&
              col("__m.width").between(loA, hiA) &&
              col("__m.height").between(loB, hiB))
            .select(out :+ col("__m.format").as("media_format") :+
              col("__m.width").as("media_w") :+
              col("__m.height").as("media_h"): _*)
        case "audio" =>
          val m = graft.functions.AudioMeta(col(binaryCol))
          df.withColumn("__m", m)
            .filter(col("__m").isNotNull &&
              col("__m.sample_rate").between(loA, hiA))
            .select(out :+ col("__m.channels").as("media_channels") :+
              col("__m.sample_rate").as("media_rate"): _*)
        case "video" =>
          val m = graft.functions.VideoMeta(col(binaryCol))
          // the band products can exceed Long for ANY large declared
          // bound (bound × timescale, timescale up to 2^31−1 from
          // untrusted bytes) and for a hostile v1 duration (duration ×
          // 1e6, duration up to Long.MaxValue) — legacy mode would wrap
          // negative and silently invert the gate, ANSI would throw.
          // Decimal(38,0) holds both products exactly (< 1e29), so the
          // comparison is the same integer arithmetic, just wide enough.
          val dec = org.apache.spark.sql.types.DecimalType(38, 0)
          val secMicro = col("__m.duration").cast(dec) * lit(1000000L)
          val upper =
            if (hiA == Long.MaxValue) lit(true)
            else secMicro <= lit(hiA).cast(dec) * col("__m.timescale")
          df.withColumn("__m", m)
            .filter(col("__m").isNotNull &&
              secMicro >= lit(loA).cast(dec) * col("__m.timescale") &&
              upper)
            .select(out :+ col("__m.brand").as("media_brand") :+
              col("__m.timescale").as("media_timescale") :+
              col("__m.duration").as("media_duration"): _*)
      }
    }
    override def outputSchema(in: StructType, idCol: String,
        textCol: String): StructType = kind match {
      // survivors passed the null filter, so the appended VALUES are
      // never null — but apply() extracts them from the kernel's
      // NULLABLE struct, which Spark types nullable = true; the
      // zero-batch contract schema must say what a real batch says
      case "image" => in
        .add(StructField("media_format", StringType, nullable = true))
        .add(StructField("media_w",
          org.apache.spark.sql.types.IntegerType, nullable = true))
        .add(StructField("media_h",
          org.apache.spark.sql.types.IntegerType, nullable = true))
      case "audio" => in
        .add(StructField("media_channels",
          org.apache.spark.sql.types.IntegerType, nullable = true))
        .add(StructField("media_rate",
          org.apache.spark.sql.types.IntegerType, nullable = true))
      case _ => in
        .add(StructField("media_brand", StringType, nullable = true))
        .add(StructField("media_timescale",
          org.apache.spark.sql.types.IntegerType, nullable = true))
        .add(StructField("media_duration", LongType, nullable = true))
    }
  }

  /** BINARY-PAYLOAD CONTENT DEDUP — the multimodal gate the text family
    * cannot provide (every text dedup keys on the caption, so two
    * byte-identical images with different captions pass them all):
    *  - `mode: "exact"` ([[graft.ext.MediaDedup.exactByPayload]]): keep
    *    the lowest-id row per byte-identical payload — one digest
    *    shuffle, payloads never ride an exchange;
    *  - `mode: "near"` ([[graft.ext.MediaDedup.keepNearCanonical]]):
    *    blocked byte signatures (`blocks` equal-stride hex-slice md5s)
    *    bucketed on (length, block index, block hash) with the
    *    [2, maxBucket] LSH cap; same-length payloads sharing ≥
    *    `minMatch` blocks at the same offset are near-duplicates, and
    *    the keep is the transitive-closure min-id rule.
    * WITHIN-FRAME semantics exactly like `exact_dedup` (per micro-batch
    * in a stream — batch-local, no corpus statistics, stream-legal);
    * cross-batch payload gating is the store-mediated form. */
  final case class MediaDedupStage(mode: String, binaryCol: String,
      blocks: Int, minMatch: Int, maxBucket: Int, window: Int = 4,
      minShared: Int = 3, zeros: Int = 1) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      require(df.columns.contains(binaryCol),
        s"media_dedup: no '$binaryCol' binary column in the input")
      mode match {
        case "exact" =>
          graft.ext.MediaDedup.exactByPayload(df, binaryCol, idCol)
        case "cdc" =>
          // the LENGTH-ROBUST near form: content-defined chunk overlap
          // (an insertion/truncation variant still pairs)
          graft.ext.MediaDedup.keepNearCanonicalCdc(df, idCol, binaryCol,
            window, minShared, maxBucket, zeros)
        case _ =>
          graft.ext.MediaDedup.keepNearCanonical(df, idCol, binaryCol,
            blocks, minMatch, maxBucket)
      }
    }
  }

  /** Temperature-scaled source mixture
    * ([[Sampling.temperatureMixPortable]]): flatten the mixture toward
    * rare strata (n^0.5 weights) at a declared total-document target —
    * the GPT-3/Pile mixing rule as a declared stage. */
  final case class TemperatureMix(strataCol: String,
      targetDocs: Long) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      Sampling.temperatureMixPortable(df, strataCol, idCol, targetDocs)
    // derives per-stratum keep rates from counts of the input FRAME
    override def batchScoped: Boolean = true
  }

  /** STORE-MEDIATED temperature mixing — the stream-correct sibling of
    * [[TemperatureMix]] (whose frame-derived rates make it batch-scoped
    * and refused by the streamed runners): per-source rates derive from
    * the CORPUS-TO-DATE counts in a [[StrataCountStore]] at `path`
    * UNION the current batch's counts, the batch is gated with
    * [[Sampling]]'s exact integer rate chain (shared code — the stored
    * form can never drift from dq146's operator), and the batch's RAW
    * counts (pre-gate: composition statistics track the corpus, not the
    * sample) fold into the store exactly-once under the run token. The
    * first round sees an absent store, so its rates come from the batch
    * alone — plain `temperature_mix` semantics, which also makes a
    * crash-replayed seed round deterministic without reading the store.
    * Replays follow the family contract (reuse the crashed run's runId,
    * replay before successor rounds run): the `excludeToken` view hands
    * a rerun its original rate inputs and `appendOnce` folds nothing
    * twice. Unlike the frame-local stage this one is legal in
    * [[graft.streaming.EventStream.runConfigPipeline]] — its statistics
    * live in the store. */
  final case class MixGate(path: String, strataCol: String,
      targetDocs: Long) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      val staged = df.localCheckpoint(true) // count + gate see one row set
      val batchCounts = Sampling.strataCounts(staged, strataCol)
      def gateWith(stored: Seq[(String, Long)]): DataFrame = {
        val merged = (stored ++ batchCounts).groupBy(_._1).view
          .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
        Sampling.temperatureGate(staged, strataCol, idCol,
          Sampling.temperatureRatesMicro(merged, targetDocs), seed = 42L)
      }
      if (!StrataCountStore.exists(spark, path)) {
        val kept = gateWith(Nil)
        try { StrataCountStore.create(spark, path, batchCounts, runToken); () }
        catch {
          case scala.util.control.NonFatal(e) =>
            // lost a concurrent create race: fold into the winner's store
            if (!StrataCountStore.exists(spark, path)) throw e
            runToken match {
              case Some(t) =>
                StrataCountStore.open(spark, path).appendOnce(batchCounts, t)
              case None =>
                StrataCountStore.open(spark, path).append(batchCounts)
            }
        }
        kept
      } else {
        val store = StrataCountStore.open(spark, path)
        if (runToken.exists(store.seededBy)) gateWith(Nil) // seed replay
        else {
          val kept = gateWith(store.counts(excludeToken = runToken))
          runToken match {
            case Some(t) => store.appendOnce(batchCounts, t)
            case None => store.append(batchCounts)
          }
          kept
        }
      }
    }
  }

  /** Multiplies rows (adds `epoch`): declare it LAST — a dedup or gate
    * downstream of the repeat would see every copy. */
  final case class RepeatEpochs(factor: Double) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      Sampling.repeatEpochsPortable(df, idCol, factor)
    override def outputSchema(in: StructType, idCol: String,
        textCol: String): StructType =
      in.add(StructField("epoch", LongType, nullable = false))
  }

  /** [[RepeatEpochs]] with a per-stratum factor table
    * ([[Sampling.repeatEpochsByStrata]]) — the LLaMA "epochs per
    * dataset" recipe as a declared stage; same declare-it-LAST rule. */
  final case class RepeatEpochsByStrata(strataCol: String,
      factors: Map[String, Double]) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      Sampling.repeatEpochsByStrata(df, strataCol, idCol, factors)
    override def outputSchema(in: StructType, idCol: String,
        textCol: String): StructType =
      in.add(StructField("epoch", LongType, nullable = false))
  }

  /** Row filter on a SQL boolean expression over the table's columns —
    * the reference runner's WHERE as a pipeline stage (and the batch
    * selector in front of the persisted-index gates below). */
  final case class WhereExpr(exprStr: String) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame =
      df.filter(expr(exprStr))
  }

  /** PERSISTED-INDEX gate stages — the config-driven form of the
    * production ingest loop (round-10 verdict #5): the stage points at a
    * stored index path; if no committed index exists there the incoming
    * batch SEEDS it (built from the batch, which is then fully kept —
    * the bootstrap round), otherwise the batch is gated against the
    * store and the survivors are appended. Each run of the pipeline is
    * one ingest round; the index carries state across runs.
    *
    * Unlike the pure stages, a gate stage is a MATERIALIZATION BOUNDARY:
    * its input and its result are checkpointed (the established
    * gate-then-append contract — appending underneath an unmaterialized
    * gate plan would let a re-evaluation see the batch's own rows), so
    * Catalyst composes the stages before and after it, not across it.
    *
    * When the caller names the run ([[PipelineDef.run]]'s `runId`), every
    * gate round is CRASH-REPLAYABLE under the same token contract the
    * streaming loop uses ([[graft.streaming.EventStream
    * .runIndexedIngest]], whose batch ids play the runId role): the
    * stage's token is `cfg:<runId>:s<stageIndex>`, the gate runs with
    * `excludeToken` so a rerun of a crashed run sees the store WITHOUT
    * its own already-committed append (a plain re-gate would emit an
    * EMPTY result from a dedup gate and double-fold a statistics gate),
    * and the append rides `appendOnce` so the fold lands exactly once. A
    * rerun whose seed build already committed is recognized through
    * [[graft.ext.IngestIndex.seededBy]] and keeps the whole batch, the
    * seed round's answer. Reruns must reuse the crashed run's `runId`
    * (the scheduler-retry contract — an Airflow/cron attempt keeps its
    * logical run id); a run with NO `runId` keeps the historical plain
    * semantics and is not safely rerunnable after a crash between a
    * gate's append and the pipeline output's consumption. */
  final case class SubstrGate(path: String, k: Int,
      maxDupWindows: Long) extends Stage {
    private def openValidated(spark: SparkSession): SubstrIndex = {
      val idx = SubstrIndex.open(spark, path)
      require(idx.stats.k == k,
        s"substr_gate at $path was built with k=${idx.stats.k}; " +
          s"the config declares k=$k")
      idx
    }
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      val existing =
        if (SubstrIndex.exists(spark, path)) Some(openValidated(spark))
        else None
      replayableRound(df, runToken, existing, () => openValidated(spark))(
        (seeded, tok) =>
          SubstrIndex.build(seeded, idCol, textCol, path, k, seedToken = tok))(
        (idx, input, tok) =>
          idx.keepFresh(input, idCol, textCol, maxDupWindows,
            excludeToken = tok)) { (idx, kept, tok) =>
        tok match {
          case Some(t) => idx.appendOnce(kept, idCol, textCol, t); ()
          case None => idx.append(kept, idCol, textCol); ()
        }
      }
    }
  }

  /** The BINARY-payload history gate ([[MediaDigestIndex]]): round 1
    * seeds the digest store from the batch's payloads; later rounds
    * drop rows whose payload digest is already STORED (byte-identical
    * to any earlier round's payload — the cross-batch complement of the
    * within-frame `media_dedup` stage) and append the survivors'
    * digests. History-only semantics: batch-internal copies both pass —
    * compose `media_dedup` before this gate to collapse them. Same
    * exactly-once replayable-round machinery as every stored gate. */
  final case class MediaDigestGate(path: String,
      binaryCol: String) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      require(df.columns.contains(binaryCol),
        s"media_digest_gate: no '$binaryCol' binary column in the input")
      val spark = df.sparkSession
      val existing =
        if (MediaDigestIndex.exists(spark, path))
          Some(MediaDigestIndex.open(spark, path))
        else None
      replayableRound(df, runToken, existing,
        () => MediaDigestIndex.open(spark, path))(
        (seeded, tok) =>
          MediaDigestIndex.build(seeded, idCol, binaryCol, path,
            seedToken = tok))(
        (idx, input, tok) =>
          idx.keepUnseenPayloads(input, idCol, binaryCol,
            excludeToken = tok)) { (idx, kept, tok) =>
        tok match {
          case Some(t) => idx.appendOnce(kept, idCol, binaryCol, t); ()
          case None => idx.append(kept, idCol, binaryCol); ()
        }
      }
    }
  }

  /** The NEAR-dup BINARY-payload history gate ([[MediaSigIndex]]): the
    * blocked-signature sibling of [[MediaDigestGate]] — round 1 seeds
    * the signature store; later rounds drop rows whose payload shares
    * ≥ `minMatch` of `blocks` block hashes at the same offset with a
    * same-length STORED payload (byte-identical payloads share all
    * blocks, so this subsumes the exact gate at the same parameters)
    * and append the survivors' signatures. The parameters are the
    * stored identity — a drifted config is refused at open. */
  final case class MediaSigGate(path: String, binaryCol: String,
      blocks: Int, minMatch: Int, maxBucket: Int) extends Stage {
    private def openValidated(spark: SparkSession): graft.ext.MediaSigIndex = {
      val idx = graft.ext.MediaSigIndex.open(spark, path)
      val st = idx.stats
      require(st.blocks == blocks && st.minMatch == minMatch &&
        st.maxBucket == maxBucket,
        s"media_sig_gate at $path was built with (blocks=${st.blocks}, " +
          s"minMatch=${st.minMatch}, maxBucket=${st.maxBucket}); the " +
          s"config declares (blocks=$blocks, minMatch=$minMatch, " +
          s"maxBucket=$maxBucket)")
      idx
    }
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      require(df.columns.contains(binaryCol),
        s"media_sig_gate: no '$binaryCol' binary column in the input")
      val spark = df.sparkSession
      val existing =
        if (graft.ext.MediaSigIndex.exists(spark, path))
          Some(openValidated(spark))
        else None
      replayableRound(df, runToken, existing,
        () => openValidated(spark))(
        (seeded, tok) =>
          graft.ext.MediaSigIndex.build(seeded, idCol, binaryCol, path,
            blocks, minMatch, maxBucket, seedToken = tok))(
        (idx, input, tok) =>
          idx.keepFarPayloads(input, idCol, binaryCol,
            excludeToken = tok)) { (idx, kept, tok) =>
        tok match {
          case Some(t) => idx.appendOnce(kept, idCol, binaryCol, t); ()
          case None => idx.append(kept, idCol, binaryCol); ()
        }
      }
    }
  }

  /** The LENGTH-ROBUST payload history gate ([[graft.ext.MediaCdcIndex]]):
    * the content-defined-chunk sibling of [[MediaSigGate]] — round 1
    * seeds the chunk store; later rounds drop rows whose payload shares
    * ≥ `minShared` DISTINCT chunk hashes with a single STORED payload
    * (an insertion/truncation variant of a stored payload still drops —
    * the blocked signature's length fence cannot see it) and append the
    * survivors' chunks. The parameters are the stored identity — a
    * drifted config is refused at open. */
  final case class MediaCdcGate(path: String, binaryCol: String,
      window: Int, minShared: Int, maxBucket: Int,
      zeros: Int = 1) extends Stage {
    private def openValidated(spark: SparkSession): graft.ext.MediaCdcIndex = {
      val idx = graft.ext.MediaCdcIndex.open(spark, path)
      val st = idx.stats
      require(st.window == window && st.minShared == minShared &&
        st.maxBucket == maxBucket && st.zeros == zeros,
        s"media_cdc_gate at $path was built with (window=${st.window}, " +
          s"minShared=${st.minShared}, maxBucket=${st.maxBucket}, " +
          s"zeros=${st.zeros}); the config declares (window=$window, " +
          s"minShared=$minShared, maxBucket=$maxBucket, zeros=$zeros)")
      idx
    }
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      require(df.columns.contains(binaryCol),
        s"media_cdc_gate: no '$binaryCol' binary column in the input")
      val spark = df.sparkSession
      val existing =
        if (graft.ext.MediaCdcIndex.exists(spark, path))
          Some(openValidated(spark))
        else None
      replayableRound(df, runToken, existing,
        () => openValidated(spark))(
        (seeded, tok) =>
          graft.ext.MediaCdcIndex.build(seeded, idCol, binaryCol, path,
            window, minShared, maxBucket, zeros, seedToken = tok))(
        (idx, input, tok) =>
          idx.keepFarPayloads(input, idCol, binaryCol,
            excludeToken = tok)) { (idx, kept, tok) =>
        tok match {
          case Some(t) => idx.appendOnce(kept, idCol, binaryCol, t); ()
          case None => idx.append(kept, idCol, binaryCol); ()
        }
      }
    }
  }

  /** BENCHMARK DECONTAMINATION FOR BINARY PAYLOADS — the multimodal
    * member of the frozen-reference family (r16 verdict #1: the frozen
    * gates covered verbatim windows, semantic, LM, probe, and fuzzy
    * text near-dup, so a benchmark IMAGE in the training corpus passed
    * every declared gate): the stage points at a FROZEN payload store
    * built ON FIRST USE from the declared benchmark table/slice — never
    * from the batch — and drops batch rows whose payload collides with
    * it:
    *  - `mode: "exact"` — a [[MediaDigestIndex]] of benchmark payload
    *    digests; byte-identical payloads drop;
    *  - `mode: "near"`  — a [[graft.ext.MediaSigIndex]] of blocked byte
    *    signatures; payloads sharing ≥ `minMatch` of `blocks` block
    *    hashes at the same offset with a same-length benchmark payload
    *    drop (subsumes exact at the same parameters).
    * Gate-ONLY like [[DecontamGate]]: survivors are never appended, the
    * benchmark set is frozen, reruns and streamed micro-batches re-gate
    * against the same store — naturally idempotent, no token machinery,
    * stream-legal. */
  final case class MediaDecontamGate(path: String, mode: String,
      binaryCol: String, benchmarkTable: String, benchmarkWhere: String,
      blocks: Int, minMatch: Int, maxBucket: Int, window: Int = 4,
      minShared: Int = 3, zeros: Int = 1) extends Stage {

    private def gate(df: DataFrame, idCol: String): DataFrame = {
      require(df.columns.contains(binaryCol),
        s"media_decontam_gate: no '$binaryCol' binary column in the input")
      val spark = df.sparkSession
      mode match {
        case "exact" =>
          MediaDigestIndex.open(spark, path)
            .keepUnseenPayloads(df, idCol, binaryCol)
        case "cdc" =>
          // LENGTH-ROBUST benchmark decontamination: a re-encoded /
          // trimmed copy of a benchmark payload still collides on its
          // content-defined chunks
          val idx = graft.ext.MediaCdcIndex.open(spark, path)
          val st = idx.stats
          require(st.window == window && st.minShared == minShared &&
            st.maxBucket == maxBucket && st.zeros == zeros,
            s"media_decontam_gate at $path was built with (window=" +
              s"${st.window}, minShared=${st.minShared}, maxBucket=" +
              s"${st.maxBucket}, zeros=${st.zeros}); the config declares " +
              s"(window=$window, minShared=$minShared, " +
              s"maxBucket=$maxBucket, zeros=$zeros)")
          idx.keepFarPayloads(df, idCol, binaryCol)
        case _ =>
          val idx = graft.ext.MediaSigIndex.open(spark, path)
          val st = idx.stats
          require(st.blocks == blocks && st.minMatch == minMatch &&
            st.maxBucket == maxBucket,
            s"media_decontam_gate at $path was built with (blocks=" +
              s"${st.blocks}, minMatch=${st.minMatch}, maxBucket=" +
              s"${st.maxBucket}); the config declares (blocks=$blocks, " +
              s"minMatch=$minMatch, maxBucket=$maxBucket)")
          idx.keepFarPayloads(df, idCol, binaryCol)
      }
    }

    private def storeExists(spark: SparkSession): Boolean = mode match {
      case "exact" => MediaDigestIndex.exists(spark, path)
      case "cdc" => graft.ext.MediaCdcIndex.exists(spark, path)
      case _ => graft.ext.MediaSigIndex.exists(spark, path)
    }

    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      require(storeExists(df.sparkSession),
        s"media_decontam_gate at $path: no committed benchmark store — " +
          "run the stage through PipelineDef.run so it can build one " +
          s"from '$benchmarkTable'")
      gate(df, idCol)
    }

    override def applyIn(dir: String)(df: DataFrame, idCol: String,
        textCol: String, runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      if (!storeExists(spark)) {
        val bench = spark.read.parquet(s"$dir/$benchmarkTable.parquet")
          .filter(expr(benchmarkWhere))
        require(bench.columns.contains(binaryCol),
          s"media_decontam_gate: benchmark table '$benchmarkTable' has " +
            s"no '$binaryCol' binary column")
        try {
          mode match {
            case "exact" =>
              MediaDigestIndex.build(bench, idCol, binaryCol, path); ()
            case "cdc" =>
              graft.ext.MediaCdcIndex.build(bench, idCol, binaryCol,
                path, window, minShared, maxBucket, zeros); ()
            case _ =>
              graft.ext.MediaSigIndex.build(bench, idCol, binaryCol,
                path, blocks, minMatch, maxBucket); ()
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            // a concurrent run won the first-use build race: the store
            // is a deterministic function of the declared benchmark
            // slice, so the winner's commit IS this run's store
            if (!storeExists(spark)) throw e
        }
      }
      gate(df, idCol)
    }
  }

  /** The EMBEDDING-modality gate ([[IvfStore]]'s semantic dedup): the
    * pipeline's `text` column is the embedding `array<float>` column
    * here. Round 1 seeds the store (trains the frozen centroids on the
    * batch); later rounds drop rows whose max cosine vs STORED vectors
    * in their `nprobe` probed cells exceeds `tau`, and append the
    * survivors — all three persisted-index modalities now have the same
    * declare-then-run form. */
  final case class SemanticGate(path: String, k: Int, tau: Double,
      nprobe: Int, tier: String = "float", pqM: Int = 16, pqK: Int = 16,
      pqResidual: Boolean = true, pqPermute: Boolean = false,
      shortlist: Int = 64) extends Stage {
    private def pq: Boolean = tier == "pq"
    private def openValidated(spark: SparkSession): IvfStore = {
      val store = IvfStore.open(spark, path)
      val st = store.stats
      // `k` only parameterizes the CREATE-time training (stats.cells is
      // the LIVE cell count — Lloyd's may collapse empty cells below
      // the declared k); the gate's stored identity is (tau, nprobe)
      require(st.gateTau == tau && st.gateNprobe == nprobe,
        s"semantic_gate at $path was built with (tau=${st.gateTau}, " +
          s"nprobe=${st.gateNprobe}); the config declares " +
          s"(tau=$tau, nprobe=$nprobe)")
      // a pq-tier gate against a store created without the code
      // relation must fail at OPEN with the config's vocabulary, not
      // at query time with the engine's
      require(!pq || store.hasPqTier,
        s"semantic_gate at $path declares tier 'pq' but the stored " +
          "layout has no PQ tier (created with pqM = 0)")
      store
    }
    def apply(df: DataFrame, idCol: String, embCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      val existing =
        if (IvfStore.exists(spark, path)) Some(openValidated(spark))
        else None
      replayableRound(df, runToken, existing, () => openValidated(spark))(
        (seeded, tok) =>
          IvfStore.create(seeded, idCol, embCol, path, k, iters = 2,
            gateTau = tau, gateNprobe = nprobe, seedToken = tok,
            pqM = if (pq) pqM else 0, pqK = pqK,
            pqResidual = pq && pqResidual,
            pqPermute = pq && pqPermute))(
        (store, input, tok) =>
          // tier 'pq': the m-byte wide net + exact refine
          // (IvfStore.semanticKeepUnseenPq — dq178); tier 'float':
          // the direct probed-cosine gate
          if (pq) store.semanticKeepUnseenPq(input, idCol, embCol,
            tau, nprobe, shortlist, excludeToken = tok)
          else store.gateKeep(input, idCol, embCol, excludeToken = tok)) {
        (store, kept, tok) =>
          tok match {
            case Some(t) => store.appendOnce(kept, idCol, embCol, t); ()
            case None => store.append(kept, idCol, embCol); ()
          }
      }
    }
  }

  /** The stored-model fluency gate ([[NgramLmStore]]): round 1 seeds the
    * model from the batch (trains = counts, everything kept); later
    * rounds band-gate against the persisted model and fold survivors'
    * counts back in — [[FluencyBand]]'s semantics with the per-call
    * retrain replaced by incremental model maintenance. */
  final case class LmGate(path: String, loMicro: Long,
      hiMicro: Long) extends Stage {
    private def openValidated(spark: SparkSession): NgramLmStore = {
      val store = NgramLmStore.open(spark, path)
      val st = store.stats
      require(st.loMicro == loMicro && st.hiMicro == hiMicro,
        s"lm_gate at $path was built with band [${st.loMicro}, " +
          s"${st.hiMicro}]; the config declares [$loMicro, $hiMicro]")
      store
    }
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      val existing =
        if (NgramLmStore.exists(spark, path)) Some(openValidated(spark))
        else None
      replayableRound(df, runToken, existing, () => openValidated(spark))(
        (seeded, tok) =>
          NgramLmStore.build(seeded, idCol, textCol, path,
            loMicro = loMicro, hiMicro = hiMicro, seedToken = tok))(
        (store, input, tok) =>
          store.gateKeep(input, idCol, textCol, excludeToken = tok)) {
        (store, kept, tok) =>
          tok match {
            case Some(t) => store.appendOnce(kept, idCol, textCol, t); ()
            case None => store.append(kept, idCol, textCol); ()
          }
      }
    }
  }

  /** The stored-statistics quality gate ([[graft.ext.QualityProbeStore]]):
    * round 1 seeds the statistics (frozen reference LM + self-model
    * moments, everything kept); later rounds keep documents scoring at
    * or above the stored corpus's mean quality under the CURRENT Cramer
    * weights and fold survivors' moments back in — dq115's
    * train→score→mean-gate with the per-call retrain replaced by
    * incremental statistics maintenance. No tunables: the threshold IS
    * the stored mean, derived from the moment table alone. */
  final case class ProbeGate(path: String) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      val existing =
        if (QualityProbeStore.exists(spark, path))
          Some(QualityProbeStore.open(spark, path))
        else None
      replayableRound(df, runToken, existing,
        () => QualityProbeStore.open(spark, path))(
        (seeded, tok) =>
          QualityProbeStore.create(seeded, idCol, textCol, path,
            seedToken = tok))(
        (store, input, tok) =>
          store.gateKeep(input, idCol, textCol, excludeToken = tok)) {
        (store, kept, tok) =>
          tok match {
            case Some(t) => store.appendOnce(kept, idCol, textCol, t)
            case None => store.append(kept, idCol, textCol)
          }
      }
    }
  }

  /** The curate-then-TOKENIZE terminal stage ([[graft.ext.BpeStore]]):
    * the first run seeds the stored BPE state from the current
    * survivors (word counts + a `numMerges`-merge vocabulary); later
    * runs tokenize against the COMMITTED vocabulary with no training at
    * all (vocabulary stability — the property a training pipeline
    * needs). Adds a `subtokens` column; id/text pass through. */
  final case class BpeTokenize(path: String, numMerges: Int) extends Stage {
    private def openValidated(spark: SparkSession): graft.ext.BpeStore = {
      val st = BpeStore.open(spark, path)
      // a crashed create committed its seed word counts but died
      // before the initial retrain: run the missing retrain (same
      // model — training consumes only the committed counts) instead
      // of failing the budget check on a wedged layout
      if (!st.hasModel) st.retrain(numMerges)
      require(st.stats.mergeBudget == numMerges,
        s"bpe_tokenize at $path was trained with numMerges=" +
          s"${st.stats.mergeBudget}; the config declares $numMerges")
      st
    }
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      val (store, input) =
        if (!BpeStore.exists(spark, path)) {
          val seeded = df.localCheckpoint(true)
          val st =
            try BpeStore.create(seeded, textCol, path, numMerges)
            catch {
              case scala.util.control.NonFatal(e) =>
                // lost a concurrent create race: tokenize against the
                // winner's committed vocabulary (openValidated still
                // enforces the declared merge budget); anything with no
                // committed store underneath propagates
                if (!BpeStore.exists(spark, path)) throw e
                openValidated(spark)
            }
          (st, seeded)
        } else (openValidated(spark), df)
      // a map-only column, NOT a join: duplicate ids (e.g. a preceding
      // repeat_epochs stage) must stay one-row-per-input
      input.withColumn("subtokens", store.tokenizeColumn(textCol))
    }
    override def outputSchema(in: StructType, idCol: String,
        textCol: String): StructType =
      // SubwordTokenize is a UnaryExpression over the text column, so
      // the column's nullability rides the text column's
      in.add(StructField("subtokens",
        ArrayType(StringType, containsNull = false),
        nullable = in(textCol).nullable))
  }

  /** TERMINAL SHARD MATERIALIZATION ([[graft.ext.ShardWriter]]) — the
    * pipeline's last meter: curate → mix → tokenize → **materialize**.
    * Orders the current frame by the portable epoch-shuffle key, packs
    * it greedily into `capacity`-bounded shards per hex-prefix stream,
    * writes `data/append=<id>/stream=<s>/bin=<n>` parquet plus a
    * per-shard integrity report (computed from the data READ BACK), and
    * publishes both under one marker commit. Declare it LAST: it is the
    * sink. Rows pass through with their shard assignment columns
    * (`skey`, `units`, `stream`, `bin`) appended, so a downstream report
    * can audit the materialization it just produced. With a named run
    * the write is exactly-once under the stage token (a replayed run —
    * batch rerun or streamed micro-batch — recognizes its committed
    * token and skips the rewrite); each distinct run appends its OWN
    * shard set, the per-round production shape. The stage is a
    * materialization boundary (the gate-stage rule): its input is
    * checkpointed, so the write and the returned assignment see one
    * row set. */
  final case class ShardWrite(path: String, capacity: Long, units: String,
      epoch: Int, streams: Int,
      binaryCol: Option[String] = None) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val staged = df.localCheckpoint(true)
      graft.ext.ShardWriter.write(staged, idCol, textCol, path, capacity,
        units, epoch, streams, runToken, binaryCol)
      graft.ext.ShardWriter.assign(staged, idCol, textCol, units, capacity,
        epoch, streams, binaryCol)
    }
    override def outputSchema(in: StructType, idCol: String,
        textCol: String): StructType = in
      .add(StructField("skey", StringType, nullable = false))
      .add(StructField("units", LongType, nullable = false))
      .add(StructField("stream", StringType, nullable = false))
      .add(StructField("bin", LongType, nullable = false))
  }

  /** INDEX MAINTENANCE as a declared stage — the lifecycle side of the
    * declare-then-run workflow (the gates above keep a store GROWING;
    * this keeps it HEALTHY): points at a committed [[IvfStore]], checks
    * the stored drift statistics ([[IvfStore.refitAdvised]] — newest and
    * cumulative L1 vs `l1ThresholdPpm`), runs the corpus-sized
    * [[IvfStore.refit]] ONLY when they advise it, then (by default)
    * [[IvfStore.vacuum]]s superseded dirs under the retention guard.
    * Rows pass through untouched — declare it wherever the operational
    * schedule wants the check (typically last). Naturally idempotent: a
    * replayed run re-checks the advisory, and a refit RESETS the drift
    * baseline, so the rerun no-ops instead of retraining twice. */
  final case class IvfMaintain(path: String, k: Int, l1ThresholdPpm: Long,
      vacuum: Boolean, permute: String = "keep") extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      require(IvfStore.exists(spark, path),
        s"ivf_maintain at $path: no committed IVF store — maintenance " +
          "declares lifecycle for a store some gate/ingest already built")
      val store = IvfStore.open(spark, path)
      // permute: "auto" honors the stored variance-spectrum advisory
      // (r16 verdict #2/#4): when the spectrum is skewed and the tier
      // is not yet permuted, the next refit turns the OPQ-lite tier on
      // — and the advisory itself becomes a refit TRIGGER (a drift-calm
      // store with a skewed spectrum still benefits)
      val flipPermute = permute == "auto" && store.hasPqTier && {
        val adv = store.permuteAdvisory()
        adv.advised && !adv.permuted
      }
      if (store.refitAdvised(l1ThresholdPpm) || flipPermute) {
        store.refit(k, iters = 2, enablePermute = flipPermute); ()
      }
      if (vacuum) { store.vacuum(); () }
      df
    }
  }

  /** Retention-guarded VACUUM as a declared stage — [[IvfMaintain]]'s
    * storage-lifecycle sibling for the whole store family: unlink the
    * compaction-superseded dirs of the store at `path` once their
    * superseding commit is older than
    * `spark.graft.index.vacuumRetentionMs` (1h default — an in-flight
    * reader that planned before the fold gets the window to finish).
    * `kind` names the layout (each store owns its dir shapes) — all
    * eight compacting stores, the quality-probe and strata-count stores
    * included. Rows pass through untouched; naturally idempotent (an
    * already-vacuumed layout has nothing eligible). */
  final case class StoreVacuum(kind: String, path: String) extends Stage {
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      def need(ok: Boolean): Unit = require(ok,
        s"store_vacuum at $path: no committed '$kind' store")
      kind match {
        case "substr" => need(SubstrIndex.exists(spark, path))
          SubstrIndex.open(spark, path).vacuum()
        case "neardup" => need(NearDupIndex.exists(spark, path))
          NearDupIndex.open(spark, path).vacuum()
        case "lm" => need(NgramLmStore.exists(spark, path))
          NgramLmStore.open(spark, path).vacuum()
        case "bm25" => need(graft.ext.Bm25Store.exists(spark, path))
          graft.ext.Bm25Store.open(spark, path).vacuum()
        case "bpe" => need(BpeStore.exists(spark, path))
          BpeStore.open(spark, path).vacuum()
        case "ivf" => need(IvfStore.exists(spark, path))
          IvfStore.open(spark, path).vacuum()
        case "probe" => need(QualityProbeStore.exists(spark, path))
          QualityProbeStore.open(spark, path).vacuum()
        case "strata" => need(StrataCountStore.exists(spark, path))
          StrataCountStore.open(spark, path).vacuum()
        case "mediadigest" => need(MediaDigestIndex.exists(spark, path))
          MediaDigestIndex.open(spark, path).vacuum()
        case "mediasig" => need(graft.ext.MediaSigIndex.exists(spark, path))
          graft.ext.MediaSigIndex.open(spark, path).vacuum()
        case "mediacdc" => need(graft.ext.MediaCdcIndex.exists(spark, path))
          graft.ext.MediaCdcIndex.open(spark, path).vacuum()
      }
      df
    }
  }

  /** BENCHMARK DECONTAMINATION as a declared stage — the eval-leakage
    * guard every training pipeline needs (documents sharing a verbatim
    * k-token window with an evaluation corpus must not reach training):
    * the stage points at a [[SubstrIndex]] holding the BENCHMARK's
    * window digests — built on first use from `benchmarkTable` (filtered
    * by `benchmarkWhere`) in the run's data directory, NEVER from the
    * batch — and drops batch documents with more than `maxDupWindows`
    * stored windows. Unlike [[SubstrGate]] this is gate-ONLY: the
    * benchmark is a frozen reference, survivors are never appended, so
    * the stage is naturally idempotent (a crashed run's rerun re-gates
    * against the same frozen set — no token machinery needed) and
    * reruns of the same batch always return the same survivors. */
  final case class DecontamGate(path: String, k: Int,
      benchmarkTable: String, benchmarkWhere: String,
      maxDupWindows: Long) extends Stage {
    private def gate(df: DataFrame, idCol: String,
        textCol: String): DataFrame = {
      val idx = SubstrIndex.open(df.sparkSession, path)
      require(idx.stats.k == k,
        s"decontam_gate at $path was built with k=${idx.stats.k}; " +
          s"the config declares k=$k")
      idx.keepFresh(df, idCol, textCol, maxDupWindows, excludeToken = None)
    }

    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      require(SubstrIndex.exists(df.sparkSession, path),
        s"decontam_gate at $path: no committed benchmark index — run the " +
          "stage through PipelineDef.run so it can build one from " +
          s"'$benchmarkTable'")
      gate(df, idCol, textCol)
    }

    override def applyIn(dir: String)(df: DataFrame, idCol: String,
        textCol: String, runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      if (!SubstrIndex.exists(spark, path)) {
        val bench = spark.read.parquet(s"$dir/$benchmarkTable.parquet")
          .filter(expr(benchmarkWhere))
        try SubstrIndex.build(bench, idCol, textCol, path, k)
        catch {
          case scala.util.control.NonFatal(e) =>
            // a concurrent run won the first-use build race: the index is
            // a deterministic function of the declared benchmark slice,
            // so the winner's commit IS this run's index — gate against
            // it; a failure with no committed index underneath propagates
            if (!SubstrIndex.exists(spark, path)) throw e
        }
      }
      gate(df, idCol, textCol)
    }
  }

  final case class NearDupGate(path: String, numHashes: Int, bands: Int,
      maxBucket: Int, threshold: Double) extends Stage {
    private def openValidated(spark: SparkSession): NearDupIndex = {
      val idx = NearDupIndex.open(spark, path)
      val st = idx.stats
      require(st.numHashes == numHashes && st.bands == bands &&
        st.maxBucket == maxBucket,
        s"neardup_gate at $path was built with (numHashes=${st.numHashes}, " +
          s"bands=${st.bands}, maxBucket=${st.maxBucket}); the config " +
          s"declares ($numHashes, $bands, $maxBucket)")
      idx
    }
    def apply(df: DataFrame, idCol: String, textCol: String,
        runToken: Option[String]): DataFrame = {
      val spark = df.sparkSession
      val existing =
        if (NearDupIndex.exists(spark, path)) Some(openValidated(spark))
        else None
      replayableRound(df, runToken, existing, () => openValidated(spark))(
        (seeded, tok) =>
          NearDupIndex.build(seeded, idCol, textCol, path, numHashes, bands,
            maxBucket, seedToken = tok))(
        (idx, input, tok) =>
          idx.keepUnseen(input, idCol, textCol, threshold,
            excludeToken = tok)) { (idx, kept, tok) =>
        tok match {
          case Some(t) => idx.appendOnce(kept, idCol, textCol, t); ()
          case None => idx.append(kept, idCol, textCol); ()
        }
      }
    }
  }

  /** Materialize `df` unless it already IS a materialized checkpoint
    * (its analyzed plan is a bare LogicalRDD — the exact shape
    * `localCheckpoint(eager = true)` returns). Gate stages and the audit
    * runner meet at stage boundaries where the previous step has already
    * checkpointed; re-checkpointing copies the cached rows into a second
    * block-manager cache for no semantic gain — the requirement is only
    * that the frame cannot re-read a store a later append mutates, and a
    * LogicalRDD (an opaque RDD, no file scan) satisfies it. One job per
    * avoided re-checkpoint, several per audited pipeline run. */
  private def materialized(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df
      case _ => df.localCheckpoint(true)
    }

  /** The crash-replay skeleton every persisted-index gate stage shares
    * (class doc of [[SubstrGate]]): seed / recognize-own-seed /
    * gate+append exactly once under the run's stage token. With
    * `runToken = None` every branch degenerates to the plain
    * non-replayable round (gate over the full store, unconditional
    * append) — the semantics of a run nobody named. */
  private def replayableRound[I <: graft.ext.IngestIndex](df: DataFrame,
      runToken: Option[String], existing: Option[I], reopen: () => I)(
      seed: (DataFrame, Option[String]) => Unit)(
      gate: (I, DataFrame, Option[String]) => DataFrame)(
      append: (I, DataFrame, Option[String]) => Unit): DataFrame = {
    def gateRound(idx: I, input: DataFrame): DataFrame =
      if (runToken.exists(idx.seededBy)) input
      else {
        val kept = gate(idx, input, runToken).localCheckpoint(true)
        append(idx, kept, runToken)
        kept
      }
    existing match {
      case None =>
        val seeded = materialized(df)
        try { seed(seeded, runToken); seeded }
        catch {
          case scala.util.control.NonFatal(e) =>
            // The seed refused (or timed out on the writer lock) and a
            // COMMITTED store is now visible at the path: this run LOST a
            // concurrent create race (two pipeline runs bootstrapping the
            // same store), so fall through to the gate round against the
            // winner's store — the result lock-serialized runs would have
            // produced. `reopen` re-validates the config's parameters; a
            // seed failure with no committed store underneath (degenerate
            // corpus, bad parameters, IO) propagates unchanged. If THIS
            // run's own seed committed before failing (post-commit stats
            // write), the token check recognizes it as the seed round.
            scala.util.Try(reopen()).toOption match {
              case Some(idx) => gateRound(idx, seeded)
              case None => throw e
            }
        }
      case Some(idx) => gateRound(idx, df)
    }
  }

  /** The config name of a stage — the string [[parse]] accepted for it
    * (stable across refactors: it is the pipeline's own vocabulary, so
    * audit rows and error messages speak the language of the config). */
  private[graft] def stageName(st: Stage): String = st match {
    case ExactDedup => "exact_dedup"
    case _: QualityGate => "quality_gate"
    case _: FluencyBand => "fluency_band"
    case _: TokenBudget => "token_budget"
    case _: TemperatureMix => "temperature_mix"
    case _: MixGate => "mix_gate"
    case _: LangGate => "lang_gate"
    case _: MediaGate => "media_gate"
    case _: MediaDedupStage => "media_dedup"
    case _: MediaDigestGate => "media_digest_gate"
    case _: MediaSigGate => "media_sig_gate"
    case _: MediaCdcGate => "media_cdc_gate"
    case _: MediaDecontamGate => "media_decontam_gate"
    case _: RepeatEpochs => "repeat_epochs"
    case _: RepeatEpochsByStrata => "repeat_epochs"
    case _: WhereExpr => "where"
    case _: SubstrGate => "substr_gate"
    case _: DecontamGate => "decontam_gate"
    case _: NearDupGate => "neardup_gate"
    case _: SemanticGate => "semantic_gate"
    case _: IvfMaintain => "ivf_maintain"
    case _: StoreVacuum => "store_vacuum"
    case _: LmGate => "lm_gate"
    case _: ProbeGate => "probe_gate"
    case _: BpeTokenize => "bpe_tokenize"
    case _: ShardWrite => "shard_write"
  }

  final case class PipelineDef(table: String, idCol: String, textCol: String,
      stages: List[Stage]) {

    /** Load the table and fold every stage into one plan. `runId` names
      * THIS pipeline run (a scheduler's logical run/attempt id): with it,
      * every persisted-index gate stage gets the exactly-once
      * crash-replay contract ([[SubstrGate]] class doc) under the token
      * `cfg:<runId>:s<stageIndex>` — a rerun with the SAME runId
      * reproduces the crashed run's survivors and folds nothing twice.
      * Without it the gates keep the plain one-shot semantics. */
    def run(spark: SparkSession, dir: String,
        runId: Option[String] = None): DataFrame =
      applyStages(spark.read.parquet(s"$dir/$table.parquet"), dir, runId)

    /** Fold the declared stage chain over an ARBITRARY batch frame — the
      * core [[run]] applies to the declared table and the STREAMED
      * runner ([[graft.streaming.EventStream.runConfigPipeline]]) applies
      * to every micro-batch: same composition, same
      * `cfg:<runId>:s<stageIndex>` stage tokens, so one micro-batch is
      * exactly one (crash-replayable) pipeline run — a replayed
      * micro-batch reuses its batch id, hence its runId, hence every
      * gate's original answer. */
    def applyStages(df: DataFrame, dir: String,
        runId: Option[String] = None): DataFrame = {
      runId.foreach(r => require(r.nonEmpty && !r.contains("\n"),
        "runId: non-empty, one line"))
      stages.zipWithIndex.foldLeft(df) { case (d, (st, i)) =>
        st.applyIn(dir)(d, idCol, textCol,
          runId.map(r => s"cfg:$r:s${i + 1}"))
      }
    }

    /** The pipeline's OUTPUT schema for a given input schema — each
      * stage's [[Stage.outputSchema]] folded in declaration order. The
      * zero-batch contract of the streamed runners: derivable without
      * running any stage (no store side effects), and pinned against the
      * real [[applyStages]] output by `CurationConfigSpec`. */
    def outputSchema(in: StructType): StructType =
      stages.foldLeft(in)((s, st) => st.outputSchema(s, idCol, textCol))

    /** The declared stages that are BATCH-SCOPED ([[Stage.batchScoped]]),
      * by config name — what the streamed runners refuse. */
    def batchScopedStages: Seq[String] =
      stages.filter(_.batchScoped).map(stageName).distinct

    /** [[run]] with per-stage DROP ACCOUNTING — the audit a production
      * curation pipeline needs to answer "which stage dropped this
      * document". Returns the pipeline result plus an audit frame with
      * one row per input-row fate: `(id, stage_idx, stage)` where a
      * dropped row carries the 1-based index and config name of the
      * stage that dropped it and a surviving row carries
      * `(0, "kept")`. Attribution is generic (an id anti-join across
      * each stage boundary), so it covers every stage kind including
      * the persisted-store gates; each boundary is checkpointed —
      * batch-sized frames, the gate stages' own materialization rule —
      * so audit mode trades the cross-stage plan fusion of [[run]] for
      * the accounting, and the RESULT is unchanged. Rows of a
      * row-multiplying stage (`repeat_epochs`) share their id across
      * copies, so audit such pipelines upstream of the repeat. */
    def runAudited(spark: SparkSession, dir: String,
        runId: Option[String] = None): (DataFrame, DataFrame) =
      applyStagesAudited(spark.read.parquet(s"$dir/$table.parquet"),
        dir, runId)

    /** [[applyStages]] with [[runAudited]]'s per-stage drop accounting —
      * the streamed runner's audit form ([[graft.streaming.EventStream
      * .runConfigPipelineAudited]] feeds each micro-batch through it). */
    def applyStagesAudited(input: DataFrame, dir: String,
        runId: Option[String] = None): (DataFrame, DataFrame) = {
      runId.foreach(r => require(r.nonEmpty && !r.contains("\n"),
        "runId: non-empty, one line"))
      var df = materialized(input)
      val drops = stages.zipWithIndex.map { case (st, i) =>
        val out = materialized(st.applyIn(dir)(df, idCol, textCol,
          runId.map(r => s"cfg:$r:s${i + 1}")))
        val dropped = df.select(col(idCol))
          .join(out.select(col(idCol)), Seq(idCol), "left_anti")
          .withColumn("stage_idx", lit((i + 1).toLong))
          .withColumn("stage", lit(stageName(st)))
        df = out
        dropped
      }
      val kept = df.select(col(idCol))
        .withColumn("stage_idx", lit(0L)).withColumn("stage", lit("kept"))
      (df, drops.foldLeft(kept)(_ unionByName _))
    }
  }

  def parse(json: String): PipelineDef = {
    val j = JsonMethods.parse(json)
    def str(field: String): String = j \ field match {
      case JString(s) => s
      case _ => fail(s"'$field' (string) is required")
    }
    val stages = j \ "stages" match {
      case JArray(ss) if ss.nonEmpty => ss.map(stageNode)
      case JArray(_) | JNothing => fail("'stages' must be a non-empty array")
      case other => fail(s"'stages' must be an array, got $other")
    }
    PipelineDef(str("table"), str("id"), str("text"), stages)
  }

  private def stageNode(j: JValue): Stage = {
    val name = j \ "stage" match {
      case JString(n) => n
      case _ => fail(s"every stage needs a 'stage' name: ${JsonMethods.compact(j)}")
    }
    def long(field: String): Option[Long] = j \ field match {
      case JInt(i) => Some(i.toLong)
      case JLong(l) => Some(l)
      case JNothing => None
      case other => fail(s"stage '$name': '$field' must be an integer, got $other")
    }
    name match {
      case "exact_dedup" => ExactDedup
      case "quality_gate" =>
        val min = long("minTokens").getOrElse(
          fail(s"stage 'quality_gate' needs 'minTokens'"))
        if (min < 0) fail(s"stage 'quality_gate': minTokens must be >= 0, got $min")
        val max = long("maxTokens")
        max.filter(_ < min).foreach(mx =>
          fail(s"stage 'quality_gate': maxTokens ($mx) < minTokens ($min)"))
        QualityGate(min, max)
      case "fluency_band" =>
        val lo = long("loMicro").getOrElse(fail("stage 'fluency_band' needs 'loMicro'"))
        val hi = long("hiMicro").getOrElse(fail("stage 'fluency_band' needs 'hiMicro'"))
        if (lo > hi) fail(s"stage 'fluency_band': loMicro ($lo) > hiMicro ($hi)")
        FluencyBand(lo, hi)
      case "token_budget" =>
        val strata = j \ "strata" match {
          case JString(s) => s
          case _ => fail("stage 'token_budget' needs a 'strata' column name")
        }
        val budgets = j \ "budgets" match {
          case JObject(fields) if fields.nonEmpty => fields.map {
            case (k, JInt(v)) if v >= 0 => k -> v.toLong
            case (k, JLong(v)) if v >= 0 => k -> v
            case (k, other) => fail(s"stage 'token_budget': budget '$k' " +
              s"must be a non-negative integer, got $other")
          }.toMap
          case _ => fail("stage 'token_budget' needs a non-empty 'budgets' object")
        }
        TokenBudget(strata, budgets)
      case "lang_gate" =>
        val keep = j \ "keep" match {
          case JArray(vs) if vs.nonEmpty => vs.map {
            case JString(c) if c.trim.nonEmpty => c
            case other => fail("stage 'lang_gate': 'keep' entries must be " +
              s"non-empty language codes, got $other")
          }.toSet
          case _ => fail("stage 'lang_gate' needs a non-empty 'keep' array " +
            "of language codes")
        }
        LangGate(keep)
      case "media_gate" =>
        val kinds = Set("image", "audio", "video")
        val kind = j \ "kind" match {
          case JString(k) if kinds(k) => k
          case JString(k) => fail(s"stage 'media_gate': unknown kind " +
            s"'$k' (image | audio | video)")
          case _ => fail("stage 'media_gate' needs a 'kind' string " +
            "(image | audio | video)")
        }
        val binary = j \ "binary" match {
          case JString(b) if b.trim.nonEmpty => b
          case _ => fail("stage 'media_gate' needs a non-empty 'binary' " +
            "column name (the payload bytes the header kernel parses)")
        }
        def band(loKey: String, hiKey: String): (Long, Long) = {
          val lo = long(loKey).getOrElse(0L)
          val hi = long(hiKey).getOrElse(Long.MaxValue)
          if (lo < 0) fail(s"stage 'media_gate': $loKey must be >= 0, got $lo")
          if (hi < lo) fail(s"stage 'media_gate': $hiKey ($hi) < $loKey ($lo)")
          (lo, hi)
        }
        kind match {
          case "image" =>
            val (loW, hiW) = band("minWidth", "maxWidth")
            val (loH, hiH) = band("minHeight", "maxHeight")
            MediaGate("image", binary, loW, hiW, loH, hiH)
          case "audio" =>
            val (loR, hiR) = band("minRate", "maxRate")
            MediaGate("audio", binary, loR, hiR, 0L, Long.MaxValue)
          case _ =>
            val (loS, hiS) = band("minSecMicro", "maxSecMicro")
            MediaGate("video", binary, loS, hiS, 0L, Long.MaxValue)
        }
      case "media_dedup" =>
        val binary = j \ "binary" match {
          case JString(b) if b.trim.nonEmpty => b
          case _ => fail("stage 'media_dedup' needs a non-empty 'binary' " +
            "column name (the payload bytes the dedup keys on)")
        }
        val mode = j \ "mode" match {
          case JString(m) if m == "exact" || m == "near" || m == "cdc" => m
          case JString(m) => fail(s"stage 'media_dedup': unknown mode " +
            s"'$m' (exact | near | cdc)")
          case JNothing => "exact"
          case _ => fail("stage 'media_dedup' 'mode' must be a string " +
            "(exact | near | cdc)")
        }
        val blocks = long("blocks").getOrElse(8L)
        if (blocks < 2 || blocks > 256)
          fail(s"stage 'media_dedup': blocks must be in [2, 256], got $blocks")
        val minMatch = long("minMatch").getOrElse(blocks * 3 / 4)
        if (minMatch < 1 || minMatch > blocks)
          fail(s"stage 'media_dedup': minMatch must be in [1, blocks=" +
            s"$blocks], got $minMatch")
        val maxBucket = long("maxBucket").getOrElse(100L)
        if (maxBucket < 2)
          fail(s"stage 'media_dedup': maxBucket must be >= 2, got $maxBucket")
        val window = long("window").getOrElse(4L)
        if (window < 1 || window > 64)
          fail(s"stage 'media_dedup': window must be in [1, 64], " +
            s"got $window")
        val minShared = long("minShared").getOrElse(3L)
        if (minShared < 1)
          fail(s"stage 'media_dedup': minShared must be >= 1, " +
            s"got $minShared")
        val mzeros = long("zeros").getOrElse(1L)
        if (mzeros < 1 || mzeros > 8)
          fail(s"stage 'media_dedup': zeros must be in [1, 8], " +
            s"got $mzeros")
        MediaDedupStage(mode, binary, blocks.toInt, minMatch.toInt,
          maxBucket.toInt, window.toInt, minShared.toInt, mzeros.toInt)
      case "media_digest_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'media_digest_gate' needs a non-empty " +
            "'path' string (the stored digest index location)")
        }
        val binary = j \ "binary" match {
          case JString(b) if b.trim.nonEmpty => b
          case _ => fail("stage 'media_digest_gate' needs a non-empty " +
            "'binary' column name (the payload bytes the gate keys on)")
        }
        MediaDigestGate(path, binary)
      case "media_sig_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'media_sig_gate' needs a non-empty " +
            "'path' string (the stored signature index location)")
        }
        val binary = j \ "binary" match {
          case JString(b) if b.trim.nonEmpty => b
          case _ => fail("stage 'media_sig_gate' needs a non-empty " +
            "'binary' column name (the payload bytes the gate keys on)")
        }
        val blocks = long("blocks").getOrElse(8L)
        if (blocks < 2 || blocks > 256)
          fail(s"stage 'media_sig_gate': blocks must be in [2, 256], " +
            s"got $blocks")
        val minMatch = long("minMatch").getOrElse(blocks * 3 / 4)
        if (minMatch < 1 || minMatch > blocks)
          fail(s"stage 'media_sig_gate': minMatch must be in [1, " +
            s"blocks=$blocks], got $minMatch")
        val maxBucket = long("maxBucket").getOrElse(100L)
        if (maxBucket < 2)
          fail(s"stage 'media_sig_gate': maxBucket must be >= 2, " +
            s"got $maxBucket")
        MediaSigGate(path, binary, blocks.toInt, minMatch.toInt,
          maxBucket.toInt)
      case "media_cdc_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'media_cdc_gate' needs a non-empty " +
            "'path' string (the stored chunk index location)")
        }
        val binary = j \ "binary" match {
          case JString(b) if b.trim.nonEmpty => b
          case _ => fail("stage 'media_cdc_gate' needs a non-empty " +
            "'binary' column name (the payload bytes the gate keys on)")
        }
        val window = long("window").getOrElse(4L)
        if (window < 1 || window > 64)
          fail(s"stage 'media_cdc_gate': window must be in [1, 64], " +
            s"got $window")
        val minShared = long("minShared").getOrElse(3L)
        if (minShared < 1)
          fail(s"stage 'media_cdc_gate': minShared must be >= 1, " +
            s"got $minShared")
        val maxBucket = long("maxBucket").getOrElse(100L)
        if (maxBucket < 2)
          fail(s"stage 'media_cdc_gate': maxBucket must be >= 2, " +
            s"got $maxBucket")
        val zeros = long("zeros").getOrElse(1L)
        if (zeros < 1 || zeros > 8)
          fail(s"stage 'media_cdc_gate': zeros must be in [1, 8], " +
            s"got $zeros")
        MediaCdcGate(path, binary, window.toInt, minShared.toInt,
          maxBucket.toInt, zeros.toInt)
      case "media_decontam_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'media_decontam_gate' needs a non-empty " +
            "'path' string (the frozen benchmark store location)")
        }
        val mode = j \ "mode" match {
          case JString("exact") => "exact"
          case JString("near") => "near"
          case JString("cdc") => "cdc"
          case JNothing => "exact"
          case JString(m) => fail("stage 'media_decontam_gate': unknown " +
            s"mode '$m' (exact | near | cdc)")
          case _ => fail("stage 'media_decontam_gate' 'mode' must be a " +
            "string (exact | near | cdc)")
        }
        val binary = j \ "binary" match {
          case JString(b) if b.trim.nonEmpty => b
          case _ => fail("stage 'media_decontam_gate' needs a non-empty " +
            "'binary' column name (the payload bytes the gate keys on)")
        }
        val bt = j \ "benchmarkTable" match {
          case JString(t) if t.trim.nonEmpty => t
          case _ => fail("stage 'media_decontam_gate' needs a non-empty " +
            "'benchmarkTable' string (the evaluation corpus it guards " +
            "against)")
        }
        val bw = j \ "benchmarkWhere" match {
          case JString(w) if w.trim.nonEmpty => w
          case JNothing => "TRUE"
          case other => fail("stage 'media_decontam_gate': " +
            s"'benchmarkWhere' must be a non-empty string, got $other")
        }
        val blocks = long("blocks").getOrElse(8L)
        if (blocks < 2 || blocks > 256)
          fail(s"stage 'media_decontam_gate': blocks must be in " +
            s"[2, 256], got $blocks")
        val minMatch = long("minMatch").getOrElse(blocks * 3 / 4)
        if (minMatch < 1 || minMatch > blocks)
          fail(s"stage 'media_decontam_gate': minMatch must be in [1, " +
            s"blocks=$blocks], got $minMatch")
        val maxBucket = long("maxBucket").getOrElse(100L)
        if (maxBucket < 2)
          fail(s"stage 'media_decontam_gate': maxBucket must be >= 2, " +
            s"got $maxBucket")
        val window = long("window").getOrElse(4L)
        if (window < 1 || window > 64)
          fail(s"stage 'media_decontam_gate': window must be in " +
            s"[1, 64], got $window")
        val minShared = long("minShared").getOrElse(3L)
        if (minShared < 1)
          fail(s"stage 'media_decontam_gate': minShared must be >= 1, " +
            s"got $minShared")
        val dzeros = long("zeros").getOrElse(1L)
        if (dzeros < 1 || dzeros > 8)
          fail(s"stage 'media_decontam_gate': zeros must be in [1, 8], " +
            s"got $dzeros")
        MediaDecontamGate(path, mode, binary, bt, bw, blocks.toInt,
          minMatch.toInt, maxBucket.toInt, window.toInt, minShared.toInt,
          dzeros.toInt)
      case "temperature_mix" =>
        val strata = j \ "strata" match {
          case JString(s) => s
          case _ => fail("stage 'temperature_mix' needs a 'strata' column name")
        }
        val target = long("targetDocs").getOrElse(
          fail("stage 'temperature_mix' needs 'targetDocs'"))
        if (target < 0)
          fail(s"stage 'temperature_mix': targetDocs must be >= 0, got $target")
        TemperatureMix(strata, target)
      case "mix_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'mix_gate' needs a non-empty 'path' string")
        }
        val strata = j \ "strata" match {
          case JString(s) => s
          case _ => fail("stage 'mix_gate' needs a 'strata' column name")
        }
        val target = long("targetDocs").getOrElse(
          fail("stage 'mix_gate' needs 'targetDocs'"))
        if (target < 0)
          fail(s"stage 'mix_gate': targetDocs must be >= 0, got $target")
        MixGate(path, strata, target)
      case "repeat_epochs" =>
        def num(v: JValue): Option[Double] = v match {
          case JDouble(d) => Some(d)
          case JInt(i) => Some(i.toDouble)
          case JLong(l) => Some(l.toDouble)
          case JDecimal(d) => Some(d.toDouble)
          case _ => None
        }
        (j \ "factors", j \ "strata") match {
          case (JObject(fields), JString(strata)) if fields.nonEmpty =>
            // the per-dataset epoch table form (LLaMA recipe)
            val fs = fields.map { case (k, v) =>
              val d = num(v).getOrElse(fail("stage 'repeat_epochs': factor " +
                s"for '$k' must be numeric, got $v"))
              if (d <= 0) fail("stage 'repeat_epochs': factor for " +
                s"'$k' must be > 0, got $d")
              k -> d
            }.toMap
            RepeatEpochsByStrata(strata, fs)
          case (JObject(_), _) =>
            fail("stage 'repeat_epochs': 'factors' needs a 'strata' column " +
              "name (and a non-empty factors object)")
          case (JNothing, _) =>
            val f = num(j \ "factor").getOrElse(
              fail("stage 'repeat_epochs' needs a numeric 'factor' (or a " +
                "'strata' + 'factors' table)"))
            if (f <= 0)
              fail(s"stage 'repeat_epochs': factor must be > 0, got $f")
            RepeatEpochs(f)
          case (other, _) =>
            fail(s"stage 'repeat_epochs': 'factors' must be an object, got $other")
        }
      case "where" =>
        j \ "expr" match {
          case JString(e) if e.trim.nonEmpty => WhereExpr(e)
          case _ => fail("stage 'where' needs a non-empty 'expr' string")
        }
      case "substr_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'substr_gate' needs a non-empty 'path' string")
        }
        val k = long("k").getOrElse(fail("stage 'substr_gate' needs 'k'"))
        if (k < 2) fail(s"stage 'substr_gate': k must be >= 2, got $k")
        val maxDup = long("maxDupWindows").getOrElse(0L)
        if (maxDup < 0)
          fail(s"stage 'substr_gate': maxDupWindows must be >= 0, got $maxDup")
        SubstrGate(path, k.toInt, maxDup)
      case "decontam_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'decontam_gate' needs a non-empty 'path' string")
        }
        val k = long("k").getOrElse(fail("stage 'decontam_gate' needs 'k'"))
        if (k < 2) fail(s"stage 'decontam_gate': k must be >= 2, got $k")
        val bt = j \ "benchmarkTable" match {
          case JString(t) if t.trim.nonEmpty => t
          case _ =>
            fail("stage 'decontam_gate' needs a non-empty 'benchmarkTable' " +
              "string (the evaluation corpus it guards against)")
        }
        val bw = j \ "benchmarkWhere" match {
          case JString(w) if w.trim.nonEmpty => w
          case JNothing => "TRUE"
          case other => fail("stage 'decontam_gate': 'benchmarkWhere' must " +
            s"be a non-empty string, got $other")
        }
        val maxDup = long("maxDupWindows").getOrElse(0L)
        if (maxDup < 0)
          fail(s"stage 'decontam_gate': maxDupWindows must be >= 0, got $maxDup")
        DecontamGate(path, k.toInt, bt, bw, maxDup)
      case "neardup_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'neardup_gate' needs a non-empty 'path' string")
        }
        val numHashes = long("numHashes").getOrElse(16L).toInt
        val bands = long("bands").getOrElse(4L).toInt
        if (bands < 1 || numHashes < 1 || numHashes % bands != 0)
          fail(s"stage 'neardup_gate': numHashes ($numHashes) must be a " +
            s"positive multiple of bands ($bands)")
        val maxBucket = long("maxBucket").getOrElse(100L).toInt
        if (maxBucket < 1)
          fail(s"stage 'neardup_gate': maxBucket must be >= 1, got $maxBucket")
        val threshold = j \ "threshold" match {
          case JDouble(d) => d
          case JDecimal(d) => d.toDouble
          case JNothing => 0.8
          case other =>
            fail(s"stage 'neardup_gate': 'threshold' must be a number, got $other")
        }
        if (threshold <= 0.0 || threshold >= 1.0)
          fail(s"stage 'neardup_gate': threshold must be in (0, 1), got $threshold")
        NearDupGate(path, numHashes, bands, maxBucket, threshold)
      case "semantic_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'semantic_gate' needs a non-empty 'path' string")
        }
        val k = long("k").getOrElse(fail("stage 'semantic_gate' needs 'k'"))
        if (k < 1) fail(s"stage 'semantic_gate': k must be >= 1, got $k")
        val tau = j \ "tau" match {
          case JDouble(d) => d
          case JDecimal(d) => d.toDouble
          case JNothing => 0.5
          case other =>
            fail(s"stage 'semantic_gate': 'tau' must be a number, got $other")
        }
        if (tau <= 0.0 || tau >= 1.0)
          fail(s"stage 'semantic_gate': tau must be in (0, 1), got $tau")
        val nprobe = long("nprobe").getOrElse(2L)
        if (nprobe < 1)
          fail(s"stage 'semantic_gate': nprobe must be >= 1, got $nprobe")
        val tier = j \ "tier" match {
          case JString(t) if t == "float" || t == "pq" => t
          case JString(t) => fail(s"stage 'semantic_gate': unknown tier " +
            s"'$t' (float | pq)")
          case JNothing => "float"
          case _ => fail("stage 'semantic_gate' 'tier' must be a string " +
            "(float | pq)")
        }
        val pqM = long("pqM").getOrElse(16L)
        if (pqM < 1) fail(s"stage 'semantic_gate': pqM must be >= 1, got $pqM")
        val pqK = long("pqK").getOrElse(16L)
        if (pqK < 1 || pqK > 128)
          fail(s"stage 'semantic_gate': pqK must be in [1, 128], got $pqK")
        val pqResidual = j \ "pqResidual" match {
          case JBool(b) => b
          case JNothing => true
          case _ => fail("stage 'semantic_gate' 'pqResidual' must be a boolean")
        }
        val pqPermute = j \ "pqPermute" match {
          case JBool(b) => b
          case JNothing => false
          case _ => fail("stage 'semantic_gate' 'pqPermute' must be a boolean")
        }
        val shortlist = long("shortlist").getOrElse(64L)
        if (shortlist < 1)
          fail(s"stage 'semantic_gate': shortlist must be >= 1, got $shortlist")
        SemanticGate(path, k.toInt, tau, nprobe.toInt, tier, pqM.toInt,
          pqK.toInt, pqResidual, pqPermute, shortlist.toInt)
      case "store_vacuum" =>
        val kinds =
          Set("substr", "neardup", "lm", "bm25", "bpe", "ivf", "probe",
            "strata", "mediadigest", "mediasig", "mediacdc")
        val kind = j \ "kind" match {
          case JString(k) if kinds(k) => k
          case JString(k) => fail(s"stage 'store_vacuum': unknown kind " +
            s"'$k' (${kinds.toSeq.sorted.mkString(" | ")})")
          case _ => fail("stage 'store_vacuum' needs a 'kind' string " +
            s"(${kinds.toSeq.sorted.mkString(" | ")})")
        }
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'store_vacuum' needs a non-empty 'path' string")
        }
        StoreVacuum(kind, path)
      case "ivf_maintain" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'ivf_maintain' needs a non-empty 'path' string")
        }
        val k = long("k").getOrElse(fail("stage 'ivf_maintain' needs 'k' " +
          "(the refit's training cell count)"))
        if (k < 1) fail(s"stage 'ivf_maintain': k must be >= 1, got $k")
        val thr = long("l1ThresholdPpm").getOrElse(500000L)
        if (thr < 0)
          fail(s"stage 'ivf_maintain': l1ThresholdPpm must be >= 0, got $thr")
        val vac = j \ "vacuum" match {
          case JBool(b) => b
          case JNothing => true
          case other =>
            fail(s"stage 'ivf_maintain': 'vacuum' must be a boolean, got $other")
        }
        val perm = j \ "permute" match {
          case JString("keep") => "keep"
          case JString("auto") => "auto"
          case JNothing => "keep"
          case JString(m) => fail("stage 'ivf_maintain': unknown " +
            s"permute mode '$m' (keep | auto)")
          case other => fail("stage 'ivf_maintain': 'permute' must be " +
            s"a string (keep | auto), got $other")
        }
        IvfMaintain(path, k.toInt, thr, vac, perm)
      case "lm_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'lm_gate' needs a non-empty 'path' string")
        }
        val lo = long("loMicro").getOrElse(fail("stage 'lm_gate' needs 'loMicro'"))
        if (lo < 0) fail(s"stage 'lm_gate': loMicro must be >= 0, got $lo")
        val hi = long("hiMicro").getOrElse(Long.MaxValue)
        if (hi < lo) fail(s"stage 'lm_gate': hiMicro ($hi) < loMicro ($lo)")
        LmGate(path, lo, hi)
      case "probe_gate" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'probe_gate' needs a non-empty 'path' string")
        }
        ProbeGate(path)
      case "bpe_tokenize" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'bpe_tokenize' needs a non-empty 'path' string")
        }
        val n = long("numMerges")
          .getOrElse(fail("stage 'bpe_tokenize' needs 'numMerges'"))
        if (n < 1) fail(s"stage 'bpe_tokenize': numMerges must be >= 1, got $n")
        BpeTokenize(path, n.toInt)
      case "shard_write" =>
        val path = j \ "path" match {
          case JString(p) if p.trim.nonEmpty => p
          case _ => fail("stage 'shard_write' needs a non-empty 'path' string")
        }
        val capacity = long("capacity")
          .getOrElse(fail("stage 'shard_write' needs 'capacity'"))
        if (capacity < 1)
          fail(s"stage 'shard_write': capacity must be >= 1, got $capacity")
        val units = j \ "units" match {
          case JString(u)
            if u == "chars" || u == "subtokens" || u == "bytes" => u
          case JNothing => "chars"
          case other => fail("stage 'shard_write': units must be 'chars', " +
            s"'subtokens' or 'bytes', got $other")
        }
        val binary = j \ "binary" match {
          case JString(b) if b.trim.nonEmpty => Some(b)
          case JNothing => None
          case other => fail("stage 'shard_write': 'binary' must be a " +
            s"non-empty column name, got $other")
        }
        if (units == "bytes" && binary.isEmpty)
          fail("stage 'shard_write': units 'bytes' needs 'binary' (the " +
            "payload column octet_length measures)")
        if (units != "bytes" && binary.nonEmpty)
          fail("stage 'shard_write': 'binary' is only meaningful with " +
            s"units 'bytes' (got units '$units')")
        val epoch = long("epoch").getOrElse(1L)
        if (epoch < 1 || epoch > Int.MaxValue)
          fail(s"stage 'shard_write': epoch must be >= 1, got $epoch")
        val streams = long("streams").getOrElse(16L)
        if (streams != 1L && streams != 16L && streams != 256L)
          fail("stage 'shard_write': streams must be 1, 16 or 256 " +
            s"(hex-prefix parallelism), got $streams")
        ShardWrite(path, capacity, units, epoch.toInt, streams.toInt,
          binary)
      case other =>
        fail(s"unknown stage '$other' (exact_dedup | quality_gate | " +
          "fluency_band | lang_gate | media_gate | media_dedup | " +
          "media_digest_gate | media_sig_gate | media_cdc_gate | " +
          "media_decontam_gate | token_budget | " +
          "temperature_mix | mix_gate | repeat_epochs | where | " +
          "substr_gate | decontam_gate | neardup_gate | semantic_gate | " +
          "ivf_maintain | store_vacuum | lm_gate | probe_gate | " +
          "bpe_tokenize | shard_write)")
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"curation config: $msg")
}
