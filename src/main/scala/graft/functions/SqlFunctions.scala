package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL names for the pipeline function surface: a SQL-first user (the
  * reference's default persona — its whole interface is SQL) gets the
  * dedup / similarity / text-analysis / time operators as
  * `SELECT graft_minhash(text, 4) FROM docs` without touching the Scala
  * API. Each registration re-expresses the same codegen'd Column
  * composition as an expression-tree builder — nothing becomes a UDF, so
  * SQL callers get identical plans (and performance) to DataFrame callers.
  */
object SqlFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => sys.error(s"$what must be an integer literal, got $other")
  }

  /** Register all graft_* functions into the session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    def c(e: Expression): Column = GraftSqlShim.column(e)
    def reg(name: String)(builder: Seq[Expression] => Column): Unit =
      fr.createOrReplaceTempFunction(name,
        exprs => GraftSqlShim.expression(builder(exprs)), "internal")

    // text analysis
    reg("graft_tokens") { e => TextFunctions.tokens(c(e.head)) }
    reg("graft_token_count") { e => TextFunctions.tokenCount(c(e.head)) }
    reg("graft_bpe_tokens") { e => TextFunctions.bpeTokens(c(e.head)) }
    reg("graft_fingerprint") { e => TextFunctions.fingerprint(c(e.head)) }
    // dedup signatures
    reg("graft_bow_signature") { e => TextFunctions.bagOfWordsSignature(c(e.head)) }
    reg("graft_minhash") { e =>
      val k = if (e.size > 1) litInt(e(1), "k") else 4
      TextFunctions.minhashSignature(c(e.head), k)
    }
    reg("graft_simhash") { e =>
      val bits = if (e.size > 1) litInt(e(1), "bits") else 16
      TextFunctions.simhash(c(e.head), bits)
    }
    reg("graft_shingles") { e => TextFunctions.shingles(c(e.head), litInt(e(1), "k")) }
    reg("graft_jaccard_tokens") { e => TextFunctions.jaccardTokens(c(e.head), c(e(1))) }
    // vectors (the kernels' generic numeric path accepts SQL
    // decimal-literal arrays with the HOF forms' per-lane cast semantics)
    reg("graft_cosine") { e => VectorFunctions.cosineSimilarity(c(e.head), c(e(1))) }
    reg("graft_lsh_bucket") { e =>
      val bits = if (e.size > 1) litInt(e(1), "bits") else 8
      VectorFunctions.lshBucket(c(e.head), bits)
    }
    // TIME surrogate
    reg("graft_time_from_string") { e => TimeFunctions.timeFromString(c(e.head)) }
    reg("graft_time_to_string") { e => TimeFunctions.timeToString(c(e.head)) }
    reg("graft_time_of_day") { e => TimeFunctions.timeOfDayMicros(c(e.head)) }
    reg("graft_hour_of_time") { e => TimeFunctions.hourOfTime(c(e.head)) }
    // uuid
    reg("graft_uuid") { e => TimeFunctions.uuidFromBytes(c(e.head)) }
    // multimodal
    reg("graft_sniff_format") { e => graft.operators.Multimodal.sniffFormat(c(e.head)) }
    reg("graft_decode_image") { e => graft.operators.Multimodal.decodeImage(c(e.head)) }
    reg("graft_decode_audio") { e => graft.operators.Multimodal.decodeAudio(c(e.head)) }
    reg("graft_image_stats") { e => graft.operators.Multimodal.imageStats(c(e.head)) }
    reg("graft_image_dhash") { e => graft.operators.Multimodal.imageDhash(c(e.head)) }
    reg("graft_audio_fingerprint") { e => graft.operators.Multimodal.audioFingerprint(c(e.head)) }
    reg("graft_quantize_int8") { e => VectorFunctions.quantizeInt8(c(e.head)) }
    reg("graft_dequantize_int8") { e => VectorFunctions.dequantizeInt8(c(e.head)) }
    reg("graft_sanitize_vector") { e => VectorFunctions.sanitizeVector(c(e.head)) }
    reg("graft_quantized_cosine") { e =>
      VectorFunctions.quantizedCosine(c(e.head), c(e(1)))
    }
    reg("graft_kmv_hash60") { e => SketchFunctions.hash60(c(e.head)) }
    reg("graft_resize_image") { e =>
      graft.operators.Multimodal.resizeImage(c(e.head), litInt(e(1), "maxWidth"))
    }
    reg("graft_sample_frames") { e =>
      graft.operators.Multimodal.sampleFrames(c(e.head), litInt(e(1), "stride"))
    }
    reg("graft_frame_dhashes") { e =>
      graft.operators.Multimodal.frameDhashes(c(e.head), litInt(e(1), "stride"))
    }
    reg("graft_audio_segments") { e =>
      graft.operators.Multimodal.audioSegmentFingerprints(c(e.head), litInt(e(1), "segLen"))
    }
  }
}
