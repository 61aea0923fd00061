package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import U._

/** Opaque binary payload + typed metadata, as a 100 TB multimodal table
  * would carry (image/audio/video bytes next to width/height/format). */
case class MMRecord(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

/** Output of the (stubbed) decode/feature-extract stage. */
case class MMFeature(doc_id: Long, f0: Double, f1: Double, f2: Double,
  f3: Double, width: Int, height: Int, byte_len: Int)

/** Multimodal decode/feature plumbing (builder brief): binary columns are
  * processed in partition-sized batches through a typed `mapPartitions` —
  * the Scala analogue of `mapInPandas` — so a real decoder (libjpeg,
  * ffmpeg, ...) would amortize per-batch setup and never materialize the
  * whole column on one node. The decode step itself is STUBBED (image
  * libs are not in this container) with a deterministic byte-level fake;
  * the schema, batching, partitioning and UDF signature are real.
  */
object Multimodal {

  val queries: Map[String, Q] = Map(
    "q_mm_features" -> ((s, d) => {
      import s.implicits._
      val recs = Tables(s, d, "documents").select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        (col("n_chars") % 640 + 32).cast("int").as("width"),
        (col("n_chars") % 480 + 32).cast("int").as("height"))
        .as[MMRecord]
      recs.mapPartitions { it =>
        // STUB decode: a real implementation decodes r.payload with an
        // image/audio codec here. Deterministic fake: first bytes scaled
        // to [0,1] stand in for extracted features.
        it.map { r =>
          val f = r.payload.take(4).map(b => (b & 0xff) / 255.0).padTo(4, 0.0)
          MMFeature(r.doc_id, f(0), f(1), f(2), f(3),
            r.width, r.height, r.payload.length)
        }
      }.toDF()
        .select(col("doc_id"), round(col("f0"), 6).as("f0"),
          round(col("f1"), 6).as("f1"), round(col("f2"), 6).as("f2"),
          round(col("f3"), 6).as("f3"), col("width"), col("height"),
          col("byte_len"))
        .orderBy("doc_id")
    })
  )

  // No oracle: byte-level feature extraction is not expressible in
  // DuckDB SQL over these views; covered by rows>0 + determinism spec.
  val oracle: Map[String, String] = Map.empty
}
