package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import U._

/** Opaque binary payload + typed metadata, as a 100 TB multimodal table
  * would carry (image/audio/video bytes next to width/height/format). */
case class MMRecord(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

/** Output of the decode/feature-extract stage: integer micro-unit image
  * statistics (exact arithmetic — no float drift between engines). */
case class MMFeature(doc_id: Long, byte_len: Int, mean_e6: Long,
  var_e6: Long, edge_e6: Long, width: Int, height: Int)

/** Multimodal decode/feature plumbing (builder brief): binary columns are
  * processed in partition-sized batches through a typed `mapPartitions` —
  * the Scala analogue of `mapInPandas` — so a real decoder (libjpeg,
  * ffmpeg, ...) would amortize per-batch setup and never materialize the
  * whole column on one node. The codec step is stubbed (image libs are
  * not in this container): the utf-8 payload bytes stand in for decoded
  * pixel rows. The feature math on those bytes is REAL — mean / variance
  * / horizontal edge energy, the first statistics an image-quality filter
  * computes — done in exact integer micro-units (floor division) so the
  * DuckDB oracle reproduces it bit-for-bit.
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
        it.map { r =>
          val p = r.payload.map(b => (b & 0xff).toLong)
          val n = p.length.toLong
          val sumP = p.sum
          val sumSq = p.map(x => x * x).sum
          val edge = p.iterator.sliding(2).withPartial(false)
            .map { w => math.abs(w(1) - w(0)) }.sum
          // BigInt intermediates: the variance numerator 1e6·(n·Σp² − (Σp)²)
          // overflows Long past ~760 KB payloads, while DuckDB's list_sum
          // promotes to HUGEINT — BigInt keeps the two engines bit-equal at
          // any payload size. Guards mirror the oracle's CASE WHEN.
          val meanE6 =
            if (n > 0) (BigInt(1000000) * sumP / (BigInt(255) * n)).toLong else 0L
          val varE6 =
            if (n > 0)
              (BigInt(1000000) * (BigInt(n) * sumSq - BigInt(sumP) * sumP)
                / (BigInt(65025) * n * n)).toLong
            else 0L
          val edgeE6 =
            if (n > 1) (BigInt(1000000) * edge / (BigInt(255) * (n - 1))).toLong
            else 0L
          MMFeature(r.doc_id, p.length, meanE6, varE6, edgeE6, r.width, r.height)
        }
      }.toDF()
        .select("doc_id", "byte_len", "mean_e6", "var_e6", "edge_e6",
          "width", "height")
        .orderBy("doc_id")
    })
  )

  // The corpus is pure ASCII (verified: octet_length == length at every
  // sf), so DuckDB's per-character ascii() sees exactly the utf-8 bytes
  // the Scala side consumes.
  val oracle: Map[String, String] = Map(
    "q_mm_features" ->
      """WITH b AS (SELECT doc_id, n_chars,
             list_transform(string_split(text, ''),
               c -> CAST(ascii(c) AS BIGINT)) AS p
           FROM documents),
         s AS (SELECT doc_id, n_chars, len(p) AS n,
                 list_sum(p) AS sum_p,
                 list_sum(list_transform(p, x -> x * x)) AS sum_sq,
                 list_sum(list_transform(range(1, len(p)),
                   i -> abs(p[i] - p[i + 1]))) AS edge
               FROM b)
         SELECT doc_id,
           CAST(n AS INT) AS byte_len,
           CAST(CASE WHEN n > 0 THEN (1000000 * sum_p) // (255 * n)
                     ELSE 0 END AS BIGINT) AS mean_e6,
           CAST(CASE WHEN n > 0 THEN (1000000 * (n * sum_sq - sum_p * sum_p))
                                     // (65025 * n * n)
                     ELSE 0 END AS BIGINT) AS var_e6,
           CAST(CASE WHEN n > 1 THEN (1000000 * edge) // (255 * (n - 1))
                     ELSE 0 END AS BIGINT) AS edge_e6,
           CAST(n_chars % 640 + 32 AS INT) AS width,
           CAST(n_chars % 480 + 32 AS INT) AS height
         FROM s ORDER BY doc_id"""
  )
}
