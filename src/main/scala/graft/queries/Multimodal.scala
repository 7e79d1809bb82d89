package graft.queries

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: media payloads as opaque `BINARY` columns
  * with typed metadata, plus a batched "decode" stage.
  *
  * The container has no image/audio codecs, so decoding is STUBBED with a
  * deterministic fake (see [[graft.multimodal.Decode]]); everything
  * Spark-side — binary schema, partition-parallel batch iteration, typed
  * output — is real. The `documents.text` bytes stand in for media blobs.
  */
object Multimodal {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- Binary metadata extraction: byte length, content hash, and
    // stub-"decoded" dimensions derived with exact integer arithmetic.
    // The length * prime products are computed in 64-bit on BOTH engines:
    // in 32-bit, a document over ~20 KB would overflow (ArithmeticException
    // under Spark 4's ANSI mode, silent wrap elsewhere). ------------------
    QueryDef("q60_blob_meta", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).as("n_bytes"),
          sha2(col("text"), 256).as("sha"),
          (octet_length(col("text")).cast("bigint") * 7919 % 1024).as("width"),
          (octet_length(col("text")).cast("bigint") * 104729 % 768).as("height"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  octet_length(CAST(text AS BLOB)) AS n_bytes,
             |  sha256(text) AS sha,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 7919 % 1024 AS width,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 104729 % 768 AS height
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Batched decode via mapPartitions (the Dataset-typed path a real
    // codec would use: one decoder instance per partition, streaming
    // iterator, no driver involvement). Deterministic stub -> stable
    // output, but not expressible in SQL -> rows-only check. --------------
    QueryDef("q61_decode_batch", (s, d) => {
      val spark = s
      import spark.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // A real pipeline would initialize the codec here, once per
          // partition, then decode each payload in the batch.
          val decoder = graft.multimodal.Decode.open()
          it.map { case (id, bytes) => decoder.decode(id, bytes) }
        }
        .toDF()
        .orderBy("doc_id")
    },
      None),

    // ---- Full media pipeline: decode -> frame-sample -> feature-extract.
    // flatMap over sampled frames then per-frame features; the shape a
    // video/image ingest pipeline has at scale (each stage map-parallel,
    // output flat and columnar). Stubbed per graft.multimodal. ------------
    QueryDef("q62_media_pipeline", (s, d) => {
      val spark = s
      import spark.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val decoder = graft.multimodal.Decode.open()
          it.flatMap { case (id, bytes) =>
            val meta = decoder.decode(id, bytes)
            val resized = graft.multimodal.Transforms.resize(meta)
            graft.multimodal.Transforms.sampleFrames(meta).map { f =>
              (meta.doc_id, meta.format, resized.target_w, resized.target_h,
                f.frame_idx, f.frame_checksum)
            }
          }
        }
        .toDF("doc_id", "format", "target_w", "target_h", "frame_idx", "frame_checksum")
        .orderBy("doc_id", "frame_idx")
    },
      None),
  )
}
