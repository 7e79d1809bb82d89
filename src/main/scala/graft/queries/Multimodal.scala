package graft.queries

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.expressions.Window
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
             |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
             |  sha256(text) AS sha,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 7919 % 1024 AS width,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 104729 % 768 AS height
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Batched decode via mapPartitions (the Dataset-typed path a real
    // codec would use: one decoder instance per partition, streaming
    // iterator, no driver involvement). The stub is deterministic byte
    // arithmetic, so DuckDB can recompute it exactly: the rolling checksum
    // is a wrapping 64-bit fold reproduced with HUGEINT mod 2^64 (signed
    // view at the end), and byte values equal codepoints because the
    // testdata payloads are ASCII (asserted: length == octet_length for
    // every row at every SF). Full hash-match oracle. -------------------
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
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    octet_length(CAST(text AS BLOB)) AS nb,
             |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
             |      list_transform(range(1, length(text)+1), i -> CAST(unicode(text[i]) AS HUGEINT))),
             |      (h, c) -> (31*h + c) % 18446744073709551616) AS ucsum
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(nb AS INTEGER) AS n_bytes,
             |  CASE WHEN nb % 3 = 0 THEN 'img' WHEN nb % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS format,
             |  CAST(nb * 7919 % 1024 AS INTEGER) AS width,
             |  CAST(nb * 104729 % 768 AS INTEGER) AS height,
             |  CAST(nb % 16 + 1 AS INTEGER) AS n_frames,
             |  CAST(CASE WHEN ucsum >= 9223372036854775808
             |       THEN ucsum - 18446744073709551616 ELSE ucsum END AS BIGINT) AS checksum
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- Full media pipeline: decode -> frame-sample -> feature-extract.
    // flatMap over sampled frames then per-frame features; the shape a
    // video/image ingest pipeline has at scale (each stage map-parallel,
    // output flat and columnar). Stubbed per graft.multimodal; the stub
    // arithmetic (incl. the aspect-fit resize in IEEE doubles and the
    // per-frame wrapping checksum) is mirrored exactly in SQL -> full
    // hash-match oracle. -------------------------------------------------
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
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    octet_length(CAST(text AS BLOB)) AS nb,
             |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
             |      list_transform(range(1, length(text)+1), i -> CAST(unicode(text[i]) AS HUGEINT))),
             |      (h, c) -> (31*h + c) % 18446744073709551616) AS ucsum
             |  FROM documents),
             |d AS (
             |  SELECT doc_id,
             |    CASE WHEN nb % 3 = 0 THEN 'img' WHEN nb % 3 = 1 THEN 'audio'
             |         ELSE 'video' END AS format,
             |    nb * 7919 % 1024 AS width, nb * 104729 % 768 AS height,
             |    nb % 16 + 1 AS n_frames, ucsum
             |  FROM m),
             |s AS (
             |  SELECT d.*, least(224.0 / greatest(width, 1),
             |                    224.0 / greatest(height, 1)) AS sc FROM d),
             |f AS (SELECT s.*, unnest(range(0, n_frames, 4)) AS frame_idx FROM s)
             |SELECT doc_id, format,
             |  CAST(greatest(1, floor(width * sc)) AS INTEGER) AS target_w,
             |  CAST(greatest(1, floor(height * sc)) AS INTEGER) AS target_h,
             |  CAST(frame_idx AS INTEGER) AS frame_idx,
             |  CAST(CASE WHEN (31*ucsum + frame_idx) % 18446744073709551616 >= 9223372036854775808
             |       THEN (31*ucsum + frame_idx) % 18446744073709551616 - 18446744073709551616
             |       ELSE (31*ucsum + frame_idx) % 18446744073709551616 END AS BIGINT) AS frame_checksum
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin)),

    // ---- Modality-interleaved batch packing ------------------------------
    // The assembly step a multimodal trainer consumes: fixed 8-slot
    // batches with a pinned modality ratio (6 text slots + 2 media
    // slots), each modality stream filling its slot range in id order.
    // Either stream running out leaves later batches partially filled —
    // the honest tail, reported rather than silently rebalanced.
    //
    // Scale shape: each stream's global position comes from the q70
    // two-phase prefix rank (stride bucketing + hierarchical chunk
    // offsets — no single-task window, no corpus sort); batch and slot
    // are then pure arithmetic on the rank. One shuffle per stream.
    QueryDef("q188_modality_pack", (s, d) => {
      def ranked(df: org.apache.spark.sql.DataFrame, idCol: String) = {
        val mx = df.agg(max(col(idCol)).as("mx"), count(lit(1)).as("cnt"))
        val sub = df.crossJoin(broadcast(mx))
          .withColumn("nb", Sampling.prefixBuckets(col("cnt")))
          .withColumn("sub", expr(s"$idCol div (mx div nb + 1)"))
          .drop("mx", "cnt", "nb")
        val offsets = Sampling.chunkOffsets(
          sub.groupBy("sub").agg(count(lit(1)).as("tot")), "sub", "tot")
        val wLoc = Window.partitionBy("sub").orderBy(idCol)
        sub.withColumn("lrn", row_number().over(wLoc).cast("long"))
          .join(broadcast(offsets), "sub")
          .select(col(idCol).as("item_id"),
            (col("off") + col("lrn")).as("rank"))
      }
      val texts = ranked(t(s, d, "documents").select("doc_id"), "doc_id")
        .select(expr("(rank - 1) div 6").as("batch_id"),
          expr("CAST((rank - 1) % 6 AS INT)").as("slot"),
          lit("text").as("modality"), col("item_id"))
      val media = ranked(t(s, d, "embeddings").select("vec_id"), "vec_id")
        .select(expr("(rank - 1) div 2").as("batch_id"),
          expr("CAST(6 + (rank - 1) % 2 AS INT)").as("slot"),
          lit("media").as("modality"), col("item_id"))
      texts.union(media).orderBy("batch_id", "slot")
    },
      Some("""WITH tr AS MATERIALIZED (
             |  SELECT doc_id AS item_id,
             |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rank
             |  FROM documents),
             |ir AS MATERIALIZED (
             |  SELECT vec_id AS item_id,
             |    CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS rank
             |  FROM embeddings)
             |SELECT * FROM (
             |  SELECT (rank - 1) // 6 AS batch_id,
             |    CAST((rank - 1) % 6 AS INTEGER) AS slot,
             |    'text' AS modality, item_id
             |  FROM tr
             |  UNION ALL
             |  SELECT (rank - 1) // 2,
             |    CAST(6 + (rank - 1) % 2 AS INTEGER), 'media', item_id
             |  FROM ir)
             |ORDER BY batch_id, slot""".stripMargin)),

    // ---- Video frame-sampling plan --------------------------------------
    // The planning stage in front of a frame-extract decode (the
    // mapInPandas batch whose codec this container lacks): per blob,
    // derive duration/fps from metadata (stub arithmetic on the blob,
    // q60's rule), then emit the frame-request rows a decoder batch
    // would consume — uniform stride capped at 16 frames per clip, each
    // with its timestamp and estimated byte offset. The generator is
    // `explode(sequence(...))` — rows fan out in the SCAN stage with no
    // shuffle at all (the plan is embarrassingly parallel at any
    // corpus size), and every derived number is exact int64 arithmetic
    // so the oracle replays it with generate_series. Stride is
    // ceil(duration/16) via (d + 15) div 16 — never 0, at most 16
    // frames, SHORT clips sample every ms.
    QueryDef("q274_frame_sample_plan", (s, d) => {
      val nb = octet_length(col("text")).cast("bigint")
      val blobs = t(s, d, "documents")
        .select(col("doc_id"), nb.as("n_bytes"),
          (nb * 3 + 40).as("duration_ms"),
          (lit(24L) + nb % 8).as("fps"))
      blobs
        .withColumn("stride_ms", expr("(duration_ms + 15) div 16"))
        .select(col("doc_id"), col("n_bytes"), col("duration_ms"),
          col("fps"), col("stride_ms"),
          posexplode(sequence(lit(0L), col("duration_ms") - 1,
            col("stride_ms"))).as(Seq("frame_idx", "ts_ms")))
        .withColumn("frame_no", expr("ts_ms * fps div 1000"))
        .withColumn("byte_offset", expr("ts_ms * n_bytes div duration_ms"))
        .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
          col("ts_ms"), col("frame_no"), col("byte_offset"))
        .orderBy("doc_id", "frame_idx")
    },
      Some("""WITH b AS MATERIALIZED (
             |  SELECT doc_id,
             |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 3 + 40
             |      AS duration_ms,
             |    24 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 8
             |      AS fps
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, n_bytes, duration_ms, fps,
             |    (duration_ms + 15) // 16 AS stride_ms
             |  FROM b)
             |SELECT doc_id,
             |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ts_ms)
             |    - 1 AS INTEGER) AS frame_idx,
             |  CAST(ts_ms AS BIGINT) AS ts_ms,
             |  CAST(ts_ms * fps // 1000 AS BIGINT) AS frame_no,
             |  CAST(ts_ms * n_bytes // duration_ms AS BIGINT) AS byte_offset
             |FROM p, LATERAL (
             |  SELECT unnest(generate_series(0, duration_ms - 1, stride_ms))
             |    AS ts_ms)
             |ORDER BY doc_id, frame_idx""".stripMargin)),
  )
}
