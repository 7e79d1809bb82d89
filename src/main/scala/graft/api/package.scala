package graft

/** The single import surface for using graft as a LIBRARY (r13 verdict
  * ask #6): `import graft.api._` exposes every operator namespace
  * without reaching into query bodies.
  *
  * Each value below IS the implementation object — no wrappers, no
  * drift. The per-function contracts (inputs, bounds, determinism
  * guarantees, scale shape) live in each function's Scaladoc and are
  * compiled into the checked-in `API.md` catalog by
  * `graft.tools.ApiCatalog`, which fails if any public operator lacks a
  * documented contract — the §2.9 validation pattern applied to the API
  * surface.
  *
  * Registry-backed operators (everything with a `q*` face) additionally
  * carry a DuckDB oracle in `SparkEntry.oracleSql`; `QUERIES.md` maps
  * query name -> source -> spec coverage.
  */
package object api {
  /** Relational/TPC-H-ish operator faces (scan, filter, join, agg...). */
  val Relational = graft.queries.Relational
  /** Exact/near dedup, LSH, winnowing, components, decontamination. */
  val Dedup = graft.queries.Dedup
  /** Embedding similarity: ANN (IVF + kNN-graph lifecycles), near-pair
    * joins, quantization, mining ops for contrastive training. */
  val Similarity = graft.queries.Similarity
  /** Text analysis: BM25/TF-IDF, BPE, language-ID, quality scores,
    * span corruption, collocations, textrank. */
  val Text = graft.queries.Text
  /** Deterministic sampling, splits, packing, importance weighting. */
  val Sampling = graft.queries.Sampling
  /** Quality gates and curation rollups over document corpora. */
  val Curation = graft.queries.Curation
  /** Event/time-series operators (sessionization, trends, anomaly). */
  val Events = graft.queries.Events
  /** Multimodal columns: opaque payload decode plumbing, perceptual
    * near-dup over media payloads. */
  val Multimodal = graft.queries.Multimodal
  /** Storage-layout advisors: z-order, compaction, partition sizing. */
  val Layout = graft.queries.Layout
  /** Data-quality rules: FK/key/FD audits. */
  val Quality = graft.queries.Quality
  /** Preference-data ops (RLHF/DPO): duel mining, Copeland ranking,
    * annotator agreement, chosen/rejected pair construction. */
  val Preference = graft.queries.Preference
  /** Conversation assembly for SFT: chat-quality gating, context-window
    * truncation accounting, template-conversation dedup. */
  val Conversation = graft.queries.Conversation
  /** Mergeable sketches: HLL, KLL, CMS, KMV, moments. */
  val Sketches = graft.queries.Sketches
  /** Structured Streaming faces: watermarked windows and stateful
    * ingest twins of the batch operators. */
  val Streams = graft.streaming.Streams
  /** Native codegen'd Catalyst expressions (array kernels, hashes). */
  val Functions = graft.functions.ArrayExprs
}
