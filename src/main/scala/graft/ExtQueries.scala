package graft

import graft.ext.{Curation, Dedup, Multimodal, Sampling, Similarity, TextAnalysis, Urls}
import org.apache.spark.sql.functions._

/** Catalog entries for the north-star analytics operators (SURVEY §7.7):
  * dedup family, similarity search, text analysis, multimodal columns.
  *
  * Oracle parity notes: word hashes are md5-hex-prefix based (identical
  * text → identical hex in both engines; fixed-width hex compares
  * lexicographically = numerically); float folds are explicit sequential
  * reduces on double-cast elements so Spark's `aggregate` and DuckDB's
  * `list_reduce` produce bit-identical doubles.
  */
object ExtQueries {
  import Queries.Q

  // ===========================================================================
  // dedup
  // ===========================================================================

  private val dedupExact = Q(
    "dedup_exact",
    (s, d) => Dedup.exact(Tables.documents(s, d)).orderBy(col("keeper_id")),
    Some("""
      SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY keeper_id
    """))

  /** Shared oracle CTE chain: words → shingles → 60-bit hashes → 4 mixed
    * signatures, mirroring Dedup.shingleHashes/sigFromHashes (one md5 per
    * shingle; signatures are ((h%p)·a+b)%p mins).
    */
  private def sqlSigCtes(src: String = "documents"): String = {
    val mixes = Dedup.MinhashA.zip(Dedup.MinhashB).zipWithIndex.map {
      case ((a, b), i) =>
        s"list_min(list_transform(hashes, h -> ((h % ${Dedup.MinhashP}) * $a + $b) % ${Dedup.MinhashP})) AS sig$i"
    }.mkString(",\n               ")
    s"""w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM $src
      ), sh AS (
        SELECT doc_id,
               list_transform(range(1, len(words) - 1),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS shingles
        FROM w WHERE len(words) >= 3
      ), hs AS (
        SELECT doc_id,
               list_transform(shingles, g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)) AS hashes
        FROM sh
      ), sig AS (
        SELECT doc_id,
               $mixes
        FROM hs
      )"""
  }

  private val sqlBandsCte: String =
    """bands AS (
        SELECT doc_id, 0 AS band,
               CAST(sig0 AS VARCHAR) || ':' || CAST(sig1 AS VARCHAR) AS bucket FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band,
               CAST(sig2 AS VARCHAR) || ':' || CAST(sig3 AS VARCHAR) AS bucket FROM sig
      )"""

  private val minhashSig = Q(
    "dedup_minhash_sig",
    (s, d) => Dedup.minhashSignatures(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some(s"""
      WITH ${sqlSigCtes()}
      SELECT doc_id, sig0, sig1, sig2, sig3 FROM sig ORDER BY doc_id
    """))

  private val minhashLsh = Q(
    "dedup_minhash_lsh",
    (s, d) => Dedup.lshBands(Dedup.minhashSignatures(Tables.documents(s, d)))
      .orderBy(col("band"), col("bucket")),
    Some(s"""
      WITH ${sqlSigCtes()}, $sqlBandsCte
      SELECT band, bucket, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      FROM bands GROUP BY band, bucket ORDER BY band, bucket
    """))

  private val lshPairs = Q(
    "dedup_lsh_pairs",
    (s, d) => Dedup.lshCandidatePairs(Dedup.minhashSignatures(Tables.documents(s, d)))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH ${sqlSigCtes()}, $sqlBandsCte
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      ORDER BY doc_a, doc_b
    """))

  /** Cross-corpus dedup ([[graft.ext.Dedup.dedupAgainst]]): the new corpus
    * (doc_id % 3 ≠ 0) deduplicated against the reference corpus
    * (doc_id % 3 = 0) — digest membership for exact, LSH-bucket membership
    * for near, no pair expansion anywhere. The oracle replays both
    * membership tests over the shared signature CTEs. Docs with
    * doc_id % 41 = 7 carry a shared constant text (41 and 3 are coprime,
    * so the constant lands on both sides of the split) — the exact arm
    * provably engages; the corpus's organic near-dups straddling the
    * split drive the near arm.
    */
  private val crossCorpusQ = {
    val dupText = "cross snapshot boilerplate " +
      (1 to 40).map(i => s"xdup$i").mkString(" ")
    val dirtied = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("text",
        when(col("doc_id") % 41 === 7, lit(dupText)).otherwise(col("text")))
    val sqlDirty =
      s"""(SELECT * REPLACE (
           CASE WHEN doc_id % 41 = 7 THEN '$dupText' ELSE text END AS text)
           FROM documents)"""
    Q(
      "dedup_cross_corpus",
      (s, d) => Dedup.dedupAgainst(
        dirtied(Tables.documents(s, d)).filter(col("doc_id") % 3 =!= 0),
        dirtied(Tables.documents(s, d)).filter(col("doc_id") % 3 === 0))
        .orderBy(col("doc_id")),
      Some(s"""
        WITH ${sqlSigCtes(sqlDirty)}, $sqlBandsCte,
        refh AS (SELECT DISTINCT md5(text) AS h FROM $sqlDirty WHERE doc_id % 3 = 0),
        refb AS (SELECT DISTINCT band, bucket FROM bands WHERE doc_id % 3 = 0),
        near AS (
          SELECT DISTINCT b.doc_id FROM bands b
          JOIN refb r ON b.band = r.band AND b.bucket = r.bucket
          WHERE b.doc_id % 3 <> 0
        ), newd AS (
          SELECT doc_id, md5(text) IN (SELECT h FROM refh) AS exact_dup,
                 doc_id IN (SELECT doc_id FROM near) AS near_dup
          FROM $sqlDirty WHERE doc_id % 3 <> 0
        )
        SELECT doc_id, exact_dup, near_dup,
               NOT exact_dup AND NOT near_dup AS keep
        FROM newd ORDER BY doc_id
      """))
  }

  /** Snapshot dedup over the BUCKETED corpus layout
    * ([[graft.sources.BucketedCorpus]]): both snapshots are written
    * bucketed+sorted by digest through the catalog, so the membership join
    * plans with no Exchange on either side — the write-once shuffle that
    * makes every later 100 TB snapshot pass network-free
    * (BucketedLayoutSpec pins the plan shape; this entry pins the rows).
    * The oracle replays the digest membership directly from the documents
    * table — layout must never change answers.
    */
  private val bucketedDedupQ = Q(
    "layout_bucketed_dedup",
    (s, d) => {
      import graft.sources.BucketedCorpus
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("digest"))
      val sfx = java.lang.Integer.toHexString(d.hashCode)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_$sfx"
      BucketedCorpus.writeSnapshot(docs.filter(col("doc_id") % 3 === 0),
        s"graft_ref_snap_$sfx", s"$base/ref", "digest", 8)
      BucketedCorpus.writeSnapshot(docs.filter(col("doc_id") % 3 =!= 0),
        s"graft_new_snap_$sfx", s"$base/new", "digest", 8)
      val ref = BucketedCorpus.snapshot(s, s"graft_ref_snap_$sfx")
        .select(col("digest")).distinct().withColumn("exact_dup", lit(true))
      BucketedCorpus.snapshot(s, s"graft_new_snap_$sfx")
        .join(ref, Seq("digest"), "left")
        .select(col("doc_id"),
          coalesce(col("exact_dup"), lit(false)).as("exact_dup"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             md5(text) IN (SELECT md5(text) FROM documents
                           WHERE doc_id % 3 = 0) AS exact_dup
      FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id
    """))

  /** Connected components over the LSH candidate pairs through the REAL
    * iterative propagation; the oracle computes the same components with a
    * recursive transitive closure — passing proves the fixpoint labeling
    * equals true reachability.
    */
  private val lshGroups = Q(
    "dedup_lsh_groups",
    (s, d) => Dedup.duplicateGroups(
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(Tables.documents(s, d)), distinctPairs = false))
      .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE ${sqlSigCtes()}, $sqlBandsCte,
      cpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cpairs
        UNION SELECT doc_b, doc_a FROM cpairs
      ), nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
      )
      SELECT src AS doc_id, MIN(dst) AS group_id,
             src = MIN(dst) AS is_keeper
      FROM reach GROUP BY src ORDER BY doc_id
    """))

  /** Keep-best-by-quality dedup ([[graft.ext.Dedup.dedupKeepBest]]): the
    * near-dup component keeps its LONGEST member (n_chars, ties by id)
    * instead of the min-id convention. The oracle replays the
    * recursive-closure groups and the quality ranking.
    */
  private val keepBestQ = Q(
    "dedup_keep_best",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val groups = Dedup.duplicateGroups(
        Dedup.lshCandidatePairs(
          Dedup.minhashSignatures(docs), distinctPairs = false))
      Dedup.dedupKeepBest(docs, groups, col("n_chars"))
        .select(col("doc_id"), col("group_id"), col("keep"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${sqlSigCtes()}, $sqlBandsCte,
      cpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cpairs
        UNION SELECT doc_b, doc_a FROM cpairs
      ), nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
      ), grp AS (
        SELECT src AS doc_id, MIN(dst) AS group_id FROM reach GROUP BY src
      ), keyed AS (
        SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS group_id,
               d.n_chars
        FROM documents d LEFT JOIN grp g USING (doc_id)
      )
      SELECT doc_id, group_id,
             ROW_NUMBER() OVER (PARTITION BY group_id
               ORDER BY n_chars DESC, doc_id) = 1 AS keep
      FROM keyed ORDER BY doc_id
    """))

  /** The composed pipeline through the REAL dedupCorpus (exact keepers →
    * LSH grouping over survivors → drop non-keepers); oracle chains the
    * same stages with the recursive-closure groups.
    */
  private val dedupPipelineQ = Q(
    "dedup_pipeline",
    (s, d) => Dedup.dedupCorpus(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE ek AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
      ), surv AS (
        SELECT d.* FROM documents d JOIN ek USING (doc_id)
      ), ${sqlSigCtes("surv")}, $sqlBandsCte,
      cpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cpairs
        UNION SELECT doc_b, doc_a FROM cpairs
      ), nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
      ), losers AS (
        SELECT src AS doc_id FROM reach GROUP BY src HAVING src != MIN(dst)
      )
      SELECT doc_id, lang, source, n_chars FROM surv
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      ORDER BY doc_id
    """))

  /** Shared simhash CTE (fingerprint from word-hash bit votes; word-hash
    * width = bits/4 hex chars, mirroring Dedup.simhash).
    */
  private def sqlSimhashCte(bits: Int, carryLang: Boolean = false): String = s"""sh AS (
        SELECT doc_id,${if (carryLang) " lang," else ""}
               CAST(list_sum(list_transform(range(0, $bits), b ->
                 CASE WHEN list_sum(list_transform(string_split(text, ' '), x ->
                   CASE WHEN CAST(floor(CAST(('0x' || substr(md5(x), 1, ${bits / 4})) AS BIGINT)
                                   / power(2, b)) AS BIGINT) % 2 = 1
                     THEN 1 ELSE -1 END)) >= 0
                   THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
        FROM documents
      )"""

  private val simhashQ = Q(
    "dedup_simhash",
    (s, d) => Dedup.simhash(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some(s"""
      WITH ${sqlSimhashCte(16)}
      SELECT doc_id, simhash FROM sh ORDER BY doc_id
    """))

  /** The Spark side runs the pigeonhole-blocked probe cohorted on `lang`
    * (the canonical text-dedup blocking key — near-dups across languages
    * are accidental hash collisions, not duplicates); the oracle
    * brute-forces every within-lang pair — passing proves the pigeonhole
    * blocking loses no pairs inside the cohorts. The maxBlock cap (2000)
    * is inert at oracle scale so the brute-force comparison stays exact;
    * the lang cohorts split the hot (block, value) groups ~5 ways before
    * the cap is even consulted at the 10×/26× scale rows.
    */
  private val simhashProbeQ = Q(
    "dedup_simhash_neardup",
    (s, d) => Dedup.simhashNearDupPairs(Tables.documents(s, d), maxDist = 2,
        bits = 32, maxBlock = 2000, blockBy = Seq("lang"))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH ${sqlSimhashCte(32, carryLang = true)}
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
      ORDER BY doc_a, doc_b
    """))

  private val jaccardQ = Q(
    "dedup_ngram_jaccard",
    (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), 0.6, maxBlock = 200)
      .orderBy(col("doc_a"), col("doc_b")),
    Some("""
      WITH raw AS (
        SELECT doc_id, lang, source, CAST(floor(n_chars / 100.0) AS INT) AS len_bucket,
               list_distinct(string_split(text, ' ')) AS wset
        FROM documents
      ), w AS (
        SELECT doc_id, lang, source, len_bucket, wset FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source, len_bucket ORDER BY doc_id) AS blk_rank
          FROM raw
        ) WHERE blk_rank <= 200
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.wset, b.wset))) AS DOUBLE) AS jaccard
      FROM w a JOIN w b
        ON a.lang = b.lang AND a.source = b.source AND a.len_bucket = b.len_bucket
       AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.wset, b.wset))) AS DOUBLE) >= 0.6
      ORDER BY doc_a, doc_b
    """))

  /** Passage-level exact-substring dedup through the REAL
    * Dedup.duplicatePassages (20-word windows, stride 10): per-doc count
    * and coverage of windows whose hash appears in more than one document.
    * The corpus's exact-duplicate docs guarantee the path is exercised.
    */
  private val passagesQ = Q(
    "dedup_passages",
    (s, d) => Dedup.duplicatePassages(Tables.documents(s, d), window = 20,
      stride = 10).orderBy(col("doc_id")),
    Some("""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), wins AS (
        SELECT doc_id,
               md5(array_to_string(ws[j*10+1 : j*10+20], ' ')) AS phash
        FROM w, UNNEST(range(0, CAST(floor((len(ws)-20)/10.0) AS BIGINT) + 1)) AS t(j)
        WHERE len(ws) >= 20
      ), dup AS (
        SELECT phash FROM wins GROUP BY phash HAVING COUNT(DISTINCT doc_id) > 1
      ), per AS (
        SELECT doc_id, COUNT(*) AS n_shared
        FROM wins JOIN dup USING (phash) GROUP BY doc_id
      ), nw AS (
        SELECT doc_id,
               CASE WHEN len(ws) >= 20
                    THEN CAST(floor((len(ws)-20)/10.0) AS BIGINT) + 1
                    ELSE 0 END AS n_windows
        FROM w
      )
      SELECT nw.doc_id, nw.n_windows,
             COALESCE(per.n_shared, 0) AS n_shared,
             CASE WHEN nw.n_windows > 0
                  THEN CAST(COALESCE(per.n_shared, 0) AS DOUBLE) / nw.n_windows
                  ELSE 0.0 END AS shared_frac,
             COALESCE(per.n_shared, 0) > 0 AS has_dup_passage
      FROM nw LEFT JOIN per USING (doc_id)
      ORDER BY nw.doc_id
    """))

  /** Span REMOVAL ([[graft.ext.Dedup.removeDupSpans]]): the duplicated
    * passages are cut out of the text, not just counted — the oracle
    * replays window hashing, the ≥2-distinct-docs test, per-word coverage
    * and the in-order rebuild, with the rebuilt STRING itself under the
    * hash (so word order, spacing and the untouched-doc fast path all
    * prove out).
    */
  private val removeSpansQ = Q(
    "dedup_remove_spans",
    (s, d) => Dedup.removeDupSpans(Tables.documents(s, d), window = 20,
      stride = 10).orderBy(col("doc_id")),
    Some("""
      WITH w AS (
        SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
      ), wins AS (
        SELECT doc_id, j*10 AS pos,
               md5(array_to_string(ws[j*10+1 : j*10+20], ' ')) AS phash
        FROM w, UNNEST(range(0, CAST(floor((len(ws)-20)/10.0) AS BIGINT) + 1)) AS t(j)
        WHERE len(ws) >= 20
      ), dup AS (
        SELECT phash FROM wins GROUP BY phash HAVING COUNT(DISTINCT doc_id) > 1
      ), starts AS (
        SELECT doc_id, pos FROM wins JOIN dup USING (phash)
      ), cov AS (
        SELECT DISTINCT doc_id, pos + k AS i
        FROM starts, UNNEST(range(0, 20)) AS t(k)
      ), words AS (
        SELECT w.doc_id, j - 1 AS i, ws[j] AS word
        FROM w, UNNEST(range(1, len(ws) + 1)) AS t(j)
        WHERE w.doc_id IN (SELECT doc_id FROM starts)
      ), reb AS (
        SELECT wo.doc_id,
               array_to_string(list(wo.word ORDER BY wo.i), ' ') AS text_dedup,
               COUNT(*) AS n_kept
        FROM words wo LEFT JOIN cov ON cov.doc_id = wo.doc_id AND cov.i = wo.i
        WHERE cov.i IS NULL
        GROUP BY wo.doc_id
      )
      SELECT w.doc_id, len(w.ws) AS n_words,
             CASE WHEN w.doc_id IN (SELECT doc_id FROM starts)
                  THEN COALESCE(reb.n_kept, 0) ELSE len(w.ws) END AS n_kept,
             CASE WHEN w.doc_id IN (SELECT doc_id FROM starts)
                  THEN COALESCE(reb.text_dedup, '') ELSE w.text END AS text_dedup
      FROM w LEFT JOIN reb USING (doc_id)
      ORDER BY w.doc_id
    """))

  // ===========================================================================
  // similarity search
  // ===========================================================================

  /** DuckDB mirror of the sequential cosine fold (seeded with 0.0 via
    * list_prepend, so the reduce order matches Spark's aggregate exactly).
    */
  private def sqlCos(a: String, b: String): String =
    s"""(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, 65), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))),
          (x, y) -> x + y)
        / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(range(1, 65), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE))),
             (x, y) -> x + y))
         * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(range(1, 65), i -> CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))),
             (x, y) -> x + y))))"""

  private val bruteTopK = Q(
    "sim_brute_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${sqlCos("q", "c")} AS cos
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 5
      ), ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored
      )
      SELECT query_id, rank, neighbor_id, cos FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank
    """))

  private val ivfTopK = Q(
    "sim_ivf_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), 5)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cell"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS cell,
               ${sqlCos("q", "c")} AS cos
        FROM embeddings q JOIN embeddings c
          ON c.label = q.label AND c.vec_id != q.vec_id
        WHERE q.vec_id < 5
      ), ranked AS (
        SELECT query_id, neighbor_id, cell, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored
      )
      SELECT query_id, rank, neighbor_id, cell, cos FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank
    """))

  /** ANN quality measurement ([[graft.ext.Similarity.annRecall]]):
    * recall@k of the cell-pruned IVF search vs the brute-force ground
    * truth, per query — the tuning loop an ANN deployment runs before
    * fixing nprobe/cell count. The oracle recomputes BOTH rankings with
    * the same tie-breaks and intersects them independently.
    */
  private val annRecallQ = Q(
    "sim_ann_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.annRecall(emb, emb.filter(col("vec_id") < 8), 5)
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH bruted AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${sqlCos("q", "c")} AS cos
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
      ), truth AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM bruted
        ) WHERE rank <= 5
      ), ivfd AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${sqlCos("q", "c")} AS cos
        FROM embeddings q JOIN embeddings c
          ON c.label = q.label AND c.vec_id != q.vec_id
        WHERE q.vec_id < 8
      ), approx AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM ivfd
        ) WHERE rank <= 5
      ), hits AS (
        SELECT a.query_id, COUNT(*) AS n_hits
        FROM approx a JOIN truth t
          ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
        GROUP BY a.query_id
      ), truth_counts AS (
        SELECT query_id, COUNT(*) AS n_truth FROM truth GROUP BY query_id
      )
      SELECT q.vec_id AS query_id,
             COALESCE(h.n_hits, 0) AS n_hits,
             CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
               / GREATEST(COALESCE(tc.n_truth, 0), 1) AS recall
      FROM embeddings q
      LEFT JOIN hits h ON h.query_id = q.vec_id
      LEFT JOIN truth_counts tc ON tc.query_id = q.vec_id
      WHERE q.vec_id < 8 ORDER BY query_id
    """))

  /** Full-dim (64) squared-L2 fold between `$e.embedding` and
    * `$c.centroid` — the assign/probe distance the Lloyd chain and the
    * IVF-PQ probe CTE share.
    */
  private def sqlL2Full(e: String, c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, 65),
             i -> (CAST($e.embedding[i] AS DOUBLE) - $c.centroid[i])
                  * (CAST($e.embedding[i] AS DOUBLE) - $c.centroid[i]))),
           (x, y) -> x + y)"""

  /** Shared unrolled-Lloyd CTE chain (k=4, 2 iterations, init = 4 smallest
    * vec_ids, corpus = embeddings WHERE `corpusPred`): defines `e`
    * (corpus), `c0`..`c2` (centroid generations) and `a1`..`a3`
    * (assignments; `a3` is the final model). Used by sim_ivf_train (model
    * parity), dedup_semantic (SemDeDup on the trained clusters), and
    * sim_ivfpq_topk (coarse quantizer; mod-IdStride corpus).
    */
  private def lloydChainOver(corpusPred: String): String = {
    val dist = sqlL2Full("e", "c")
    def assignCte(n: Int, cent: String) =
      s"""a$n AS (
        SELECT vec_id, cell, dist FROM (
          SELECT e.vec_id, c.cell, $dist AS dist,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY $dist ASC, c.cell ASC) AS rn
          FROM e CROSS JOIN $cent c
        ) WHERE rn = 1
      )"""
    def centroidCte(n: Int) =
      s"""m$n AS (
        SELECT cell, list(embedding ORDER BY vec_id) AS ms
        FROM a$n JOIN e USING (vec_id) GROUP BY cell
      ), c$n AS (
        SELECT cell, list_transform(range(1, 65), dd ->
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(ms, m -> CAST(m[dd] AS DOUBLE))),
            (x, y) -> x + y) / len(ms)) AS centroid
        FROM m$n
      )"""
    s"""e AS (SELECT vec_id, embedding FROM embeddings WHERE $corpusPred),
      c0 AS (
        SELECT CAST(vec_id AS INT) AS cell,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
        FROM e WHERE vec_id < 4
      ),
      ${assignCte(1, "c0")}, ${centroidCte(1)},
      ${assignCte(2, "c1")}, ${centroidCte(2)},
      ${assignCte(3, "c2")}"""
  }

  private val lloydChain: String = lloydChainOver("vec_id < 300")

  /** Trained-quantizer IVF build: deterministic Lloyd k-means (k=4, 2
    * iterations, init = 4 smallest vec_ids) through the REAL
    * Similarity.kmeans path; oracle unrolls the same iterations in SQL.
    * Passing means an independent engine reproduces the trained model —
    * assignments AND final distances — bit-for-bit.
    */
  private val ivfTrain = Q(
    "sim_ivf_train",
    (s, d) => Similarity.ivfTrainAssign(
      Tables.embeddings(s, d).filter(col("vec_id") < 300), k = 4, iters = 2, dim = 64)
      .orderBy(col("vec_id")),
    Some(s"""
      WITH $lloydChain
      SELECT vec_id, cell, dist FROM a3 ORDER BY vec_id
    """))

  /** SemDeDup (Abbas et al. 2023) through the REAL composed path: trained
    * k-means clusters as the blocking key, in-cluster lower-id cosine
    * pruning. The oracle replays training (the shared Lloyd chain) AND
    * the dedup policy — an independent engine reproduces which vectors
    * are semantic duplicates, of whom, and at what evidence cosine.
    */
  // threshold 0.3 ≈ the p99 of the synthetic corpus's in-cluster cosines
  // (max 0.456) — real corpora use ~0.95+, but the catalog needs both
  // classes populated so the flag column is actually under the hash
  // corpus predicate is mod-IdStride (identical on base tables where every
  // vec_id < IdStride) so the 26× scale bench grows the clustered corpus
  // instead of re-selecting copy 0 — the MinK cell cap and the blocked
  // pair join are what the scale section is there to prove
  // maxCell = 400: never binds at the correctness SF (300 vectors total,
  // so no cell can reach it — the oracle needs no cap CTE), but at the
  // 26× scale corpus (~7800 vectors, ~2k/cell) it bounds the candidate
  // side the way a real deployment would — SemDeDup's in-cluster pair
  // work is quadratic in cell size, and the MinK cap is the documented
  // mechanism that keeps it bounded when k doesn't scale with the corpus
  private val semanticDedupQ = Q(
    "dedup_semantic",
    (s, d) => Similarity.semanticDedup(
      Tables.embeddings(s, d).filter(col("vec_id") % ScaleData.IdStride < 300),
      k = 4, iters = 2, dim = 64, threshold = 0.3, maxCell = 400)
      .orderBy(col("vec_id")),
    Some(s"""
      WITH ${lloydChainOver(s"vec_id % ${ScaleData.IdStride} < 300")},
      wc AS (
        SELECT e.vec_id, e.embedding, a3.cell FROM e JOIN a3 USING (vec_id)
      ), sc AS (
        SELECT a.vec_id, b.vec_id AS lower_id, ${sqlCos("a", "b")} AS cos
        FROM wc a JOIN wc b ON a.cell = b.cell AND b.vec_id < a.vec_id
      ), di AS (
        SELECT vec_id, MIN(lower_id) AS dup_of, MAX(cos) AS max_cos
        FROM sc WHERE cos >= 0.3 GROUP BY vec_id
      )
      SELECT wc.vec_id, wc.cell, di.dup_of, di.max_cos,
             di.dup_of IS NOT NULL AS is_semantic_dup
      FROM wc LEFT JOIN di USING (vec_id) ORDER BY wc.vec_id
    """))

  /** PQ training/encode/LUT CTE chain over a corpus CTE `e` (defined by
    * the caller): per subspace s — es$s (slice), c0_$s (init), a1_$s/m1_$s/
    * c1_$s (one Lloyd iteration), enc_$s (codes), lut_$s (per-query LUT
    * rows for queries matching `queryPred` over es$s alias `e`). Shared by
    * sim_pq_topk and sim_ivfpq_topk.
    */
  /** Sub-slice squared-L2 fold between `$e.emb` and `$c.centroid` — the
    * per-subspace distance every PQ CTE shares.
    */
  private def sqlL2Sub(subdim: Int)(e: String, c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         list_transform(range(1, ${subdim + 1}),
           i -> (CAST($e.emb[i] AS DOUBLE) - $c.centroid[i])
                * (CAST($e.emb[i] AS DOUBLE) - $c.centroid[i]))),
         (x, y) -> x + y)"""

  private def pqSubCtes(m: Int, kCodes: Int, subdim: Int,
      queryPred: String, src: String = "e"): String = {
    val dist = sqlL2Sub(subdim) _
    (0 until m).map { s =>
      val lo = s * subdim + 1; val hi = (s + 1) * subdim
      s"""es$s AS (
          SELECT vec_id, embedding[$lo:$hi] AS emb FROM $src
        ), c0_$s AS (
          SELECT CAST(vec_id AS INT) AS cell,
                 list_transform(emb, x -> CAST(x AS DOUBLE)) AS centroid
          FROM es$s WHERE vec_id < $kCodes
        ), a1_$s AS (
          SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY ${dist("e", "c")} ASC, c.cell ASC) AS rn
            FROM es$s e CROSS JOIN c0_$s c
          ) WHERE rn = 1
        ), m1_$s AS (
          SELECT cell, list(emb ORDER BY vec_id) AS ms
          FROM a1_$s JOIN es$s USING (vec_id) GROUP BY cell
        ), c1_$s AS (
          SELECT cell, list_transform(range(1, ${subdim + 1}), dd ->
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(ms, mm -> CAST(mm[dd] AS DOUBLE))),
              (x, y) -> x + y) / len(ms)) AS centroid
          FROM m1_$s
        ), enc_$s AS (
          SELECT vec_id, cell AS code FROM (
            SELECT e.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY ${dist("e", "c")} ASC, c.cell ASC) AS rn
            FROM es$s e CROSS JOIN c1_$s c
          ) WHERE rn = 1
        ), lut_$s AS (
          SELECT e.vec_id AS query_id, c.cell, ${dist("e", "c")} AS d
          FROM es$s e CROSS JOIN c1_$s c WHERE $queryPred
        )"""
    }.mkString(",\n      ")
  }

  /** The per-subspace (query, neighbor, sub, d) arms feeding the ADC sum. */
  private def pqScArms(m: Int): String =
    (0 until m).map { s =>
      s"""SELECT l.query_id, n.vec_id AS neighbor_id, $s AS sub, l.d
            FROM enc_$s n JOIN lut_$s l ON n.code = l.cell
            WHERE l.query_id != n.vec_id"""
    }.mkString("\n        UNION ALL\n        ")

  /** Product quantization end-to-end (train 4 subspace codebooks, encode,
    * ADC top-5). The oracle replays the whole thing: per subspace, the
    * same unrolled-Lloyd CTE chain sim_ivf_train uses (init = first k
    * vec_ids' slices, one assign+mean iteration), then encoding as a
    * rn=1 assignment, the per-query LUT as a relational (code = cell)
    * join, and the ADC sum as a subspace-ordered fold.
    */
  private val pqTopKQ = Q(
    "sim_pq_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 300)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 3), kNeighbors = 5,
        m = 4, kCodes = 4, iters = 1, dim = 64)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("adc_dist"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      s"""
      WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
      ${pqSubCtes(m = 4, kCodes = 4, subdim = 16, queryPred = "e.vec_id < 3")},
      sc AS (
        ${pqScArms(4)}
      ), pair AS (
        SELECT query_id, neighbor_id, list(d ORDER BY sub) AS ds
        FROM sc GROUP BY query_id, neighbor_id
      ), adc AS (
        SELECT query_id, neighbor_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE), ds),
                 (x, y) -> x + y) AS adc_dist
        FROM pair
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
        FROM adc
      )
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_dist
      FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """
    })

  /** IVF-PQ (IVFADC) through the REAL composed path
    * (Similarity.ivfPqTopK): trained coarse quantizer (the shared Lloyd
    * chain — k=4, 2 iterations), per-query probe of the nprobe=2 nearest
    * trained cells, PQ codebooks (m=4, k=4, 1 iteration) trained/encoded
    * on the same corpus, and the ADC scan restricted to probed cells. The
    * oracle replays ALL of it — coarse training, probe ranking, subspace
    * training, encoding, LUT join, cell pruning, final ranking — so a pass
    * means an independent engine reproduces the full IVFADC serving path
    * bit-for-bit. The corpus predicate is mod-IdStride so the scale
    * bench's N× corpus genuinely grows the indexed set (the queries stay
    * fixed: search cost should scale with corpus size / kCells · nprobe,
    * not with the query count — cf. dedup_embedding_neardup's note).
    */
  private val ivfPqTopKQ = Q(
    "sim_ivfpq_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .filter(col("vec_id") % ScaleData.IdStride < 300)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 3), kNeighbors = 5,
        kCells = 4, cellIters = 2, nprobe = 2, m = 4, kCodes = 4, pqIters = 1,
        dim = 64)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cell").cast("int").as("cell"),
          col("adc_dist"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      s"""
      WITH ${lloydChainOver(s"vec_id % ${ScaleData.IdStride} < 300")},
      probe AS (
        SELECT query_id, cell FROM (
          SELECT e.vec_id AS query_id, c.cell,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlL2Full("e", "c")} ASC, c.cell ASC) AS rn
          FROM e CROSS JOIN c2 c WHERE e.vec_id < 3
        ) WHERE rn <= 2
      ),
      ${pqSubCtes(m = 4, kCodes = 4, subdim = 16, queryPred = "e.vec_id < 3")},
      sc AS (
        ${pqScArms(4)}
      ), pair AS (
        SELECT query_id, neighbor_id, list(d ORDER BY sub) AS ds
        FROM sc GROUP BY query_id, neighbor_id
      ), adc AS (
        SELECT query_id, neighbor_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE), ds),
                 (x, y) -> x + y) AS adc_dist
        FROM pair
      ), pruned AS (
        SELECT a.query_id, a.neighbor_id, n.cell, a.adc_dist
        FROM adc a
        JOIN a3 n ON n.vec_id = a.neighbor_id
        JOIN probe p ON p.query_id = a.query_id AND p.cell = n.cell
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
        FROM pruned
      )
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cell,
             adc_dist
      FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """
    })

  /** Residual IVF-PQ — the refinement the IVFADC paper actually ships
    * (Jégou et al. 2011 §IV.B): PQ trains and encodes on x − centroid(cell)
    * instead of raw vectors, and each (query, probed cell) gets its own
    * LUT from the query's residual against THAT cell's centroid. The
    * oracle replays everything sim_ivfpq_topk replays PLUS the residual
    * arithmetic: double subtraction rounded to float (CAST(.. AS FLOAT)
    * rounds identically to Spark's array<float> cast), per-cell query
    * residuals, per-(query, cell) LUTs, and the pairing restricted to
    * the neighbor's own coarse cell.
    */
  private val ivfPqResTopKQ = Q(
    "sim_ivfpq_res_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .filter(col("vec_id") % ScaleData.IdStride < 300)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 3), kNeighbors = 5,
        kCells = 4, cellIters = 2, nprobe = 2, m = 4, kCodes = 4, pqIters = 1,
        dim = 64, residual = true)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cell").cast("int").as("cell"),
          col("adc_dist"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      val subdim = 16
      val dist = sqlL2Sub(subdim) _
      val lutrCtes = (0 until 4).map { s =>
        val lo = s * subdim + 1; val hi = (s + 1) * subdim
        s"""lutr_$s AS (
          SELECT q.query_id, q.probe_cell, c.cell, ${dist("q", "c")} AS d
          FROM (SELECT query_id, probe_cell, emb[$lo:$hi] AS emb FROM qres) q
          CROSS JOIN c1_$s c
        )"""
      }.mkString(",\n      ")
      val scArms = (0 until 4).map { s =>
        s"""SELECT l.query_id, l.probe_cell, n.vec_id AS neighbor_id, $s AS sub, l.d
            FROM enc_$s n JOIN lutr_$s l ON n.code = l.cell
            WHERE l.query_id != n.vec_id"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH ${lloydChainOver(s"vec_id % ${ScaleData.IdStride} < 300")},
      probe AS (
        SELECT query_id, cell FROM (
          SELECT e.vec_id AS query_id, c.cell,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlL2Full("e", "c")} ASC, c.cell ASC) AS rn
          FROM e CROSS JOIN c2 c WHERE e.vec_id < 3
        ) WHERE rn <= 2
      ),
      re AS (
        SELECT e.vec_id, list_transform(range(1, 65),
          i -> CAST(CAST(e.embedding[i] AS DOUBLE) - c.centroid[i] AS FLOAT))
          AS embedding
        FROM e JOIN a3 USING (vec_id) JOIN c2 c ON c.cell = a3.cell
      ),
      ${pqSubCtes(m = 4, kCodes = 4, subdim = subdim, queryPred = "1 = 0",
        src = "re")},
      qres AS (
        SELECT p.query_id, p.cell AS probe_cell,
               list_transform(range(1, 65),
                 i -> CAST(CAST(q.embedding[i] AS DOUBLE) - c.centroid[i] AS FLOAT))
               AS emb
        FROM probe p
        JOIN e q ON q.vec_id = p.query_id
        JOIN c2 c ON c.cell = p.cell
      ),
      $lutrCtes,
      sc AS (
        $scArms
      ), pair AS (
        SELECT query_id, probe_cell, neighbor_id, list(d ORDER BY sub) AS ds
        FROM sc GROUP BY query_id, probe_cell, neighbor_id
      ), adc AS (
        SELECT query_id, probe_cell, neighbor_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE), ds),
                 (x, y) -> x + y) AS adc_dist
        FROM pair
      ), pruned AS (
        SELECT a.query_id, a.neighbor_id, n.cell, a.adc_dist
        FROM adc a
        JOIN a3 n ON n.vec_id = a.neighbor_id AND n.cell = a.probe_cell
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
        FROM pruned
      )
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cell,
             adc_dist
      FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """
    })

  /** IVFADC+R through the REAL composed path (Similarity.ivfPqRerankTopK):
    * everything sim_ivfpq_topk runs — trained coarse quantizer, nprobe=2
    * probe, PQ train/encode, cell-pruned ADC — but the ADC ranking keeps
    * kNeighbors·rerankFactor = 10 candidates, and exact float cosine over
    * ONLY those candidates decides the final top-5. The oracle replays the
    * whole chain plus the candidate cut and the float rerank — passing
    * proves the two-stage contract (codes pick, full precision decides)
    * end to end, not just the ADC stage.
    */
  private val ivfPqRerankTopKQ = Q(
    "sim_ivfpq_rerank_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .filter(col("vec_id") % ScaleData.IdStride < 300)
      Similarity.ivfPqRerankTopK(emb, emb.filter(col("vec_id") < 3),
        kNeighbors = 5, kCells = 4, cellIters = 2, nprobe = 2, m = 4,
        kCodes = 4, pqIters = 1, dim = 64, rerankFactor = 2)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cell").cast("int").as("cell"),
          col("cos"), col("adc_dist"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      s"""
      WITH ${lloydChainOver(s"vec_id % ${ScaleData.IdStride} < 300")},
      probe AS (
        SELECT query_id, cell FROM (
          SELECT e.vec_id AS query_id, c.cell,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlL2Full("e", "c")} ASC, c.cell ASC) AS rn
          FROM e CROSS JOIN c2 c WHERE e.vec_id < 3
        ) WHERE rn <= 2
      ),
      ${pqSubCtes(m = 4, kCodes = 4, subdim = 16, queryPred = "e.vec_id < 3")},
      sc AS (
        ${pqScArms(4)}
      ), pair AS (
        SELECT query_id, neighbor_id, list(d ORDER BY sub) AS ds
        FROM sc GROUP BY query_id, neighbor_id
      ), adc AS (
        SELECT query_id, neighbor_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE), ds),
                 (x, y) -> x + y) AS adc_dist
        FROM pair
      ), pruned AS (
        SELECT a.query_id, a.neighbor_id, n.cell, a.adc_dist
        FROM adc a
        JOIN a3 n ON n.vec_id = a.neighbor_id
        JOIN probe p ON p.query_id = a.query_id AND p.cell = n.cell
      ), cand AS (
        SELECT query_id, neighbor_id, cell, adc_dist FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
          FROM pruned
        ) WHERE rank <= 10
      ), rr AS (
        SELECT cd.query_id, cd.neighbor_id, cd.cell, cd.adc_dist,
               ${sqlCos("q", "n")} AS cos
        FROM cand cd
        JOIN e q ON q.vec_id = cd.query_id
        JOIN e n ON n.vec_id = cd.neighbor_id
      ), rr2 AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM rr
      )
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cell,
             cos, adc_dist
      FROM rr2 WHERE rank <= 5 ORDER BY query_id, rank
    """
    })

  /** Normalization + quantization: unit-norm check (post-normalization
    * norm² folds to 1 bit-for-bit via the same sequential reduce) and the
    * int8 codes with their scale.
    */
  private val quantizeQ = Q(
    "sim_quantize",
    (s, d) => {
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 300)
      val (codes, scale) = Similarity.int8Quantize(col("embedding"))
      // codes fold to an order-sensitive checksum: array-typed outputs are
      // untested in the driver comparator, and the checksum pins every
      // element and its position anyway
      emb.select(col("vec_id"),
        Similarity.foldDot(
          Similarity.l2Normalize(col("embedding")).cast("array<float>"),
          Similarity.l2Normalize(col("embedding")).cast("array<float>")).as("unit_norm2"),
        aggregate(codes, lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L).as("codes_checksum"),
        size(codes).cast("int").as("n_codes"), scale.as("scale"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (a, b) -> a + b)) AS nrm,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        FROM embeddings WHERE vec_id < 300
      ), u AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(CAST(CAST(x AS DOUBLE) / nrm AS FLOAT) AS DOUBLE)) AS unit,
               CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS scale,
               embedding
        FROM n
      )
      SELECT vec_id,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(unit, x -> x * x)), (a, b) -> a + b) AS unit_norm2,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS codes_checksum,
             CAST(len(embedding) AS INT) AS n_codes,
             scale
      FROM u ORDER BY vec_id
    """))

  /** Quantized candidates + exact rerank through the REAL int8TopK; the
    * oracle replays both stages (integer code dot × scales for the
    * candidate cut, float cosine for the final order).
    */
  private val int8TopKQ = Q(
    "sim_int8_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.int8TopK(emb, emb.filter(col("vec_id") < 5), k = 5, rerankFactor = 2)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH coded AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        FROM embeddings
      ), cq AS (
        SELECT vec_id, embedding,
               CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS scale,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) /
                   (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5) AS BIGINT)) AS codes
        FROM coded
      ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, 65), i -> c.codes[i] * q.codes[i])),
                 (a, b) -> a + b) AS DOUBLE) * c.scale * q.scale AS approx
        FROM cq c JOIN cq q ON c.vec_id != q.vec_id AND q.vec_id < 5
      ), cand AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY approx DESC, neighbor_id ASC) AS r1
          FROM scored
        ) WHERE r1 <= 10
      ), rer AS (
        SELECT cand.query_id, cand.neighbor_id, ${sqlCos("q", "c")} AS cos
        FROM cand
        JOIN embeddings c ON c.vec_id = cand.neighbor_id
        JOIN embeddings q ON q.vec_id = cand.query_id
      )
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM rer
      ) WHERE rank <= 5 ORDER BY query_id, rank
    """))

  private def sqlPlaneDot(j: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, 65),
            i -> CAST(embedding[i] AS DOUBLE) * CAST((((i - 1) * 31 + $j * 17) % 7) - 3 AS DOUBLE))),
          (x, y) -> x + y)"""

  private val lshBucketQ = Q(
    "sim_lsh_bucket",
    (s, d) => Tables.embeddings(s, d).select(
      col("vec_id"),
      Similarity.lshBucket(col("embedding"), 64, 4).cast("bigint").as("bucket"))
      .orderBy(col("vec_id")),
    Some(s"""
      SELECT vec_id,
             (CASE WHEN ${sqlPlaneDot(0)} >= 0 THEN 1 ELSE 0 END)
           + (CASE WHEN ${sqlPlaneDot(1)} >= 0 THEN 2 ELSE 0 END)
           + (CASE WHEN ${sqlPlaneDot(2)} >= 0 THEN 4 ELSE 0 END)
           + (CASE WHEN ${sqlPlaneDot(3)} >= 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings ORDER BY vec_id
    """))

  // the subset predicate is mod-IdStride so the ScaleData N× corpus keeps
  // N× the query-side vectors (a plain `vec_id < 500` would select only
  // copy 0 and the scale bench would measure nothing); on the base tables
  // every vec_id < IdStride, so the result is identical
  private val nearDupQ = Q(
    "dedup_embedding_neardup",
    (s, d) => Similarity.embeddingNearDup(
      Tables.embeddings(s, d).filter(col("vec_id") % ScaleData.IdStride < 500),
      0.9, maxCell = 200)
      .orderBy(col("vec_id")),
    Some(s"""
      WITH sub AS (
        SELECT * FROM embeddings WHERE vec_id % ${ScaleData.IdStride} < 500
      ), cand AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS cell_rank
          FROM sub
        ) WHERE cell_rank <= 200
      ), scored AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, ${sqlCos("a", "b")} AS cos
        FROM sub a JOIN cand b ON a.label = b.label AND a.vec_id != b.vec_id
      ), ranked AS (
        SELECT vec_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored
      )
      SELECT vec_id, neighbor_id, cos, cos >= 0.9 AS is_near_dup
      FROM ranked WHERE rank = 1 ORDER BY vec_id
    """))

  // ===========================================================================
  // text analysis
  // ===========================================================================

  private def sqlStopCount(set: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), w -> w IN (${set.map(w => s"'$w'").mkString(", ")})))"

  private val langIdQ = Q(
    "text_langid",
    (s, d) => TextAnalysis.langId(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some {
      // word scores over lowercased tokens; char languages over raw
      // function chars — generated from the SAME lexicon Seqs langId
      // compiles, so Spark and oracle stay symmetric by construction
      val scores = (TextAnalysis.langWords
        .map { case (l, ws) =>
          s"${sqlStopCount(ws).replace("string_split(text", "string_split(lower(text)")} AS score_$l"
        } ++
        TextAnalysis.charLangs.map { case (l, cs) =>
          s"CAST(len(regexp_extract_all(text, '[$cs]')) AS INT) AS score_$l"
        })
        .mkString(",\n             ")
      val maxExpr = "greatest(" + TextAnalysis.langOrder.map(l => s"score_$l").mkString(", ") + ")"
      val caseExpr = TextAnalysis.langOrder
        .map(l => s"WHEN score_$l = $maxExpr AND $maxExpr > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'unknown' END")
      val scoreCols = (TextAnalysis.langWords.map(_._1) ++
        TextAnalysis.charLangs.map(_._1)).map(l => s"score_$l").mkString(", ")
      s"""
      WITH scored AS (
        SELECT doc_id,
             $scores
        FROM documents
      )
      SELECT doc_id, $scoreCols,
             $caseExpr AS predicted_lang
      FROM scored ORDER BY doc_id
    """
    })

  private val qualityQ = Q(
    "text_quality",
    (s, d) => TextAnalysis.quality(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some(s"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words, text FROM documents
      )
      SELECT doc_id,
             len(words) AS n_words,
             len(list_distinct(words)) AS n_uniq_words,
             CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS type_token_ratio,
             CAST(${sqlStopCount(TextAnalysis.langWords.head._2).replace("string_split(text, ' ')", "words")} AS DOUBLE)
               / len(words) AS stopword_ratio,
             CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
               / len(words) AS mean_word_len,
             CASE WHEN CAST(len(list_distinct(words)) AS DOUBLE) / len(words) < 0.2 THEN 'repetitive'
                  WHEN len(words) < 5 THEN 'too_short'
                  ELSE 'ok' END AS quality_flag
      FROM w ORDER BY doc_id
    """))

  /** The TRAINED quality classifier ([[TextAnalysis.qualityClassifier]]):
    * weak-rule labels → 6 rounds of full-batch gradient descent over five
    * shape features → per-doc quasi-sigmoid score. The oracle replays the
    * ENTIRE training run — feature extraction, each iteration's
    * fixed-point-quantized gradient sums (order-independent integer
    * arithmetic, so Spark's partitioned sum and DuckDB's serial sum agree
    * exactly), the weight updates, and final scoring. A pass means an
    * independent engine reproduces the trained model AND every score
    * bit-for-bit.
    */
  private val qualityModelQ = Q(
    "text_quality_model",
    (s, d) => TextAnalysis.qualityClassifier(Tables.documents(s, d))
      .orderBy(col("doc_id")),
    Some {
      val stopSql = sqlStopCount(TextAnalysis.langWords.head._2)
        .replace("string_split(text, ' ')", "words")
      val S = "1048576.0"
      val lr = "4.0"
      def z(g: String) =
        s"$g.w0 + $g.w1 * f.x1 + $g.w2 * f.x2 + $g.w3 * f.x3 + $g.w4 * f.x4"
      val iterCtes = (1 to 6).map { t =>
        val prev = s"g${t - 1}"
        def qd(x: String) =
          s"sum(CAST(floor((p - y) $x * $S + 0.5) AS BIGINT))"
        s"""s$t AS (
          SELECT ${qd("")} AS q0, ${qd("* x1")} AS q1, ${qd("* x2")} AS q2,
                 ${qd("* x3")} AS q3, ${qd("* x4")} AS q4
          FROM (SELECT zf.*, 0.5 * (1.0 + z / (1.0 + abs(z))) AS p
                FROM (SELECT f.*, ${z("g")} AS z FROM feats f, $prev g) zf)
        ), g$t AS (
          SELECT g.w0 - $lr * (s.q0 / $S / n.n) AS w0,
                 g.w1 - $lr * (s.q1 / $S / n.n) AS w1,
                 g.w2 - $lr * (s.q2 / $S / n.n) AS w2,
                 g.w3 - $lr * (s.q3 / $S / n.n) AS w3,
                 g.w4 - $lr * (s.q4 / $S / n.n) AS w4
          FROM $prev g, s$t s, n
        )"""
      }.mkString(", ")
      s"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
      ), feats AS (
        SELECT doc_id,
               LEAST(len(words) / 100.0, 1.0) AS x1,
               CAST($stopSql AS DOUBLE) / len(words) AS x2,
               CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS x3,
               LEAST(CAST(list_sum(list_transform(words, x -> length(x)))
                 AS DOUBLE) / len(words) / 10.0, 1.0) AS x4,
               CASE WHEN len(words) >= 40
                     AND CAST($stopSql AS DOUBLE) / len(words) >= 0.02
                    THEN 1.0 ELSE 0.0 END AS y
        FROM w
      ), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats),
      g0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4),
      $iterCtes
      SELECT f.doc_id, CAST(f.y AS BIGINT) AS label,
             CAST(floor(0.5 * (1.0 + (${z("g6")}) / (1.0 + abs(${z("g6")})))
               * $S + 0.5) AS BIGINT) AS score_fp,
             (${z("g6")}) >= 0.0 AS keep
      FROM feats f, g6 ORDER BY f.doc_id
    """
    })

  private val tokensQ = Q(
    "text_tokens",
    (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '[a-z]+')) AS regex_tokens,
             CAST(list_sum(list_transform(string_split(text, ' '),
               w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS subword_est
      FROM documents ORDER BY doc_id
    """))

  /** Real subword counts through the REAL greedy-merge BPE kernel
    * (graft.functions.BpeTokens). The oracle replays the ALGORITHM, not a
    * precomputed answer: per word, a recursive CTE starts from the
    * character symbols and each recursion step (a) finds the lowest-ranked
    * adjacent pair present — `list_filter` over the SAME rank-ordered
    * merge table the kernel compiles in, first hit = lowest rank — and
    * (b) fuses all its occurrences left-to-right. Symbols ride a
    * chr(31)-delimited string (each symbol wrapped in separators, so a
    * pair pattern can only match at a symbol boundary), where one
    * `replace()` IS the reference algorithm's single left-to-right
    * merge-all pass: both scan forward and never re-merge output within a
    * round. A pass means an independent engine reproduces every merge
    * decision and the final piece counts.
    */
  private val tokensBpeQ = {
    val mergesSql = graft.functions.BpeTokens.merges
      .map { case (l, r) => s"{'l': '$l', 'r': '$r'}" }
      .mkString("[", ", ", "]")
    val U = "chr(31)"
    // pattern for pair (m.l, m.r) and its merged replacement
    val pairPat = s"$U || m.l || $U || $U || m.r || $U"
    val bestPat = s"$U || best.l || $U || $U || best.r || $U"
    val bestRep = s"$U || best.l || best.r || $U"
    Q(
      "text_tokens_bpe",
      (s, d) => TextAnalysis.bpeTokenCounts(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some(s"""
        WITH RECURSIVE w AS (
          SELECT doc_id, t.i AS wid, string_split(text, ' ')[t.i] AS word
          FROM documents,
               UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS t(i)
        ), init AS (
          SELECT doc_id, wid,
                 CASE WHEN length(word) = 0 THEN ''
                      ELSE $U || array_to_string(
                        list_transform(range(1, length(word) + 1), i -> word[i]),
                        $U || $U) || $U END AS s
          FROM w
        ), bpe AS (
          SELECT doc_id, wid, s, false AS done FROM init
          UNION ALL
          SELECT doc_id, wid,
                 CASE WHEN best IS NULL THEN s
                      ELSE replace(s, $bestPat, $bestRep) END AS s,
                 best IS NULL AS done
          FROM (
            SELECT doc_id, wid, s,
                   list_filter($mergesSql,
                     m -> contains(s, $pairPat))[1] AS best
            FROM bpe WHERE NOT done
          ) t
        ), counts AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN s = '' THEN 0
                          ELSE len(string_split(s, $U || $U)) END) AS BIGINT)
                   AS bpe_tokens
          FROM bpe WHERE done GROUP BY doc_id
        )
        SELECT d.doc_id, len(string_split(d.text, ' ')) AS ws_tokens,
               c.bpe_tokens
        FROM documents d JOIN counts c USING (doc_id)
        ORDER BY d.doc_id
      """))
  }

  /** Distributed BPE merge training ([[TextAnalysis.bpeTrain]]): the
    * oracle replays the WHOLE training run in unrolled CTEs — word
    * frequencies, every iteration's freq-weighted adjacent-pair counts,
    * the (count DESC, lhs, rhs) argmax, and the merge-all replace on the
    * delimited symbol strings (one non-regex replace = one left-to-right
    * fuse pass in both engines). A pass means an independent engine
    * learns the identical merge table in the identical order.
    */
  private val BpeTrainIters = 8
  private val bpeTrainQ = Q(
    "text_bpe_train",
    (s, d) => TextAnalysis.bpeTrain(Tables.documents(s, d), BpeTrainIters)
      .orderBy(col("merge_rank")),
    Some {
      val U = "chr(31)"
      val iterCtes = (1 to BpeTrainIters).map { t =>
        val prev = s"v${t - 1}"
        s"""p$t AS (
          SELECT l, r, SUM(freq) AS cnt FROM (
            SELECT freq, arr[i] AS l, arr[i + 1] AS r
            FROM (SELECT freq,
                    string_split(substr(s, 2, length(s) - 2), $U || $U) AS arr
                  FROM $prev),
                 UNNEST(range(1, len(arr))) AS t(i)
          ) GROUP BY l, r
        ), b$t AS (
          SELECT l, r, cnt FROM p$t ORDER BY cnt DESC, l, r LIMIT 1
        ), v$t AS (
          SELECT freq,
                 replace(s, $U || b.l || $U || $U || b.r || $U,
                         $U || b.l || b.r || $U) AS s
          FROM $prev, b$t b
        )"""
      }.mkString(", ")
      val rows = (1 to BpeTrainIters).map { t =>
        s"SELECT CAST($t AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, CAST(cnt AS BIGINT) AS pair_count FROM b$t"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH v0 AS (
        SELECT freq,
               $U || array_to_string(
                 list_transform(range(1, length(word) + 1), i -> word[i]),
                 $U || $U) || $U AS s
        FROM (SELECT word, CAST(count(*) AS BIGINT) AS freq
              FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
              WHERE word <> '' GROUP BY word)
      ), $iterCtes
      SELECT * FROM (
        $rows
      ) ORDER BY merge_rank
    """
    })

  /** HTML visible-text extraction ([[TextAnalysis.htmlExtract]]): both
    * engines build the SAME deterministic HTML page per document (corpus
    * text sanitized of raw markup chars, every 7th word wrapped in a
    * link, a script/style/comment/entity gauntlet around it), then each
    * extracts independently — Spark through the one-pass
    * [[graft.functions.HtmlText]] state machine, DuckDB through the
    * regex-chain spelling (strip scripts → styles → comments → tags,
    * decode entities, collapse whitespace). A hash match means the
    * single-pass kernel is indistinguishable from the reference chain on
    * well-formed pages, link counts included.
    */
  private val htmlExtractQ = Q(
    "text_html_extract",
    (s, d) => {
      val clean = regexp_replace(col("text"), "[<>&]", "")
      val words = split(clean, " ")
      // one codegen'd pass (optimization r22): the interpreted
      // transform(sequence(...)) + array_join spelling of this fixture
      // builder was the measured CPU of the 10x tier (62 cpu-s — the
      // extraction itself is already the HtmlText kernel); value-identical
      // (parity pinned in HashKernelsSpec), empty-array guard unchanged
      val wrapped = when(size(words) > 0,
        graft.functions.WrapEveryK(words, 7, "<a href=\"/l\">", "</a>"))
        .otherwise(lit(""))
      val html = concat(
        lit("<html><head><title>T</title><script>var x=1<2;//</head></script>"),
        lit("<style>.c{color:red}</style></head><body><h1>"),
        coalesce(try_element_at(words, lit(1)), lit("")),
        lit("</h1><p>"), wrapped,
        lit("</p><p>Fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b</p>"),
        lit("<!-- footer --></body></html>"))
      // fan out BEFORE synthesizing: the fixture html is built by an
      // interpreted per-word transform-HOF, and with the projection below
      // htmlExtract's own fanOut exchange it ran inside the single-task
      // scan stage (StageProbe, optimization r21: a serial 2.1 s stage
      // ahead of the 32-way extract) — repartition the narrow (doc_id,
      // text) rows first so synthesis and extraction share the parallel
      // stage. Identical rows; orderBy fixes the output order.
      TextAnalysis.htmlExtract(graft.Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), html.as("html")))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH src AS (
        SELECT doc_id, regexp_replace(text, '[<>&]', '', 'g') AS ctext
        FROM documents
      ), built AS (
        SELECT doc_id,
          '<html><head><title>T</title><script>var x=1<2;//</head></script>'
          || '<style>.c{color:red}</style></head><body><h1>'
          || COALESCE(string_split(ctext, ' ')[1], '')
          || '</h1><p>'
          || array_to_string(list_transform(
               range(1, len(string_split(ctext, ' ')) + 1),
               i -> CASE WHEN i % 7 = 0
                    THEN '<a href="/l">' || string_split(ctext, ' ')[i] || '</a>'
                    ELSE string_split(ctext, ' ')[i] END), ' ')
          || '</p><p>Fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b</p>'
          || '<!-- footer --></body></html>' AS html
        FROM src
      ), stripped AS (
        SELECT doc_id,
          len(string_split(html, '<a ')) - 1 AS n_links,
          trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(html, '(?s)<script.*?</script[^>]*>', ' ', 'g'),
                    '(?s)<style.*?</style[^>]*>', ' ', 'g'),
                  '(?s)<!--.*?-->', ' ', 'g'),
                '<[^>]*>', ' ', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
            '\s+', ' ', 'g')) AS clean_text
        FROM built
      )
      SELECT doc_id, clean_text,
             CAST(n_links AS BIGINT) AS n_links,
             CASE WHEN length(clean_text) = 0 THEN 0
                  ELSE CAST(len(string_split(clean_text, ' ')) AS BIGINT)
             END AS n_words,
             CASE WHEN length(clean_text) = 0 THEN 0.0
                  ELSE CAST(n_links AS DOUBLE)
                       / len(string_split(clean_text, ' '))
             END AS link_density
      FROM stripped ORDER BY doc_id
    """))

  private val fingerprintQ = Q(
    "text_fingerprint",
    (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ' '),
                   w -> CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT))),
               (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
      FROM documents ORDER BY doc_id
    """))

  private val nfcQ = Q(
    "text_nfc",
    // synthesize decomposed sequences (e + U+0301, n + U+0303) so the
    // composition pass is actually exercised; the corpus itself is ASCII
    (s, d) => TextAnalysis.nfcNormalize(
      Tables.documents(s, d).withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" cafe\u0301 nin\u0303o")))
          .otherwise(col("text"))))
      .orderBy(col("doc_id")),
    Some("""
      WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                 THEN text || ' cafe' || chr(769) || ' nin' || chr(771) || 'o'
                 ELSE text END AS text
        FROM documents
      )
      SELECT doc_id, nfc_normalize(text) AS text_nfc,
             nfc_normalize(text) != text AS changed
      FROM dirty ORDER BY doc_id
    """))

  /** Both engines BUILD the identical multi-line page from corpus text
    * (same-construction fixture): a javascript banner on every 3rd doc, a
    * newsletter template line on every even doc (passes prose checks,
    * falls to the corpus-frequency cut), a too-short "ok" line on
    * doc_id%4=1, a cookie notice on doc_id%7=2, and the body line itself
    * keeps its terminal period only when doc_id%5!=4 — so every rule
    * (min-words, punctuation, keywords, global frequency) provably
    * engages.
    */
  private val lineCurateQ = {
    val boiler = Seq(
      ("doc_id % 3 = 0", "Please enable javascript to continue.", true),
      ("doc_id % 2 = 0", "Subscribe to our newsletter today.", false),
      ("doc_id % 4 = 1", "ok", false),
      ("doc_id % 7 = 2", "We use cookies on this site.", false))
    Q(
      "text_c4_lines",
      (s, d) => {
        val page = concat(
          when(col("doc_id") % 3 === 0,
            lit("Please enable javascript to continue.\n")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 5 =!= 4, lit(".")).otherwise(lit("")),
          when(col("doc_id") % 2 === 0,
            lit("\nSubscribe to our newsletter today.")).otherwise(lit("")),
          when(col("doc_id") % 4 === 1, lit("\nok")).otherwise(lit("")),
          when(col("doc_id") % 7 === 2,
            lit("\nWe use cookies on this site.")).otherwise(lit("")))
        TextAnalysis.lineCurate(
          Tables.documents(s, d).withColumn("text", page))
          .orderBy(col("doc_id"))
      },
      Some {
        val cases = boiler.map { case (cond, ln, pre) =>
          if (pre) s"CASE WHEN $cond THEN '$ln' || chr(10) ELSE '' END"
          else s"CASE WHEN $cond THEN chr(10) || '$ln' ELSE '' END"
        }
        s"""
        WITH multi AS (
          SELECT doc_id,
                 ${cases.head}
                 || text
                 || CASE WHEN doc_id % 5 != 4 THEN '.' ELSE '' END
                 || ${cases(1)}
                 || ${cases(2)}
                 || ${cases(3)} AS text
          FROM documents
        ), lines AS (
          SELECT doc_id,
                 unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx,
                 unnest(string_split(text, chr(10))) AS ln
          FROM multi
        ), kept AS (
          SELECT doc_id, idx, ln FROM lines
          WHERE len(string_split_regex(trim(ln), ' +')) >= 3
            AND regexp_matches(ln, '[.!?"]$$')
            AND NOT contains(lower(ln), 'javascript')
            AND NOT contains(lower(ln), 'cookie')
        ), freq AS (
          SELECT md5(ln) AS lh FROM kept GROUP BY md5(ln) HAVING count(*) > 30
        ), pruned AS (
          SELECT doc_id, idx, ln FROM kept
          WHERE md5(ln) NOT IN (SELECT lh FROM freq)
        ), rebuilt AS (
          SELECT doc_id, count(*) AS n_kept,
                 string_agg(ln, chr(10) ORDER BY idx) AS text_kept
          FROM pruned GROUP BY doc_id
        )
        SELECT m.doc_id,
               CAST(len(string_split(m.text, chr(10))) AS BIGINT) AS n_lines,
               CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
               coalesce(r.text_kept, '') AS text_kept
        FROM multi m LEFT JOIN rebuilt r ON m.doc_id = r.doc_id
        ORDER BY m.doc_id
      """
      })
  }

  private val chunkQ = Q(
    "text_chunk_windows",
    (s, d) => TextAnalysis.chunkWindows(Tables.documents(s, d),
      chunkWords = 20, overlapWords = 5)
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
      ), n AS (
        SELECT doc_id, words,
               1 + CAST(floor((greatest(0, len(words) - 20) + 14) / 15.0) AS BIGINT)
                 AS n_starts
        FROM w
      ), c AS (
        SELECT doc_id, unnest(range(0, n_starts)) AS chunk_idx, words FROM n
      )
      SELECT doc_id, chunk_idx,
             CAST(len(words[chunk_idx*15 + 1 : chunk_idx*15 + 20]) AS BIGINT)
               AS n_words,
             array_to_string(words[chunk_idx*15 + 1 : chunk_idx*15 + 20], ' ')
               AS chunk_text
      FROM c ORDER BY doc_id, chunk_idx
    """))

  private val gopherQ = Q(
    "text_gopher_quality",
    (s, d) => TextAnalysis.gopherQuality(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some("""
      WITH w AS (
        SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
      )
      SELECT doc_id,
             len(words) AS n_words,
             CAST(len(list_filter(words, x -> length(x) <= 3)) AS DOUBLE) / len(words) AS frac_short_words,
             CAST(len(list_filter(words, x -> length(x) >= 8)) AS DOUBLE) / len(words) AS frac_long_words,
             CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS symbol_ratio,
             CAST(list_max(list_transform(list_distinct(words),
               w -> len(list_filter(words, x -> x = w)))) AS DOUBLE) / len(words) AS top_word_freq,
             (len(words) >= 50 AND len(words) <= 100000 AND
              CAST(list_max(list_transform(list_distinct(words),
                w -> len(list_filter(words, x -> x = w)))) AS DOUBLE) / len(words) <= 0.2)
               AS passes_gopher
      FROM w ORDER BY doc_id
    """))

  private val repetitionQ = Q(
    "text_repetition",
    (s, d) => TextAnalysis.repetition(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some {
      // mirrors TextAnalysis.repetition: grams as 1-based word slices,
      // per-gram counts via list_filter, top = (max count, then max gram),
      // character coverage = count * length(gram) / length(text)
      def grams(n: Int): String = {
        val parts = (0 until n).map(k => s"ws[i + $k]").mkString(" || ' ' || ")
        s"list_transform(range(1, greatest(len(ws) - ${n - 1}, 0) + 1), i -> $parts)"
      }
      def cntOf(gs: String): String = s"len(list_filter($gs, x -> x = g))"
      val topNs = Seq(2, 3, 4)
      val mcCols = topNs.map(n =>
        s"list_max(list_transform(list_distinct(g$n), g -> ${cntOf(s"g$n")})) AS mc$n")
        .mkString(",\n               ")
      val tgCols = topNs.map(n =>
        s"list_max(list_filter(list_distinct(g$n), g -> ${cntOf(s"g$n")} = mc$n)) AS tg$n")
        .mkString(",\n               ")
      val dup5 =
        s"""coalesce(list_sum(list_transform(list_distinct(g5),
               g -> CASE WHEN ${cntOf("g5")} > 1
                         THEN ${cntOf("g5")} * length(g) ELSE 0 END)), 0)"""
      val fracCols = topNs.map(n =>
        s"coalesce(CAST(mc$n * length(tg$n) AS DOUBLE) / length(text), 0.0) AS top${n}_frac")
        .mkString(",\n               ")
      s"""
      WITH w AS (
        SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
      ), g AS (
        SELECT doc_id, text,
               ${grams(2)} AS g2, ${grams(3)} AS g3,
               ${grams(4)} AS g4, ${grams(5)} AS g5
        FROM w
      ), c AS (
        SELECT doc_id, text, g2, g3, g4, g5,
               $mcCols
        FROM g
      ), t AS (
        SELECT doc_id, text,
               $tgCols,
               mc2, mc3, mc4,
               $dup5 AS dup5chars
        FROM c
      ), f AS (
        SELECT doc_id,
               $fracCols,
               CAST(dup5chars AS DOUBLE) / length(text) AS dup5_frac
        FROM t
      )
      SELECT doc_id, top2_frac, top3_frac, top4_frac, dup5_frac,
             (top2_frac <= 0.20 AND top3_frac <= 0.18 AND
              top4_frac <= 0.16 AND dup5_frac <= 0.15) AS passes_repetition
      FROM f ORDER BY doc_id
    """
    })

  private val cleanQ = Q(
    "text_clean",
    (s, d) => TextAnalysis.clean(
      // synthesize dirt so the cleaning is actually exercised: embed a tab
      // and duplicate spaces derived from the row
      Tables.documents(s, d).withColumn("text",
        when(col("doc_id") % 2 === 0,
          concat(lit("\t "), col("text"), lit("  tail\u0001")))
          .otherwise(col("text"))))
      .orderBy(col("doc_id")),
    Some("""
      WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                 THEN chr(9) || ' ' || text || '  tail' || chr(1)
                 ELSE text END AS text
        FROM documents
      ), c AS (
        SELECT doc_id, text,
               trim(regexp_replace(regexp_replace(text, '[\x00-\x1f]', ' ', 'g'),
                 ' +', ' ', 'g')) AS text_clean
        FROM dirty
      )
      SELECT doc_id, text_clean, text_clean != text AS was_dirty
      FROM c ORDER BY doc_id
    """))

  private val piiQ = Q(
    "text_redact_pii",
    // synthesize PII deterministically so the scrub is actually exercised
    (s, d) => TextAnalysis.redactPii(
      Tables.documents(s, d).withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or https://example.com/d/"), col("doc_id")))
          .otherwise(col("text"))))
      .orderBy(col("doc_id")),
    Some("""
      WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                 THEN text || ' contact user' || doc_id
                      || '@example.com or https://example.com/d/' || doc_id
                 ELSE text END AS text
        FROM documents
      )
      SELECT doc_id,
             regexp_replace(
               regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'),
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS text_redacted,
             CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INT) AS n_urls
      FROM dirty ORDER BY doc_id
    """))

  private val splitQ = Q(
    "sample_split",
    (s, d) => Sampling.assign(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id")),
    Some("""
      WITH b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents
      )
      SELECT doc_id, bucket,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      FROM b ORDER BY doc_id
    """))

  /** Leakage-safe split ([[graft.ext.Sampling.leakageSafeAssign]]): docs
    * split by their LSH duplicate group, so near-dup copies land on the
    * same side of train/val/test. The oracle replays the recursive-closure
    * groups AND the md5 bucket arithmetic over the group key.
    */
  private val splitLeakageSafeQ = Q(
    "sample_split_leakage_safe",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val groups = Dedup.duplicateGroups(
        Dedup.lshCandidatePairs(
          Dedup.minhashSignatures(docs), distinctPairs = false))
      Sampling.leakageSafeAssign(docs, groups)
        .select(col("doc_id"), col("split_key"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${sqlSigCtes()}, $sqlBandsCte,
      cpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cpairs
        UNION SELECT doc_b, doc_a FROM cpairs
      ), nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
      ), grp AS (
        SELECT src AS doc_id, MIN(dst) AS group_id FROM reach GROUP BY src
      ), keyed AS (
        SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS split_key
        FROM documents d LEFT JOIN grp g USING (doc_id)
      )
      SELECT doc_id, split_key,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, split_key,
              CAST(('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 8))
                   AS BIGINT) % 100 AS b
            FROM keyed)
      ORDER BY doc_id
    """))

  /** Domain mixing: en kept at 90%, zh 50%, de 25%, everything else 10% —
    * the static corpus-mixture downsample, decided per row from a ppm-
    * resolution hash with no shuffle and no per-stratum counting.
    */
  private val mixtureQ = Q(
    "sample_mixture",
    (s, d) => Sampling.mixture(Tables.documents(s, d), col("lang"), col("doc_id"),
      Map("en" -> 900000, "zh" -> 500000, "de" -> 250000), defaultPpm = 100000)
      .select(col("doc_id"), col("lang"), col("rate_ppm"), col("keep"))
      .orderBy(col("doc_id")),
    Some("""
      WITH r AS (
        SELECT doc_id, lang,
               CASE WHEN lang = 'en' THEN 900000
                    WHEN lang = 'zh' THEN 500000
                    WHEN lang = 'de' THEN 250000
                    ELSE 100000 END AS rate_ppm,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
                 % 1000000 AS ppm
        FROM documents
      )
      SELECT doc_id, lang, rate_ppm, ppm < rate_ppm AS keep
      FROM r ORDER BY doc_id
    """))

  /** Context packing into 4096-token sequences over 16 hash shards per
    * lang (concat-then-chunk; a doc's sequence is where its first token
    * lands). The running token sum is the one inherently sequential step;
    * shards are the scale axis.
    */
  private val packQ = Q(
    "text_pack_sequences",
    (s, d) => TextAnalysis.packSequences(Tables.documents(s, d), budget = 4096,
      nShards = 16).orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                 % 100 % 16 AS pack_shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
      ), c AS (
        SELECT *,
               -- DuckDB SUM(BIGINT) is HUGEINT; pin back to BIGINT
               CAST(SUM(n_tokens) OVER (PARTITION BY lang, pack_shard
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS BIGINT) AS start_offset
        FROM t
      )
      SELECT doc_id, lang, pack_shard, n_tokens, start_offset,
             CAST(floor(start_offset / 4096.0) AS BIGINT) AS seq_id,
             CAST(start_offset % 4096 AS BIGINT) AS offset_in_seq
      FROM c ORDER BY doc_id
    """))

  /** Benchmark decontamination over synthesized contamination: eval set =
    * doc_id % 97 == 0; a shared canary passage (two variants, by parity)
    * is appended to eval docs AND to corpus docs with doc_id % 13 == 0, so
    * the 5-gram overlap is actually exercised (natural overlap in the
    * synthetic corpus is ~1 doc). The REAL TextAnalysis.decontaminate
    * (broadcast eval grams → hit counts) runs on the Spark side; the
    * oracle rebuilds grams with list slicing and joins.
    */
  private val decontaminateQ = Q(
    "text_decontaminate",
    (s, d) => {
      val canary = concat(col("text"), lit(" shared benchmark passage variant "),
        (col("doc_id") % 2).cast("string"), lit(" alpha beta gamma delta epsilon"))
      val dirty = Tables.documents(s, d).withColumn("text",
        when(col("doc_id") % 97 === 0 || col("doc_id") % 13 === 0, canary)
          .otherwise(col("text")))
      TextAnalysis.decontaminate(
        dirty.filter(col("doc_id") % 97 =!= 0),
        dirty.filter(col("doc_id") % 97 === 0), n = 5)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH dirty AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 97 = 0 OR doc_id % 13 = 0
                 THEN text || ' shared benchmark passage variant '
                      || CAST(doc_id % 2 AS VARCHAR)
                      || ' alpha beta gamma delta epsilon'
                 ELSE text END AS text
        FROM documents
      ), w AS (
        SELECT doc_id, lang, string_split(text, ' ') AS ws FROM dirty
      ), g AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                      || ws[i+3] || ' ' || ws[i+4])) AS grams
        FROM w
      ), ev AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
      ), hits AS (
        SELECT c.doc_id, COUNT(*) AS n_hits
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 != 0) c
        JOIN ev USING (gram) GROUP BY c.doc_id
      )
      SELECT g.doc_id, g.lang, COALESCE(h.n_hits, 0) AS n_hits,
             COALESCE(h.n_hits, 0) > 0 AS contaminated
      FROM g LEFT JOIN hits h USING (doc_id)
      WHERE g.doc_id % 97 != 0
      ORDER BY g.doc_id
    """))

  /** Bloom decontamination through the REAL TextAnalysis.decontaminateBloom
    * (same dirt as text_decontaminate). The oracle replays the SEEDED
    * double hashing exactly — h1/h2 from disjoint md5 hex halves, k probe
    * positions per gram — and declares a corpus gram a Bloom hit iff ALL
    * k of its positions fall in the set of positions any eval gram set
    * (bit-set semantics, expressed relationally). A pass means the whole
    * deterministic filter — including any false positives — reproduces in
    * an independent engine.
    */
  private val decontaminateBloomQ = {
    val m = 1 << 20
    val k = 5
    def sqlH1(g: String) = s"CAST(('0x' || substr(md5($g), 1, 15)) AS BIGINT) % $m"
    def sqlH2(g: String) = s"(CAST(('0x' || substr(md5($g), 16, 15)) AS BIGINT) % $m) * 2 + 1"
    Q(
      "text_decontaminate_bloom",
      (s, d) => {
        val canary = concat(col("text"), lit(" shared benchmark passage variant "),
          (col("doc_id") % 2).cast("string"), lit(" alpha beta gamma delta epsilon"))
        val dirty = Tables.documents(s, d).withColumn("text",
          when(col("doc_id") % 97 === 0 || col("doc_id") % 13 === 0, canary)
            .otherwise(col("text")))
        TextAnalysis.decontaminateBloom(
          dirty.filter(col("doc_id") % 97 =!= 0),
          dirty.filter(col("doc_id") % 97 === 0), n = 5, mBits = m, k = k)
          .orderBy(col("doc_id"))
      },
      Some(s"""
      WITH dirty AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 97 = 0 OR doc_id % 13 = 0
                 THEN text || ' shared benchmark passage variant '
                      || CAST(doc_id % 2 AS VARCHAR)
                      || ' alpha beta gamma delta epsilon'
                 ELSE text END AS text
        FROM documents
      ), w AS (
        SELECT doc_id, lang, string_split(text, ' ') AS ws FROM dirty
      ), g AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                      || ws[i+3] || ' ' || ws[i+4])) AS grams
        FROM w
      ), evp AS (
        SELECT DISTINCT (${sqlH1("gram")} + t.i * (${sqlH2("gram")})) % $m AS pos
        FROM (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
             UNNEST(range(0, $k)) t(i)
      ), cg AS (
        SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 != 0
      ), cpos AS (
        SELECT doc_id, gram, t.i,
               (${sqlH1("gram")} + t.i * (${sqlH2("gram")})) % $m AS pos
        FROM cg, UNNEST(range(0, $k)) t(i)
      ), hitg AS (
        SELECT doc_id, gram
        FROM cpos JOIN evp USING (pos)
        GROUP BY doc_id, gram
        HAVING COUNT(DISTINCT i) = $k
      ), hits AS (
        SELECT doc_id, COUNT(*) AS n_hits FROM hitg GROUP BY doc_id
      )
      SELECT g.doc_id, g.lang, COALESCE(h.n_hits, 0) AS n_hits,
             COALESCE(h.n_hits, 0) > 0 AS contaminated
      FROM g LEFT JOIN hits h USING (doc_id)
      WHERE g.doc_id % 97 != 0
      ORDER BY g.doc_id
    """))
  }

  /** Corpus TF-IDF top terms through the REAL TextAnalysis.tfIdfTopTerms;
    * the log-free score (tf·N/df, one double division) makes the weights
    * bit-identical across engines.
    */
  private val tfidfQ = Q(
    "text_tfidf",
    (s, d) => TextAnalysis.tfIdfTopTerms(Tables.documents(s, d), k = 3)
      .orderBy(col("doc_id"), col("rank")),
    Some("""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term
      ), dfr AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
      ), sc AS (
        SELECT doc_id, term, tf, df,
               CAST(tf * n_docs AS DOUBLE) / df AS score
        FROM tf JOIN dfr USING (term) CROSS JOIN n
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term ASC) AS rank
        FROM sc
      )
      SELECT doc_id, rank, term, tf, df, score FROM r
      WHERE rank <= 3 ORDER BY doc_id, rank
    """))

  /** Deterministic k-per-stratum sample through the REAL Sampling.reservoir
    * (MinK-bounded smallest-hash draw); the oracle spells the same
    * selection as a per-stratum hash-order window.
    */
  private val reservoirQ = Q(
    "sample_reservoir",
    (s, d) => Sampling.reservoir(Tables.documents(s, d), col("lang"),
      col("doc_id"), k = 20)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id")),
    Some("""
      WITH h AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM documents
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
        FROM h
      )
      SELECT doc_id, lang, source FROM r WHERE rn <= 20 ORDER BY doc_id
    """))

  /** Approx-distinct (HLL) — SURVEY §7.7's approx_count_distinct promise.
    * The HLL sketch value itself is engine-specific (Spark vs DuckDB use
    * different registers), so the oracle-able contract is the error BOUND,
    * and the bound is CARDINALITY-AWARE (VERDICT r6 #3 — a flat 3×rsd
    * gate would pass a sketch that's systematically 10-15% off): in the
    * low-cardinality regime (n ≤ 2·512 registers at the default
    * rsd=0.05), the estimator's linear-counting branch is near-exact —
    * measured 0.67% at sf0.01, 0% at sf0.001 — so the gate there is
    * max(2%, 2 absolute), which a biased/zeroed/overflowed sketch flips
    * immediately. Past that regime the raw-HLL rsd applies (measured
    * 6.67% at sf0.1's 1500 users/type) and 3×rsd (15%) is the honest
    * contract for a relative STANDARD DEVIATION. No flake risk: the
    * sketch is seedless/deterministic, so for a fixed corpus the observed
    * error is a constant.
    */
  private val approxDistinctQ = Q(
    "approx_distinct",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("approx_users") - col("exact_users"))
          <= when(col("exact_users") <= 1024,
            greatest(col("exact_users") * 0.02, lit(2.0)))
            .otherwise(col("exact_users") * 0.15)).as("approx_ok"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS exact_users,
             COUNT(*) AS n_events,
             TRUE AS approx_ok
      FROM events GROUP BY event_type ORDER BY event_type
    """))

  // ===========================================================================
  // multimodal
  // ===========================================================================

  private val multimodalQ = Q(
    "multimodal_decode",
    (s, d) => Multimodal.decode(
      Multimodal.mediaFromDocuments(Tables.documents(s, d)))
      .select(col("media_id"), col("kind"),
        col("meta.byte_len").as("byte_len"),
        col("meta.width").cast("bigint").as("width"),
        col("meta.height").cast("bigint").as("height"),
        col("meta.format").as("format"),
        col("meta.sample_rate").cast("bigint").as("sample_rate"),
        col("meta.channels").cast("bigint").as("channels"),
        col("meta.duration_ms").as("duration_ms"))
      .orderBy(col("media_id")),
    // every row carries a real container — PNG (33 B) / JPEG (23 B) /
    // WAV (44 B) / MP4 (232 B) — whose header the Spark side must
    // actually parse; the oracle predicts the decoded fields from the
    // id arithmetic the synthesizers used
    Some("""
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             CASE WHEN doc_id % 3 = 0 THEN (CASE WHEN doc_id % 6 = 0 THEN 33 ELSE 23 END)
                  WHEN doc_id % 3 = 1 THEN 44 ELSE 232 END AS byte_len,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 640 + 1
                  WHEN doc_id % 3 = 2 THEN doc_id % 1920 + 16 END AS width,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 480 + 1
                  WHEN doc_id % 3 = 2 THEN doc_id % 1080 + 16 END AS height,
             CASE WHEN doc_id % 6 = 0 THEN 'png'
                  WHEN doc_id % 3 = 0 THEN 'jpeg'
                  WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
             CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 8000 END AS sample_rate,
             CASE WHEN doc_id % 3 = 1 THEN doc_id % 2 + 1 END AS channels,
             CASE WHEN doc_id % 3 = 1 THEN (doc_id % 10 + 1) * 1000
                  WHEN doc_id % 3 = 2 THEN (doc_id % 30 + 1) * 1000 END AS duration_ms
      FROM documents ORDER BY media_id
    """))

  /** 25 fps frame sampling (40 ms step) from the REAL decoded durations;
    * the oracle predicts the offset-list shape (count, first, last) from
    * the synthesizers' id arithmetic. Images (no duration) sample nothing.
    */
  private val framesQ = Q(
    "multimodal_frames",
    (s, d) => Multimodal.sampleOffsets(
      Multimodal.decode(Multimodal.mediaFromDocuments(Tables.documents(s, d))),
      stepMs = 40)
      .select(col("media_id"), col("kind"), col("duration_ms"), col("n_samples"),
        when(col("n_samples") > 0, element_at(col("offsets_ms"), 1)).as("first_ms"),
        when(col("n_samples") > 0, element_at(col("offsets_ms"), -1)).as("last_ms"))
      .orderBy(col("media_id")),
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
               CASE WHEN doc_id % 3 = 1 THEN (doc_id % 10 + 1) * 1000
                    WHEN doc_id % 3 = 2 THEN (doc_id % 30 + 1) * 1000 END AS duration_ms
        FROM documents
      )
      SELECT media_id, kind, duration_ms,
             CASE WHEN duration_ms > 0 THEN CAST(ceil(duration_ms / 40.0) AS BIGINT)
                  ELSE 0 END AS n_samples,
             CASE WHEN duration_ms > 0 THEN CAST(0 AS BIGINT) END AS first_ms,
             CASE WHEN duration_ms > 0
                  THEN (CAST(ceil(duration_ms / 40.0) AS BIGINT) - 1) * 40 END AS last_ms
      FROM m ORDER BY media_id
    """))

  /** Real MP4 sample-table walk ([[graft.ext.Multimodal.mp4Samples]]):
    * stts/stsc/stsz/stco/stss resolved to per-sample byte ranges, with a
    * checksum SLICED FROM THE BLOB ITSELF over each declared range — so a
    * walker that mis-assembles chunk offsets or sample sizes reads the
    * wrong bytes and hash-mismatches. The oracle recomputes every column
    * from the synthesizer's closed forms (sizes, two-run chunk map, header
    * size 412 + 4n + 4c + 4k, payload byte (p·7 + id) mod 256) without
    * touching the container.
    */
  private val mp4SamplesQ = Q(
    "multimodal_mp4_samples",
    (s, d) => Multimodal.mp4Samples(
      Multimodal.mp4MediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id"), col("sample_idx")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(doc_id % 24 + 8 AS BIGINT) AS n FROM documents
      ), s AS (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM d
      ), sz AS (
        SELECT doc_id, n, i,
               200 + (doc_id * 31 + i * 17) % 120
                   + CASE WHEN i % 8 = 0 THEN 600 ELSE 0 END AS sz
        FROM s
      ), base AS (
        SELECT doc_id, n, i, sz,
               412 + 4 * n
                 + 4 * (CASE WHEN n <= 12 THEN (n + 5) // 6
                             ELSE 2 + (n - 12 + 3) // 4 END)
                 + 4 * ((n + 7) // 8)
                 + COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS off
        FROM sz
      )
      SELECT doc_id AS media_id,
             CAST(i + 1 AS INT) AS sample_idx,
             CAST(CASE WHEN i < 12 THEN i // 6 + 1
                       ELSE (i - 12) // 4 + 3 END AS INT) AS chunk_idx,
             CAST(off AS BIGINT) AS "offset",
             CAST(sz AS BIGINT) AS size,
             i * 40 AS time_ms,
             CAST(40 AS BIGINT) AS dur_ms,
             i % 8 = 0 AS sync,
             CAST(list_sum(list_transform(
               range(CAST(off AS BIGINT), CAST(off + sz AS BIGINT)),
               p -> (p * 7 + doc_id) % 256)) AS BIGINT) AS checksum
      FROM base ORDER BY media_id, sample_idx
    """))

  /** Codec-free keyframe detection ([[graft.ext.Multimodal.mp4Keyframes]]):
    * a sample ≥ 2× the mean of its ≤4 predecessors is a size spike —
    * I-frames are bigger than deltas, the shot-boundary primitive for
    * containers without an stss box. Emitted beside the stss truth bit
    * (`agree` measures the heuristic) plus a running shot id. The oracle
    * replays the size formula and the integer cross-multiplied window
    * rule.
    */
  private val mp4KeyframesQ = Q(
    "multimodal_mp4_keyframes",
    (s, d) => Multimodal.mp4Keyframes(
      Multimodal.mp4MediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id"), col("sample_idx")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(doc_id % 24 + 8 AS BIGINT) AS n FROM documents
      ), s AS (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM d
      ), sz AS (
        SELECT doc_id, i,
               CAST(200 + (doc_id * 31 + i * 17) % 120
                   + CASE WHEN i % 8 = 0 THEN 600 ELSE 0 END AS BIGINT) AS sz
        FROM s
      ), sp AS (
        SELECT doc_id, i, sz,
               i = 0 OR sz * COALESCE(COUNT(sz) OVER w4, 0)
                        >= 2 * COALESCE(SUM(sz) OVER w4, 0) AS spike
        FROM sz
        WINDOW w4 AS (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
      )
      SELECT doc_id AS media_id,
             CAST(i + 1 AS INT) AS sample_idx,
             sz AS size,
             i % 8 = 0 AS sync,
             spike,
             (i % 8 = 0) = spike AS agree,
             CAST(SUM(CASE WHEN spike THEN 1 ELSE 0 END) OVER
               (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS shot_id
      FROM sp ORDER BY media_id, sample_idx
    """))

  /** Fit-within-640x360 resize planning over the decoded image/video
    * dimensions — integer cross-multiplication picks the limiting axis, so
    * target dims are bit-identical in any engine.
    */
  private val resizeQ = Q(
    "multimodal_resize",
    (s, d) => Multimodal.resizePlan(
      Multimodal.decode(Multimodal.mediaFromDocuments(Tables.documents(s, d))),
      maxW = 640, maxH = 360)
      .orderBy(col("media_id")),
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'video' END AS kind,
               CASE WHEN doc_id % 3 = 0 THEN doc_id % 640 + 1
                    ELSE doc_id % 1920 + 16 END AS width,
               CASE WHEN doc_id % 3 = 0 THEN doc_id % 480 + 1
                    ELSE doc_id % 1080 + 16 END AS height
        FROM documents WHERE doc_id % 3 != 1
      )
      SELECT media_id, kind, width, height,
             CASE WHEN width <= 640 AND height <= 360 THEN width
                  WHEN width * 360 >= height * 640 THEN 640
                  ELSE CAST(floor(width * 360 / height) AS BIGINT) END AS target_width,
             CASE WHEN width <= 640 AND height <= 360 THEN height
                  WHEN width * 360 >= height * 640
                    THEN CAST(floor(height * 640 / width) AS BIGINT)
                  ELSE 360 END AS target_height,
             NOT (width <= 640 AND height <= 360) AS scaled
      FROM m ORDER BY media_id
    """))

  /** Corpus-trained bigram-LM fluency score (CCNet-style perplexity
    * filtering, minus the transcendental): Laplace-smoothed transition
    * probabilities from IEEE-exact integer-count divisions, summed in
    * position order — both engines replay the identical fold, so the
    * oracle hash-matches doubles with no ln() cross-libm drift.
    */
  private val lmScoreQ = Q(
    "text_lm_score",
    (s, d) => TextAnalysis.bigramLmScore(Tables.documents(s, d))
      .orderBy(col("doc_id")),
    Some("""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), posx AS (
        SELECT doc_id, ws, unnest(range(1, len(ws))) AS pos FROM w
      ), g AS (
        SELECT doc_id, pos, ws[pos] || ' ' || ws[pos + 1] AS gram,
               ws[pos] AS w1
        FROM posx
      ), c2 AS (
        SELECT gram, COUNT(*) AS c2 FROM g GROUP BY gram
      ), c1 AS (
        SELECT w1, COUNT(*) AS c1 FROM g GROUP BY w1
      ), vv AS (
        SELECT COUNT(DISTINCT w1) AS v FROM g
      ), sc AS (
        SELECT g.doc_id, g.pos,
               CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + vv.v AS DOUBLE) AS p
        FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN vv
      ), agg AS (
        SELECT doc_id, COUNT(*) AS n_bigrams, MIN(p) AS min_p,
               list_sort(list(struct_pack(pos := pos, p := p))) AS ps
        FROM sc GROUP BY doc_id
      )
      SELECT doc_id, n_bigrams, min_p,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(ps, s -> s.p)), (a, b) -> a + b)
               / n_bigrams AS avg_p
      FROM agg ORDER BY doc_id
    """))

  /** URL-level dedup: canonicalize a deterministic messy URL (uppercase
    * scheme/host, default port, www., utm params, fragment, trailing
    * slash — all derived from doc_id arithmetic so DuckDB builds the
    * identical input) through the REAL Urls.canonicalizeUrl chain, then
    * group. The oracle replays the same RE2-safe regex chain.
    */
  private val urlQ = Q(
    "dedup_url",
    (s, d) => {
      val url = concat(
        lit("HTTPS://WWW."), col("source"), lit(".example.com:443/docs/"),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 4 === 0,
          concat(lit("?utm_source=feed&ref="), (col("doc_id") % 7).cast("string")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("?ref="), (col("doc_id") % 7).cast("string"),
              lit("&utm_campaign=x")))
          .when(col("doc_id") % 4 === 2, lit("#section-2"))
          .otherwise(lit("/?utm_source=s&utm_medium=m&utm_campaign=c&utm_term=t&utm_content=x")))
      Urls.dedupByUrl(Tables.documents(s, d), url)
        .orderBy(col("canonical_url"))
    },
    Some("""
      WITH u0 AS (
        SELECT doc_id,
               'HTTPS://WWW.' || source || '.example.com:443/docs/' ||
               CAST(doc_id % 50 AS VARCHAR) ||
               CASE WHEN doc_id % 4 = 0
                      THEN '?utm_source=feed&ref=' || CAST(doc_id % 7 AS VARCHAR)
                    WHEN doc_id % 4 = 1
                      THEN '?ref=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x'
                    WHEN doc_id % 4 = 2 THEN '#section-2'
                    ELSE '/?utm_source=s&utm_medium=m&utm_campaign=c&utm_term=t&utm_content=x' END AS url
        FROM documents
      ), s1 AS (
        SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u0
      ), s2 AS (
        SELECT doc_id,
               lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) ||
               regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS u
        FROM s1
      ), s3 AS (
        SELECT doc_id, regexp_replace(regexp_replace(u,
                 '^(https://[^/?#:]+):443([/?#].*)?$', '\1\2'),
                 '^(http://[^/?#:]+):80([/?#].*)?$', '\1\2') AS u FROM s2
      ), s4 AS (
        SELECT doc_id,
               regexp_replace(u, '^([a-z][a-z0-9+.-]*://)www\.', '\1') AS u
        FROM s3
      ), s5 AS (
        SELECT doc_id, regexp_replace(regexp_replace(
                 regexp_replace(u,
                   '([?&])(utm_[^&#]*&)+', '\1', 'g'),
                   '[?&]utm_[^&#]*$', ''),
                   '\?$', '') AS u FROM s4
      ), c AS (
        SELECT doc_id, regexp_replace(u, '/$', '') AS canonical_url FROM s5
      )
      SELECT canonical_url, MIN(doc_id) AS keeper, COUNT(*) AS n_docs
      FROM c GROUP BY canonical_url ORDER BY canonical_url
    """))

  private val domainCapQ = Q(
    "sample_domain_cap",
    (s, d) => {
      // 20 synthetic domains (one per source), mixed-case scheme/www and
      // an explicit port on some rows so host extraction is exercised;
      // ~25 docs/domain at sf0.01 against a cap of 10
      val url = concat(
        when(col("doc_id") % 5 === 0, lit("HTTPS://WWW.")).otherwise(lit("https://")),
        col("source"), lit(".example.com"),
        when(col("doc_id") % 7 === 0, lit(":443")).otherwise(lit("")),
        lit("/page/"), col("doc_id").cast("string"))
      Urls.domainCap(Tables.documents(s, d), url, k = 10)
        .select(col("doc_id"), col("domain"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH u AS (
        SELECT doc_id, source,
               lower(CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END
                 || source || '.example.com'
                 || CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END
                 || '/page/' || CAST(doc_id AS VARCHAR)) AS url
        FROM documents
      ), h AS (
        SELECT doc_id, source,
               regexp_extract(url, '^[a-z][a-z0-9+.-]*://(?:www\.)?([^/?#:]+)', 1) AS domain,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM u
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hv, doc_id) AS rn
        FROM h
      )
      SELECT doc_id, domain, source FROM r WHERE rn <= 10 ORDER BY doc_id
    """))

  /** Codec-free byte features (histogram Horner checksum / entropy /
    * ASCII ratio) over a binary column. The catalog input is the ASCII
    * projection of the document TEXT bytes — BOTH engines strip non-ASCII
    * up front (`[^\x00-\x7F]` → ''), so DuckDB's codepoint-based
    * length()/ascii() provably equal Spark's byte semantics for ANY
    * corpus, not just the current all-ASCII one (ADVICE r5: the implicit
    * all-ASCII assumption would otherwise silently diverge byte_len,
    * entropy, ascii_ratio and the histogram on a future corpus). This
    * makes every output column independently predictable by the oracle,
    * unlike the synthesized container blobs (which stay covered by
    * MultimodalSpec's hand-computed PNG/WAV vectors and by
    * `multimodal_decode`). Entropy is rounded to 4 dp on both sides: the
    * sum of −p·log₂p terms is accumulated in ascending byte order by both
    * engines, but their libm `log` may differ in the last ulp, and a 6 dp
    * round leaves a boundary case when the true value sits within an ulp
    * of x.xxxxxx5 (ADVICE r5) — 4 dp gives that ulp ~100× more margin.
    */
  private val featuresQ = Q(
    "multimodal_features",
    (s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        regexp_replace(col("text"), "[^\\x00-\\x7F]", "")
          .cast("binary").as("content"))
      Multimodal.byteFeatures(media)
        .select(col("media_id"), col("kind"), col("byte_len"),
          round(col("entropy"), 4).as("entropy"),
          col("ascii_ratio"), col("hist16_checksum"))
        .orderBy(col("media_id"))
    },
    Some("""
      WITH src AS (
        SELECT doc_id, regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS text
        FROM documents
      ), chars AS (
        SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS code
        FROM src, UNNEST(range(1, length(text) + 1)) AS t(i)
      ), cnt AS (
        SELECT doc_id, code, COUNT(*) AS c FROM chars GROUP BY 1, 2
      ), ent AS (
        SELECT doc_id,
               SUM(CASE WHEN code >= 32 AND code < 127 THEN c ELSE 0 END) AS ascii_cnt,
               list_sort(list(struct_pack(code := code, c := c))) AS cs
        FROM cnt GROUP BY doc_id
      ), buckets AS (
        SELECT c.doc_id, t.k,
               CAST(COALESCE(SUM(CASE WHEN c.code // 16 = t.k THEN c.c END), 0) AS BIGINT) AS bc
        FROM cnt c CROSS JOIN (SELECT UNNEST(range(0, 16)) AS k) t
        GROUP BY 1, 2
      ), hist AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(list_sort(list(struct_pack(k := k, bc := bc))),
                   s -> s.bc)),
                 (a, b) -> (a * 31 + b) % 1000000007) AS hist16_checksum
        FROM buckets GROUP BY doc_id
      )
      SELECT d.doc_id AS media_id,
             CASE WHEN d.doc_id % 3 = 0 THEN 'image'
                  WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(length(d.text) AS BIGINT) AS byte_len,
             COALESCE(round(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(e.cs, s ->
                 (CAST(s.c AS DOUBLE) / length(d.text))
                   * ln(CAST(s.c AS DOUBLE) / length(d.text)) / ln(2))),
               (a, b) -> a + b), 4), 0.0) AS entropy,
             COALESCE(CAST(e.ascii_cnt AS DOUBLE) / length(d.text), 0.0) AS ascii_ratio,
             CAST(COALESCE(h.hist16_checksum, 0) AS BIGINT) AS hist16_checksum
      FROM src d
      LEFT JOIN ent e ON d.doc_id = e.doc_id
      LEFT JOIN hist h ON d.doc_id = h.doc_id
      ORDER BY media_id
    """))

  /** Shared oracle fragments for the pixel-depth entries: the generative
    * channel formula at (x, y) for seed doc_id — truecolor containers
    * (BMP/PNG, doc_id%4 < 3) carry the direct RGB formula; GIF rows
    * (doc_id%4 = 3) carry the palette curve over the index formula
    * (Pixels.gifIndex/gifPal*) — and the stats fold (per-channel sums +
    * row-major top-down Horner checksum).
    */
  private def sqlPixelStruct(sx: String, sy: String): String =
    s"""CASE WHEN doc_id % 6 IN (3, 4) THEN struct_pack(
          r := ((($sx * 7 + $sy * 11 + doc_id) % 256) * 3 + 29) % 256,
          g := ((($sx * 7 + $sy * 11 + doc_id) % 256) * 5 + 7) % 256,
          b := ((($sx * 7 + $sy * 11 + doc_id) % 256) * 7 + 13) % 256)
        WHEN doc_id % 6 = 5 THEN struct_pack(
          r := ($sx * 3 + $sy * 13 + doc_id) % 256,
          g := ($sx * 3 + $sy * 13 + doc_id) % 256,
          b := ($sx * 3 + $sy * 13 + doc_id) % 256)
        ELSE struct_pack(
          r := ($sx * 3 + $sy * 13 + doc_id) % 256,
          g := ($sx * 5 + $sy * 3 + doc_id * 7) % 256,
          b := ($sx * 7 + $sy * 11 + doc_id * 3) % 256) END"""

  private val sqlPixelStats: String =
    """CAST(list_sum(list_transform(ps, p -> p.r)) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(ps, p -> p.g)) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(ps, p -> p.b)) AS BIGINT) AS sum_b,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(ps, p -> p.r * 65536 + p.g * 256 + p.b)),
         (a, v) -> (a * 31 + v) % 1000000007) AS pix_checksum"""

  /** REAL pixel decode through the whole container round trip: the Spark
    * side writes each doc's generative test pattern as an actual container
    * rotating by id%6 (uncompressed 24-bit BMP; PNG in RGB, RGBA, palette,
    * and grayscale forms; GIF with LZW + interlacing) and parses it back
    * byte-by-byte; the oracle computes the SAME statistics straight from
    * the generative formulas, never touching the containers.
    * A pass proves encoder and parser agree on every byte of layout — the
    * row-major top-down checksum catches a forgotten bottom-up flip or
    * swapped channel order that channel sums alone would miss.
    */
  private val pixelStatsQ = Q(
    "multimodal_pixel_stats",
    (s, d) => Multimodal.pixelStats(
      Multimodal.bmpMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id")),
    Some(s"""
      WITH dims AS (
        SELECT doc_id, CAST(doc_id % 16 + 4 AS INT) AS w,
               CAST(doc_id % 12 + 4 AS INT) AS h
        FROM documents
      ), px AS (
        SELECT doc_id, w, h,
               flatten(list_transform(range(0, h), y ->
                 list_transform(range(0, w), x ->
                   ${sqlPixelStruct("x", "y")}))) AS ps
        FROM dims
      )
      SELECT doc_id AS media_id, w AS width, h AS height,
             $sqlPixelStats
      FROM px ORDER BY media_id
    """))

  /** REAL pixel resample: decode the rotated container, fit-within-(8,8) nearest
    * neighbor, stats of the RESAMPLED image. The oracle replays the
    * fit-within integer arithmetic AND the source-index mapping
    * (sx = x·W/TW floor division) over the generative formula — decode,
    * resize plan, and resample all under one hash.
    */
  private val resizePixelsQ = Q(
    "multimodal_resize_pixels",
    (s, d) => Multimodal.resizePixels(
      Multimodal.bmpMediaFromDocuments(Tables.documents(s, d)), 8, 8)
      .orderBy(col("media_id")),
    Some(s"""
      WITH dims AS (
        SELECT doc_id, CAST(doc_id % 16 + 4 AS INT) AS w,
               CAST(doc_id % 12 + 4 AS INT) AS h
        FROM documents
      ), rs AS (
        SELECT doc_id, w, h,
               CAST(CASE WHEN w <= 8 AND h <= 8 THEN w
                    WHEN w * 8 >= h * 8 THEN 8
                    ELSE (w * 8) // h END AS INT) AS tw,
               CAST(CASE WHEN w <= 8 AND h <= 8 THEN h
                    WHEN w * 8 >= h * 8 THEN (h * 8) // w
                    ELSE 8 END AS INT) AS th
        FROM dims
      ), px AS (
        SELECT doc_id, w, h, tw, th,
               flatten(list_transform(range(0, th), y ->
                 list_transform(range(0, tw), x ->
                   ${sqlPixelStruct("(x * w // tw)", "(y * h // th)")}))) AS ps
        FROM rs
      )
      SELECT doc_id AS media_id, w AS width, h AS height,
             tw AS target_width, th AS target_height,
             $sqlPixelStats
      FROM px ORDER BY media_id
    """))

  private def sqlJpegY(sx: String, sy: String): String =
    s"((($sx) // 8) * 17 + (($sy) // 8) * 29 + doc_id) % 256"
  private def sqlJpegCb(sx: String, sy: String): String =
    s"((($sx) // 16) * 23 + (($sy) // 16) * 31 + doc_id * 5) % 256"
  private def sqlJpegCr(sx: String, sy: String): String =
    s"((($sx) // 16) * 13 + (($sy) // 16) * 37 + doc_id * 11) % 256"

  /** The decoded-JPEG pixel formula: flat 8×8 luma / 16×16 chroma blocks
    * plus [[graft.ext.Jpeg.ycbcrToRgb]]'s 16.16 fixed-point conversion —
    * floor((k·c + 32768) / 65536) is exactly the decoder's (… >> 16).
    */
  private def sqlJpegPixelStruct(sx: String, sy: String): String = {
    val yv = sqlJpegY(sx, sy)
    val cb = sqlJpegCb(sx, sy)
    val cr = sqlJpegCr(sx, sy)
    s"""CASE WHEN doc_id % 3 = 0 THEN struct_pack(r := $yv, g := $yv, b := $yv)
        ELSE struct_pack(
          r := LEAST(255, GREATEST(0, $yv +
            CAST(floor((91881 * (($cr) - 128) + 32768) / 65536.0) AS BIGINT))),
          g := LEAST(255, GREATEST(0, $yv -
            CAST(floor((22554 * (($cb) - 128) + 46802 * (($cr) - 128) + 32768)
              / 65536.0) AS BIGINT))),
          b := LEAST(255, GREATEST(0, $yv +
            CAST(floor((116130 * (($cb) - 128) + 32768) / 65536.0) AS BIGINT))))
        END"""
  }

  /** REAL baseline JPEG decode through the whole compressed round trip:
    * the Spark side writes each doc's block-flat generative pattern as an
    * actual JFIF file (Annex K Huffman tables, quant step 8, grayscale /
    * 4:4:4 / 4:2:0 rotating by id, restart intervals on id%7=0) and
    * decodes it back through Huffman, dequant, IDCT, upsample, and
    * fixed-point color conversion; the oracle computes the SAME statistics
    * straight from the generative formula — exact because a block-flat
    * image's DCT round trip at DC quant 8 is lossless. The top-down
    * checksum catches wrong MCU order, a predictor that fails to reset at
    * a restart marker, or swapped chroma planes.
    */
  /** Gzip text round trip with a corruption path: Spark compresses each
    * document's text, truncates every 53rd blob (REAL corruption), then
    * decodes inside the scan with the bounded NULL-on-malformed kernel.
    * The oracle never sees a compressed byte — it asserts intact rows
    * recover the EXACT original text (length + md5) and corrupted rows
    * answer NULL, pinning both the codec and its failure contract.
    */
  private val gzipTextQ = Q(
    "multimodal_gzip_text",
    (s, d) => Multimodal.gzipText(
      Multimodal.gzipMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id")),
    Some("""
      SELECT doc_id AS media_id,
             doc_id % 53 <> 0 AS ok,
             CASE WHEN doc_id % 53 = 0 THEN NULL ELSE length(text) END AS text_len,
             CASE WHEN doc_id % 53 = 0 THEN NULL ELSE md5(text) END AS text_md5
      FROM documents ORDER BY media_id
    """))

  /** WARC container round trip with a corruption path (the Common-Crawl
    * ingestion shape): the Spark side BUILDS real concatenated WARC/1.0
    * records per document — a fixed warcinfo record then a response record
    * whose payload is the document text — truncates every 41st blob
    * mid-payload (REAL corruption: text is ≥ 2 chars, so the cut of
    * half-the-payload + the 4-byte separator always lands inside the
    * response payload), and parses the bytes back with the bounded
    * one-pass kernel. The oracle never sees a WARC byte — it derives the
    * expected record list straight from the construction: intact docs
    * yield both records field-exact (type, uri, length, payload md5),
    * truncated docs yield ONLY the complete warcinfo record.
    */
  private val warcQ = Q(
    "multimodal_warc_records",
    (s, d) => {
      val uri = concat(lit("https://"), col("source"),
        lit(".example.com/page/"), col("doc_id").cast("string"))
      val full = concat(
        lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\nisPartOf!\r\n\r\n"),
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
        lit("\r\nContent-Length: "), length(col("text")).cast("string"),
        lit("\r\n\r\n"), col("text"), lit("\r\n\r\n"))
      val blob = when(col("doc_id") % 41 === 0,
        full.substr(lit(1),
          length(full) - (floor(length(col("text")) / 2) + lit(4)).cast("int")))
        .otherwise(full)
        .cast("binary")
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(graft.functions.WarcRecords(blob)).as(Seq("rec_idx", "rec")))
        .select(col("doc_id"), col("rec_idx").cast("long").as("rec_idx"),
          col("rec.rec_type").as("rec_type"), col("rec.uri").as("uri"),
          col("rec.content_length").as("content_length"),
          length(col("rec.payload")).cast("long").as("payload_len"),
          md5(col("rec.payload")).as("payload_md5"),
          // payload is raw BinaryType; payload_text is its REPORT-mode
          // UTF-8 decode (null on binary bodies). This corpus is all text,
          // so the decode must reproduce the payload bytes exactly
          md5(col("rec.payload_text")).as("payload_text_md5"))
        .orderBy(col("doc_id"), col("rec_idx"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, text,
               'https://' || source || '.example.com/page/' ||
                 CAST(doc_id AS VARCHAR) AS uri
        FROM documents
      ), r AS (
        SELECT doc_id, unnest(range(0, 2)) AS rec_idx, text, uri FROM base
      ), keep AS (
        SELECT * FROM r WHERE rec_idx = 0 OR doc_id % 41 != 0
      )
      SELECT doc_id, rec_idx,
             CASE WHEN rec_idx = 0 THEN 'warcinfo' ELSE 'response' END AS rec_type,
             CASE WHEN rec_idx = 0 THEN NULL ELSE uri END AS uri,
             CAST(CASE WHEN rec_idx = 0 THEN 9 ELSE length(text) END AS BIGINT)
               AS content_length,
             CAST(CASE WHEN rec_idx = 0 THEN 9 ELSE length(text) END AS BIGINT)
               AS payload_len,
             CASE WHEN rec_idx = 0 THEN md5('isPartOf!') ELSE md5(text) END
               AS payload_md5,
             CASE WHEN rec_idx = 0 THEN md5('isPartOf!') ELSE md5(text) END
               AS payload_text_md5
      FROM keep ORDER BY doc_id, rec_idx
    """))

  private val jpegStatsQ = Q(
    "multimodal_jpeg_stats",
    (s, d) => Multimodal.pixelStats(
      Multimodal.jpegMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id")),
    Some(s"""
      WITH dims AS (
        SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) AS w,
               CAST(doc_id % 20 + 8 AS INT) AS h
        FROM documents
      ), px AS (
        SELECT doc_id, w, h,
               flatten(list_transform(range(0, h), y ->
                 list_transform(range(0, w), x ->
                   ${sqlJpegPixelStruct("x", "y")}))) AS ps
        FROM dims
      )
      SELECT doc_id AS media_id, w AS width, h AS height,
             $sqlPixelStats
      FROM px ORDER BY media_id
    """))

  /** REAL audio sample decode through the whole container round trip: the
    * Spark side writes each doc's generative test tone as an actual 16-bit
    * PCM WAV (RIFF chunks, interleaved little-endian frames) and parses it
    * back byte-by-byte; the oracle computes the SAME statistics straight
    * from the generative sample formula, never touching the container. A
    * pass proves encoder and parser agree on every byte of layout — the
    * interleaved-order checksum catches wrong de-interleaving or a missed
    * sign extension that the absolute sums alone would not.
    */
  private val audioStatsQ = Q(
    "multimodal_audio_stats",
    (s, d) => Multimodal.audioStats(
      Multimodal.wavMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id")),
    Some("""
      WITH dims AS (
        SELECT doc_id, CAST(8000 + (doc_id % 5) * 8000 AS INT) AS sample_rate,
               CAST(doc_id % 2 + 1 AS INT) AS ch,
               CAST(doc_id % 50 + 10 AS INT) AS nf
        FROM documents
      ), smp AS (
        SELECT doc_id, sample_rate, ch, nf,
               flatten(list_transform(range(0, nf), i ->
                 list_transform(range(0, ch), c ->
                   (i * 37 + c * 101 + doc_id * 13) % 4001 - 2000))) AS ss,
               list_transform(range(0, nf), i ->
                 (i * 37 + doc_id * 13) % 4001 - 2000) AS ch0
        FROM dims
      )
      SELECT doc_id AS media_id, sample_rate, ch AS channels, nf AS n_frames,
             CAST(list_sum(list_transform(ss, s -> abs(s))) AS BIGINT) AS sum_abs,
             CAST(list_sum(list_transform(ss, s -> s * s)) AS BIGINT) AS sum_sq,
             CAST(list_max(list_transform(ss, s -> abs(s))) AS BIGINT) AS peak,
             CAST(len(list_filter(range(1, nf),
               j -> (ch0[j] < 0) != (ch0[j + 1] < 0))) AS BIGINT) AS zero_crossings,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(ss, s -> CASE WHEN s < 0 THEN s + 65536 ELSE s END)),
               (a, v) -> (a * 31 + v) % 1000000007) AS pcm_checksum
      FROM smp ORDER BY media_id
    """))

  /** Frame-windowed audio energy over the same real WAV fixtures as
    * `multimodal_audio_stats`: the Spark side decodes actual PCM bytes
    * and windows them; the oracle computes every window's Σ s² straight
    * from the generative tone formula (never touching the container) and
    * replays the integer-division mean-square voiced verdict. The ±2000
    * tone's mean square sits near the 1.33e6 theoretical mean, so the
    * 1.3e6 threshold splits windows both ways — `voiced` is non-vacuous.
    */
  private val audioFramesQ = Q(
    "multimodal_audio_frames",
    (s, d) => Multimodal.audioFrames(
      Multimodal.wavMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id"), col("win_idx")),
    Some("""
      WITH dims AS (
        SELECT doc_id, CAST(doc_id % 2 + 1 AS INT) AS ch,
               CAST(doc_id % 50 + 10 AS INT) AS nf
        FROM documents
      ), w AS (
        SELECT doc_id, ch, nf,
               unnest(range(0, CAST(ceil(nf / 16.0) AS BIGINT))) AS win_idx
        FROM dims
      ), e AS (
        SELECT doc_id, ch, win_idx,
               least(CAST(nf AS BIGINT), (win_idx + 1) * 16) - win_idx * 16
                 AS win_frames,
               CAST(list_sum(flatten(
                 list_transform(range(win_idx * 16,
                     least(CAST(nf AS BIGINT), (win_idx + 1) * 16)), i ->
                   list_transform(range(0, ch), c ->
                     ((i * 37 + c * 101 + doc_id * 13) % 4001 - 2000)
                     * ((i * 37 + c * 101 + doc_id * 13) % 4001 - 2000)))))
                 AS BIGINT) AS energy
        FROM w
      )
      SELECT doc_id AS media_id, win_idx, win_frames, energy,
             energy // (win_frames * ch) >= 1300000 AS voiced
      FROM e ORDER BY media_id, win_idx
    """))

  /** dHash luma grid replayed from the generative pixel formulas: 8×8
    * nearest-neighbor sample indices (x·w/8 floor), the same integer
    * BT.601 luma, one bit per horizontal neighbor pair. `j` linearizes the
    * grid row-major so one list holds the 64 samples.
    */
  private def sqlPhashGrid(where: String = ""): String =
    s"""dims AS (
        SELECT doc_id, CAST(doc_id % 16 + 4 AS INT) AS w,
               CAST(doc_id % 12 + 4 AS INT) AS h
        FROM documents $where
      ), px AS (
        SELECT doc_id, w, h, list_transform(range(0, 64), j ->
          ${sqlPixelStruct("((j % 8) * w // 8)", "((j // 8) * h // 8)")}) AS ps
        FROM dims
      ), g AS (
        SELECT doc_id, w, h, list_transform(ps, p ->
          (p.r * 299 + p.g * 587 + p.b * 114) // 1000) AS gs
        FROM px
      ), ph AS (
        SELECT doc_id, w, h, CAST(list_sum(list_transform(range(0, 56), i ->
          CASE WHEN gs[CAST(i // 7 * 8 + i % 7 + 2 AS INT)]
                    > gs[CAST(i // 7 * 8 + i % 7 + 1 AS INT)]
               THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END))
          AS BIGINT) AS phash
        FROM g
      )"""

  /** Perceptual image fingerprint ([[graft.ext.Multimodal.imagePhash]]):
    * REAL container decode (the id%6 BMP/PNG×4/GIF rotation) → 8×8
    * nearest-neighbor resample → integer luma → 56-bit dHash. The oracle
    * replays resample indices, luma, and bit packing straight from the
    * generative pixel formulas — a decoder that misreads any container, or
    * a resampler off by one source index, flips bits and hash-mismatches.
    * The decoded (width, height) ride along (the near-dup probes' cohort
    * keys) and are checked against the dimension formulas too.
    */
  private val phashQ = Q(
    "multimodal_phash",
    (s, d) => Multimodal.imagePhash(
      Multimodal.bmpMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id")),
    Some(s"""
      WITH ${sqlPhashGrid()}
      SELECT doc_id AS media_id, phash, w AS width, h AS height
      FROM ph ORDER BY media_id
    """))

  /** Image near-dup pairs: the banded hamming-ball probe
    * ([[graft.ext.Dedup.hammingNearDupPairs]]) over the dHash column —
    * equality blocks on fingerprint slices, MinK-capped groups, never
    * all-pairs — cohort-blocked on the decoded (width, height): a pair
    * must share dimensions, the production blocking key that keeps the
    * synthetic corpus's hot hash values (periodic in doc_id) from
    * cross-pairing unrelated dimension cohorts. The oracle IS all-pairs
    * within cohorts (500 docs) — the probe must find exactly the pairs
    * cohort brute force finds, a completeness check the banded path can't
    * fake.
    */
  private val phashNearDupQ = Q(
    "dedup_phash_neardup",
    // maxBlock 256 is the skew backstop. With the (width, height) cohort
    // keys the widest (w, h, block, value) group is 9 members at sf0.01
    // (cap inert — the oracle compare is exact) and 92 at sf0.1 base; on
    // the SYNTHESIZED 10×/26× bench corpora identical-hash clusters still
    // grow linearly with the copies (≈920/2380 wide), so there the cap
    // engages and bounds pair work — the bench-detail histograms report
    // demanded vs admitted pairs per width bucket (10×: 21.5M demanded,
    // 6.3M admitted; ratio 7.3 vs 23.15 before the cohort keys)
    (s, d) => Dedup.hammingNearDupPairs(
      Multimodal.imagePhash(
        Multimodal.bmpMediaFromDocuments(Tables.documents(s, d))),
      "media_id", "phash", maxDist = 2, bits = 56, maxBlock = 256,
      blockBy = Seq("width", "height"))
      .withColumnsRenamed(Map("id_a" -> "media_a", "id_b" -> "media_b"))
      .orderBy(col("media_a"), col("media_b")),
    Some(s"""
      WITH ${sqlPhashGrid()}
      SELECT a.doc_id AS media_a, b.doc_id AS media_b,
             bit_count(xor(a.phash, b.phash)) AS hamming
      FROM ph a JOIN ph b
        ON a.doc_id < b.doc_id AND a.w = b.w AND a.h = b.h
      WHERE bit_count(xor(a.phash, b.phash)) <= 2
      ORDER BY media_a, media_b
    """))

  /** Transitive image duplicate groups: the phash near-dup pairs through
    * the REAL [[graft.ext.Dedup.duplicateGroups]] connected-components
    * labeling (keeper = smallest media_id per component) — the decision
    * step an image-corpus dedup actually runs (`filter(!is_keeper)` drops).
    * The oracle recomputes components by recursive transitive closure over
    * the within-cohort brute-force pair set (same (width, height) blocking
    * as `dedup_phash_neardup`).
    */
  private val phashGroupsQ = Q(
    "dedup_phash_groups",
    (s, d) => Dedup.duplicateGroups(
      Dedup.hammingNearDupPairs(
        Multimodal.imagePhash(
          Multimodal.bmpMediaFromDocuments(Tables.documents(s, d))),
        "media_id", "phash", maxDist = 2, bits = 56, maxBlock = 256,
        blockBy = Seq("width", "height"))
        .withColumnsRenamed(Map("id_a" -> "doc_a", "id_b" -> "doc_b")))
      .withColumnsRenamed(Map("doc_id" -> "media_id"))
      .orderBy(col("media_id")),
    Some(s"""
      WITH RECURSIVE ${sqlPhashGrid()},
      cpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ph a JOIN ph b
          ON a.doc_id < b.doc_id AND a.w = b.w AND a.h = b.h
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
      ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cpairs
        UNION SELECT doc_b, doc_a FROM cpairs
      ), nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
      )
      SELECT src AS media_id, MIN(dst) AS group_id,
             src = MIN(dst) AS is_keeper
      FROM reach GROUP BY src ORDER BY media_id
    """))

  /** Shared oracle tail of the three media-curation entries: recursive
    * transitive closure over `cpairs` and the keep/near_dup/corrupt CASE
    * (corruption arm = doc_id % 53). One definition — the three oracles
    * can't drift on keeper or verdict semantics.
    */
  private def sqlCurationTail: String =
    """edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cpairs
        UNION SELECT doc_b, doc_a FROM cpairs
      ), nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
      ), comp AS (
        SELECT src AS id, MIN(dst) AS grp FROM reach GROUP BY src
      )
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 53 = 0 THEN false
                  WHEN comp.grp IS NOT NULL AND comp.grp <> doc_id THEN false
                  ELSE true END AS keep,
             CASE WHEN doc_id % 53 = 0 THEN 'corrupt'
                  WHEN comp.grp IS NOT NULL AND comp.grp <> doc_id THEN 'near_dup'
                  ELSE 'keep' END AS reason
      FROM documents LEFT JOIN comp ON comp.id = doc_id
      ORDER BY media_id"""

  /** The composed image-corpus curation pass
    * ([[graft.ext.Curation.curateMedia]]): decode gate → dHash → banded
    * near-dup pairs → connected-component groups → keeper verdicts, one
    * reason per media row. Every 53rd container is truncated to 8 bytes —
    * a REAL corruption every decoder rejects — so the corrupt arm provably
    * engages and corrupt rows provably never join a duplicate group. The
    * oracle replays the fingerprint formula over the intact rows only,
    * recomputes components by recursive closure, and cases out the same
    * three verdicts.
    */
  private val mediaCurationQ = Q(
    "pipeline_media_curation",
    (s, d) => Curation.curateMedia(
      Multimodal.bmpMediaFromDocuments(Tables.documents(s, d))
        .withColumn("content",
          when(col("media_id") % 53 === 0, expr("substring(content, 1, 8)"))
            .otherwise(col("content"))))
      .orderBy(col("media_id")),
    Some(s"""
      WITH RECURSIVE ${sqlPhashGrid("WHERE doc_id % 53 <> 0")},
      cpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
      ), $sqlCurationTail
    """))

  /** The composed audio-corpus curation pass
    * ([[graft.ext.Curation.curateAudio]]): decode gate → energy-delta
    * fingerprint → cohort-blocked hamming pairs → connected-component
    * groups → keep/near_dup/corrupt verdicts. Every 53rd container is
    * truncated to 8 bytes — a corruption every PCM decoder rejects — so
    * the corrupt arm provably engages and corrupt rows never join a
    * group. The oracle replays fingerprints over intact rows only,
    * recomputes components by recursive closure within the
    * (n_bits, rate, ch) cohorts, and cases out the same verdicts.
    */
  private val audioCurationQ = Q(
    "pipeline_audio_curation",
    (s, d) => Curation.curateAudio(
      Multimodal.wavMediaFromDocuments(Tables.documents(s, d))
        .withColumn("content",
          when(col("media_id") % 53 === 0, expr("substring(content, 1, 8)"))
            .otherwise(col("content"))))
      .orderBy(col("media_id")),
    Some(s"""
      WITH RECURSIVE ${sqlAudioFpWhere("WHERE doc_id % 53 <> 0")},
      cpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fp a JOIN fp b
          ON a.doc_id < b.doc_id AND a.n_bits = b.n_bits
          AND a.rate = b.rate AND a.ch = b.ch
        WHERE bit_count(xor(a.afp, b.afp)) <= 2
      ), $sqlCurationTail
    """))

  /** Energy-delta sign list replayed from the WAV synth formula: per-frame
    * energy = sum over channels of sample², bit i set iff e(i+1) > e(i),
    * i < min(nf−1, 56).
    */
  private def sqlAudioFp: String = sqlAudioFpWhere("")

  /** Same CTE restricted to a document subset (the curation pass's intact
    * rows). */
  private def sqlAudioFpWhere(where: String): String =
    s"""dims AS (
        SELECT doc_id, CAST(doc_id % 2 + 1 AS INT) AS ch,
               CAST(8000 + (doc_id % 5) * 8000 AS INT) AS rate,
               CAST(doc_id % 50 + 10 AS INT) AS nf
        FROM documents $where
      ), en AS (
        SELECT doc_id, ch, rate, nf, list_transform(range(0, nf), i ->
          CAST(list_sum(list_transform(range(0, ch), c ->
            ((i * 37 + c * 101 + doc_id * 13) % 4001 - 2000)
            * ((i * 37 + c * 101 + doc_id * 13) % 4001 - 2000))) AS BIGINT))
          AS es
        FROM dims
      ), fp AS (
        SELECT doc_id, rate, ch,
          CAST(list_sum(list_transform(range(0, least(nf - 1, 56)), i ->
            CASE WHEN es[CAST(i + 2 AS INT)] > es[CAST(i + 1 AS INT)]
                 THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END))
            AS BIGINT) AS afp,
          CAST(least(nf - 1, 56) AS INT) AS n_bits
        FROM en
      )"""

  /** Keyframe dHash closed form: per doc, frames i ≡ 0 (mod 4) of
    * n = id%12+4 samples; frame pixels are the BMP generative formula at
    * seed = doc_id·100 + i over (id%8+4)×(id%6+4) dims, resampled to the
    * 8×8 dHash grid — mirrors [[graft.ext.Multimodal.keyframeHashes]]
    * slicing real BMP bytes out of the mdat.
    */
  private def sqlKeyframePhash: String = sqlKeyframePhashWhere("")

  /** Same CTE restricted to a document subset (the curation pass's intact
    * rows). */
  private def sqlKeyframePhashWhere(where: String): String =
    s"""kfd AS (
        SELECT doc_id, CAST(doc_id % 8 + 4 AS INT) AS fw,
               CAST(doc_id % 6 + 4 AS INT) AS fh,
               CAST(doc_id % 12 + 4 AS BIGINT) AS n
        FROM documents $where
      ), kfi AS (
        SELECT doc_id, fw, fh, unnest(range(0, n)) AS i FROM kfd
      ), kfk AS (
        SELECT doc_id, fw, fh, i, doc_id * 100 + i AS seed
        FROM kfi WHERE i % 4 = 0
      ), kfg AS (
        SELECT doc_id, fw, fh, i,
          list_transform(range(0, 64), j ->
            ((((j % 8) * fw // 8) * 3 + ((j // 8) * fh // 8) * 13 + seed) % 256) * 299
            + ((((j % 8) * fw // 8) * 5 + ((j // 8) * fh // 8) * 3 + seed * 7) % 256) * 587
            + ((((j % 8) * fw // 8) * 7 + ((j // 8) * fh // 8) * 11 + seed * 3) % 256) * 114)
          AS ls
        FROM kfk
      ), kfp AS (
        SELECT doc_id, fw, fh, i,
          CAST(list_sum(list_transform(range(0, 56), t ->
            CASE WHEN ls[CAST(t // 7 * 8 + t % 7 + 2 AS INT)] // 1000
                      > ls[CAST(t // 7 * 8 + t % 7 + 1 AS INT)] // 1000
                 THEN (CAST(1 AS BIGINT) << CAST(t AS INT)) ELSE 0 END))
            AS BIGINT) AS phash
        FROM kfg
      )"""

  /** The composed video-corpus curation pass
    * ([[graft.ext.Curation.curateVideo]]): decode gate → keyframe
    * extraction → frame dHash pairs → ≥2-distinct-shared-keyframe clip
    * pairs → connected-component clip groups → keep/near_dup/corrupt
    * verdicts. Every 53rd container truncated to 8 bytes (no ftyp — the
    * sample walk rejects it) so the corrupt arm provably engages. The
    * oracle replays the whole chain closed-form over intact rows.
    */
  private val videoCurationQ = Q(
    "pipeline_video_curation",
    (s, d) => Curation.curateVideo(
      Multimodal.mp4FrameMediaFromDocuments(Tables.documents(s, d))
        .withColumn("content",
          when(col("media_id") % 53 === 0, expr("substring(content, 1, 8)"))
            .otherwise(col("content"))))
      .orderBy(col("media_id")),
    Some(s"""
      WITH RECURSIVE ${sqlKeyframePhashWhere("WHERE doc_id % 53 <> 0")},
      kfu AS (
        -- mirror the engine's sample_idx < 2^21 drop (frame_uid packing
        -- bound, Multimodal.keyframeClipDedup) so both sides replay the
        -- same semantics if the builder bound ever moves past 2^16
        SELECT doc_id, fw, fh, doc_id * 2097152 + i + 1 AS uid, phash
        FROM kfp WHERE i + 1 < 2097152
      ), fpair AS (
        SELECT a.uid // 2097152 AS clip_a, b.uid // 2097152 AS clip_b,
               a.uid AS ua, b.uid AS ub
        FROM kfu a JOIN kfu b
          ON a.uid < b.uid AND a.fw = b.fw AND a.fh = b.fh
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
          AND a.doc_id != b.doc_id
      ), cpairs AS (
        SELECT clip_a AS doc_a, clip_b AS doc_b
        FROM fpair GROUP BY clip_a, clip_b
        HAVING LEAST(COUNT(DISTINCT ua), COUNT(DISTINCT ub)) >= 2
      ), $sqlCurationTail
    """))

  /** Real keyframe extraction ([[graft.ext.Multimodal.keyframeHashes]]):
    * stbl walk → stss sync samples → slice the byte range out of the blob
    * → decode the BMP frame → dHash the pixels. The oracle replays frame
    * selection, pixel formulas, resample indices, luma, and bit packing
    * without touching the container — a walker that slices the wrong
    * range decodes the wrong frame and hash-mismatches.
    */
  private val keyframeExtractQ = Q(
    "multimodal_keyframe_extract",
    (s, d) => Multimodal.keyframeHashes(
      Multimodal.mp4FrameMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id"), col("sample_idx")),
    Some(s"""
      WITH $sqlKeyframePhash
      SELECT doc_id AS media_id, CAST(i + 1 AS INT) AS sample_idx,
             i * 40 AS time_ms, phash, fw AS width, fh AS height
      FROM kfp ORDER BY media_id, sample_idx
    """))

  /** Clip dedup by shared keyframes
    * ([[graft.ext.Multimodal.keyframeClipDedup]]): frame-level banded
    * hamming pairs within (width, height) cohorts rolled up to clip
    * pairs; near_dup = ≥2 DISTINCT shared keyframes on the smaller side.
    * The oracle brute-forces frame pairs within cohorts from the replayed
    * hashes and rolls up identically.
    */
  private val keyframeClipsQ = Q(
    "dedup_keyframe_clips",
    (s, d) => Multimodal.keyframeClipDedup(
      Multimodal.mp4FrameMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("clip_a"), col("clip_b")),
    Some(s"""
      WITH $sqlKeyframePhash,
      kfu AS (
        -- mirror the engine's sample_idx < 2^21 drop (frame_uid packing
        -- bound, Multimodal.keyframeClipDedup) — same guard as the video
        -- curation oracle above
        SELECT doc_id, fw, fh, doc_id * 2097152 + i + 1 AS uid, phash
        FROM kfp WHERE i + 1 < 2097152
      ), fpair AS (
        SELECT a.uid // 2097152 AS clip_a, b.uid // 2097152 AS clip_b,
               a.uid AS ua, b.uid AS ub
        FROM kfu a JOIN kfu b
          ON a.uid < b.uid AND a.fw = b.fw AND a.fh = b.fh
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
          AND a.doc_id != b.doc_id
      )
      SELECT clip_a, clip_b,
             LEAST(COUNT(DISTINCT ua), COUNT(DISTINCT ub)) AS n_shared,
             LEAST(COUNT(DISTINCT ua), COUNT(DISTINCT ub)) >= 2 AS near_dup
      FROM fpair GROUP BY clip_a, clip_b ORDER BY clip_a, clip_b
    """))

  /** Sample-size sequence per clip, then one sign bit per consecutive
    * delta — the video fingerprint's closed form (mirrors
    * [[graft.ext.Multimodal.videoFingerprint]] over
    * [[graft.ext.MediaHeader.sampleSize]]).
    */
  private def sqlVideoFp: String =
    """vd AS (
        SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) AS n FROM documents
      ), vsz AS (
        SELECT doc_id, n, list_transform(range(0, n), i ->
          CAST(200 + (doc_id * 31 + i * 17) % 120
               + CASE WHEN i % 8 = 0 THEN 600 ELSE 0 END AS BIGINT)) AS ss
        FROM vd
      ), vfp AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0, least(n - 1, 56)), i ->
            CASE WHEN ss[CAST(i + 2 AS INT)] > ss[CAST(i + 1 AS INT)]
                 THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END))
            AS BIGINT) AS vfp,
          CAST(least(n - 1, 56) AS INT) AS n_bits
        FROM vsz
      )"""

  /** Codec-free video fingerprint
    * ([[graft.ext.Multimodal.videoFingerprint]]): sign bits over the stbl
    * walk's consecutive sample sizes — the size pattern of an encoded
    * stream survives remuxing, which is what clip-level dedup keys on. The
    * oracle replays sizes and bit packing from the synthesizer's closed
    * form; a walker that misorders chunks or misreads stsz flips bits.
    */
  private val videoFpQ = Q(
    "multimodal_video_fp",
    (s, d) => Multimodal.videoFingerprint(
      Multimodal.mp4MediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id")),
    Some(s"""
      WITH $sqlVideoFp
      SELECT doc_id AS media_id, vfp, n_bits FROM vfp ORDER BY media_id
    """))

  /** Video clip near-dup pairs: the shared hamming-ball probe over the
    * size-delta fingerprints, cohort-blocked on fingerprint bit-length
    * (clips of different sample counts never cross-pair — the audio
    * query's contract). Oracle = brute force within cohorts.
    */
  private val videoNearDupQ = Q(
    "dedup_video_neardup",
    (s, d) => Dedup.hammingNearDupPairs(
      Multimodal.videoFingerprint(
        Multimodal.mp4MediaFromDocuments(Tables.documents(s, d))),
      "media_id", "vfp", maxDist = 2, bits = 56, maxBlock = 256,
      blockBy = Seq("n_bits"))
      .withColumnsRenamed(Map("id_a" -> "media_a", "id_b" -> "media_b"))
      .orderBy(col("media_a"), col("media_b")),
    Some(s"""
      WITH $sqlVideoFp
      SELECT a.doc_id AS media_a, b.doc_id AS media_b,
             bit_count(xor(a.vfp, b.vfp)) AS hamming
      FROM vfp a JOIN vfp b
        ON a.doc_id < b.doc_id AND a.n_bits = b.n_bits
      WHERE bit_count(xor(a.vfp, b.vfp)) <= 2
      ORDER BY media_a, media_b
    """))

  /** Acoustic fingerprint ([[graft.ext.Multimodal.audioFingerprint]],
    * Haitsma–Kalker-shaped energy-delta signs over REAL WAV PCM decode).
    * The oracle replays frame energies and bit packing from the synth
    * formula — a decoder that misreads channel interleaving or frame
    * boundaries flips sign bits.
    */
  private val audioFpQ = Q(
    "multimodal_audio_fp",
    (s, d) => Multimodal.audioFingerprint(
      Multimodal.wavMediaFromDocuments(Tables.documents(s, d)))
      .orderBy(col("media_id")),
    Some(s"""
      WITH $sqlAudioFp
      SELECT doc_id AS media_id, afp, n_bits,
             rate AS sample_rate, ch AS channels
      FROM fp ORDER BY media_id
    """))

  /** Audio near-dup pairs: the hamming probe with HARD blocking keys —
    * fingerprints only pair within the same bit-length (clips of very
    * different durations never collide, and a 9-bit fingerprint's hamming
    * distance to a 56-bit one is meaningless) AND the same decoded
    * (sample_rate, channels): energy-delta signs aren't comparable across
    * stream parameters (r11 — splits the hot same-length cohorts ~10
    * ways before the cap is consulted). The oracle is the brute-force
    * equivalent with the same equality join keys.
    */
  private val audioNearDupQ = Q(
    "dedup_audio_neardup",
    // maxBlock 256: a short fingerprint (n_bits < 19) zeroes the two high
    // pigeonhole blocks, so its whole same-length cohort shares those
    // block values and the group width grows linearly with the corpus —
    // the cap bounds that cohort's pair work (inert at oracle scale:
    // cohorts are 10 docs at sf0.01). A production audio fingerprint is
    // fixed-width (pad/truncate to a frame budget), which dissolves the
    // degenerate blocks entirely; the cap is the guard for this reduced
    // variable-width shape.
    (s, d) => Dedup.hammingNearDupPairs(
      Multimodal.audioFingerprint(
        Multimodal.wavMediaFromDocuments(Tables.documents(s, d))),
      "media_id", "afp", maxDist = 2, bits = 56, maxBlock = 256,
      blockBy = Seq("n_bits", "sample_rate", "channels"))
      .withColumnsRenamed(Map("id_a" -> "media_a", "id_b" -> "media_b"))
      .orderBy(col("media_a"), col("media_b")),
    Some(s"""
      WITH $sqlAudioFp
      SELECT a.doc_id AS media_a, b.doc_id AS media_b,
             bit_count(xor(a.afp, b.afp)) AS hamming
      FROM fp a JOIN fp b
        ON a.doc_id < b.doc_id AND a.n_bits = b.n_bits
        AND a.rate = b.rate AND a.ch = b.ch
      WHERE bit_count(xor(a.afp, b.afp)) <= 2
      ORDER BY media_a, media_b
    """))

  /** The composed end-to-end curation pipeline ([[graft.ext.Curation]]):
    * clean → Gopher gate → exact-dedup (keep smallest id, carry group
    * size) → decontaminate vs the eval set. Dirt is synthesized so every
    * stage is non-vacuous: doc_id%13 gets the decontamination canary
    * (dropped at stage 4), doc_id%89 a shared 62-distinct-word constant
    * (collapses to one keeper with n_copies = group size at stage 3; the
    * constant passes the Gopher gate by construction), %97 docs form the
    * canary'd eval set. The oracle replays the whole chain as one CTE
    * cascade — the composed survivor set, keeper choice, and group sizes
    * all under the hash.
    */
  private val curationQ = {
    val dupText = "curation filler " + (1 to 60).map(i => s"dupword$i").mkString(" ")
    val canarySql =
      "' shared benchmark passage variant ' || CAST(doc_id % 2 AS VARCHAR) || ' alpha beta gamma delta epsilon'"
    def gramsSql(ws: String) =
      s"""list_transform(range(1, greatest(len($ws) - 4, 0) + 1),
            i -> $ws[i] || ' ' || $ws[i+1] || ' ' || $ws[i+2] || ' '
                 || $ws[i+3] || ' ' || $ws[i+4])"""
    Q(
      "pipeline_curation",
      (s, d) => {
        val canary = concat(col("text"),
          lit(" shared benchmark passage variant "),
          (col("doc_id") % 2).cast("string"),
          lit(" alpha beta gamma delta epsilon"))
        val base = Tables.documents(s, d)
        val corpus = base.filter(col("doc_id") % 97 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, canary)
              .when(col("doc_id") % 89 === 0, lit(dupText))
              .otherwise(col("text")))
        val evalSet = base.filter(col("doc_id") % 97 === 0)
          .withColumn("text", canary)
        Curation.curate(corpus, evalSet).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, lang,
                 CASE WHEN doc_id % 13 = 0 THEN text || $canarySql
                      WHEN doc_id % 89 = 0 THEN '$dupText'
                      ELSE text END AS text
          FROM documents WHERE doc_id % 97 != 0
        ), ev AS (
          SELECT text || $canarySql AS text
          FROM documents WHERE doc_id % 97 = 0
        ), cleaned AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1f]', ' ', 'g'),
                   ' +', ' ', 'g')) AS text
          FROM base
        ), gw AS (
          SELECT doc_id, lang, text, string_split(text, ' ') AS words FROM cleaned
        ), gated AS (
          SELECT doc_id, lang, text FROM gw
          WHERE len(words) >= 50 AND len(words) <= 100000
            AND CAST(list_max(list_transform(list_distinct(words),
              w -> len(list_filter(words, x -> x = w)))) AS DOUBLE) / len(words) <= 0.2
        ), groups AS (
          SELECT md5(text) AS h, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
          FROM gated GROUP BY 1
        ), uniq AS (
          SELECT g.doc_id, g.lang, g.text, gr.n_copies
          FROM gated g JOIN groups gr ON md5(g.text) = gr.h AND g.doc_id = gr.keeper_id
        ), evw AS (
          SELECT string_split(text, ' ') AS ws FROM ev
        ), evg AS (
          SELECT DISTINCT unnest(${gramsSql("ws")}) AS gram FROM evw
        ), uw AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM uniq
        ), ug AS (
          SELECT doc_id, list_distinct(${gramsSql("ws")}) AS grams FROM uw
        ), hits AS (
          SELECT u.doc_id, COUNT(*) AS n
          FROM (SELECT doc_id, unnest(grams) AS gram FROM ug) u
          JOIN evg USING (gram) GROUP BY u.doc_id
        )
        SELECT q.doc_id, q.lang, q.n_copies
        FROM uniq q LEFT JOIN hits h ON q.doc_id = h.doc_id
        WHERE COALESCE(h.n, 0) = 0
        ORDER BY q.doc_id
      """))
  }

  /** The fuzzy curation chain through the REAL Curation.curateFuzzy:
    * clean → Gopher gate → exact-dedup → MinHash-LSH near-dedup (CC
    * keepers) → passage-coverage drop → decontaminate. Dirt makes every
    * stage non-vacuous: %13 docs get the decontamination canary, %89 a
    * shared constant (exact dups), %71 a shared 62-word core plus a
    * per-doc tail word (distinct hashes, so they SURVIVE exact-dedup and
    * collide in the LSH bands — the near-dup stage's prey), %67 a shared
    * 200-word passage prefixed to their own text (distinct minhash
    * profiles for most pairs, but ≥19 shared 20-word windows — the
    * passage stage's prey when coverage ≥ 0.3), %97 docs form the
    * canary'd eval set. The oracle replays the WHOLE chain — gates,
    * keeper choice, recursive-closure near-dup groups, window-hash
    * coverage, gram hits — as one CTE cascade.
    */
  /** Factory for the two fuzzy-curation pipeline entries: same dirt, same
    * chain, two near-dup keeper policies — min-id CC keeper
    * (`pipeline_curation_fuzzy`, [[Curation.curateFuzzy]]) and
    * best-quality-by-length ([[Curation.curateKeepBest]]), whose keeper
    * swap reuses the one groups frame instead of a second
    * minhash→LSH→components chain. The oracle swaps only the losers CTE.
    */
  private def fuzzyCurationQ(name: String, keepBest: Boolean): Q = {
    val dupText = "curation filler " + (1 to 60).map(i => s"dupword$i").mkString(" ")
    val nearText = "neardup core " + (1 to 60).map(i => s"ndword$i").mkString(" ")
    val passText = (1 to 200).map(i => s"pgword$i").mkString(" ")
    val canarySql =
      "' shared benchmark passage variant ' || CAST(doc_id % 2 AS VARCHAR) || ' alpha beta gamma delta epsilon'"
    def gramsSql(ws: String) =
      s"""list_transform(range(1, greatest(len($ws) - 4, 0) + 1),
            i -> $ws[i] || ' ' || $ws[i+1] || ' ' || $ws[i+2] || ' '
                 || $ws[i+3] || ' ' || $ws[i+4])"""
    // min-id keeper: every non-min member of a component loses.
    // keep-best keeper: the longest cleaned text wins (ties to min id) —
    // the ROW_NUMBER replay of dedupKeepBest's argmax
    val losersSql =
      if (keepBest) """grp AS (
          SELECT src AS doc_id, MIN(dst) AS group_id FROM reach GROUP BY src
        ), keyed AS (
          SELECT u.doc_id, COALESCE(g.group_id, u.doc_id) AS group_id,
                 len(u.text) AS q
          FROM uniq u LEFT JOIN grp g USING (doc_id)
        ), losers AS (
          SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY group_id
                     ORDER BY q DESC, doc_id) AS rn
            FROM keyed) WHERE rn != 1
        )"""
      else """losers AS (
          SELECT src AS doc_id FROM reach GROUP BY src HAVING src != MIN(dst)
        )"""
    Q(
      name,
      (s, d) => {
        val canary = concat(col("text"),
          lit(" shared benchmark passage variant "),
          (col("doc_id") % 2).cast("string"),
          lit(" alpha beta gamma delta epsilon"))
        val base = Tables.documents(s, d)
        val corpus = base.filter(col("doc_id") % 97 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, canary)
              .when(col("doc_id") % 89 === 0, lit(dupText))
              .when(col("doc_id") % 71 === 0,
                concat(lit(nearText), lit(" tail"), col("doc_id").cast("string")))
              .when(col("doc_id") % 67 === 0,
                concat(lit(passText), lit(" "), col("text")))
              .otherwise(col("text")))
        val evalSet = base.filter(col("doc_id") % 97 === 0)
          .withColumn("text", canary)
        (if (keepBest) Curation.curateKeepBest(corpus, evalSet)
        else Curation.curateFuzzy(corpus, evalSet)).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE base AS (
          SELECT doc_id, lang,
                 CASE WHEN doc_id % 13 = 0 THEN text || $canarySql
                      WHEN doc_id % 89 = 0 THEN '$dupText'
                      WHEN doc_id % 71 = 0
                        THEN '$nearText' || ' tail' || CAST(doc_id AS VARCHAR)
                      WHEN doc_id % 67 = 0 THEN '$passText' || ' ' || text
                      ELSE text END AS text
          FROM documents WHERE doc_id % 97 != 0
        ), ev AS (
          SELECT text || $canarySql AS text
          FROM documents WHERE doc_id % 97 = 0
        ), cleaned AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1f]', ' ', 'g'),
                   ' +', ' ', 'g')) AS text
          FROM base
        ), gw AS (
          SELECT doc_id, lang, text, string_split(text, ' ') AS words FROM cleaned
        ), gated AS (
          SELECT doc_id, lang, text FROM gw
          WHERE len(words) >= 50 AND len(words) <= 100000
            AND CAST(list_max(list_transform(list_distinct(words),
              w -> len(list_filter(words, x -> x = w)))) AS DOUBLE) / len(words) <= 0.2
        ), groups AS (
          SELECT md5(text) AS h, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
          FROM gated GROUP BY 1
        ), uniq AS (
          SELECT g.doc_id, g.lang, g.text, gr.n_copies
          FROM gated g JOIN groups gr ON md5(g.text) = gr.h AND g.doc_id = gr.keeper_id
        ), ${sqlSigCtes("uniq")}, $sqlBandsCte,
        cpairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ), edges AS (
          SELECT doc_a AS a, doc_b AS b FROM cpairs
          UNION SELECT doc_b, doc_a FROM cpairs
        ), nodes AS (SELECT DISTINCT a AS id FROM edges),
        reach(src, dst) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ), $losersSql, nd AS (
          SELECT * FROM uniq WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        ), pw AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM nd
        ), wins AS (
          SELECT doc_id,
                 md5(array_to_string(ws[j*10+1 : j*10+20], ' ')) AS phash
          FROM pw, UNNEST(range(0, CAST(floor((len(ws)-20)/10.0) AS BIGINT) + 1)) AS t(j)
          WHERE len(ws) >= 20
        ), pdup AS (
          SELECT phash FROM wins GROUP BY phash HAVING COUNT(DISTINCT doc_id) > 1
        ), pper AS (
          SELECT doc_id, COUNT(*) AS n_shared
          FROM wins JOIN pdup USING (phash) GROUP BY doc_id
        ), pnw AS (
          SELECT doc_id,
                 CASE WHEN len(ws) >= 20
                      THEN CAST(floor((len(ws)-20)/10.0) AS BIGINT) + 1
                      ELSE 0 END AS n_windows
          FROM pw
        ), pdrop AS (
          SELECT pnw.doc_id FROM pnw LEFT JOIN pper USING (doc_id)
          WHERE pnw.n_windows > 0
            AND CAST(COALESCE(pper.n_shared, 0) AS DOUBLE) / pnw.n_windows >= 0.3
        ), kept AS (
          SELECT * FROM nd WHERE doc_id NOT IN (SELECT doc_id FROM pdrop)
        ), evw AS (
          SELECT string_split(text, ' ') AS ws FROM ev
        ), evg AS (
          SELECT DISTINCT unnest(${gramsSql("ws")}) AS gram FROM evw
        ), uw AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM kept
        ), ug AS (
          SELECT doc_id, list_distinct(${gramsSql("ws")}) AS grams FROM uw
        ), chits AS (
          SELECT DISTINCT u.doc_id
          FROM (SELECT doc_id, unnest(grams) AS gram FROM ug) u
          JOIN evg USING (gram)
        )
        SELECT doc_id, lang, n_copies FROM kept
        WHERE doc_id NOT IN (SELECT doc_id FROM chits)
        ORDER BY doc_id
      """))
  }

  private val curationFuzzyQ = fuzzyCurationQ("pipeline_curation_fuzzy", keepBest = false)
  private val curationKeepBestQ = fuzzyCurationQ("pipeline_curate_keep_best", keepBest = true)

  val all: Seq[Q] = Seq(dedupExact, minhashSig, minhashLsh, lshPairs, lshGroups, dedupPipelineQ, simhashQ,
    simhashProbeQ, jaccardQ, passagesQ, removeSpansQ,
    bruteTopK, ivfTopK, ivfTrain, annRecallQ, semanticDedupQ, quantizeQ, int8TopKQ, pqTopKQ, ivfPqTopKQ, ivfPqResTopKQ, ivfPqRerankTopKQ, lshBucketQ, nearDupQ,
    curationQ, curationFuzzyQ, curationKeepBestQ,
    langIdQ, qualityQ, qualityModelQ, gopherQ, repetitionQ, cleanQ, nfcQ, lineCurateQ, chunkQ, piiQ, splitQ, splitLeakageSafeQ, mixtureQ, packQ,
    decontaminateQ, decontaminateBloomQ, tfidfQ, reservoirQ, lmScoreQ, urlQ, domainCapQ,
    approxDistinctQ, tokensQ, tokensBpeQ, bpeTrainQ, htmlExtractQ, fingerprintQ, multimodalQ, framesQ, resizeQ, featuresQ,
    pixelStatsQ, resizePixelsQ, audioStatsQ, audioFramesQ, jpegStatsQ, gzipTextQ, warcQ,
    phashQ, phashNearDupQ, phashGroupsQ, audioFpQ, audioNearDupQ, crossCorpusQ,
    bucketedDedupQ, keepBestQ,
    mediaCurationQ, audioCurationQ, mp4SamplesQ, mp4KeyframesQ, videoFpQ, videoNearDupQ,
    keyframeExtractQ, keyframeClipsQ, videoCurationQ)
}
