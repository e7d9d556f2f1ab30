package graft.queries

import graft.Q
import graft.operators.Multimodal
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Round-11 verify gates: real pixel decode (the former multimodal stub
  * seam — javax.imageio is in the JDK, so pixels are now genuinely
  * decoded, resized and featurized).
  */
object Round11Queries {

  private def t = graft.Tables.t _

  val all: Seq[Q] = Seq(

    // ---- m05: pixel-level image decode. Payloads are real PNGs from a
    //      HAND-ROLLED encoder (Deflater+CRC32 chunks — independent of
    //      the ImageIO decoder under test) carrying a coordinate-gradient
    //      pattern (r=x, g=y, b=doc_id%256). The gate emits per-channel
    //      means over EVERY pixel and the 8x8 nearest-neighbor grayscale
    //      thumbnail's sum (the resize+featurize step); the oracle
    //      recomputes both in closed form from the pattern — a single
    //      wrong pixel, sample point, or channel order breaks the hash. ----
    Q("m05_pixel_decode", (s, d) => {
      val media = Multimodal.synthPng(s,
        t(s, d, "documents").filter(col("doc_id") < 200))
      Multimodal.decodePixelStats(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"),
          col("gray_sum"))
    },
      Some("""WITH d AS (
                SELECT doc_id,
                       8 + doc_id % 9 AS w,
                       8 + (doc_id * 3) % 7 AS h,
                       doc_id % 256 AS b
                FROM documents WHERE doc_id < 200),
              thumb AS (
                SELECT d.doc_id,
                       CAST(sum(((i * d.w) // 8 + (j * d.h) // 8 + d.b) // 3)
                            AS BIGINT) AS gray_sum
                FROM d,
                     (SELECT unnest(range(0, 8)) AS i) ii,
                     (SELECT unnest(range(0, 8)) AS j) jj
                GROUP BY d.doc_id)
              SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
                     CAST(d.h AS BIGINT) AS height,
                     round((d.w - 1) / 2.0, 4) AS mean_r,
                     round((d.h - 1) / 2.0, 4) AS mean_g,
                     round(CAST(d.b AS DOUBLE), 4) AS mean_b,
                     thumb.gray_sum
              FROM d JOIN thumb ON d.doc_id = thumb.doc_id""")),

    // ---- m06: sample-level audio decode — real 16-bit LE PCM values
    //      read out of RIFF/WAV data chunks (m04 stopped at the header).
    //      Payload samples follow a closed-form pattern, so the oracle
    //      recomputes sum/count/peak value-by-value: an endianness flip,
    //      off-by-one data offset, or sign error breaks the hash. ----
    Q("m06_audio_samples", (s, d) => {
      val media = Multimodal.synthWavPcm(s,
        t(s, d, "documents").filter(col("doc_id") < 300))
      Multimodal.decodeAudioStats(s, media).toDF()
        .select("doc_id", "channels", "sample_rate", "n_values",
          "sample_sum", "max_abs")
    },
      Some("""WITH d AS (
                SELECT doc_id,
                       1 + doc_id % 2 AS ch,
                       CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                            ELSE 32000 END AS rate,
                       (doc_id % 100) * 10 * (1 + doc_id % 2) AS nvals
                FROM documents WHERE doc_id < 300),
              s AS (
                SELECT d.doc_id,
                       unnest(range(0, d.nvals)) AS k
                FROM d),
              v AS (
                SELECT s.doc_id,
                       ((s.k * (s.doc_id + 3)) % 65536) - 32768 AS val
                FROM s)
              SELECT d.doc_id, CAST(d.ch AS BIGINT) AS channels,
                     CAST(d.rate AS BIGINT) AS sample_rate,
                     CAST(d.nvals AS BIGINT) AS n_values,
                     CAST(COALESCE(sum(v.val), 0) AS BIGINT) AS sample_sum,
                     CAST(COALESCE(max(abs(v.val)), 0) AS BIGINT) AS max_abs
              FROM d LEFT JOIN v ON d.doc_id = v.doc_id
              GROUP BY d.doc_id, d.ch, d.rate, d.nvals""")),

    // ---- m08: audio quality gates from the decoded PCM — signal power
    //      (sum of squares) and silence ratio, the inputs to the two
    //      standard corpus filters (near-silent clips out, clipped clips
    //      out). All-integer aggregates + one correctly-rounded division,
    //      so the oracle compare is bit-exact (no transcendental dB math
    //      on the gate path). ----
    Q("m08_audio_quality", (s, d) => {
      val media = Multimodal.synthWavPcm(s,
        t(s, d, "documents").filter(col("doc_id") < 300))
      Multimodal.decodeAudioQuality(s, media).toDF()
        .select(col("doc_id"), col("n_values"), col("sum_sq"),
          col("n_silent"),
          when(col("n_values") > 0, round(
            col("n_silent").cast("double") / col("n_values"), 6))
            .otherwise(lit(0.0)).as("silence_ratio"),
          when(col("n_values") > 0, round(
            col("sum_sq").cast("double") / col("n_values"), 4))
            .otherwise(lit(0.0)).as("mean_square"))
    },
      Some("""WITH d AS (
                SELECT doc_id,
                       (doc_id % 100) * 10 * (1 + doc_id % 2) AS nvals
                FROM documents WHERE doc_id < 300),
              s AS (
                SELECT d.doc_id, unnest(range(0, d.nvals)) AS k FROM d),
              v AS (
                SELECT s.doc_id,
                       ((s.k * (s.doc_id + 3)) % 65536) - 32768 AS val
                FROM s),
              agg AS (
                SELECT doc_id, sum(val * val) AS sum_sq,
                       sum(CASE WHEN abs(val) < 512 THEN 1 ELSE 0 END)
                         AS n_silent
                FROM v GROUP BY doc_id)
              SELECT d.doc_id, CAST(d.nvals AS BIGINT) AS n_values,
                     CAST(COALESCE(agg.sum_sq, 0) AS BIGINT) AS sum_sq,
                     CAST(COALESCE(agg.n_silent, 0) AS BIGINT) AS n_silent,
                     CASE WHEN d.nvals > 0 THEN round(
                       CAST(COALESCE(agg.n_silent, 0) AS DOUBLE) / d.nvals, 6)
                       ELSE 0.0 END AS silence_ratio,
                     CASE WHEN d.nvals > 0 THEN round(
                       CAST(COALESCE(agg.sum_sq, 0) AS DOUBLE) / d.nvals, 4)
                       ELSE 0.0 END AS mean_square
              FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id""")),

    // ---- t18: per-domain document cap — keep the top-3 docs per source
    //      by quality (distinct-token ratio, doc_id tiebreak), the
    //      "no domain dominates the corpus" guard a crawl pipeline runs
    //      before mixing. The window partitions by SOURCE, so work
    //      scales with per-domain data, never the corpus; a
    //      pathologically hot domain is the one place a bounded-heap
    //      aggregate would replace it. ----
    Q("t18_domain_cap", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      t(s, d, "documents")
        .withColumn("quality",
          round(size(array_distinct(split(col("text"), " "))) /
            size(split(col("text"), " ")).cast("double"), 4))
        .withColumn("rn", row_number().over(Window.partitionBy("source")
          .orderBy(col("quality").desc, col("doc_id"))))
        .filter(col("rn") <= 3)
        .select(col("source"), col("doc_id"), col("quality"), col("rn"))
    },
      Some("""WITH q AS (
                SELECT source, doc_id,
                       round(CAST(len(list_distinct(string_split(text,' ')))
                             AS DOUBLE) / len(string_split(text,' ')), 4)
                         AS quality
                FROM documents),
              r AS (
                SELECT source, doc_id, quality,
                       row_number() OVER (PARTITION BY source
                         ORDER BY quality DESC, doc_id) AS rn
                FROM q)
              SELECT source, doc_id, quality, rn FROM r WHERE rn <= 3""")),

    // ---- t19: mixture balancing to the smallest source — downsample
    //      every source to the minimum source's token count
    //      (rate_s = min_total / total_s), each doc kept by the same
    //      overflow-safe multiplicative hash as t11, so the sample is
    //      reproducible with zero extra state. Plan shape: one 20-row
    //      aggregate, a broadcast of the per-source rates back onto the
    //      corpus, a narrow filter — no window, no corpus shuffle. ----
    Q("t19_mixture_sample", (s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      val totals = docs.groupBy("source")
        .agg(sum("ntok").as("total"))
      val rates = totals
        .crossJoin(broadcast(totals.agg(min("total").as("mn"))))
        .select(col("source"),
          least(lit(1.0), col("mn").cast("double") / col("total"))
            .as("rate"))
      docs.join(broadcast(rates), "source")
        .withColumn("u",
          ((col("doc_id") % lit(1048576L)) * lit(489905L) % lit(1048576L))
            / lit(1048576.0))
        .filter(col("u") < col("rate"))
        .select(col("doc_id"), col("source"), round(col("rate"), 6).as("rate"))
    },
      Some("""WITH tok AS (
                SELECT doc_id, source,
                       len(string_split(text,' ')) AS ntok
                FROM documents),
              tot AS (SELECT source, sum(ntok) AS total
                      FROM tok GROUP BY source),
              m AS (SELECT min(total) AS mn FROM tot),
              r AS (SELECT source,
                           least(1.0, CAST(mn AS DOUBLE) / total) AS rate
                    FROM tot, m)
              SELECT tok.doc_id, tok.source, round(r.rate, 6) AS rate
              FROM tok JOIN r USING (source)
              WHERE (tok.doc_id % 1048576 * 489905 % 1048576) / 1048576.0
                    < r.rate""")),

    // ---- t20: corpus-adaptive boilerplate removal — drop every token
    //      whose DOCUMENT frequency exceeds 80% of the corpus (the
    //      data-driven analogue of CCNet's duplicated-line stripping),
    //      preserving token order, and report how many were removed.
    //      The stop set is bounded by construction (≤ 1/0.8 tokens can
    //      each appear in >80% of docs... in practice a handful), so the
    //      anti-join broadcasts; reassembly is a per-document
    //      collect+sort, bounded by doc length, never corpus-sized. ----
    Q("t20_boilerplate_strip", (s, d) => {
      val docs = t(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val stop = docs
        .select(explode(array_distinct(split(col("text"), " "))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("dfreq"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .filter(col("dfreq") > col("n") * 0.8).select("w")
      val kept = toks.join(broadcast(stop), Seq("w"), "left_anti")
      val rebuilt = kept.groupBy("doc_id")
        .agg(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x("w"))).as("scrubbed"),
          count(lit(1)).as("n_kept"))
      docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("scrubbed"), lit("")).as("scrubbed"),
          (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    },
      Some("""WITH n AS (SELECT count(*) AS cnt FROM documents),
              tok AS (SELECT doc_id,
                             unnest(range(len(string_split(text,' ')))) AS pos,
                             unnest(string_split(text,' ')) AS w
                      FROM documents),
              dfq AS (SELECT w, count(DISTINCT doc_id) AS dfreq
                      FROM tok GROUP BY w),
              stop AS (SELECT w FROM dfq, n WHERE dfreq > cnt * 0.8),
              kept AS (SELECT doc_id, pos, w FROM tok
                       WHERE w NOT IN (SELECT w FROM stop)),
              reb AS (SELECT doc_id,
                             string_agg(w, ' ' ORDER BY pos) AS scrubbed,
                             count(*) AS n_kept
                      FROM kept GROUP BY doc_id)
              SELECT d.doc_id,
                     COALESCE(reb.scrubbed, '') AS scrubbed,
                     len(string_split(d.text,' ')) - COALESCE(reb.n_kept, 0)
                       AS n_removed
              FROM documents d LEFT JOIN reb ON d.doc_id = reb.doc_id""")),

    // ---- t21: classifier-based quality scoring — a linear model over
    //      hashing-trick token features (the fasttext-style quality
    //      filter a pipeline runs per document). Bucket = md5-prefix mod
    //      1024, weight = a deterministic integer per bucket in
    //      [-1000,1000]; the per-doc weight SUM stays in integer space
    //      (exact under any evaluation order — a double accumulation
    //      would make the oracle order-sensitive), divided once at the
    //      end. r17: explode + whole-stage-codegen'd hash aggregate, NOT
    //      a per-row aggregate() fold — higher-order functions are
    //      CodegenFallback, so the fold ran its md5+conv lambda
    //      interpreted per token (the d03 lesson from the other side:
    //      when the per-element work is expensive, the codegen'd
    //      explode+agg beats the narrow interpreted fold — measured
    //      0.74× here). The sum stays in integer space, so the
    //      re-association across partial aggregates is exact and the
    //      result is identical; count(1) per doc IS size(toks) (explode
    //      emits every element, split("") included). NULL-text docs:
    //      explode emits no rows for them, so they are DROPPED from the
    //      output — matching the unnest-based oracle exactly (the old
    //      fold form kept them with NULL score; the fixture corpus has
    //      no NULL text, and the oracle defines the contract either
    //      way). ----
    Q("t21_quality_classifier", (s, d) => {
      val weight = (conv(substring(md5(col("w")), 1, 6), 16, 10)
        .cast("long") % 1024L) * 2654435761L % 2001L - 1000L
      t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("w"))
        .groupBy("doc_id")
        .agg(sum(weight).as("wsum"), count(lit(1)).as("ntok"))
        .select(col("doc_id"),
          round(col("wsum") / (col("ntok") * 1000.0), 5).as("score"))
        .withColumn("keep", col("score") > 0.02)
    },
      Some("""WITH tok AS (
                SELECT doc_id, unnest(string_split(lower(text),' ')) AS w
                FROM documents),
              b AS (SELECT doc_id,
                           ('0x' || substr(md5(w), 1, 6))::BIGINT % 1024
                             AS bkt
                    FROM tok),
              sc AS (SELECT doc_id,
                            sum(bkt * 2654435761 % 2001 - 1000) AS ws,
                            count(*) AS ntok
                     FROM b GROUP BY doc_id)
              SELECT doc_id,
                     round(ws / (ntok * 1000.0), 5) AS score,
                     round(ws / (ntok * 1000.0), 5) > 0.02 AS keep
              FROM sc""")),

    // ---- m07: image-level dedup from DECODED PIXELS — every document's
    //      payload (content-addressed: one synthesis per distinct
    //      pattern, joined back per doc) is pixel-decoded, and documents
    //      pair when their decoded signatures (dims + channel means +
    //      gray sum) coincide. The signature join is hash-partitioned
    //      equality — blocked, never all-pairs. The oracle predicts the
    //      pair set purely from the generator's closed form (doc_id mod
    //      60), so a decoder that collapses or splits signatures breaks
    //      the row set, not just a value. ----
    Q("m07_image_dedup", (s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), (col("doc_id") % 60).as("pat"))
      val patMedia = Multimodal.synthPng(s,
          docs.select(col("pat").as("doc_id")).distinct())
        .withColumnRenamed("doc_id", "pat")
      val docMedia = docs.join(patMedia, "pat")
        .select(col("doc_id"), col("payload"))
      val sig = Multimodal.decodePixelStats(s, docMedia).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("gray_sum"),
          col("mean_r"), col("mean_g"), col("mean_b"))
      val a = sig.as("a"); val b = sig.as("b")
      a.join(b,
          col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.gray_sum") === col("b.gray_sum") &&
          col("a.mean_r") === col("b.mean_r") &&
          col("a.mean_g") === col("b.mean_g") &&
          col("a.mean_b") === col("b.mean_b") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    },
      Some("""SELECT a.doc_id AS da, b.doc_id AS db
             FROM documents a JOIN documents b
               ON a.doc_id % 60 = b.doc_id % 60 AND a.doc_id < b.doc_id
             WHERE a.doc_id < 300 AND b.doc_id < 300""")),

    // ---- t22: deterministic train/val/test split — 90/5/5 by the same
    //      overflow-safe multiplicative doc hash as t11/t19, so
    //      membership is a pure function of doc_id (stable across runs,
    //      machines, and re-partitions — the property an eval split must
    //      have). Zero shuffle for the assignment; the summary aggregate
    //      verifies the proportions AND the exact membership hash. ----
    Q("t22_train_test_split", (s, d) =>
      t(s, d, "documents")
        .withColumn("u",
          ((col("doc_id") % lit(1048576L)) * lit(489905L) % lit(1048576L))
            / lit(1048576.0))
        .withColumn("split",
          when(col("u") < 0.9, "train")
            .when(col("u") < 0.95, "val").otherwise("test"))
        .select(col("doc_id"), col("split")),
      Some("""SELECT doc_id,
                CASE WHEN (doc_id % 1048576 * 489905 % 1048576) / 1048576.0
                          < 0.9 THEN 'train'
                     WHEN (doc_id % 1048576 * 489905 % 1048576) / 1048576.0
                          < 0.95 THEN 'val'
                     ELSE 'test' END AS split
             FROM documents""")),

    // ---- t25: deterministic corpus shuffle + balanced sharding — the
    //      dataloader permutation: shard = pmod(xxhash64(doc_id), 8),
    //      position within shard = rank in hash order. Being a pure
    //      function of doc_id, the permutation is stable across runs and
    //      cluster sizes (resumable training). Scale: the per-shard rank
    //      is NOT a window over shard (8 partitions x 12.5 TB each at
    //      100 TB) — GlobalRank range-partitions the (shard, h) order
    //      across ALL partitions and converts local row numbers via an
    //      8-row offset join, so every stage stays fully parallel. The
    //      oracle recomputes the exact xxhash64 via the gx_ macro
    //      library — one flipped hash bit reorders the permutation and
    //      breaks the hash compare. ----
    Q("t25_shuffle_shard", (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
        .select(col("doc_id"))
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)).cast("int"))
      val rn = graft.operators.GlobalRank.rowNumber(docs,
        Seq(col("shard"), col("h"), col("doc_id")), "rn")
      // 8-row shard histogram -> cumulative start offsets, computed
      // driver-side (metadata-sized, the same bounded-collect discipline
      // as GlobalRank's own per-partition counts — a window over the
      // 8 rows would plan an empty partitionSpec and trip the bench's
      // global-window guard); counting over rn reuses GlobalRank's
      // materialized range layout instead of re-scanning the source;
      // pos = global rank - shard start
      val counts = rn.groupBy("shard").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      val offs = counts.map { case (sh, c) => val o = acc; acc += c; (sh, o) }
      val offDf = broadcast(offs.toSeq.toDF("shard", "off"))
      rn.join(offDf, "shard")
        .select(col("doc_id"), col("shard"),
          (col("rn") - col("off")).as("pos"))
    },
      Some(XxhOracle.macros + """
        WITH h0 AS (SELECT doc_id,
               gx_wstep(gx_a64(42, 2870177450012600269),
                        gx_unsigned(doc_id)) AS h FROM documents),
        h1 AS (SELECT doc_id,
               gx_m64(xor(h, h >> 33), 14029467366897019727) AS h FROM h0),
        h2 AS (SELECT doc_id,
               gx_m64(xor(h, h >> 29), 1609587929392839161) AS h FROM h1),
        h3 AS (SELECT doc_id, gx_signed(xor(h, h >> 32)) AS h FROM h2),
        s AS (SELECT doc_id, h,
               CAST(((h % 8) + 8) % 8 AS INT) AS shard FROM h3)
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard
                 ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM s""")),

    // ---- t26: exact token-budget fill per domain — greedy selection in
    //      deterministic hash order until each source's token budget
    //      (2000) is filled: the mixture step when a training run needs
    //      exactly-N tokens per domain (t19's rate sampling hits the
    //      budget only in expectation). Window partitions by SOURCE
    //      (bounded cardinality, the t18 discipline) — work scales with
    //      per-domain data, never the corpus; selection order is
    //      xxhash64(doc_id), so the fill is reproducible across runs and
    //      cluster sizes and the oracle re-derives it bit-exactly. ----
    Q("t26_token_budget_fill", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("h", xxhash64(col("doc_id")))
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.withColumn("cum_before",
          coalesce(sum("n_tokens").over(w), lit(0L)))
        .filter(col("cum_before") < lit(2000L))
        .select("source", "doc_id", "n_tokens")
    },
      Some(XxhOracle.macros + """
        WITH h0 AS (SELECT doc_id,
               gx_wstep(gx_a64(42, 2870177450012600269),
                        gx_unsigned(doc_id)) AS h FROM documents),
        h1 AS (SELECT doc_id,
               gx_m64(xor(h, h >> 33), 14029467366897019727) AS h FROM h0),
        h2 AS (SELECT doc_id,
               gx_m64(xor(h, h >> 29), 1609587929392839161) AS h FROM h1),
        h3 AS (SELECT doc_id, gx_signed(xor(h, h >> 32)) AS h FROM h2),
        tok AS (SELECT source, doc_id,
                       len(string_split(text, ' ')) AS n FROM documents),
        j AS (SELECT tok.source, tok.doc_id, tok.n, h3.h
              FROM tok JOIN h3 USING (doc_id)),
        c AS (SELECT source, doc_id, n,
                COALESCE(sum(n) OVER (PARTITION BY source
                  ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS cb
              FROM j)
        SELECT source, doc_id, CAST(n AS BIGINT) AS n_tokens
        FROM c WHERE cb < 2000""")),

    // ---- t27: corpus snapshot diff — classify every document across two
    //      corpus versions as added / removed / changed / unchanged (the
    //      incremental-retraining primitive: which documents need
    //      re-embedding, which training shards are dirty). Snapshot B is
    //      derived deterministically from the fixture (drop %11, edit %7,
    //      add 20 re-keyed docs) so the gate needs no second table; the
    //      compare ships 16-byte md5 content hashes through ONE full
    //      outer join on doc_id — never the text itself (at 100 TB the
    //      shuffle carries hashes, not documents). ----
    Q("t27_snapshot_diff", (s, d) => {
      val docs = t(s, d, "documents")
      // presence rides explicit flags, not hash nullness: md5(NULL) is
      // NULL, so a NULL-text document would otherwise misclassify; the
      // hash compare is null-safe (<=>) for the same reason
      val a = docs.select(col("doc_id"), md5(col("text")).as("ha"),
        lit(true).as("in_a"))
      val b0 = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val badd = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val b = b0.unionAll(badd)
        .select(col("doc_id"), md5(col("text")).as("hb"),
          lit(true).as("in_b"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("in_a").isNull, "added")
            .when(col("in_b").isNull, "removed")
            .when(col("ha") <=> col("hb"), "unchanged")
            .otherwise("changed").as("status"))
    },
      Some("""WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents),
        b0 AS (SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
                   AS text
               FROM documents WHERE doc_id % 11 <> 0),
        badd AS (SELECT doc_id + 1000000 AS doc_id, text
                 FROM documents WHERE doc_id < 20),
        b AS (SELECT doc_id, md5(text) AS hb
              FROM (SELECT * FROM b0 UNION ALL SELECT * FROM badd))
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN ha IS NOT DISTINCT FROM hb THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""")),

    // ---- t23: exact duplicate-SPAN removal (Lee et al. 2022 ExactSubstr)
    //      — every 8-token window occurring >1 time in the corpus is cut
    //      from all but its globally-first occurrence, overlapping windows
    //      merging into maximal spans; documents are REWRITTEN, not
    //      dropped. Two shuffles (gram agg, per-doc merge), 8-byte gram
    //      hashes end-to-end; the oracle re-derives the same spans from
    //      the gram STRINGS, so a single off-by-one in windowing,
    //      canonical choice, or token reassembly breaks the hash. ----
    Q("t23_span_dedup", (s, d) =>
      graft.operators.Dedup.removeDuplicateSpans(t(s, d, "documents"), 8),
      Some("""WITH ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              occ AS (
                SELECT doc_id, i AS pos, array_to_string(w[i+1:i+8], ' ') AS gram
                FROM ws, UNNEST(range(0, len(w) - 7)) AS u(i)),
              rk AS (
                SELECT doc_id, pos,
                       row_number() OVER (PARTITION BY gram
                         ORDER BY doc_id, pos) AS rn,
                       count(*) OVER (PARTITION BY gram) AS df
                FROM occ),
              rm AS (SELECT doc_id, pos FROM rk WHERE df >= 2 AND rn > 1),
              dropi AS (
                SELECT DISTINCT doc_id, i FROM (
                  SELECT doc_id, unnest(range(pos, pos + 8)) AS i FROM rm)),
              toks AS (
                SELECT doc_id, i, w[i+1] AS tok
                FROM ws, UNNEST(range(0, len(w))) AS u(i)),
              kept AS (
                SELECT t.doc_id, t.i, t.tok
                FROM toks t LEFT JOIN dropi d
                  ON t.doc_id = d.doc_id AND t.i = d.i
                WHERE d.doc_id IS NULL),
              agg AS (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
                FROM kept GROUP BY doc_id),
              nd AS (
                SELECT doc_id, count(*) AS n_removed FROM dropi GROUP BY doc_id)
              SELECT ws.doc_id, len(ws.w) AS n_tokens,
                     coalesce(nd.n_removed, 0) AS n_removed,
                     coalesce(agg.clean_text, '') AS clean_text
              FROM ws LEFT JOIN nd USING (doc_id) LEFT JOIN agg USING (doc_id)""")),

    // ---- t24: corpus-level bigram novelty — the share of a document's
    //      bigram occurrences that appear in NO other document (a cheap
    //      n-gram-LM quality signal in the CCNet spirit: templated/spammy
    //      docs score near 0, unique prose near 1). All-integer counting
    //      plus ONE division, so the result is bit-exact across engines
    //      (no float summation order anywhere). One gram aggregate + one
    //      join back; grams travel as 8-byte hashes. ----
    Q("t24_bigram_novelty", (s, d) => {
      // r17 rewrite, result-identical: a doc's bigram count is size(ws)-1
      // (a narrow per-row expression — no aggregate needed), and "novel"
      // occurrences (c == tot, i.e. the doc owns EVERY occurrence of the
      // gram) are exactly the single-doc grams (min doc == max doc), whose
      // full count tot credits that one doc. One gram aggregate replaces
      // the old per-(doc,gram) aggregate + totals aggregate + join back —
      // one shuffle of the occurrences instead of two plus a join.
      val base = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
      val occ = base.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-2), i -> xxhash64(concat_ws(' ', slice(ws, i+1, 2))))"
      )).as("gram"))
      val novelPerDoc = occ.groupBy("gram")
        .agg(count(lit(1)).as("tot"),
          min("doc_id").as("d0"), max("doc_id").as("d1"))
        .filter(col("d0") === col("d1"))
        .groupBy(col("d0").as("doc_id"))
        .agg(sum("tot").as("nv"))
      base.select(col("doc_id"),
          (size(col("ws")) - 1).cast("long").as("n_bigrams"))
        .join(novelPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bigrams"),
          coalesce(col("nv"), lit(0L)).as("n_novel"),
          round(coalesce(col("nv"), lit(0L)).cast("double") / col("n_bigrams"), 6)
            .as("novelty"))
    },
      Some("""WITH ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              occ AS (
                SELECT doc_id, w[i+1] || ' ' || w[i+2] AS gram
                FROM ws, UNNEST(range(0, len(w) - 1)) AS u(i)
                WHERE len(w) >= 2),
              pd AS (
                SELECT doc_id, gram, count(*) AS c FROM occ GROUP BY 1, 2),
              tot AS (
                SELECT gram, sum(c) AS tot FROM pd GROUP BY 1)
              SELECT pd.doc_id,
                     CAST(sum(pd.c) AS BIGINT) AS n_bigrams,
                     CAST(sum(CASE WHEN pd.c = tot.tot THEN pd.c ELSE 0 END)
                          AS BIGINT) AS n_novel,
                     round(CAST(sum(CASE WHEN pd.c = tot.tot THEN pd.c ELSE 0 END)
                           AS DOUBLE) / sum(pd.c), 6) AS novelty
              FROM pd JOIN tot USING (gram)
              GROUP BY pd.doc_id"""))
  )
}
