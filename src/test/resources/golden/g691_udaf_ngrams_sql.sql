-- udaf_ngrams.q / udaf_context_ngrams.q: the SQL-name surface of the
-- ngrams family over the sentences() nested shape — n-grams never cross
-- sentence boundaries, the output is Hive's
-- array<struct<ngram:array<string>, estfrequency:double>> (scripts
-- access .estfrequency), and the optional precision argument is
-- accepted. create_union (udf_union.q) and compute_stats ride along on
-- the same SQL-name registration.
DROP TABLE IF EXISTS g691_kafka;
CREATE TABLE g691_kafka (contents STRING);
INSERT INTO g691_kafka VALUES
  ('The quick fox jumped. The lazy dog slept. The quick dog barked.'),
  ('A quick dog runs. The quick fox rests.');
SELECT 'ngrams' AS fn, t.ngram, t.estfrequency
FROM (SELECT explode(ngrams(sentences(lower(contents)), 2, 4, 1000)) AS t
      FROM g691_kafka)
UNION ALL
SELECT 'context' AS fn, t.ngram, t.estfrequency
FROM (SELECT explode(context_ngrams(sentences(lower(contents)),
                                    array('the', null), 3, 1000)) AS t
      FROM g691_kafka)
UNION ALL
SELECT 'stats' AS fn,
       array(st.ColumnType, CAST(st.Min AS STRING), CAST(st.Max AS STRING),
             CAST(st.CountNulls AS STRING)) AS ngram,
       CAST(st.NumDistinctValues AS DOUBLE) AS estfrequency
FROM (SELECT compute_stats(length(contents), 16) AS st FROM g691_kafka)
ORDER BY fn, estfrequency DESC, ngram
