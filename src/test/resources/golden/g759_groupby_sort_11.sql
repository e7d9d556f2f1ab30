-- groupby_sort_11.q: distinct-aggregate battery over one bucketed-sorted
-- partition — global, grouped, keyed, distinct-over-expression and
-- distinct-over-constant.
DROP TABLE IF EXISTS g759_t1;
CREATE TABLE g759_t1 (key STRING, val STRING) PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
INSERT OVERWRITE TABLE g759_t1 PARTITION (ds='1')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey < 10;
SELECT 'g' AS tag, count(DISTINCT key) AS c1, count(1) AS c2, count(key) AS c3, sum(DISTINCT key) AS s1 FROM g759_t1
UNION ALL
SELECT 'expr', count(DISTINCT key+key), NULL, NULL, NULL FROM g759_t1
UNION ALL
SELECT 'const', count(DISTINCT 1), NULL, NULL, NULL FROM g759_t1
