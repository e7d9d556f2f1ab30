-- orc_dictionary_threshold.q: string columns read back exactly whether
-- or not the writer used dictionary encoding — one low-cardinality
-- column (dictionary-friendly) and one all-distinct column in the same
-- ORC table.
DROP TABLE IF EXISTS g999_do;
CREATE TABLE g999_do (rep STRING, uniq STRING) STORED AS ORC;
INSERT OVERWRITE TABLE g999_do
  SELECT CAST(n_regionkey AS STRING), concat(n_name, '_', n_nationkey)
  FROM nation;
SELECT rep, count(*) AS cnt, min(uniq) AS first_u, max(uniq) AS last_u
FROM g999_do GROUP BY rep
