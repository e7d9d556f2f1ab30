-- reference: ql/src/test/queries/clientpositive/nonblock_op_deduplicate.q
-- — the HIVE-4968 shape: a pass-through subquery chain joined (cross)
-- to a count(*) aggregate, plus an expression referenced twice through
-- an alias.
SELECT tmp4.key AS key, tmp4.value AS value, tmp4.cnt AS cnt FROM
  (SELECT tmp2.key AS key, tmp2.value AS value, tmp3.cnt AS cnt
   FROM (SELECT * FROM
          (SELECT n_nationkey AS key, n_name AS value FROM nation
           WHERE n_nationkey < 5) tmp1) tmp2
   JOIN (SELECT count(*) AS cnt FROM nation) tmp3) tmp4
UNION ALL
SELECT nkey, CAST(nkey + 1 AS STRING), CAST(NULL AS BIGINT) FROM
  (SELECT n_nationkey + 1 AS nkey, n_name AS value FROM nation
   WHERE n_nationkey < 3) a
