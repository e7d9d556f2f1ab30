-- mapreduce2.q shape: map-side TRANSFORM, DISTRIBUTE BY + SORT BY
-- between stages, reduce-side TRANSFORM (uniq -c over the sorted, key-
-- colocated stream — each key wholly inside one partition). Exercises
-- the Hive TAB default the engine injects for script IO.
SELECT r_key AS k, r_cnt AS cnt
FROM (
  FROM (
    FROM nation
    SELECT TRANSFORM(n_regionkey) USING 'cat' AS (mkey)
    DISTRIBUTE BY mkey SORT BY mkey
  ) mapped
  SELECT TRANSFORM(mapped.mkey) USING 'uniq -c | sed "s/^ *//;s/ /\t/"' AS (r_cnt, r_key)
) reduced
