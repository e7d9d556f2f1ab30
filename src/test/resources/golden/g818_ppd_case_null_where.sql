-- ppd_udf_case.q: a CASE in WHERE that yields TRUE/FALSE/NULL — rows
-- whose CASE lands NULL are filtered out exactly like FALSE, across a
-- self-join.
SELECT a.n_nationkey AS ka, a.n_name AS na, b.n_regionkey AS rb
FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
WHERE CASE a.n_nationkey
        WHEN 7 THEN TRUE
        WHEN 8 THEN FALSE
        ELSE NULL
      END
ORDER BY ka, na, rb
