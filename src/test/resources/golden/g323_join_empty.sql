-- join_empty.q: joins where one side is provably empty — inner join
-- drops everything, left outer preserves the populated side with NULLs,
-- and the aggregate over the empty side still answers.
CREATE OR REPLACE TEMPORARY VIEW g323_empty AS
  SELECT n_nationkey AS k, n_name AS v FROM nation WHERE 1 = 0;
SELECT 'inner' AS tag, count(*) AS n, NULL AS sample FROM region r JOIN g323_empty e ON r.r_regionkey = e.k
UNION ALL
SELECT 'louter', count(*), max(r.r_name) FROM region r LEFT JOIN g323_empty e ON r.r_regionkey = e.k
UNION ALL
SELECT 'righte', count(*), NULL FROM region r RIGHT JOIN g323_empty e ON r.r_regionkey = e.k
ORDER BY tag;
