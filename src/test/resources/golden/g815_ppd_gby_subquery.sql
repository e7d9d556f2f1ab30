-- ppd_gby2.q: outer WHERE over a grouped subquery mixing a pushable
-- key predicate with an OR over the aggregate (only the key half may
-- push below the inner GROUP BY).
SELECT max(src1.c1) AS m, src1.c2
FROM (SELECT n_name AS c1, count(n_nationkey) AS c2
      FROM nation WHERE n_name > 'C' GROUP BY n_name) src1
WHERE src1.c1 > 'E' AND (src1.c2 > 30 OR src1.c1 < 'P')
GROUP BY src1.c2
