-- join20.q / join21.q / auto_join21.q shape: inner-then-right-outer chains
-- where ON-clause key predicates interact with the outer padding.
SELECT 'j20' AS tag,
       s1.n_nationkey AS k1, s2.n_nationkey AS k2, s3.n_nationkey AS k3
FROM nation s1
JOIN nation s2 ON (s1.n_nationkey = s2.n_nationkey AND s1.n_nationkey < 10)
RIGHT OUTER JOIN nation s3 ON (s1.n_nationkey = s3.n_nationkey AND s3.n_nationkey < 20)
UNION ALL
SELECT 'j21',
       s1.n_nationkey, s2.n_nationkey, s3.n_nationkey
FROM nation s1
LEFT OUTER JOIN nation s2 ON (s1.n_nationkey = s2.n_nationkey AND s1.n_nationkey < 10 AND s2.n_nationkey > 10)
RIGHT OUTER JOIN nation s3 ON (s2.n_nationkey = s3.n_nationkey AND s3.n_nationkey < 10)
