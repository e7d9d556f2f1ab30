-- auto_join3.q: a three-way self-join written through INSERT OVERWRITE,
-- pinned by the reference's sum(hash(key, value)) checksum so broadcast
-- conversion cannot change the answer.
DROP TABLE IF EXISTS g788_dest;
CREATE TABLE g788_dest (key INT, value STRING) USING parquet;
FROM nation n1
  JOIN nation n2 ON (n1.n_nationkey = n2.n_nationkey)
  JOIN nation n3 ON (n1.n_nationkey = n3.n_nationkey)
INSERT OVERWRITE TABLE g788_dest SELECT n1.n_nationkey, n3.n_name;
SELECT sum(hash(key, value)) AS hv, count(*) AS n FROM g788_dest;
