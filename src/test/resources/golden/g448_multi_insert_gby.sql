-- multi_insert_gby.q: one scan, two INSERTs with DIFFERENT group-bys and
-- a HAVING on one branch.
DROP TABLE IF EXISTS g448_o1;
DROP TABLE IF EXISTS g448_o2;
CREATE TABLE g448_o1 (rf STRING, cnt BIGINT);
CREATE TABLE g448_o2 (ls STRING, s DOUBLE);
FROM lineitem
INSERT OVERWRITE TABLE g448_o1
  SELECT l_returnflag, count(1) GROUP BY l_returnflag HAVING count(1) > 100
INSERT OVERWRITE TABLE g448_o2
  SELECT l_linestatus, round(sum(l_discount) * 100) / 100 GROUP BY l_linestatus;
SELECT 'o1' AS src, rf AS k, cast(cnt AS STRING) AS v FROM g448_o1
UNION ALL
SELECT 'o2', ls, cast(s AS STRING) FROM g448_o2
