-- join_reorder2.q / join_reorder3.q: 4-table chains joined on mixed
-- key/val equalities — result must be order-insensitive to Hive's
-- STREAMTABLE reorder (Catalyst reorders freely; rows are the contract).
DROP TABLE IF EXISTS g429_t1;
DROP TABLE IF EXISTS g429_t2;
DROP TABLE IF EXISTS g429_t3;
DROP TABLE IF EXISTS g429_t4;
CREATE TABLE g429_t1 (key STRING, val STRING);
CREATE TABLE g429_t2 (key STRING, val STRING);
CREATE TABLE g429_t3 (key STRING, val STRING);
CREATE TABLE g429_t4 (key STRING, val STRING);
INSERT INTO g429_t1 VALUES ('1','101'), ('2','102'), ('4','104'), ('9','109');
INSERT INTO g429_t2 VALUES ('2','102'), ('4','204'), ('5','205'), ('9','109');
INSERT INTO g429_t3 VALUES ('1','301'), ('2','102'), ('4','104'), ('9','109');
INSERT INTO g429_t4 VALUES ('2','102'), ('4','104'), ('7','707'), ('9','109');
SELECT /*+ STREAMTABLE(a, c) */ a.key AS ak, b.key AS bk, c.key AS ck, d.key AS dk
FROM g429_t1 a
  JOIN g429_t2 b ON a.key = b.key
  JOIN g429_t3 c ON a.val = c.val
  JOIN g429_t4 d ON a.key + 1 = d.key + 1
