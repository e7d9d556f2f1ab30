-- join_reorder.q: STREAMTABLE hint (Hive reorder directive — accepted and
-- safely ignorable on Spark, where Catalyst owns join order) plus the
-- FROM-first SELECT form, and an arithmetic join key c.key+1=a.key.
DROP TABLE IF EXISTS g428_t1;
DROP TABLE IF EXISTS g428_t2;
DROP TABLE IF EXISTS g428_t3;
CREATE TABLE g428_t1 (key STRING, val STRING);
CREATE TABLE g428_t2 (key STRING, val STRING);
CREATE TABLE g428_t3 (key STRING, val STRING);
INSERT INTO g428_t1 VALUES ('1','101'), ('2','102'), ('4','104'), ('9','109'), ('9','119');
INSERT INTO g428_t2 VALUES ('2','202'), ('4','204'), ('5','205'), ('9','209');
INSERT INTO g428_t3 VALUES ('1','301'), ('4','304'), ('6','306'), ('9','309');
FROM g428_t1 a
  LEFT OUTER JOIN g428_t2 b ON (b.key = a.key)
  RIGHT OUTER JOIN g428_t3 c ON (c.val = a.val OR c.key = a.key)
SELECT /*+ STREAMTABLE(a) */ a.key AS ak, b.key AS bk, a.val AS av, c.val AS cv
